"""WebM / Matroska (EBML) block walk — pure stdlib (round 5).

The EBML counterpart of operators/mp4_parse: walks Segment -> Tracks to
find the video track, reads TimestampScale from Info, then walks every
Cluster's SimpleBlocks to emit (offset, size, pts_s, keyframe) per video
block — frame sampling as bounded byte-range fetches, no codec decode
(VP8/VP9/AV1 payloads stay opaque; that is the declared stub surface).

Element IDs used (Matroska spec, public):
  Segment 0x18538067, Info 0x1549A966, TimestampScale 0x2AD7B1,
  Tracks 0x1654AE6B, TrackEntry 0xAE, TrackNumber 0xD7, TrackType 0x83,
  Cluster 0x1F43B675, Timestamp 0xE7, SimpleBlock 0xA3.
"""

from __future__ import annotations

import numpy as np

_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3


def _read_id(data: bytes, pos: int) -> tuple[int, int]:
    """EBML IDs keep their length-descriptor bit."""
    b0 = data[pos]
    for n in range(1, 5):
        if b0 & (0x100 >> n):
            return int.from_bytes(data[pos : pos + n], "big"), pos + n
    raise ValueError("invalid EBML ID")


def _read_size(data: bytes, pos: int) -> tuple[int, int]:
    """EBML sizes strip the marker bit; all-ones payload = unknown size."""
    b0 = data[pos]
    for n in range(1, 9):
        if b0 & (0x100 >> n):
            raw = int.from_bytes(data[pos : pos + n], "big")
            val = raw & ((1 << (7 * n)) - 1)
            if val == (1 << (7 * n)) - 1:
                val = -1  # unknown size (streamed) — caller bounds by parent
            return val, pos + n
    raise ValueError("invalid EBML size")


def _walk(data: bytes, start: int, end: int):
    pos = start
    while pos < end:
        eid, p = _read_id(data, pos)
        size, p = _read_size(data, p)
        if size < 0:
            size = end - p
        if p + size > end:
            raise ValueError("malformed EBML element")
        yield eid, p, p + size
        pos = p + size


def _uint(data: bytes, ps: int, pe: int) -> int:
    return int.from_bytes(data[ps:pe], "big")


def webm_block_ranges(data: bytes) -> dict:
    """Walk the first video track's SimpleBlocks -> numpy arrays
    ``offset`` (payload byte offset), ``size``, ``pts`` (seconds) and
    ``keyframe``, plus ``timescale_ns``. Corrupt input raises ValueError
    (never raw IndexError from parser internals)."""
    try:
        return _webm_block_ranges(bytes(data))
    except IndexError as exc:
        raise ValueError(f"malformed Matroska stream: {exc}") from exc


def _webm_block_ranges(data: bytes) -> dict:
    seg = None
    for eid, ps, pe in _walk(data, 0, len(data)):
        if eid == _SEGMENT:
            seg = (ps, pe)
            break
    if seg is None:
        raise ValueError("no Matroska Segment element")

    scale_ns = 1_000_000  # spec default: 1 ms per timestamp tick
    video_track = None
    for eid, ps, pe in _walk(data, *seg):
        if eid == _INFO:
            for eid2, p2, q2 in _walk(data, ps, pe):
                if eid2 == _TIMESTAMP_SCALE:
                    scale_ns = _uint(data, p2, q2)
        elif eid == _TRACKS:
            for eid2, p2, q2 in _walk(data, ps, pe):
                if eid2 != _TRACK_ENTRY:
                    continue
                num = ttype = None
                for eid3, p3, q3 in _walk(data, p2, q2):
                    if eid3 == _TRACK_NUMBER:
                        num = _uint(data, p3, q3)
                    elif eid3 == _TRACK_TYPE:
                        ttype = _uint(data, p3, q3)
                if ttype == 1 and video_track is None:  # 1 = video
                    video_track = num
    if video_track is None:
        raise ValueError("no video TrackEntry in Tracks")

    offsets, sizes, pts, keys = [], [], [], []
    for eid, ps, pe in _walk(data, *seg):
        if eid != _CLUSTER:
            continue
        cluster_ts = 0
        for eid2, p2, q2 in _walk(data, ps, pe):
            if eid2 == _CLUSTER_TS:
                cluster_ts = _uint(data, p2, q2)
            elif eid2 == _SIMPLE_BLOCK:
                tnum, bp = _read_size(data, p2)  # track number is a varint
                rel = int.from_bytes(data[bp : bp + 2], "big", signed=True)
                flags = data[bp + 2]
                if tnum != video_track:
                    continue
                payload = bp + 3
                offsets.append(payload)
                sizes.append(q2 - payload)
                pts.append((cluster_ts + rel) * scale_ns / 1e9)
                keys.append(bool(flags & 0x80))
    if not offsets:
        raise ValueError("no SimpleBlocks for the video track")
    return {
        "offset": np.array(offsets, dtype=np.int64),
        "size": np.array(sizes, dtype=np.int64),
        "pts": np.array(pts, dtype=np.float64),
        "keyframe": np.array(keys, dtype=bool),
        "timescale_ns": int(scale_ns),
    }
