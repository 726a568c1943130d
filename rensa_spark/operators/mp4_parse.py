"""ISO BMFF (MP4) sample-table parsing — pure stdlib/numpy.

Upgrades the mp4 lane of the multimodal plumbing from "stub" to "container
walk real, codec payload opaque": a 100-TB frame-sampling pipeline does not
decode video inline — it reads each file's sample tables once (a few KB in
`moov`), picks the sample indices it wants (keyframes, midpoints), and
issues bounded byte-range reads into `mdat` for just those samples. The
H.264/H.265 payload itself still requires a codec library this sandbox does
not have, so pixel-level work (phash, PSNR) remains behind the declared
NotImplementedError — but offsets/sizes/timestamps/keyframe flags are fully
computable from the container alone, and that is what this module does.

Parsed boxes (ISO/IEC 14496-12 structures, public spec):
  moov/trak/mdia[hdlr=vide]/minf/stbl:
    stsz (sample sizes), stco/co64 (chunk offsets), stsc (sample->chunk
    runs), stts (time deltas), stss (sync samples; absent = all sync),
    mdhd (timescale).
"""

from __future__ import annotations

import struct

import numpy as np

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk(data: bytes, start: int, end: int):
    """Yield (box_type, payload_start, payload_end) for sibling boxes."""
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack(">I4s", data[pos : pos + 8])
        header = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            header = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError("malformed MP4 box structure")
        yield btype, pos + header, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, path: list[bytes]):
    """Return (payload_start, payload_end) of the first box at ``path``."""
    head, rest = path[0], path[1:]
    for btype, ps, pe in _walk(data, start, end):
        if btype != head:
            continue
        if not rest:
            return ps, pe
        found = _find(data, ps, pe, rest)
        if found is not None:
            return found
    return None


def _video_stbl(data: bytes) -> tuple[int, int, int]:
    """Locate the first VIDEO track's stbl payload + its mdhd timescale."""
    moov = _find(data, 0, len(data), [b"moov"])
    if moov is None:
        raise ValueError("no moov box (not an MP4 or streaming-only file)")
    for btype, ps, pe in _walk(data, *moov):
        if btype != b"trak":
            continue
        mdia = _find(data, ps, pe, [b"mdia"])
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, [b"hdlr"])
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(data, *mdia, [b"mdhd"])
        if mdhd is None:
            raise ValueError("video trak without mdhd")
        version = data[mdhd[0]]
        if version == 1:
            (timescale,) = struct.unpack(">I", data[mdhd[0] + 20 : mdhd[0] + 24])
        else:
            (timescale,) = struct.unpack(">I", data[mdhd[0] + 12 : mdhd[0] + 16])
        stbl = _find(data, *mdia, [b"minf", b"stbl"])
        if stbl is None:
            raise ValueError("video trak without stbl")
        return stbl[0], stbl[1], timescale
    raise ValueError("no video track (hdlr 'vide') in moov")


def _full_box(data: bytes, ps: int) -> int:
    """Skip the FullBox version/flags word, returning the table start."""
    return ps + 4


def mp4_sample_table(data: bytes) -> dict:
    """Parse the first video track's sample table.

    Returns dict with numpy arrays, one entry per sample:
      ``offset`` (byte offset in the file), ``size`` (bytes),
      ``pts`` (seconds, float64, decode-time based), ``keyframe`` (bool),
    plus ``timescale`` (int).

    Corrupt input raises ValueError (typed, message-bearing) — at corpus
    scale malformed payloads are routine and must never surface as raw
    IndexError/struct.error from parser internals."""
    try:
        return _mp4_sample_table(bytes(data))
    except (IndexError, struct.error, ZeroDivisionError) as exc:
        raise ValueError(f"malformed MP4: {exc}") from exc


def _mp4_sample_table(data: bytes) -> dict:
    stbl_s, stbl_e, timescale = _video_stbl(data)
    boxes = {t: (ps, pe) for t, ps, pe in _walk(data, stbl_s, stbl_e)}

    if b"stsz" not in boxes:
        raise ValueError("stbl without stsz")
    p = _full_box(data, boxes[b"stsz"][0])
    uniform, count = struct.unpack(">II", data[p : p + 8])
    if uniform:
        sizes = np.full(count, uniform, dtype=np.int64)
    else:
        sizes = np.frombuffer(
            data[p + 8 : p + 8 + 4 * count], dtype=">u4"
        ).astype(np.int64)

    if b"stco" in boxes:
        p = _full_box(data, boxes[b"stco"][0])
        (n_chunks,) = struct.unpack(">I", data[p : p + 4])
        chunk_offsets = np.frombuffer(
            data[p + 4 : p + 4 + 4 * n_chunks], dtype=">u4"
        ).astype(np.int64)
    elif b"co64" in boxes:
        p = _full_box(data, boxes[b"co64"][0])
        (n_chunks,) = struct.unpack(">I", data[p : p + 4])
        chunk_offsets = np.frombuffer(
            data[p + 4 : p + 4 + 8 * n_chunks], dtype=">u8"
        ).astype(np.int64)
    else:
        raise ValueError("stbl without stco/co64")

    if b"stsc" not in boxes:
        raise ValueError("stbl without stsc")
    p = _full_box(data, boxes[b"stsc"][0])
    (n_runs,) = struct.unpack(">I", data[p : p + 4])
    runs = np.frombuffer(
        data[p + 4 : p + 4 + 12 * n_runs], dtype=">u4"
    ).astype(np.int64).reshape(-1, 3)  # (first_chunk 1-based, per_chunk, _)

    # expand sample->chunk runs into a per-sample chunk index + intra-chunk
    # position, then per-sample offsets from the chunk offsets + sizes.
    # zeros (not empty) + run validation: a malformed stsc whose runs skip
    # chunk 1, go non-monotonic, or point past the chunk table would leave
    # garbage counts feeding np.repeat (round-5 advice) — raise the typed
    # error the parser contract promises instead
    if n_runs == 0 or runs[0, 0] != 1 or np.any(np.diff(runs[:, 0]) <= 0) or runs[-1, 0] > n_chunks:
        raise ValueError(
            "malformed stsc: first_chunk must start at 1, strictly "
            "increase, and stay within the chunk table"
        )
    per_chunk = np.zeros(n_chunks, dtype=np.int64)
    for i in range(len(runs)):
        first = runs[i, 0] - 1
        last = (runs[i + 1, 0] - 1) if i + 1 < len(runs) else n_chunks
        per_chunk[first:last] = runs[i, 1]
    if per_chunk.sum() < len(sizes):
        raise ValueError("stsc/stsz sample count mismatch")
    chunk_of = np.repeat(np.arange(n_chunks), per_chunk)[: len(sizes)]
    # offset of sample s = chunk_offset[c] + sum(sizes of earlier samples
    # in the same chunk) — cumulative sum reset at chunk boundaries
    csum = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    chunk_start_idx = np.concatenate(
        [[0], np.cumsum(per_chunk)[:-1]]
    ).astype(np.int64)
    within = csum - csum[chunk_start_idx[chunk_of]]
    offsets = chunk_offsets[chunk_of] + within

    if b"stts" not in boxes:
        raise ValueError("stbl without stts")
    p = _full_box(data, boxes[b"stts"][0])
    (n_tt,) = struct.unpack(">I", data[p : p + 4])
    tt = np.frombuffer(
        data[p + 4 : p + 4 + 8 * n_tt], dtype=">u4"
    ).astype(np.int64).reshape(-1, 2)  # (count, delta)
    deltas = np.repeat(tt[:, 1], tt[:, 0])[: len(sizes)]
    pts = np.concatenate([[0], np.cumsum(deltas)[:-1]]) / float(timescale)

    keyframe = np.ones(len(sizes), dtype=bool)
    if b"stss" in boxes:
        p = _full_box(data, boxes[b"stss"][0])
        (n_sync,) = struct.unpack(">I", data[p : p + 4])
        sync = np.frombuffer(
            data[p + 4 : p + 4 + 4 * n_sync], dtype=">u4"
        ).astype(np.int64)
        keyframe[:] = False
        keyframe[sync - 1] = True  # stss is 1-based

    return {
        "offset": offsets,
        "size": sizes,
        "pts": pts.astype(np.float64),
        "keyframe": keyframe,
        "timescale": int(timescale),
    }
