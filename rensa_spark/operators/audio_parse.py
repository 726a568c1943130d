"""Audio container/metadata walks — pure stdlib (round 5).

Like operators/mp4_parse for video, these parse the CONTAINER layer of the
two compressed audio formats the schema names, without decoding audio:

- FLAC: the STREAMINFO metadata block (first block after the ``fLaC``
  magic, format spec public): sample rate, channels, bits per sample,
  total samples -> exact duration.
- MP3: ID3v2 skip + MPEG audio frame-header walk (sync, version, layer,
  bitrate/samplerate indices): per-frame byte ranges and durations ->
  duration, mean bitrate, frame count.

At 100 TB this is the audio analogue of the sampled-fetch rule: corpus
stats (duration/rate/bitrate histograms, truncation checks) come from
headers at ~0 IO; PCM-level features (rms, zero crossings — the
audio_features lane) remain for real only on formats with decodable
payloads (rawa, RIFF PCM16 WAV). The codec payloads stay opaque —
decoding them is the declared NotImplementedError surface.
"""

from __future__ import annotations

import struct

import numpy as np

# MPEG1/MPEG2 Layer III tables (header spec, public)
_MP3_BITRATE_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                     224, 256, 320, 0]
_MP3_BITRATE_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                     144, 160, 0]
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
              0: [11025, 12000, 8000]}  # version bits -> rates


def flac_streaminfo(data: bytes) -> dict:
    """Parse the FLAC STREAMINFO block -> sample_rate, channels,
    bits_per_sample, total_samples, duration_s. Corrupt input raises
    ValueError, never raw IndexError/struct.error."""
    try:
        return _flac_streaminfo(bytes(data))
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed FLAC stream: {exc}") from exc


def _flac_streaminfo(data: bytes) -> dict:
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    while pos + 4 <= len(data):
        hdr = data[pos]
        btype = hdr & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:  # STREAMINFO
            if length < 34:
                raise ValueError("truncated STREAMINFO")
            # bits 80..99 sample rate, 100..102 channels-1,
            # 103..107 bps-1, 108..143 total samples
            bits = int.from_bytes(body[10:18], "big")
            sample_rate = bits >> 44
            channels = ((bits >> 41) & 0x7) + 1
            bps = ((bits >> 36) & 0x1F) + 1
            total = bits & ((1 << 36) - 1)
            if sample_rate == 0:
                raise ValueError("STREAMINFO with zero sample rate")
            return {
                "sample_rate": int(sample_rate),
                "channels": int(channels),
                "bits_per_sample": int(bps),
                "total_samples": int(total),
                "duration_s": total / sample_rate,
            }
        if hdr & 0x80:  # last-metadata-block flag
            break
        pos += 4 + length
    raise ValueError("no STREAMINFO block")


def mp3_frame_walk(data: bytes, max_frames: int | None = None) -> dict:
    """Walk MPEG Layer III frames -> per-frame (offset, size, duration_s)
    arrays + totals. Skips a leading ID3v2 tag; stops at the first
    non-frame byte (tag padding / truncation), like real scanners.
    Corrupt input raises ValueError, never raw IndexError."""
    try:
        return _mp3_frame_walk(bytes(data), max_frames)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed MP3 stream: {exc}") from exc


def _mp3_frame_walk(data: bytes, max_frames: int | None = None) -> dict:
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        sz = data[6:10]
        pos = 10 + ((sz[0] << 21) | (sz[1] << 14) | (sz[2] << 7) | sz[3])
    offsets, sizes, durs, brs, srs = [], [], [], [], []
    while pos + 4 <= len(data):
        b0, b1, b2, _b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break
        version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (b1 >> 1) & 0x3  # 1 = Layer III
        if layer != 1 or version == 1:
            break
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        if br_idx in (0, 15) or sr_idx == 3:
            break
        rates = _MP3_RATES[version]
        sr = rates[sr_idx]
        if version == 3:
            kbps = _MP3_BITRATE_V1L3[br_idx]
            spf = 1152  # samples per frame, MPEG1 Layer III
        else:
            kbps = _MP3_BITRATE_V2L3[br_idx]
            spf = 576
        size = (spf // 8) * kbps * 1000 // sr + padding
        if size <= 4 or pos + size > len(data):
            break
        offsets.append(pos)
        sizes.append(size)
        durs.append(spf / sr)
        brs.append(kbps)
        srs.append(sr)
        pos += size
        if max_frames is not None and len(offsets) >= max_frames:
            break
    if not offsets:
        raise ValueError("no MPEG audio frames found")
    # DOMINANT rate, not the last parsed frame's (round-5 advice: a mixed
    # stream used to report an arbitrary rate with no signal) — ties go to
    # the first-seen rate; mixing is flagged explicitly
    sr_arr = np.array(srs, dtype=np.int64)
    uniq, counts = np.unique(sr_arr, return_counts=True)
    if len(uniq) == 1:
        dominant = int(uniq[0])
    else:
        best = counts.max()
        first_pos = {int(u): int(np.argmax(sr_arr == u)) for u in uniq}
        dominant = int(
            min((u for u, c in zip(uniq, counts) if c == best),
                key=lambda u: first_pos[int(u)])
        )
    return {
        "offset": np.array(offsets, dtype=np.int64),
        "size": np.array(sizes, dtype=np.int64),
        "duration_s": np.array(durs, dtype=np.float64),
        "n_frames": len(offsets),
        "sample_rate": dominant,
        "mixed_sample_rate": bool(len(uniq) > 1),
        "duration_total_s": float(sum(durs)),
        "mean_kbps": float(np.mean(brs)),
    }
