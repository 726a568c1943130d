"""Vectorized reimplementation of rensa's FxHasher-compatible byte hash.

Reference: /root/reference/src/utils.rs
- ``hash_bytes``     (utils.rs:129-165): seeds SEED1/SEED2, <=16-byte dual-word
  fast path, 16-byte-stride ``multiply_mix`` folding loop for longer inputs.
- ``calculate_hash_fast`` (utils.rs:168-185): 64-bit finalizer
  ``rotl(compressed * K, 26)``.
- ``calculate_band_hash`` (utils.rs:194-223): FxHash-style polynomial over a
  band of u32 MinHash slots, packed two-at-a-time into u64s, finished with
  ``rotl(state, 26)``.

Vectorization strategy (no per-token Python in the hot path): tokens are
grouped by byte length; for each distinct length the whole group is hashed as
one (group, length) uint8 matrix with numpy uint64 arithmetic. The 128-bit
product inside ``multiply_mix`` is decomposed into 32-bit limbs. The loop
count per group is ceil(length/16), i.e. O(max_token_len), not O(n_tokens).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

U64 = np.uint64
U8 = np.uint8

K = 0xF1357AEA2E62A9C5  # utils.rs:4 (64-bit K)
ROTATE = 26  # utils.rs:11
SEED1 = 0x243F6A8885A308D3  # utils.rs:15
SEED2 = 0x13198A2E03707344  # utils.rs:16
PREVENT_TRIVIAL_ZERO_COLLAPSE = 0xA4093822299F31D0  # utils.rs:17

_POW8 = (np.uint64(256) ** np.arange(8, dtype=U64)).astype(U64)
_POW4 = (np.uint64(256) ** np.arange(4, dtype=U64)).astype(U64)


def _mul_hi_lo(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """128-bit product of two uint64 arrays as (hi, lo) uint64 limbs."""
    m32 = U64(0xFFFFFFFF)
    xl, xh = x & m32, x >> U64(32)
    yl, yh = y & m32, y >> U64(32)
    with np.errstate(over="ignore"):
        lo_lo = xl * yl
        u = xh * yl + (lo_lo >> U64(32))
        v = xl * yh + (u & m32)
        hi = xh * yh + (u >> U64(32)) + (v >> U64(32))
        lo = x * y  # wrapping low 64 bits
    return hi, lo


def _multiply_mix(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """multiply_mix: lo ^ hi of the 128-bit product (utils.rs:55-66)."""
    hi, lo = _mul_hi_lo(x, y)
    return hi ^ lo


def _read_u64_le(m: np.ndarray, off: int) -> np.ndarray:
    """LE u64 from columns [off, off+8) of a (k, L) uint8 matrix."""
    return (m[:, off : off + 8].astype(U64) * _POW8).sum(axis=1, dtype=U64)


def _read_u32_le(m: np.ndarray, off: int) -> np.ndarray:
    return (m[:, off : off + 4].astype(U64) * _POW4).sum(axis=1, dtype=U64)


def _hash_bytes_fixed_len(m: np.ndarray) -> np.ndarray:
    """hash_bytes (utils.rs:129-165) vectorized over a (k, L) uint8 matrix."""
    k, length = m.shape
    s0 = np.full(k, SEED1, dtype=U64)
    s1 = np.full(k, SEED2, dtype=U64)
    if length <= 16:
        if length >= 8:
            s0 ^= _read_u64_le(m, 0)
            s1 ^= _read_u64_le(m, length - 8)
        elif length >= 4:
            s0 ^= _read_u32_le(m, 0)
            s1 ^= _read_u32_le(m, length - 4)
        elif length > 0:
            lo = m[:, 0].astype(U64)
            mid = m[:, length // 2].astype(U64)
            hi = m[:, length - 1].astype(U64)
            s0 ^= lo
            s1 ^= (hi << U64(8)) | mid
    else:
        ptzc = U64(PREVENT_TRIVIAL_ZERO_COLLAPSE)
        off = 0
        while off < length - 16:
            x = _read_u64_le(m, off)
            y = _read_u64_le(m, off + 8)
            t = _multiply_mix(s0 ^ x, ptzc ^ y)
            s0 = s1
            s1 = t
            off += 16
        s0 = s0 ^ _read_u64_le(m, length - 16)
        s1 = s1 ^ _read_u64_le(m, length - 8)
    return _multiply_mix(s0, s1) ^ U64(length)


def _finalize(compressed: np.ndarray) -> np.ndarray:
    """calculate_hash_fast finalizer: rotl(compressed * K, 26) (utils.rs:168-178)."""
    with np.errstate(over="ignore"):
        h = compressed * U64(K)
    return (h << U64(ROTATE)) | (h >> U64(64 - ROTATE))


def _gather_u64(buf: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """LE u64 at arbitrary byte offsets ``pos`` of a uint8 buffer."""
    idx = pos[:, None] + np.arange(8, dtype=np.int64)[None, :]
    return (buf[idx].astype(U64) * _POW8).sum(axis=1, dtype=U64)


def _gather_u32(buf: np.ndarray, pos: np.ndarray) -> np.ndarray:
    idx = pos[:, None] + np.arange(4, dtype=np.int64)[None, :]
    return (buf[idx].astype(U64) * _POW4).sum(axis=1, dtype=U64)


def fxhash64_ranges(buf: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """calculate_hash_fast over (start, length) slices of one uint8 buffer.

    Zero-copy hot path: shingle bytes are never materialized as Python
    objects. Vectorized by LENGTH CLASS, not exact length — hash_bytes only
    reads fixed word positions per class (utils.rs:134-147), so e.g. every
    8..16-byte token needs exactly the u64s at offsets 0 and len-8; one
    gather handles the whole class regardless of exact lengths. Long tokens
    group by 16-byte chunk count (one folding step per chunk, vectorized
    across all tokens of that chunk count)."""
    n = len(starts)
    out = np.empty(n, dtype=U64)
    if n == 0:
        return out
    starts = np.asarray(starts, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    len64 = lengths.astype(U64)

    sel0 = lengths == 0
    if sel0.any():
        out[sel0] = _finalize(
            _multiply_mix(np.array([SEED1], dtype=U64), np.array([SEED2], dtype=U64))
        )[0]

    sel = (lengths >= 1) & (lengths <= 3)
    if sel.any():
        s, l = starts[sel], lengths[sel]
        s0 = U64(SEED1) ^ buf[s].astype(U64)
        s1 = U64(SEED2) ^ (
            (buf[s + l - 1].astype(U64) << U64(8)) | buf[s + l // 2].astype(U64)
        )
        out[sel] = _finalize(_multiply_mix(s0, s1) ^ len64[sel])

    sel = (lengths >= 4) & (lengths <= 7)
    if sel.any():
        s, l = starts[sel], lengths[sel]
        s0 = U64(SEED1) ^ _gather_u32(buf, s)
        s1 = U64(SEED2) ^ _gather_u32(buf, s + l - 4)
        out[sel] = _finalize(_multiply_mix(s0, s1) ^ len64[sel])

    sel = (lengths >= 8) & (lengths <= 16)
    if sel.any():
        s, l = starts[sel], lengths[sel]
        s0 = U64(SEED1) ^ _gather_u64(buf, s)
        s1 = U64(SEED2) ^ _gather_u64(buf, s + l - 8)
        out[sel] = _finalize(_multiply_mix(s0, s1) ^ len64[sel])

    long_sel = lengths > 16
    if long_sel.any():
        l_long = lengths[long_sel]
        # folding iterations: off = 0,16,... while off < len-16
        iters = (l_long - 17) // 16 + 1
        ptzc = U64(PREVENT_TRIVIAL_ZERO_COLLAPSE)
        for it in np.unique(iters):
            sub = np.nonzero(long_sel)[0][iters == it]
            s, l = starts[sub], lengths[sub]
            s0 = np.full(len(sub), SEED1, dtype=U64)
            s1 = np.full(len(sub), SEED2, dtype=U64)
            for k in range(int(it)):
                off = 16 * k
                x = _gather_u64(buf, s + off)
                y = _gather_u64(buf, s + off + 8)
                t = _multiply_mix(s0 ^ x, ptzc ^ y)
                s0 = s1
                s1 = t
            s0 = s0 ^ _gather_u64(buf, s + l - 16)
            s1 = s1 ^ _gather_u64(buf, s + l - 8)
            out[sub] = _finalize(_multiply_mix(s0, s1) ^ len64[sub])
    return out


def fxhash64(tokens: Sequence[bytes]) -> np.ndarray:
    """calculate_hash_fast over a batch of byte strings -> uint64[n].

    Tokens are length-bucketed; each bucket is hashed fully vectorized.
    """
    n = len(tokens)
    out = np.empty(n, dtype=U64)
    if n == 0:
        return out
    lengths = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=n)
    total = int(lengths.sum())
    if total == 0:
        # len==0: hash_bytes = multiply_mix(SEED1, SEED2) ^ 0
        empty = _finalize(
            _multiply_mix(np.array([SEED1], dtype=U64), np.array([SEED2], dtype=U64))
        )[0]
        out.fill(empty)
        return out
    blob = b"".join(tokens)
    buf = np.frombuffer(blob, dtype=U8)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    for length in np.unique(lengths):
        sel = np.nonzero(lengths == length)[0]
        if length == 0:
            empty = _finalize(
                _multiply_mix(np.array([SEED1], dtype=U64), np.array([SEED2], dtype=U64))
            )[0]
            out[sel] = empty
            continue
        idx = starts[sel][:, None] + np.arange(length, dtype=np.int64)[None, :]
        m = buf[idx]
        out[sel] = _finalize(_hash_bytes_fixed_len(m))
    return out


def fxhash64_strs(tokens: Iterable[str]) -> np.ndarray:
    """Hash str tokens as their UTF-8 bytes (src/py_input/ptr_hash.rs:11-28)."""
    return fxhash64([t.encode("utf-8") for t in tokens])


def band_hash_u64(bands: np.ndarray) -> np.ndarray:
    """calculate_band_hash (utils.rs:194-223) vectorized over rows.

    ``bands``: (k, band_size) uint32 matrix -> uint64[k]. Mirrors FxHasher's
    specialized integer hashing: pairs of u32 packed into u64,
    state = (state + value) * K per write, finish rotl(state, 26).

    Band folding note: rensa's folded band hash
    (src/lsh/one_shot.rs:453-490, src/lsh.rs:107-123) is algebraically equal
    to ``calculate_band_hash`` over the concatenated wider band whenever
    band_size % 4 == 0, because each write step is affine in the running
    state (state' = (state + v) * K). We therefore always hash the effective
    (possibly folded) band slice directly.
    """
    k_rows, band_size = bands.shape
    state = np.zeros(k_rows, dtype=U64)
    kmul = U64(K)
    b64 = bands.astype(U64)
    i = 0
    with np.errstate(over="ignore"):
        while i + 4 <= band_size:
            val1 = b64[:, i] | (b64[:, i + 1] << U64(32))
            val2 = b64[:, i + 2] | (b64[:, i + 3] << U64(32))
            state = (state + val1) * kmul
            state = (state + val2) * kmul
            i += 4
        while i < band_size:
            state = (state + b64[:, i]) * kmul
            i += 1
    return (state << U64(ROTATE)) | (state >> U64(64 - ROTATE))
