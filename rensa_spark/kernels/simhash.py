"""SimHash kernel (Charikar random-hyperplane sketch for text sets).

Not present in the reference library (rensa is MinHash-only) — included
because the north rule lists "MinHash/SimHash/suffix-array substring" as the
dedup family. 64-bit simhash over the same fxhash64 shingle hashes the
MinHash path uses: bit j of the sketch is 1 iff the sum over tokens of
(+1 if bit j of token-hash set else -1) is positive.

Vectorized: unpack token hashes to a (tokens, 64) bit matrix via
np.unpackbits, segment-sum per row with np.add.reduceat, compare to
count/2 (majority).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64


def simhash_from_flat(flat_hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(flat uint64 token hashes, row offsets) -> int64[rows] simhash
    (bit-pattern; empty rows -> 0)."""
    offsets = np.asarray(offsets, dtype=np.int64)
    rows = len(offsets) - 1
    out = np.zeros(rows, dtype=np.int64)
    n = len(flat_hashes)
    if rows == 0 or n == 0:
        return out
    flat = np.ascontiguousarray(flat_hashes, dtype=U64)
    # (n, 64) bit matrix, bit j = (h >> j) & 1
    bits = np.unpackbits(flat.view(np.uint8).reshape(n, 8), axis=1, bitorder="little")
    counts = np.diff(offsets)
    starts = offsets[:-1]
    valid = counts > 0
    sums = np.add.reduceat(bits.astype(np.int32), starts[valid], axis=0)
    # bit set iff #ones*2 > count  (sum(+1/-1) > 0)
    cnt = counts[valid][:, None]
    set_bits = (sums * 2 > cnt).astype(np.uint8)
    packed = np.packbits(set_bits, axis=1, bitorder="little").view(np.uint64)[:, 0]
    out[valid] = packed.view(np.int64)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise (aligned) hamming distance between int64 simhashes."""
    x = (a.view(np.uint64) ^ b.view(np.uint64)).view(np.uint8)
    return np.unpackbits(x.reshape(len(a), 8), axis=1).sum(axis=1)
