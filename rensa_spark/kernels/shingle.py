"""Batched word n-gram shingling + hashing, bit-compatible with the reference
benchmark tokenizer (/root/reference/benchmarks/full_benchmark.py:306-310):

    tokens = [t for t in text.lower().split() if t]
    shingles = tokens                       if ngram <= 1 or len(tokens) < ngram
             = [" ".join(tokens[i:i+n])]    otherwise

and each shingle hashed as its UTF-8 bytes through calculate_hash_fast
(src/py_input/ptr_hash.rs:11-28 + src/utils.rs:168-185).

Trick: shingle byte strings are never materialized. Each document's tokens
are joined once into a canonical single-space blob; a shingle's bytes are a
contiguous slice of that blob (tokens cannot contain 0x20 — str.split()
removes all whitespace, and multi-byte UTF-8 units never contain bytes
< 0x80). All blobs are concatenated into one uint8 buffer and shingles become
(start, length) ranges fed to fxhash64_ranges. Per-row Python is limited to
lower/split/join/encode; everything else is numpy over the whole batch.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

from rensa_spark.kernels.fxhash import fxhash64_ranges


def _ragged_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    offsets = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(offsets, counts)


def shingle_hashes_batch(
    texts: Iterable[str | None], ngram: int
) -> tuple[np.ndarray, np.ndarray]:
    """-> (flat uint64 shingle hashes, int64 row offsets [rows+1])."""
    blobs: list[bytes] = []
    token_counts: list[int] = []
    for text in texts:
        tokens = text.lower().split() if text else []
        token_counts.append(len(tokens))
        blobs.append(" ".join(tokens).encode("utf-8") if tokens else b"")
    rows = len(token_counts)
    t_counts = np.asarray(token_counts, dtype=np.int64)
    blob_lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=rows)
    row_starts = np.zeros(rows, dtype=np.int64)
    np.cumsum(blob_lens[:-1], out=row_starts[1:]) if rows > 1 else None
    row_ends = row_starts + blob_lens
    buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)

    total_tokens = int(t_counts.sum())
    offsets = np.zeros(rows + 1, dtype=np.int64)
    if total_tokens == 0:
        return np.empty(0, dtype=np.uint64), offsets

    # global token boundaries: every 0x20 byte is a separator
    spaces = np.nonzero(buf == 0x20)[0].astype(np.int64)
    tok_off = np.zeros(rows, dtype=np.int64)
    np.cumsum(t_counts[:-1], out=tok_off[1:]) if rows > 1 else None
    token_starts = np.empty(total_tokens, dtype=np.int64)
    token_ends = np.empty(total_tokens, dtype=np.int64)
    nonzero = t_counts > 0
    first_pos = tok_off[nonzero]
    last_pos = (tok_off + t_counts - 1)[nonzero]
    token_starts[first_pos] = row_starts[nonzero]
    token_ends[last_pos] = row_ends[nonzero]
    mask = np.ones(total_tokens, dtype=bool)
    mask[first_pos] = False
    token_starts[mask] = spaces + 1
    mask = np.ones(total_tokens, dtype=bool)
    mask[last_pos] = False
    token_ends[mask] = spaces

    # per-row shingle window (w) and count (c)
    use_ngram = (ngram > 1) & (t_counts >= ngram)
    w = np.where(use_ngram, ngram, 1)
    c = np.where(t_counts > 0, t_counts - w + 1, 0)
    np.cumsum(c, out=offsets[1:])
    total_shingles = int(offsets[-1])
    within = _ragged_arange(c)
    row_of_shingle = np.repeat(np.arange(rows, dtype=np.int64), c)
    first_tok = tok_off[row_of_shingle] + within
    last_tok = first_tok + w[row_of_shingle] - 1
    starts = token_starts[first_tok]
    lengths = token_ends[last_tok] - starts
    return fxhash64_ranges(buf, starts, lengths), offsets
