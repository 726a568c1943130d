"""Property-based fuzz tests (hypothesis) — the analogue of the reference's
randomized mixed-token fuzz (/root/reference/tests/test_rensa.py:615-637)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rensa_spark.config import RensaConfig
from rensa_spark.kernels import fxhash as kf
from rensa_spark.kernels import rho as kr
from rensa_spark.kernels import rminhash as km
from rensa_spark.kernels.prng import rminhash_permutations
from rensa_spark.kernels.shingle import shingle_hashes_batch
from rensa_spark.oracle import pyrensa as oracle


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=120), min_size=1, max_size=40))
def test_fxhash_fuzz_bytes(tokens):
    got = kf.fxhash64(tokens)
    want = [oracle.fxhash64_py(t) for t in tokens]
    assert got.tolist() == want


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=80),
        min_size=1,
        max_size=20,
    )
)
def test_rminhash_fuzz_token_sets(docs):
    a, b = rminhash_permutations(32, 99)
    flat = np.array([h for d in docs for h in d], dtype=np.uint64)
    offsets = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=offsets[1:])
    got = km.rminhash_matrix(flat, offsets, a, b)
    for i, d in enumerate(docs):
        want = oracle.rminhash_sig_py(d, [int(x) for x in a], [int(x) for x in b])
        assert got[i].tolist() == want


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=150),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=0, max_value=(1 << 32) - 1),
)
def test_rho_fuzz_token_sets(docs, seed):
    cfg = RensaConfig(num_perm=64, seed=seed, num_bands=8)
    flat = np.array([h for d in docs for h in d], dtype=np.uint64)
    offsets = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=offsets[1:])
    got = kr.rho_matrix(flat, offsets, cfg)
    for i, d in enumerate(docs):
        want = oracle.rho_row_py(d, cfg)
        assert got.digest[i].tolist() == want.digest
        assert bool(got.sparse[i]) == want.sparse


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
            max_size=200,
        ),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_shingle_fuzz_unicode(texts, ngram):
    """Zero-copy shingling == naive join+hash for arbitrary unicode text,
    including exotic whitespace (str.split semantics)."""
    flat, offs = shingle_hashes_batch(texts, ngram)
    for i, t in enumerate(texts):
        tokens = [tok for tok in (t or "").lower().split() if tok]
        if ngram <= 1 or len(tokens) < ngram:
            shingles = tokens
        else:
            shingles = [" ".join(tokens[j : j + ngram]) for j in range(len(tokens) - ngram + 1)]
        want = [oracle.fxhash64_py(s) for s in shingles]
        assert flat[offs[i] : offs[i + 1]].tolist() == want, (i, t)


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_jpeg_roundtrip_property(w, h, seed):
    """Property: any blockwise-smooth RGB image of any (odd) size
    round-trips through the baseline JPEG codec at the default quality
    above the north rule's 40 dB PSNR invariant, with exact shape
    preservation (edge blocks are replicate-padded then cropped)."""
    import numpy as np

    from rensa_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg
    from rensa_spark.sources.synthetic import psnr

    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, size=((h + 7) // 8, (w + 7) // 8, 3))
    px = np.repeat(np.repeat(coarse, 8, axis=0), 8, axis=1)[:h, :w].astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(px))
    assert dec.shape == px.shape
    assert psnr(px, dec) >= 40.0
