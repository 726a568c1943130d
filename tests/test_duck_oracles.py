"""Prove the generated DuckDB oracle SQL (rensa_spark/oracle/duck_sql.py) is
bit-exact against the numpy kernels, independently of Spark and of the
driver harness. This is the chain of trust for the sketch-lane oracles:
kernels are proven against the pure-Python rensa oracle (test_kernels.py),
Spark UDFs against the kernels (test_operators_spark.py), and the DuckDB SQL
against the kernels here — so a driver hash-match is a three-way agreement.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb
import numpy as np
import pytest

from rensa_spark.config import RensaConfig
from rensa_spark.kernels.fxhash import band_hash_u64
from rensa_spark.kernels.prng import rminhash_permutations
from rensa_spark.kernels.rho import rho_matrix
from rensa_spark.kernels.rminhash import rminhash_matrix
from rensa_spark.kernels.shingle import shingle_hashes_batch
from rensa_spark.kernels.simhash import simhash_from_flat
from rensa_spark.oracle import duck_sql as D

SF_DIR = "/root/testdata/sf0.001"
CFG = RensaConfig(num_perm=128, seed=42, threshold=0.8, num_bands=8, ngram_size=3)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    return c


@pytest.fixture(scope="module")
def corpus(con):
    docs = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
    ids = [d for d, _ in docs]
    flat, offs = shingle_hashes_batch([t for _, t in docs], CFG.ngram_size)
    return ids, flat, offs


@pytest.fixture(scope="module")
def sig_bands(corpus):
    ids, flat, offs = corpus
    a, b = rminhash_permutations(CFG.num_perm, CFG.seed)
    sig = rminhash_matrix(flat, offs, a, b)
    bs = CFG.num_perm // CFG.num_bands
    bands = np.empty((sig.shape[0], CFG.num_bands), dtype=np.uint64)
    for i in range(CFG.num_bands):
        bands[:, i] = band_hash_u64(sig[:, i * bs : (i + 1) * bs])
    return sig, bands


def test_sql_fxhash_matches_kernel(con, corpus):
    ids, flat, offs = corpus
    sql = f"WITH {D.shingle_hash_ctes(CFG)} SELECT doc_id, ord, h FROM hashes ORDER BY doc_id, ord"
    got = con.execute(sql).fetchall()
    exp = [
        (ids[i], j + 1, int(h))
        for i in range(len(ids))
        for j, h in enumerate(flat[offs[i] : offs[i + 1]])
    ]
    assert got == exp


def test_sql_minhash_stats_match_kernel(con, corpus):
    ids, flat, offs = corpus
    a, b = rminhash_permutations(CFG.num_perm, CFG.seed)
    s32 = rminhash_matrix(flat, offs, a, b).view(np.int32).astype(np.int64)
    exp = [
        (ids[i], int(np.abs(s32[i]).sum()), int(s32[i].min()), int(s32[i].max()))
        for i in range(len(ids))
    ]
    got = con.execute(D.minhash_signature_stats_sql(CFG)).fetchall()
    assert got == exp


def test_sql_dup_flags_match_kernel(con, corpus, sig_bands):
    ids = corpus[0]
    _, bands = sig_bands
    cnt: dict = defaultdict(int)
    for r in range(len(ids)):
        for i in range(CFG.num_bands):
            cnt[(i, bands[r, i])] += 1
    exp = [
        (ids[r], any(cnt[(i, bands[r, i])] >= 2 for i in range(CFG.num_bands)))
        for r in range(len(ids))
    ]
    got = con.execute(D.minhash_dup_flags_sql(CFG)).fetchall()
    assert got == exp


def test_sql_simhash_flags_match_kernel(con, corpus):
    ids, flat, offs = corpus
    sh = simhash_from_flat(flat, offs).view(np.uint64)
    cnt: dict = defaultdict(int)
    chunks = np.empty((len(ids), 4), dtype=np.int64)
    for c in range(4):
        chunks[:, c] = ((sh >> np.uint64(c * 16)) & np.uint64(0xFFFF)).astype(np.int64)
    for r in range(len(ids)):
        for c in range(4):
            cnt[(c, chunks[r, c])] += 1
    exp = [
        (ids[r], any(cnt[(c, chunks[r, c])] >= 2 for c in range(4)))
        for r in range(len(ids))
    ]
    got = con.execute(D.simhash_dup_flags_sql(CFG)).fetchall()
    assert got == exp


def test_sql_rho_sidecar_matches_kernel(con, corpus):
    ids, flat, offs = corpus
    m = rho_matrix(flat, offs, CFG)
    exp = [
        (
            ids[r],
            int(min(m.source_token_counts[r], 65535)),
            int(m.non_empty[r]),
            bool(m.sparse[r]),
        )
        for r in range(len(ids))
    ]
    got = con.execute(D.rho_sidecar_sql(CFG)).fetchall()
    assert got == exp


def _verified_edges(sig, bands, ids):
    buckets = defaultdict(list)
    for r in range(len(ids)):
        for i in range(CFG.num_bands):
            buckets[(i, bands[r, i])].append(r)
    cand = set()
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                cand.add((min(members[x], members[y]), max(members[x], members[y])))
    return [(x, y) for x, y in cand if (sig[x] == sig[y]).mean() >= CFG.threshold]


def test_sql_clusters_match_union_find(con, corpus, sig_bands):
    ids = corpus[0]
    sig, bands = sig_bands
    edges = _verified_edges(sig, bands, ids)
    parent = list(range(len(ids)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in edges:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    comp = defaultdict(list)
    for r in range(len(ids)):
        comp[find(r)].append(r)
    cid = {}
    for members in comp.values():
        m = min(ids[r] for r in members)
        for r in members:
            cid[r] = m
    exp = [(ids[r], cid[r], ids[r] == cid[r]) for r in range(len(ids))]
    got = con.execute(D.minhash_clusters_sql(CFG)).fetchall()
    assert got == exp


def test_sql_add_if_unique_matches_greedy(con, corpus, sig_bands):
    ids = corpus[0]
    sig, bands = sig_bands
    edges = _verified_edges(sig, bands, ids)
    nbrs = defaultdict(set)
    for x, y in edges:
        nbrs[y].add(x)
        nbrs[x].add(y)
    kept: dict = {}
    for r in sorted(range(len(ids)), key=lambda r: ids[r]):
        kept[r] = not any(kept.get(n, False) for n in nbrs[r] if ids[n] < ids[r])
    exp = [(ids[r], kept[r]) for r in range(len(ids))]
    got = con.execute(D.add_if_unique_sql(CFG)).fetchall()
    assert got == exp


def test_sql_rho_dup_flags_match_pyrensa(con, corpus):
    """The refined one-shot rho decision flow in SQL (folded bands, sparse
    capped verify, recall rescue) against the pure-Python control-flow
    oracle — same pairing the Spark operator is proven against."""
    from rensa_spark.oracle import pyrensa as O

    ids, flat, offs = corpus
    rho_rows = [
        O.rho_row_py([int(h) for h in flat[offs[i] : offs[i + 1]]], CFG)
        for i in range(len(ids))
    ]
    want = O.one_shot_flags_rho_py(rho_rows, CFG)
    got = con.execute(D.rho_dup_flags_sql(CFG)).fetchall()
    assert got == [(ids[i], want[i]) for i in range(len(ids))]


def test_oracle_generators_reject_nondefault_configs():
    """The generated SQL encodes default-config control flow; non-default
    RensaConfigs must be rejected loudly instead of producing silently wrong
    oracles (round-2 advice). ValueError, not AssertionError, so the guard
    survives `python -O` (round-3 advice)."""
    import pytest

    from rensa_spark.config import RensaConfig
    from rensa_spark.oracle import duck_sql as D

    with pytest.raises(ValueError, match="probe count"):
        D.rho_sidecar_sql(RensaConfig(num_perm=128, num_bands=8, rho_adaptive_probes=True))
    with pytest.raises(ValueError, match="token budget|budget rule"):
        D.rho_sidecar_sql(
            RensaConfig(num_perm=128, num_bands=8, rho_token_budget_overridden=True)
        )
    with pytest.raises(ValueError, match="recall rescue"):
        D.rho_dup_flags_sql(
            RensaConfig(num_perm=128, num_bands=8, rho_recall_rescue_enabled=False)
        )


def _xxh64_long_py(v: int, seed: int = 42) -> int:
    """Scalar XXH64 of one little-endian u64 (the published single-lane
    fast path; Spark's xxhash64 on a LongType column computes exactly
    this with default seed 42). Signed-int64 output like Spark."""
    mask = (1 << 64) - 1
    p1, p2 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F
    p3, p4, p5 = 0x165667B19E3779F9, 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & mask

    h = (seed + p5 + 8) & mask
    h ^= rotl(((v & mask) * p2) & mask, 31) * p1 & mask
    h = (rotl(h, 27) * p1 + p4) & mask
    h ^= h >> 33
    h = (h * p2) & mask
    h ^= h >> 29
    h = (h * p3) & mask
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def test_sql_xxhash64_long_matches_reference(con):
    """duck_sql.xxhash64_long_ctes (the IVF training-sample order rule)
    against the scalar XXH64 reference, including the sign-edge longs.
    The Spark side of the chain is pinned transitively: the ivf_topk
    driver lane hash-verifies the full sample ordering against
    F.xxhash64 at every selfcheck."""
    vals = [0, 1, -1, 42, (1 << 63) - 1, -(1 << 63), 123456789, -77, 985743821]

    def lit(v: int) -> str:
        # SQL has no negative literals: -(2^63) parses as unary minus over
        # an out-of-int64 constant — spell LONG_MIN arithmetically
        return f"({v}::BIGINT)" if v != -(1 << 63) else "((-9223372036854775807 - 1)::BIGINT)"

    con.execute(
        "CREATE OR REPLACE TABLE xxt AS SELECT * FROM (VALUES "
        + ",".join(lit(v) for v in vals)
        + ") _(vid)"
    )
    sql = (
        f"WITH {D.xxhash64_long_ctes('xxt', 'vid')} "
        "SELECT vid, xxh FROM xxh ORDER BY vid"
    )
    got = dict(con.execute(sql).fetchall())
    for v in vals:
        assert got[v] == _xxh64_long_py(v), v
