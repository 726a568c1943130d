"""Distributed operators vs driver-side oracle (kernels proven bit-exact in
test_kernels.py). The Spark analogue of the reference's determinism-under-
parallelism tests (/root/reference/tests/test_rensa.py:589-612): results must
be identical across partitionings and equal to the single-threaded oracle."""

from __future__ import annotations

import random

import numpy as np
import pytest

from rensa_spark.config import RensaConfig
from rensa_spark.kernels.fxhash import band_hash_u64
from rensa_spark.kernels.prng import rminhash_permutations
from rensa_spark.kernels.rho import rho_matrix
from rensa_spark.kernels.rminhash import rminhash_matrix
from rensa_spark.kernels.shingle import shingle_hashes_batch
from rensa_spark.oracle import pyrensa as oracle
from rensa_spark.sources.synthetic import generate_corpus

CFG = RensaConfig(num_perm=128, seed=42, threshold=0.8, num_bands=8, ngram_size=3)


def _oracle_sig_matrix(captions: list[str], cfg: RensaConfig) -> np.ndarray:
    flat, offsets = shingle_hashes_batch(captions, cfg.ngram_size)
    a, b = rminhash_permutations(cfg.num_perm, cfg.seed)
    return rminhash_matrix(flat, offsets, a, b)


def _oracle_simple_flags(captions: list[str], cfg: RensaConfig) -> list[bool]:
    sig = _oracle_sig_matrix(captions, cfg)
    return oracle.one_shot_flags_simple_py(
        [list(map(int, row)) for row in sig], cfg.num_bands, cfg.band_size
    )


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(300, seed=42, with_images=False)


def test_dup_flags_match_oracle(spark, corpus):
    from rensa_spark.operators.dedup import dup_flags

    df = spark.createDataFrame(corpus[["image_id", "caption"]])
    got = {
        r["key"]: r["is_dup"]
        for r in dup_flags(df, CFG, "image_id", "caption").collect()
    }
    want = _oracle_simple_flags(list(corpus["caption"]), CFG)
    ids = list(corpus["image_id"])
    mismatches = [i for i, k in enumerate(ids) if got[k] != want[i]]
    assert not mismatches, f"{len(mismatches)} flag mismatches: {mismatches[:10]}"


def test_dup_flags_partitioning_invariance(spark, corpus):
    from rensa_spark.operators.dedup import dup_flags

    df1 = spark.createDataFrame(corpus[["image_id", "caption"]]).repartition(1)
    df16 = spark.createDataFrame(corpus[["image_id", "caption"]]).repartition(16)
    f1 = sorted(dup_flags(df1, CFG, "image_id", "caption").collect())
    f16 = sorted(dup_flags(df16, CFG, "image_id", "caption").collect())
    assert f1 == f16


def test_dup_flags_finds_planted_exact_dups(spark, corpus):
    from rensa_spark.operators.dedup import dup_flags

    df = spark.createDataFrame(corpus[["image_id", "caption"]])
    got = {
        r["key"]: r["is_dup"]
        for r in dup_flags(df, CFG, "image_id", "caption").collect()
    }
    # every exact-dup group (same nonempty caption appearing twice) must flag
    counts = corpus[corpus["caption"] != ""].groupby("caption")["image_id"].agg(list)
    for ids in counts:
        if len(ids) >= 2:
            for k in ids:
                assert got[k], f"exact dup {k} not flagged"


def test_rho_flags_match_oracle(spark, corpus):
    from pyspark.sql import functions as F

    from rensa_spark.operators.dedup import sketch_rho
    from rensa_spark.operators.lsh import one_shot_dup_flags_rho

    captions = list(corpus["caption"])
    df = spark.createDataFrame(corpus[["image_id", "caption"]])
    sk = sketch_rho(df, CFG, "image_id", "caption")
    got = {
        r["key"]: r["is_dup"]
        for r in one_shot_dup_flags_rho(sk, CFG, "image_id").collect()
    }
    # oracle path
    rho_rows = []
    for c in captions:
        flat, offs = shingle_hashes_batch([c], CFG.ngram_size)
        rho_rows.append(oracle.rho_row_py([int(h) for h in flat], CFG))
    want = oracle.one_shot_flags_rho_py(rho_rows, CFG)
    ids = list(corpus["image_id"])
    mismatches = [
        (ids[i], got[ids[i]], want[i]) for i in range(len(ids)) if got[ids[i]] != want[i]
    ]
    assert not mismatches, f"{len(mismatches)} rho flag mismatches: {mismatches[:10]}"


def test_connected_components_vs_union_find(spark):
    from rensa_spark.operators.cc import connected_components

    rng = random.Random(99)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    edges = [(f"k{a:04d}", f"k{b:04d}") for a, b in edges if a != b]

    parent = {f"k{i:04d}": f"k{i:04d}" for i in range(n)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for k in parent:
        want[k] = find(k)

    df = spark.createDataFrame(edges, ["a", "b"])
    got = {r["key"]: r["cluster_id"] for r in connected_components(df).collect()}
    touched = {k for e in edges for k in e}
    for k in touched:
        assert got.get(k, k) == want[k], k


def test_add_if_unique_driver_greedy_matches_loop(spark, corpus):
    """Round 6: the small-edge-set driver-side greedy must reproduce the
    distributed frontier loop bit-for-bit (same DAG recursion, different
    evaluation engines)."""
    from rensa_spark.operators.dedup import add_if_unique

    df = spark.createDataFrame(corpus[["image_id", "caption"]])
    greedy = {
        r["key"]: r["kept"]
        for r in add_if_unique(df, CFG, "image_id", "caption").collect()
    }
    loop = {
        r["key"]: r["kept"]
        for r in add_if_unique(
            df, CFG, "image_id", "caption", driver_max_edges=0
        ).collect()
    }
    assert greedy == loop


def test_add_if_unique_matches_sequential_oracle(spark, corpus):
    from rensa_spark.operators.dedup import add_if_unique

    df = spark.createDataFrame(corpus[["image_id", "caption"]])
    got = {
        r["key"]: r["kept"]
        for r in add_if_unique(df, CFG, "image_id", "caption").collect()
    }
    # sequential oracle: candidates via band co-membership of *kept* items
    captions = list(corpus["caption"])
    ids = list(corpus["image_id"])
    sig = _oracle_sig_matrix(captions, CFG)
    bands = np.stack(
        [
            band_hash_u64(sig[:, i * CFG.band_size : (i + 1) * CFG.band_size])
            for i in range(CFG.num_bands)
        ],
        axis=1,
    )
    kept_idx: list[int] = []
    want = {}
    for i in range(len(ids)):
        dup = False
        for j in kept_idx:
            if any(bands[i] == bands[j]) and (sig[i] == sig[j]).mean() >= CFG.threshold:
                dup = True
                break
        want[ids[i]] = not dup
        if not dup:
            kept_idx.append(i)
    mismatches = [k for k in ids if got[k] != want[k]]
    assert not mismatches, f"{len(mismatches)} mismatches: {mismatches[:10]}"


def test_exact_dup_flags(spark, corpus):
    from rensa_spark.operators.dedup import exact_dup_flags

    df = spark.createDataFrame(corpus[["image_id", "caption"]])
    got = {r["key"]: r for r in exact_dup_flags(df, "image_id", "caption").collect()}
    counts = corpus.groupby("caption")["image_id"].agg(list)
    for caption, ids in counts.items():
        for k in ids:
            assert got[k]["is_dup"] == (len(ids) >= 2)
            assert got[k]["is_survivor"] == (k == min(ids))
    # the single-hash keying (verify=False) agrees with the double-hash
    # default on real data — hash-splits/merges would need 64-bit collisions
    fast = {
        r["key"]: r
        for r in exact_dup_flags(df, "image_id", "caption", verify=False).collect()
    }
    for k, r in got.items():
        assert (r["is_dup"], r["group_size"], r["is_survivor"]) == (
            fast[k]["is_dup"],
            fast[k]["group_size"],
            fast[k]["is_survivor"],
        )


def test_add_if_unique_brute_force_guard(spark, corpus):
    """The O(n^2) use_lsh=False path refuses inputs over
    brute_force_max_rows (round-3 verdict ask #7) — the guard must fire
    BEFORE the cross join is ever scheduled."""
    from rensa_spark.operators.dedup import add_if_unique

    df = spark.createDataFrame(corpus[["image_id", "caption"]])
    with pytest.raises(ValueError, match="brute_force_max_rows"):
        add_if_unique(
            df, CFG, "image_id", "caption",
            use_lsh=False, brute_force_max_rows=100,
        )
    # under the bound the path still works (collect forces the plan)
    small = spark.createDataFrame(corpus[["image_id", "caption"]].head(20))
    out = add_if_unique(
        small, CFG, "image_id", "caption", use_lsh=False,
        brute_force_max_rows=100,
    ).collect()
    assert len(out) == 20


def test_capped_bucket_observation(spark):
    """Entering the >hot_bucket_cap heuristic regime emits an observable
    CollectMetrics signal (round-3 advice): capped_buckets counts buckets
    over the cap, max_bucket_size reports the worst one; a run with no
    capped bucket reports zero."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from rensa_spark.operators.lsh import (
        candidate_pairs_from_band_rows,
        explode_bands,
    )

    rows = [(f"k{i:03d}", [7, 7]) for i in range(40)]  # one 40-member bucket x2 bands
    df = spark.createDataFrame(rows, "key string, bands array<long>")
    bands = explode_bands(df, "key")

    obs = Observation("capped")
    pairs = candidate_pairs_from_band_rows(
        bands, hot_bucket_cap=8, capped_metrics=obs
    )
    n = pairs.count()
    assert n > 0
    assert obs.get["capped_buckets"] == 2
    assert obs.get["max_bucket_size"] == 40

    obs2 = Observation("uncapped")
    pairs2 = candidate_pairs_from_band_rows(
        bands, hot_bucket_cap=4096, capped_metrics=obs2
    )
    pairs2.count()
    assert obs2.get["capped_buckets"] == 0
    assert obs2.get["max_bucket_size"] == 40
    # capped vs not must agree on the connected keys (star+ring covers all)
    assert pairs.selectExpr("a AS k").union(pairs.selectExpr("b")).distinct().count() == \
        pairs2.selectExpr("a AS k").union(pairs2.selectExpr("b")).distinct().count()
