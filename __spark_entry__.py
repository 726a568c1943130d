"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship one-shot MinHash dup-flag pipeline on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-runnable SQL equivalents where expressible.

Oracle notes: the MinHash/LSH sketch math is not SQL-expressible; its
bit-exactness is proven in tests/ against a pure-Python oracle
(tests/test_kernels.py, tests/test_operators_spark.py). Where a query's
*decision* coincides with an exactly-SQL-expressible rule on the driver
corpus (e.g. one-shot flags on a corpus whose only duplicates are exact
duplicates), the SQL oracle is registered; sketch-output queries are
registered rows-only per the driver contract.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rensa_spark.config import RensaConfig

CFG = RensaConfig(num_perm=128, seed=42, threshold=0.8, num_bands=8, ngram_size=3)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one-shot duplicate flags (benchmark semantics,
    /root/reference/src/lsh/one_shot.rs:294-332) over sf0.001 documents."""
    from rensa_spark.operators.dedup import dup_flags

    docs = _docs(spark, "/root/testdata/sf0.001")
    return dup_flags(docs, CFG, "doc_id", "text").orderBy("key")


# --------------------------------------------------------------- queries
def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rensa_spark.operators.dedup import exact_dup_flags

    return (
        exact_dup_flags(_docs(spark, sf_dir), "doc_id", "text")
        .select(
            F.col("key").alias("doc_id"),
            F.col("is_dup"),
            F.col("group_size").cast("long").alias("group_size"),
            F.col("is_survivor"),
        )
        .orderBy("doc_id")
    )


def _q_minhash_dup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rensa_spark.operators.dedup import dup_flags

    return (
        dup_flags(_docs(spark, sf_dir), CFG, "doc_id", "text")
        .select(F.col("key").alias("doc_id"), F.col("is_dup"))
        .orderBy("doc_id")
    )


def _q_minhash_signature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch output summarized to scalars (rows-only check: the u32 slot
    values are not SQL-expressible; bit-exactness is pytest-verified)."""
    from rensa_spark.functions.udfs import rminhash_sig_udf

    sig = rminhash_sig_udf(CFG)
    return (
        _docs(spark, sf_dir)
        .select(F.col("doc_id"), sig(F.col("text")).alias("sig"))
        .select(
            "doc_id",
            F.aggregate(
                "sig", F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)
            ).alias("sig_abs_sum"),
            F.array_min("sig").cast("long").alias("sig_min"),
            F.array_max("sig").cast("long").alias("sig_max"),
        )
        .orderBy("doc_id")
    )


def _q_cminhash_signature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rensa_spark.functions.udfs import cminhash_sig_udf

    sig = cminhash_sig_udf(CFG, bits=32)
    return (
        _docs(spark, sf_dir)
        .select(F.col("doc_id"), sig(F.col("text")).alias("sig"))
        .select(
            "doc_id",
            F.aggregate(
                "sig", F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)
            ).alias("sig_abs_sum"),
            F.array_min("sig").cast("long").alias("sig_min"),
        )
        .orderBy("doc_id")
    )


def _q_rho_sidecar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rho sketch sidecar columns (token budget / occupancy semantics,
    src/rminhash/rho.rs). token_count is SQL-checkable; the rest rows-only."""
    from rensa_spark.operators.dedup import sketch_rho

    return (
        sketch_rho(_docs(spark, sf_dir), CFG, "doc_id", "text")
        .select(
            "doc_id",
            F.col("token_count").cast("long").alias("shingle_count"),
            F.col("non_empty").cast("long").alias("non_empty"),
            F.col("is_sparse"),
        )
        .orderBy("doc_id")
    )


def _q_shingle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram shingle count per document (tokenizer parity with
    benchmarks/full_benchmark.py:306-310) — fully SQL-expressible."""
    from rensa_spark.functions.udfs import shingle_hashes_udf

    sh = shingle_hashes_udf(CFG)
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.size(sh(F.col("text"))).cast("long").alias("n_shingles"),
            F.size(F.array_distinct(sh(F.col("text")))).cast("long").alias(
                "n_distinct_shingles"
            ),
        )
        .orderBy("doc_id")
    )


def _q_cc_exact_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components driven by exact-text-duplicate edges; the CC
    operator (large-star/small-star) must reproduce min-doc_id-per-text-group."""
    from rensa_spark.operators.cc import connected_components, survivors

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    firsts = docs.groupBy("text").agg(F.min("doc_id").alias("first_id"))
    edges = (
        docs.join(firsts, "text")
        .filter(F.col("doc_id") != F.col("first_id"))
        .select(F.col("first_id").alias("a"), F.col("doc_id").alias("b"))
    )
    clusters = connected_components(edges)
    return (
        survivors(clusters, docs.select("doc_id"), "doc_id")
        .select(
            F.col("key").alias("doc_id"),
            F.col("cluster_id").cast("long").alias("cluster_id"),
            F.col("is_survivor"),
        )
        .orderBy("doc_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_dedup": _q_exact_dedup,
        "minhash_dup_flags": _q_minhash_dup_flags,
        "minhash_signature_stats": _q_minhash_signature_stats,
        "cminhash_signature_stats": _q_cminhash_signature_stats,
        "rho_sidecar": _q_rho_sidecar,
        "shingle_counts": _q_shingle_counts,
        "cc_exact_clusters": _q_cc_exact_clusters,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dedup": """
            SELECT doc_id,
                   COUNT(*) OVER (PARTITION BY text) >= 2 AS is_dup,
                   COUNT(*) OVER (PARTITION BY text) AS group_size,
                   doc_id = MIN(doc_id) OVER (PARTITION BY text) AS is_survivor
            FROM documents
            ORDER BY doc_id
        """,
        # minhash_dup_flags: no SQL oracle — the driver corpus's tiny
        # vocabulary produces genuinely-high-Jaccard non-identical pairs, so
        # one-shot band-collision flags are NOT equivalent to exact-dup flags
        # (verified empirically). Registered rows-only; bit-exact parity with
        # the rensa semantics is proven in tests/test_operators_spark.py
        # against the pure-Python oracle.
        "shingle_counts": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   t -> t <> '') AS tokens
                FROM documents
            ), grams AS (
                SELECT doc_id,
                       CASE WHEN len(tokens) < 3 THEN tokens
                            ELSE list_transform(
                                generate_series(1, len(tokens) - 2),
                                i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])
                       END AS shingles
                FROM toks
            )
            SELECT doc_id,
                   len(shingles)::BIGINT AS n_shingles,
                   len(list_distinct(shingles))::BIGINT AS n_distinct_shingles
            FROM grams
            ORDER BY doc_id
        """,
        "cc_exact_clusters": """
            SELECT doc_id,
                   MIN(doc_id) OVER (PARTITION BY text) AS cluster_id,
                   doc_id = MIN(doc_id) OVER (PARTITION BY text) AS is_survivor
            FROM documents
            ORDER BY doc_id
        """,
    }
