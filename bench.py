"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus synthetic-corpus
dedup throughput (signatures/sec + end-to-end one-shot flags rows/sec — the
reference's benchmark metric, /root/reference/benchmarks/full_benchmark.py).

Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
 "sf": ..., "sigs_per_sec": ..., "dedup_rows_per_sec": ...}

Scaling-efficiency evidence (N vs 4N cores) lives in tools/scaling_bench.py
-> BENCH/BASELINE.md (too slow to run per-round).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYNTH_ROWS = int(os.environ.get("BENCH_SYNTH_ROWS", "200000"))


def _synth_corpus_path() -> str:
    """Generate (once) the deterministic caption corpus used for throughput."""
    import pandas as pd

    path = f"/tmp/rensa_bench_corpus_{SYNTH_ROWS}.parquet"
    if not os.path.exists(path):
        from rensa_spark.sources.synthetic import generate_corpus

        pdf = generate_corpus(SYNTH_ROWS, seed=12345, with_images=False)
        pdf[["image_id", "caption"]].to_parquet(path, index=False)
    return path


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from rensa_spark.config import RensaConfig
    from rensa_spark.functions.udfs import rminhash_sig_udf
    from rensa_spark.operators.dedup import dup_flags
    from rensa_spark.session import get_spark

    cfg = RensaConfig(num_perm=128, seed=12345, threshold=0.8, num_bands=8, ngram_size=3)
    corpus_path = _synth_corpus_path()

    spark = get_spark(
        app_name="rensa-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
    )
    timings: dict[str, float] = {}

    # warm the Python UDF workers (imports of pandas/numpy/rensa_spark per
    # worker process dominate otherwise; a real long-running cluster
    # amortizes this once per executor)
    from pyspark.sql.pandas.functions import PandasUDFType, pandas_udf
    from pyspark.sql.types import LongType

    def _warm_fn(texts):
        import rensa_spark.kernels.rminhash  # noqa: F401 — preload modules

        return texts.str.len().astype("int64")

    _warm = pandas_udf(_warm_fn, LongType(), PandasUDFType.SCALAR)

    warm_df = spark.range(0, CPUS * 4, 1, CPUS * 4).withColumn(
        "t", F.lit("warm up the executor python workers")
    )
    warm_df.select(_warm("t")).write.format("noop").mode("overwrite").save()

    # headline driver queries at SF_DIR — best-of-2 per lane (this host's
    # run-to-run CPU variance poisons single-shot timings: the same lane
    # measured 17.1s then 1.4s back-to-back in one session; see CLAUDE.md).
    # Lanes whose first trial exceeds RETRY_BELOW skip the retry so the
    # suite's worst-case wall stays bounded for the per-round driver run.
    RETRY_BELOW = float(os.environ.get("BENCH_RETRY_BELOW_SEC", "3.0"))
    for name, fn in em.queries().items():
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best = time.perf_counter() - t0
        if best < RETRY_BELOW:
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # the synthetic corpus is one ~35MB parquet file = 1 input split; spread
    # it across the executor threads like a real multi-file table would be
    corpus = spark.read.parquet(corpus_path).repartition(CPUS * 3).cache()
    n_rows = corpus.count()

    def best_of(fn, trials: int = 2) -> float:
        # best-of-N: this host shows heavy run-to-run CPU variance
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # signatures/sec: sketch only (num_perm=128 u32 slots per row)
    sig = rminhash_sig_udf(cfg)
    sketch_sec = best_of(
        lambda: corpus.select(
            F.aggregate(
                sig("caption"), F.lit(0).cast("long"), lambda a, x: a + F.abs(x)
            ).alias("s")
        )
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    timings["synthetic_sketch_200k"] = round(sketch_sec, 3)

    # end-to-end one-shot dup flags (the reference benchmark lane)
    dedup_sec = best_of(
        lambda: dup_flags(corpus, cfg, "image_id", "caption")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    timings["synthetic_oneshot_dedup_200k"] = round(dedup_sec, 3)

    # sparse-heavy rho lane (round-1 perf findings: the per-row sparse-verify
    # sidecar loop + row-at-a-time candidate verify, both since vectorized):
    # captions truncated to 8 tokens make every row sparse (8 tokens x 4
    # probes << occupancy threshold 56), driving the refined flag path —
    # sparse sigs, capped JVM pair verify, recall rescue — end-to-end
    from rensa_spark.api import RhoEngine

    sparse_corpus = corpus.select(
        "image_id",
        F.array_join(
            F.slice(F.split(F.col("caption"), " "), 1, 8), " "
        ).alias("caption"),
    ).cache()
    sparse_corpus.count()
    engine = RhoEngine(cfg)
    sparse_sec = best_of(
        lambda: engine.dup_flags(sparse_corpus, "image_id", "caption")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    timings["synthetic_rho_sparse_200k"] = round(sparse_sec, 3)

    # degenerate corpora (round-2 verdict asks #1/#3): a 10k-identical-sig
    # block inside 50k rows (simhash pair lane must collapse it, not join it)
    # and 100k ALL-EMPTY captions (every band bucket is one 100k-row bucket —
    # the flag lane must not funnel it through a single straggler task)
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(777)
    vocab = [f"w{i:03d}" for i in range(900)]
    hot_pdf = pd.DataFrame(
        {
            "image_id": np.arange(50_000, dtype=np.int64),
            "caption": [" ".join(rng.choice(vocab, size=12)) for _ in range(40_000)]
            + ["the same boilerplate caption appears everywhere"] * 10_000,
        }
    )
    hot_df = spark.createDataFrame(hot_pdf).repartition(CPUS).cache()
    hot_df.count()
    from rensa_spark.operators.similarity import simhash_near_pairs

    simhash_hot_sec = best_of(
        lambda: simhash_near_pairs(hot_df, cfg, "image_id", "caption")
        .write.format("noop")
        .mode("overwrite")
        .save(),
        trials=1,  # ~C(10k,2) output rows; one trial keeps the suite bounded
    )
    timings["synthetic_simhash_hot_50k"] = round(simhash_hot_sec, 3)

    empty_df = (
        spark.range(0, 100_000, 1, CPUS)
        .select(F.col("id").alias("image_id"), F.lit("").alias("caption"))
        .cache()
    )
    empty_df.count()
    degen_sec = best_of(
        lambda: dup_flags(empty_df, cfg, "image_id", "caption")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    timings["synthetic_degenerate_flags_100k"] = round(degen_sec, 3)

    spark.stop()
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "rensa_spark dedup suite wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "synthetic_rows": n_rows,
                "sigs_per_sec": round(n_rows / sketch_sec, 1),
                "dedup_rows_per_sec": round(n_rows / dedup_sec, 1),
                "sparse_rho_rows_per_sec": round(n_rows / sparse_sec, 1),
                "cpus": CPUS,
                "trials_per_lane": "2 when first trial < 3s, else 1",
            }
        )
    )


if __name__ == "__main__":
    main()
