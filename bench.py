"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus synthetic-corpus
dedup throughput (signatures/sec + end-to-end one-shot flags rows/sec — the
reference's benchmark metric, /root/reference/benchmarks/full_benchmark.py).

Prints ONE compact JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
 "sf": ..., "sigs_per_sec": ..., "dedup_rows_per_sec": ...}
Per-lane detail {name: {"sec", "trials", "load_before", "load_after",
"err"}} is written to BENCH/lanes_detail.json (keeping it off stdout keeps
the line inside the driver's tail-capture window — round-4 verdict ask #3).

Trust protocol (round-3 verdict ask #4): EVERY lane is best-of-N (default
2 — this host's run-to-run CPU variance poisons single shots; the same lane
measured 17.1s then 1.4s back-to-back in one session, see CLAUDE.md);
os.getloadavg() is recorded before/after each lane so a contended window is
visible in the artifact itself; any lane error is captured into that lane's
"err" field (and "errors" at top level) instead of riding the stderr tail —
the output line is ALWAYS valid JSON with zero embedded stack traces.

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
TRIALS = int(os.environ.get("BENCH_TRIALS", "2"))


def _synth_corpus_path() -> str:
    """Generate (once) the deterministic caption corpus used for throughput."""
    import pandas as pd

    path = f"/tmp/rensa_bench_corpus_{SYNTH_ROWS}.parquet"
    if not os.path.exists(path):
        from rensa_spark.sources.synthetic import generate_corpus

        pdf = generate_corpus(SYNTH_ROWS, seed=12345, with_images=False)
        pdf[["image_id", "caption"]].to_parquet(path, index=False)
    return path


class LaneRunner:
    """best-of-N lane timing with per-lane load + error capture."""

    def __init__(self, trials: int = TRIALS):
        self.trials = trials
        self.lanes: dict[str, dict] = {}
        self.timings: dict[str, float] = {}

    def run(self, name: str, fn, trials: int | None = None) -> float | None:
        rec: dict = {
            "sec": None,
            "trials": 0,
            "load_before": round(os.getloadavg()[0], 2),
            "load_after": None,
            "err": None,
        }
        best = float("inf")
        try:
            for _ in range(trials or self.trials):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
                rec["trials"] += 1
        except Exception as exc:  # noqa: BLE001 — captured into the artifact
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
        rec["load_after"] = round(os.getloadavg()[0], 2)
        if rec["trials"]:
            rec["sec"] = round(best, 3)
            self.timings[name] = rec["sec"]
        self.lanes[name] = rec
        return rec["sec"]


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from rensa_spark.config import RensaConfig
    from rensa_spark.functions.udfs import rminhash_sig_udf
    from rensa_spark.operators.dedup import dup_flags, exact_dup_flags
    from rensa_spark.session import get_spark

    cfg = RensaConfig(num_perm=128, seed=12345, threshold=0.8, num_bands=8, ngram_size=3)
    corpus_path = _synth_corpus_path()

    spark = get_spark(
        app_name="rensa-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
    )
    runner = LaneRunner()

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

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    # headline driver queries at SF_DIR
    for name, fn in em.queries().items():
        runner.run(name, lambda fn=fn: _noop(fn(spark, SF_DIR)))

    # the synthetic corpus is one ~35MB parquet file = 1 input split; spread
    # it across the executor threads like a real multi-file table would be
    corpus = spark.read.parquet(corpus_path).repartition(CPUS * 3).cache()
    n_rows = corpus.count()

    # signatures/sec: sketch only (num_perm=128 u32 slots per row)
    sig = rminhash_sig_udf(cfg)
    runner.run(
        "synthetic_sketch_200k",
        lambda: _noop(
            corpus.select(
                F.aggregate(
                    sig("caption"), F.lit(0).cast("long"), lambda a, x: a + F.abs(x)
                ).alias("s")
            )
        ),
    )

    # end-to-end one-shot dup flags (the reference benchmark lane)
    runner.run(
        "synthetic_oneshot_dedup_200k",
        lambda: _noop(dup_flags(corpus, cfg, "image_id", "caption")),
    )

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
    runner.run(
        "synthetic_rho_sparse_200k",
        lambda: _noop(engine.dup_flags(sparse_corpus, "image_id", "caption")),
    )

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

    runner.run(
        "synthetic_simhash_hot_50k",
        lambda: _noop(simhash_near_pairs(hot_df, cfg, "image_id", "caption")),
    )

    empty_df = (
        spark.range(0, 100_000, 1, CPUS)
        .select(F.col("id").alias("image_id"), F.lit("").alias("caption"))
        .cache()
    )
    empty_df.count()
    runner.run(
        "synthetic_degenerate_flags_100k",
        lambda: _noop(dup_flags(empty_df, cfg, "image_id", "caption")),
    )

    # degenerate ANN lane (round-3 verdict ask #2): 50k embeddings where a
    # 10k block is ONE identical vector (worst-case bucket) and the other
    # 40k random rows overflow every 6-plane bucket past hot_bucket_cap —
    # the identical block must collapse to one representative (its ~50M
    # output pairs are the true answer, salted over 16 reducers) and the
    # hot buckets must take the extra-plane sub-split, keeping join rows
    # bounded instead of O(n^2/64).
    from rensa_spark.operators.similarity import ann_near_dup_pairs

    dim_ann = 32
    rng_ann = np.random.default_rng(4242)
    base_vecs = rng_ann.normal(size=(40_000, dim_ann)).astype(np.float32)
    block_vec = np.tile(
        rng_ann.normal(size=(1, dim_ann)).astype(np.float32), (10_000, 1)
    )
    ann_pdf = pd.DataFrame(
        {
            "vec_id": np.arange(50_000, dtype=np.int64),
            "embedding": [v.tolist() for v in np.vstack([base_vecs, block_vec])],
        }
    )
    ann_df = spark.createDataFrame(ann_pdf).repartition(CPUS).cache()
    ann_df.count()
    runner.run(
        "synthetic_ann_hot_50k",
        lambda: _noop(
            ann_near_dup_pairs(
                ann_df, "vec_id", "embedding", min_cosine=0.3, n_planes=6,
                dim=dim_ann, hot_bucket_cap=512, extra_planes=6,
            )
        ),
    )

    # round-4 verdict ask #1: the df<->df top-k join on the same degenerate
    # corpus (10k identical vectors + 40k random over 64 buckets — EVERY
    # bucket hot at cap 128). The identical block collapses to k corpus
    # rows and hot buckets sub-split on both sides, bounding the equi-join
    # at ~50k*7*(bucket/2^extra) ~ 3.5M candidate rows; without the round-5
    # treatment it emits ~50k*7*(50k/64) ~ 270M.
    from rensa_spark.operators.similarity import bucketed_topk_join

    runner.run(
        "synthetic_topk_hot_50k",
        lambda: _noop(
            bucketed_topk_join(
                ann_df, "vec_id", "embedding", ann_df, "vec_id", "embedding",
                k=5, n_planes=6, dim=dim_ann, hot_bucket_cap=128,
                extra_planes=6,
            )
        ),
    )

    # JPEG decode throughput (round-5: the image payload decodes for real —
    # 2k baseline JFIF payloads decoded + phashed inside the Arrow batches;
    # Huffman bit IO is Python, so this lane prices the sampled pixel-verify
    # pass, NOT the dedup hot path, which never touches bytes)
    from rensa_spark.operators.jpeg_codec import encode_jpeg
    from rensa_spark.operators.multimodal import image_stats
    from rensa_spark.sources.synthetic import phash_of_pixels

    rng_j = np.random.default_rng(99)
    jrows = []
    for i in range(2000):
        coarse = rng_j.integers(0, 256, size=(4, 4, 3))
        px = np.repeat(np.repeat(coarse, 8, axis=0), 8, axis=1).astype(np.uint8)
        jrows.append(
            ("img%04d" % i, encode_jpeg(px), 32, 32, "jpeg", "cap %d" % i,
             phash_of_pixels(px))
        )
    jpdf = pd.DataFrame(
        jrows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    )
    jdf = spark.createDataFrame(jpdf).repartition(CPUS).cache()
    jdf.count()
    runner.run(
        "synthetic_jpeg_decode_2k",
        lambda: _noop(image_stats(jdf)),
    )

    # exact-dedup shuffle-bytes lane (round-3 verdict ask #1): 20k documents
    # of ~10KB each (~200MB of text). The hash-keyed exact_dup_flags moves
    # ~24 bytes/row through its two exchanges; the retired groupBy(text)
    # plan moved all ~200MB twice. 10% planted exact dups.
    body_words = np.array([f"tok{i:04d}" for i in range(5000)])
    docs = []
    for i in range(20_000):
        seed = i if i < 18_000 else i - 18_000  # ids >= 18k repeat an earlier body
        r = np.random.default_rng(seed)
        docs.append(" ".join(r.choice(body_words, size=1400)))
    big_pdf = pd.DataFrame(
        {"image_id": np.arange(20_000, dtype=np.int64), "caption": docs}
    )
    big_df = spark.createDataFrame(big_pdf).repartition(CPUS).cache()
    big_df.count()
    runner.run(
        "synthetic_exact_dedup_10kb_20k",
        lambda: _noop(exact_dup_flags(big_df, "image_id", "caption")),
    )

    spark.stop()
    timings = runner.timings
    total = round(sum(timings.values()), 3)
    sketch_sec = timings.get("synthetic_sketch_200k")
    dedup_sec = timings.get("synthetic_oneshot_dedup_200k")
    sparse_sec = timings.get("synthetic_rho_sparse_200k")
    errors = sorted(n for n, r in runner.lanes.items() if r["err"])
    headline = {
        "metric": "rensa_spark dedup suite wall-clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "sf": SF_DIR,
        "synthetic_rows": n_rows,
        "sigs_per_sec": round(n_rows / sketch_sec, 1) if sketch_sec else None,
        "dedup_rows_per_sec": round(n_rows / dedup_sec, 1) if dedup_sec else None,
        "sparse_rho_rows_per_sec": round(n_rows / sparse_sec, 1) if sparse_sec else None,
        "cpus": CPUS,
        "trials_per_lane": TRIALS,
        "lane_detail": "BENCH/lanes_detail.json",
    }
    # Per-lane detail (best-of-N, loadavg before/after, error text) goes to
    # a sidecar file, NOT the stdout line: round 4's driver artifact failed
    # to parse because duplicating the 43-lane detail map inline pushed the
    # single JSON line past the driver's tail-capture window, truncating the
    # headline fields (round-4 verdict ask #3). stdout stays one COMPACT
    # parseable line; the full record lands next to the scaling runs.
    detail_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(detail_dir, exist_ok=True)
    with open(os.path.join(detail_dir, "lanes_detail.json"), "w") as f:
        json.dump({**headline, "lanes": runner.lanes}, f, indent=1)
    print(json.dumps(headline))
    if errors:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
