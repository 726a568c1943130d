"""Quantify the hot-bucket sub-split recall trade (round-5 verdict ask #4).

On the synthetic_topk_hot_50k corpus (the bench lane's exact data: 40k
random + 10k identical vectors, dim 32, every bucket hot at cap 128),
measure for a fixed sample of queries:

1. sub-split vs UNSPLIT bucket path: top-k overlap isolating the ONE
   approximation the many-query lane makes inside hot buckets
   (hot_bucket_cap=128/extra_planes=6 vs cap=10^9 — same buckets,
   no sub-split);
2. sub-split vs exact brute force: end-to-end lane recall including the
   bucketing loss itself (approximate-by-design).

Prints one JSON line and appends a row to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

K = 5
DIM = 32
N_SAMPLE = 400


def main() -> None:
    from pyspark.sql import functions as F

    from rensa_spark.operators.similarity import bucketed_topk_join, quantize_vecs
    from rensa_spark.session import get_spark

    rng = np.random.default_rng(4242)
    base_vecs = rng.normal(size=(40_000, DIM)).astype(np.float32)
    block_vec = np.tile(rng.normal(size=(1, DIM)).astype(np.float32), (10_000, 1))
    vecs = np.vstack([base_vecs, block_vec])
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(50_000, dtype=np.int64),
            "embedding": [v.tolist() for v in vecs],
        }
    )

    spark = get_spark(app_name="recall-topk-hot", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(pdf).repartition(32).cache()
    df.count()

    common = dict(k=K, n_planes=6, dim=DIM, extra_planes=6)
    split = bucketed_topk_join(
        df, "vec_id", "embedding", df, "vec_id", "embedding",
        hot_bucket_cap=128, **common,
    ).toPandas()
    unsplit = bucketed_topk_join(
        df, "vec_id", "embedding", df, "vec_id", "embedding",
        hot_bucket_cap=10**9, **common,
    ).toPandas()
    spark.stop()

    # exact brute force on the SAME quantized-cosine score + tie-break
    smp = np.sort(
        np.concatenate(
            [
                rng.choice(40_000, size=N_SAMPLE // 2, replace=False),
                40_000 + rng.choice(10_000, size=N_SAMPLE // 2, replace=False),
            ]
        )
    )
    vq = quantize_vecs(vecs.astype(np.float64))
    n2 = (vq * vq).sum(axis=1).astype(np.float64)
    exact = {}
    for qid in smp:
        dots = (vq @ vq[qid]).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.where((n2 > 0) & (n2[qid] > 0),
                         dots / (np.sqrt(n2) * np.sqrt(n2[qid])), 0.0)
        order = np.lexsort((np.arange(len(s)), -s))[:K]
        exact[int(qid)] = set(order.tolist())

    def topk_map(out):
        m = {}
        for qid, grp in out.groupby("qid"):
            m[int(qid)] = set(grp["neighbor_id"].tolist())
        return m

    sp, us = topk_map(split), topk_map(unsplit)
    o_split_vs_unsplit = np.mean(
        [len(sp.get(q, set()) & us.get(q, set())) / K for q in smp]
    )
    o_split_vs_exact = np.mean(
        [len(sp.get(q, set()) & exact[q]) / K for q in smp]
    )
    o_unsplit_vs_exact = np.mean(
        [len(us.get(q, set()) & exact[q]) / K for q in smp]
    )
    res = {
        "lane": "synthetic_topk_hot_50k shape",
        "k": K,
        "sampled_queries": len(smp),
        "subsplit_vs_unsplit_overlap": round(float(o_split_vs_unsplit), 4),
        "subsplit_vs_exact_recall": round(float(o_split_vs_exact), 4),
        "unsplit_vs_exact_recall": round(float(o_unsplit_vs_exact), 4),
    }
    print(json.dumps(res))
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            "\n## Hot-bucket sub-split recall (round 6, verdict ask #4)\n\n"
            f"On the `synthetic_topk_hot_50k` corpus ({len(smp)} sampled "
            "queries, half from the degenerate identical block), top-5 "
            "overlap of the sub-split path (cap=128, extra_planes=6) vs "
            f"the unsplit bucket path: **{res['subsplit_vs_unsplit_overlap']}** "
            "— the sub-split's own recall cost inside hot buckets. End-to-"
            f"end vs exact brute force: sub-split {res['subsplit_vs_exact_recall']}, "
            f"unsplit {res['unsplit_vs_exact_recall']} (the gap to 1.0 is the "
            "hyperplane bucketing itself, approximate by design).\n"
        )


if __name__ == "__main__":
    main()
