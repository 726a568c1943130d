"""spark-submit entrypoint for the checkpointed dedup pipeline.

Deployment (north rule: spark-submit --py-files on a multi-executor cluster):

    cd /root/repo && zip -qr /tmp/rensa_spark.zip rensa_spark
    spark-submit --master <cluster> --py-files /tmp/rensa_spark.zip \
        tools/run_pipeline.py \
        --input  /path/to/images.parquet \
        --key-col image_id --text-col caption \
        --checkpoint-dir /path/to/ckpt --run-id run-42 \
        [--num-perm 128 --num-bands 8 --threshold 0.8 --seed 42]

Prints one JSON line with survivor counts and per-stage lineage; re-running
with the same checkpoint dir resumes after the last completed stage.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--key-col", default="image_id")
    p.add_argument("--text-col", default="caption")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--num-perm", type=int, default=128)
    p.add_argument("--num-bands", type=int, default=8)
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument("--ngram", type=int, default=3)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from rensa_spark.config import RensaConfig
    from rensa_spark.plans.pipeline import DedupPipeline

    spark = SparkSession.builder.appName("rensa-dedup-pipeline").getOrCreate()
    cfg = RensaConfig(
        num_perm=args.num_perm,
        num_bands=args.num_bands,
        threshold=args.threshold,
        ngram_size=args.ngram,
        seed=args.seed,
    )
    df = spark.read.parquet(args.input)
    pipe = DedupPipeline(spark, cfg, args.checkpoint_dir, run_id=args.run_id)
    out = pipe.run(df, args.key_col, args.text_col)
    n_rows = out.count()
    n_surv = out.filter("is_survivor").count()
    print(
        json.dumps(
            {
                "rows": n_rows,
                "survivors": n_surv,
                "stages": pipe.stage_log,
                "config_hash": pipe.config_hash,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
