"""Exact near-text substring-overlap detection — the "suffix-array substring
pass" of the north rule.

Centralized suffix arrays (à la Lee et al. 2021, "Deduplicating Training
Data Makes Language Models Better") don't distribute; the standard
shuffle-friendly equivalent is fingerprinted fixed-length windows:

1. slide a length-L character window over each document with stride S
   (S <= L/2 guarantees any shared substring of length >= 2L covers at
   least one aligned window pair; S=1 detects >= L overlaps exactly),
2. hash each window (fxhash64 — same kernel as the sketch path),
3. group by window hash: documents sharing a window are substring-overlap
   candidates,
4. verify exactly: re-join the actual window text and compare (hash
   collisions die here), emit (a, b, window overlap count).

Plan shape: one mapInPandas (windows never leave the executor as Python
objects — only (hash, key, pos) rows), one groupBy on the 8-byte hash,
pair expansion bounded per bucket like the LSH path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rensa_spark.kernels.fxhash import fxhash64_ranges


def window_hashes(
    df: DataFrame,
    key_col: str,
    text_col: str,
    window: int = 50,
    stride: int = 25,
) -> DataFrame:
    """-> (key, pos, whash) fixed-length window fingerprints (UTF-8 bytes)."""
    key_type = df.schema[key_col].dataType.simpleString()
    schema = f"key {key_type}, pos int, whash long"

    def gen(batches):
        for pdf in batches:
            keys, poss, blobs, starts, lens = [], [], [], [], []
            offset = 0
            for key, text in zip(pdf[key_col], pdf[text_col]):
                b = (text or "").encode("utf-8")
                blobs.append(b)
                n = len(b)
                if n >= window:
                    p = np.arange(0, n - window + 1, stride, dtype=np.int64)
                    keys.append(np.repeat(key, len(p)))
                    poss.append(p)
                    starts.append(p + offset)
                offset += n
            if not starts:
                yield pd.DataFrame({"key": [], "pos": [], "whash": []}).astype(
                    {"pos": "int32", "whash": "int64"}
                )
                continue
            buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            s = np.concatenate(starts)
            hashes = fxhash64_ranges(
                buf, s, np.full(len(s), window, dtype=np.int64)
            ).view(np.int64)
            yield pd.DataFrame(
                {
                    "key": np.concatenate(keys),
                    "pos": np.concatenate(poss).astype(np.int32),
                    "whash": hashes,
                }
            )

    return df.select(key_col, text_col).mapInPandas(gen, schema)


def substring_overlap_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str,
    window: int = 50,
    stride: int = 25,
    hot_bucket_cap: int = 1024,
    verify: bool = True,
) -> DataFrame:
    """-> (a, b, shared_windows) distinct doc pairs sharing >=1 exact
    length-``window`` substring at sampled alignments.

    ``verify=True`` re-checks the actual window bytes for every candidate
    bucket (collision-proof); candidates whose buckets exceed
    ``hot_bucket_cap`` are star-reduced like the LSH path (component-
    preserving)."""
    # the window-hash UDF feeds two consumers (bucket sizes + the sized
    # join) — checkpoint it once so the mapInPandas pass runs once
    # (round 6; lazy: blocks reclaimed when the result drops out of scope)
    wh = window_hashes(df, key_col, text_col, window, stride).localCheckpoint(
        eager=False
    )
    sizes = wh.groupBy("whash").agg(F.count(F.lit(1)).alias("n"))
    sized = wh.join(sizes.filter(F.col("n") >= 2), "whash")

    small = sized.filter(F.col("n") <= hot_bucket_cap)
    left = small.select("whash", F.col("key").alias("a"), F.col("pos").alias("pos_a"))
    right = small.select("whash", F.col("key").alias("b"), F.col("pos").alias("pos_b"))
    pairs = left.join(right, "whash").filter(F.col("a") < F.col("b"))

    big = sized.filter(F.col("n") > hot_bucket_cap)
    hubs = big.groupBy("whash").agg(F.min("key").alias("hub"))
    big_pairs = (
        big.join(hubs, "whash")
        .filter(F.col("key") != F.col("hub"))
        .select(
            "whash",
            F.col("hub").alias("a"),
            F.lit(None).cast("int").alias("pos_a"),
            F.col("key").alias("b"),
            F.col("pos").alias("pos_b"),
        )
    )
    all_pairs = pairs.unionByName(big_pairs.select(pairs.columns))

    if verify:
        texts = df.select(F.col(key_col).alias("k"), F.col(text_col).alias("t"))
        all_pairs = (
            all_pairs.join(
                texts.withColumnRenamed("k", "a").withColumnRenamed("t", "text_a"), "a"
            )
            .join(
                texts.withColumnRenamed("k", "b").withColumnRenamed("t", "text_b"), "b"
            )
            .withColumn(
                "win_a",
                F.when(
                    F.col("pos_a").isNotNull(),
                    # pos is a BYTE offset into UTF-8; substring() is
                    # char-based, so exact verify re-encodes driver-free via
                    # contains() on the byte-identical window when ascii;
                    # general correctness: compare via encode/substr on binary
                    F.substring(
                        F.encode("text_a", "utf-8").cast("binary"), F.col("pos_a") + 1, window
                    ),
                ),
            )
            .withColumn(
                "win_b",
                F.substring(
                    F.encode("text_b", "utf-8").cast("binary"), F.col("pos_b") + 1, window
                ),
            )
            .filter(F.col("win_a").isNull() | (F.col("win_a") == F.col("win_b")))
            .drop("text_a", "text_b", "win_a", "win_b")
        )
    return all_pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("shared_windows")
    )
