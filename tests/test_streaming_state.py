"""applyInPandasWithState band-keyed continuous dedup (round-3 verdict ask
#6): equivalence vs a sequential oracle, including a checkpoint restart so
bucket state genuinely crosses micro-batch boundaries through the state
store (not parquet re-reads)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from rensa_spark.config import RensaConfig
from rensa_spark.sources.synthetic import generate_corpus

CFG = RensaConfig(num_perm=128, seed=42, threshold=0.8, num_bands=8)


def _sequential_oracle(texts: list[str], cfg: RensaConfig) -> list[bool]:
    """Flags vs EVERYTHING seen earlier: row i conflicts iff some j < i
    shares >=1 band hash and jaccard(sig_i, sig_j) >= threshold."""
    from rensa_spark.kernels.fxhash import band_hash_u64
    from rensa_spark.kernels.prng import rminhash_permutations
    from rensa_spark.kernels.rminhash import rminhash_matrix
    from rensa_spark.kernels.shingle import shingle_hashes_batch

    flat, offs = shingle_hashes_batch(texts, cfg.ngram_size)
    a, b = rminhash_permutations(cfg.num_perm, cfg.seed)
    sig = rminhash_matrix(flat, offs, a, b)
    bands = np.stack(
        [
            band_hash_u64(sig[:, i * cfg.band_size : (i + 1) * cfg.band_size])
            for i in range(cfg.num_bands)
        ],
        axis=1,
    )
    out = []
    for i in range(len(texts)):
        hit = False
        for j in range(i):
            if any(bands[i] == bands[j]) and (sig[i] == sig[j]).mean() >= cfg.threshold:
                hit = True
                break
        out.append(hit)
    return out


def test_band_state_flags_matches_sequential(spark, tmp_path):
    from rensa_spark.streaming.dedup import band_state_flag_rows

    pdf = generate_corpus(120, seed=9, with_images=False)[["image_id", "caption"]]
    pdf = pdf.sort_values("image_id", ignore_index=True)
    half = len(pdf) // 2
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    out_dir = str(tmp_path / "verdicts_out")

    def run() -> None:
        # parquet sink: fault-tolerant, so the SAME checkpoint restarts the
        # query with the state store restored (memory sink cannot recover)
        stream_in = spark.readStream.schema("image_id string, caption string").parquet(src)
        verdicts = band_state_flag_rows(stream_in, CFG, "image_id", "caption")
        q = (
            verdicts.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.exception() is None

    # batch 1: first half -> one availableNow run
    spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.mode("append").parquet(src)
    run()
    # batch 2: second half lands; SAME checkpoint -> state restored from the
    # state store, batch-1 members must be visible to batch-2 arrivals
    spark.createDataFrame(pdf.iloc[half:]).coalesce(1).write.mode("append").parquet(src)
    run()

    got = (
        spark.read.parquet(out_dir)
        .toPandas()
        .groupby("key")["conflict"]
        .any()
        .to_dict()
    )
    want = _sequential_oracle(list(pdf["caption"]), CFG)
    ids = list(pdf["image_id"])
    mismatches = [
        (ids[i], got[ids[i]], want[i])
        for i in range(len(ids))
        if got[ids[i]] != want[i]
    ]
    assert not mismatches, f"{len(mismatches)}: {mismatches[:10]}"
    # the planted dups actually exercise both regimes
    assert any(want) and not all(want)
    # and at least one conflict crosses the batch boundary through the
    # restored state store (an arrival in batch 2 whose only earlier
    # near-dup lives in batch 1)
    b2 = {
        ids[i]
        for i in range(half, len(ids))
        if want[i] and not _sequential_oracle(list(pdf["caption"])[half:], CFG)[i - half]
    }
    assert b2, "fixture has no cross-batch duplicate; regenerate with another seed"
    for k in b2:
        assert got[k]
