"""Physical-plan regression guards: the scale properties PLANS.md claims are
asserted here so a refactor cannot silently reintroduce a scan of the image
bytes, an extra Python crossing, or a duplicated UDF.
"""

from __future__ import annotations

import re

import pytest

from rensa_spark.config import RensaConfig

CFG = RensaConfig(num_perm=128, seed=42, threshold=0.8, num_bands=8, ngram_size=3)


def _formatted_plan(df) -> str:
    jdf = df._jdf
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def image_table(spark, tmp_path_factory):
    """An input_hint-shaped table (image_id, bytes, w, h, fmt, caption,
    phash) written to parquet so scan pruning is observable."""
    import pandas as pd

    from rensa_spark.sources.synthetic import generate_corpus

    pdf = generate_corpus(500, seed=3, with_images=True)
    path = str(tmp_path_factory.mktemp("plans") / "images.parquet")
    pd.DataFrame(pdf).to_parquet(path, index=False)
    return spark.read.parquet(path)


def test_flagship_plan_prunes_bytes_and_single_crossing(image_table):
    """dup_flags hot path, round-3 shape: the sketch stage (band rows) reads
    no image bytes and crosses Python exactly once; the flag stage consumes
    the checkpointed band rows with NO per-bucket window sort (the skew
    cliff the round-2 verdict flagged), only map-side-combining aggregates
    and a salted semi-join, and its keys side is a pruned byte-free scan."""
    from rensa_spark.operators.dedup import dup_flags
    from rensa_spark.operators.sketch import rminhash_band_rows

    # stage 1: the single Python crossing, bytes pruned at the scan
    band_plan = _formatted_plan(
        rminhash_band_rows(image_table, CFG, "image_id", "caption")
    )
    scan = next(l for l in band_plan.splitlines() if "ReadSchema" in l)
    assert "bytes" not in scan, scan
    assert "caption" in scan
    assert len(re.findall(r"\) MapInPandas", band_plan)) == 1
    assert len(re.findall(r"\) ArrowEvalPython", band_plan)) == 0
    assert len(re.findall(r"\) Exchange", band_plan)) == 0

    # stage 2: flags over the (checkpointed) band rows — skew-proof shape
    plan = _formatted_plan(dup_flags(image_table, CFG, "image_id", "caption"))
    assert len(re.findall(r"\) Window", plan)) == 0  # no single-bucket sort
    assert len(re.findall(r"\) Sort", plan)) == 0
    assert len(re.findall(r"\) ArrowEvalPython", plan)) == 0
    assert len(re.findall(r"\) Exchange", plan)) <= 4
    for line in plan.splitlines():
        if "ReadSchema" in line:  # the keys side reads only the key column
            assert "bytes" not in line and "caption" not in line, line


def test_ann_bucket_join_no_udf_duplication(spark, image_table):
    """bucketed_topk_join: exactly one bucket-UDF evaluation per side (the
    nullable-join-key isnotnull pushdown used to duplicate the corpus-side
    UDF; guarded by the coalesce fix in similarity.py)."""
    from rensa_spark.operators.similarity import bucketed_topk_join

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _formatted_plan(
        bucketed_topk_join(
            emb, "vec_id", "embedding", emb, "vec_id", "embedding",
            k=3, n_planes=4, dim=64,
        )
    )
    assert len(re.findall(r"\) ArrowEvalPython", plan)) == 2


def test_multimodal_clusters_never_scan_bytes(image_table):
    """The multimodal dedup hot path reads only (image_id, caption, phash)
    even though the table carries pixel payloads (north rule / SURVEY §7
    hard part 6). Asserted on the LAZY edge plan — the clusters operator
    eagerly runs CC internally (scoped persist), so its returned plan no
    longer exposes the sketch scan."""
    from rensa_spark.operators.dedup import multimodal_dedup_edges

    plan = _formatted_plan(
        multimodal_dedup_edges(image_table, CFG, "image_id", "caption", "phash")
    )
    scans = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scans
    for line in scans:
        assert "bytes" not in line, line
