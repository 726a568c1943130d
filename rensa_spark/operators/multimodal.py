"""Multimodal (image) column plumbing.

Images are opaque ``binary`` columns with typed metadata (w, h, fmt) per the
BASELINE input_hint schema. The Spark-side plumbing — schema, partition
hygiene, Arrow batch shape, UDF signatures — is real and tested; pixel codecs
for formats whose libraries are absent in this container (png/jpeg) are
STUBBED behind NotImplementedError, while PPM (pure numpy) decodes for real
so the per-row invariants (decoded-pixel PSNR + caption equality) are
actually exercised.

Scale rule (SURVEY.md §7 hard part 6): the dedup hot path never touches
``bytes`` — it reads only caption/phash (column pruning keeps the scan
narrow); pixel work happens in a separate sampled verification pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rensa_spark.sources.synthetic import decode_ppm, psnr


def decode_pixels(data: bytes | None, fmt: str) -> np.ndarray | None:
    """Decode one image payload to (h, w, 3) uint8. PPM is implemented;
    png/jpeg decode is stubbed (no imaging libraries in this container)."""
    if data is None:
        return None
    if fmt == "ppm":
        return decode_ppm(data)
    raise NotImplementedError(
        f"decoder for fmt={fmt!r} requires an imaging library not present in "
        "this container; the Spark plumbing (schema/batching) is format-agnostic"
    )


def image_stats(df: DataFrame, bytes_col: str = "bytes", fmt_col: str = "fmt") -> DataFrame:
    """Per-image decoded statistics via mapInPandas (Arrow binary batches):
    adds mean_px, px_hash_ok (decoded pixel hash == stored phash)."""
    from rensa_spark.sources.synthetic import phash_of_pixels

    out_schema = (
        df.schema.simpleString()[7:-1] + ",mean_px double,px_phash long"
    )

    def gen(batches):
        for pdf in batches:
            means, phashes = [], []
            for data, fmt in zip(pdf[bytes_col], pdf[fmt_col]):
                px = decode_pixels(data, fmt)
                if px is None:
                    means.append(None)
                    phashes.append(None)
                else:
                    means.append(float(px.mean()))
                    phashes.append(phash_of_pixels(px))
            pdf = pdf.copy()
            pdf["mean_px"] = means
            pdf["px_phash"] = phashes
            yield pdf

    return df.mapInPandas(gen, out_schema)


def resize_stub(df: DataFrame, w: int, h: int) -> DataFrame:
    """Resize plumbing: schema + UDF signature are real, the pixel resample
    is a deterministic fake (nearest-neighbor index math on PPM, stub
    elsewhere)."""

    def gen(batches):
        from rensa_spark.sources.synthetic import encode_ppm

        for pdf in batches:
            out = []
            for data, fmt in zip(pdf["bytes"], pdf["fmt"]):
                if data is None:
                    out.append(None)
                    continue
                px = decode_pixels(data, fmt)
                yi = (np.arange(h) * px.shape[0] // h).astype(np.int64)
                xi = (np.arange(w) * px.shape[1] // w).astype(np.int64)
                out.append(encode_ppm(px[yi][:, xi]))
            pdf = pdf.copy()
            pdf["bytes"] = out
            pdf["w"] = np.int32(w)
            pdf["h"] = np.int32(h)
            yield pdf

    return df.mapInPandas(gen, df.schema)


def verify_payload_invariants(
    before: DataFrame, after: DataFrame, key_col: str = "image_id", sample: float = 0.1
) -> pd.DataFrame:
    """Per-row invariant check on a sample: caption equality + decoded-pixel
    PSNR (>=40dB for lossy, infinite for lossless passthrough). Driver-side
    on the sampled rows only — never a full-scan pixel shuffle."""
    cols = [key_col, "bytes", "fmt", "caption"]
    b = before.select(cols).sample(sample, seed=42).toPandas().set_index(key_col)
    if not len(b):
        b = before.select(cols).limit(50).toPandas().set_index(key_col)
    a = (
        after.select(cols)
        .join(
            before.select(F.col(key_col)).sample(sample, seed=42),
            key_col,
            "leftsemi",
        )
        .toPandas()
        .set_index(key_col)
    )
    rows = []
    for key in b.index.intersection(a.index):
        pb = decode_pixels(b.loc[key, "bytes"], b.loc[key, "fmt"])
        pa = decode_pixels(a.loc[key, "bytes"], a.loc[key, "fmt"])
        rows.append(
            {
                "key": key,
                "caption_equal": b.loc[key, "caption"] == a.loc[key, "caption"],
                "psnr": float("inf")
                if (pb is None and pa is None)
                else psnr(pb, pa),
            }
        )
    return pd.DataFrame(rows)
