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


# ------------------------------------------------------- video / audio lanes
#
# Same contract as images: opaque binary column + typed metadata, real Spark
# plumbing (schema, Arrow batch shape, vectorized per-batch math), codecs for
# container formats stubbed. 'rawv' is a trivial decodable format so the
# sampling/fingerprint math is actually exercised end-to-end:
#   rawv video: 6-byte header (u16le n_frames, u16le h, u16le w) + n*h*w
#               grayscale uint8 frames
#   rawa audio: 4-byte header (u32le sample_rate) + int16le PCM samples


def decode_rawv(data: bytes) -> np.ndarray:
    """(n_frames, h, w) uint8 from the rawv layout."""
    head = np.frombuffer(data[:6], dtype=np.uint16)
    n, h, w = int(head[0]), int(head[1]), int(head[2])
    return np.frombuffer(data[6 : 6 + n * h * w], dtype=np.uint8).reshape(n, h, w)


def encode_rawv(frames: np.ndarray) -> bytes:
    n, h, w = frames.shape
    return np.array([n, h, w], dtype=np.uint16).tobytes() + frames.tobytes()


def frame_sample_indices(n_frames: int, k: int) -> np.ndarray:
    """Deterministic evenly-spaced frame picks (midpoint rule): the same
    closed form the Rho token sampler uses, so sampling is a pure function
    of n_frames — stable across partitionings and resumes."""
    k = min(k, n_frames)
    return ((np.arange(k, dtype=np.int64) * 2 + 1) * n_frames) // (2 * k)


def video_frame_sample(
    df: DataFrame,
    key_col: str = "video_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    n_frames: int = 4,
) -> DataFrame:
    """One row per sampled frame: (key, frame_idx, frame_phash, mean_px).
    rawv decodes for real; container formats (mp4/webm/...) raise
    NotImplementedError inside the worker — no imaging/ffmpeg libraries in
    this container; the plumbing is format-agnostic."""
    from rensa_spark.sources.synthetic import phash_of_pixels

    key_type = df.schema[key_col].dataType.simpleString()
    schema = f"key {key_type}, frame_idx int, frame_phash long, mean_px double"

    def gen(batches):
        for pdf in batches:
            keys, idxs, phs, means = [], [], [], []
            for key, data, fmt in zip(pdf[key_col], pdf[bytes_col], pdf[fmt_col]):
                if data is None:
                    continue
                if fmt != "rawv":
                    raise NotImplementedError(
                        f"video decoder for fmt={fmt!r} requires ffmpeg/imaging "
                        "libraries not present in this container"
                    )
                frames = decode_rawv(bytes(data))
                for fi in frame_sample_indices(frames.shape[0], n_frames):
                    px = frames[int(fi)]
                    keys.append(key)
                    idxs.append(int(fi))
                    # grayscale frame -> 3-channel for the shared phash
                    phs.append(phash_of_pixels(np.repeat(px[:, :, None], 3, axis=2)))
                    means.append(float(px.mean()))
            yield pd.DataFrame(
                {"key": keys, "frame_idx": np.array(idxs, dtype=np.int32),
                 "frame_phash": np.array(phs, dtype=np.int64),
                 "mean_px": np.array(means, dtype=np.float64)}
            )

    return df.select(key_col, bytes_col, fmt_col).mapInPandas(gen, schema)


def audio_features(
    df: DataFrame,
    key_col: str = "audio_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """(key, n_samples, sample_rate, rms, zero_crossings) per clip — the
    feature-extract stage of an audio dedup pipeline. rawa decodes for real
    (vectorized numpy over the PCM buffer); mp3/flac/... stubbed."""
    key_type = df.schema[key_col].dataType.simpleString()
    schema = (
        f"key {key_type}, n_samples long, sample_rate int, rms double, "
        "zero_crossings long"
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for key, data, fmt in zip(pdf[key_col], pdf[bytes_col], pdf[fmt_col]):
                if data is None:
                    continue
                if fmt != "rawa":
                    raise NotImplementedError(
                        f"audio decoder for fmt={fmt!r} requires codec "
                        "libraries not present in this container"
                    )
                data = bytes(data)
                sr = int(np.frombuffer(data[:4], dtype=np.uint32)[0])
                pcm = np.frombuffer(data[4:], dtype=np.int16).astype(np.float64)
                rows.append(
                    {
                        "key": key,
                        "n_samples": len(pcm),
                        "sample_rate": sr,
                        "rms": float(np.sqrt((pcm ** 2).mean())) if len(pcm) else 0.0,
                        "zero_crossings": int((np.diff(np.signbit(pcm)) != 0).sum())
                        if len(pcm) > 1
                        else 0,
                    }
                )
            yield pd.DataFrame(rows, columns=["key", "n_samples", "sample_rate", "rms", "zero_crossings"])

    return df.select(key_col, bytes_col, fmt_col).mapInPandas(gen, schema)
