"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The compressed-format decode kernels are STUBS (image/audio codec
libraries are not available in this container — they raise
NotImplementedError unless ``fake=True`` substitutes a deterministic fake
decoder). Everything downstream of decode is real: raw-buffer
nearest-neighbor resize (``resize_raw_images``, exact numpy pixel math),
frame sampling, and the Spark-side plumbing — schemas, Arrow batch
shapes, mapInPandas signatures, partition sizing — exactly what a 100 TB
media pipeline needs before plugging in a codec.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata accompanying an opaque media payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),    # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake 'decoder': bytes → dim floats in [0,1). Stands in
    for a real image/audio decode so the pipeline shape is testable."""
    if payload is None:
        return None
    out = []
    h = 2166136261
    for i in range(dim):
        for b in payload[i::dim] or b"\x00":
            h = (h ^ b) * 16777619 % (1 << 32)
        out.append((h % 10**6) / 10**6)
    return out


def extract_features(
    df: DataFrame, dim: int = 8, fake: bool = False, batch_limit_mb: int = 64
) -> DataFrame:
    """media table → (media_id, feature[dim], n_bytes) via mapInPandas.

    Partition discipline: media payloads are large; callers should ensure
    ``spark.sql.files.maxPartitionBytes`` keeps a partition's payloads
    within executor memory. Arrow batches stream — a batch never holds
    more than spark.sql.execution.arrow.maxRecordsPerBatch payloads.
    """

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires an image/audio library not "
                    "present in this environment; pass fake=True for the "
                    "deterministic test decoder"
                )
            feats = [_fake_decode(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else None
                                 for p in pdf["payload"]],
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    df: DataFrame, width: int, height: int, payload_format: str = "encoded"
) -> DataFrame:
    """Resize media payloads.

    ``payload_format="raw"`` (H×W×C uint8 buffers — the post-decode
    layout) delegates to the real ``resize_raw_images``. The default
    ``"encoded"`` (compressed JPEG/PNG/…) would need a codec library not
    present in this environment and raises — an earlier revision
    silently updated width/height metadata while leaving the payload
    untouched, which handed callers "resized" images that weren't."""
    if payload_format == "raw":
        return resize_raw_images(df, width, height)
    raise NotImplementedError(
        "resizing encoded image payloads requires an image codec library "
        "not present in this environment; decode first and call with "
        "payload_format='raw' (resize_raw_images handles raw buffers)"
    )


def resize_raw_images(
    df: DataFrame, out_w: int, out_h: int, channels: int = 3
) -> DataFrame:
    """REAL nearest-neighbor resize over raw-array payloads (no codec
    needed: payload is an H×W×C uint8 buffer, dims from width/height
    metadata — the post-decode representation every image pipeline
    normalizes to). Compressed formats still need the stubbed decoder
    first; this is the stage after it, implemented for real.

    numpy fancy-indexing per Arrow batch: O(out pixels) per image,
    vectorized, no Python per-pixel loops. Emits the resized buffer with
    updated metadata; rows whose payload size does not match their
    declared dims yield a null payload (corrupt-input policy: skip, not
    fail — matches training-pipeline practice)."""
    import numpy as np

    out_fields = [f for f in MEDIA_SCHEMA.fields]
    schema = T.StructType(out_fields)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                if p is None or w is None or h is None or \
                        len(p) != int(w) * int(h) * channels:
                    payloads.append(None)
                    continue
                img = np.frombuffer(bytes(p), dtype=np.uint8).reshape(
                    int(h), int(w), channels)
                yi = (np.arange(out_h) * int(h)) // out_h
                xi = (np.arange(out_w) * int(w)) // out_w
                payloads.append(img[yi[:, None], xi, :].tobytes())
            out = pdf.copy()
            out["payload"] = payloads
            out["width"] = out_w
            out["height"] = out_h
            yield out

    return df.mapInPandas(run, schema=schema)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Stub frame sampler: emits (media_id, frame_ts_ms) rows from duration
    metadata — the explode pattern a real video pipeline uses, minus decode."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)),
                           F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
