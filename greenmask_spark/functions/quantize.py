"""Embedding quantization: float32 vectors → int8 + per-vector scale.

At 100 TB of embeddings, int8 scalar quantization cuts vector storage
and shuffle width 4× (and ANN candidate scoring reads 4× fewer bytes)
at a recall cost that is negligible for coarse stages like IVF routing
and LSH bucketing. Symmetric per-vector max-abs scheme — the layout
FAISS/ScaNN-style pipelines use for the re-rank tier.

Pure Column expressions (transform / aggregate HOFs): scan+project, no
shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _max_abs(vec: Column) -> Column:
    return F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))),
    )


def quantize_vec(vec: Column, scale: Column | None = None) -> Column:
    """array<float> → struct(q: array<tinyint>, scale: double).

    q_i = round(v_i / scale · 127) clamped to [-127, 127]; scale is the
    vector's max-abs (zero vectors quantize to zeros with scale 0).

    Pass a pre-computed ``scale`` column when quantizing a DataFrame —
    an inline aggregate referenced inside the transform() lambda
    re-evaluates the whole max-abs fold per element (O(dim²) per row;
    ``quantize_embeddings`` stages it for you)."""
    amax = _max_abs(vec) if scale is None else scale
    q = F.transform(
        vec,
        lambda v: F.when(amax == 0.0, F.lit(0)).otherwise(
            F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.round(v.cast("double") / amax * 127.0, 0).cast("int"),
                ),
            )
        ).cast("tinyint"),
    )
    return F.struct(q.alias("q"), amax.alias("scale"))


def dequantize_vec(qstruct: Column) -> Column:
    """struct(q, scale) → array<double> (v̂_i = q_i · scale / 127)."""
    scale = qstruct["scale"]
    return F.transform(
        qstruct["q"], lambda q: q.cast("double") * scale / 127.0
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "qvec"
) -> DataFrame:
    """Add a quantized column; drop the float column to realize the 4×
    storage cut (callers keep it by selecting both).

    The max-abs scale stages in its own projection so the per-element
    lambda reads a column (one fold per row), not an inline aggregate
    (one fold per element)."""
    staged = df.withColumn("__scale", _max_abs(F.col(vec_col)))
    return (
        staged.withColumn(
            out_col, quantize_vec(F.col(vec_col), scale=F.col("__scale"))
        )
        .drop(vec_col, "__scale")
    )
