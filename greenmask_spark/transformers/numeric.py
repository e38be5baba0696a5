"""Numeric transformer family: Random{Int,Float,Numeric,Bool}, Noise{Int,Float,Numeric}.

Reference semantics:
- RandomInt  (internal/db/postgres/transformers/random_int.go:33-364):
  uniform int in [min,max]; min/max static, templated or dynamic; int2/4/8
  size-aware.
- RandomFloat (random_float.go:32-360): uniform in [min,max], rounded to
  ``decimal`` digits.
- RandomNumeric (random_numeric.go): arbitrary precision — we implement as
  DecimalType(38, s); >38 digits documented unsupported (SURVEY §7 known-hard).
- NoiseInt (noise_int.go:26-306, core generators/transformers/noise_int64.go:39-80):
  value ± value*U(min_ratio,max_ratio), sign from one generator bit, clamped
  to optional [min,max].
- NoiseFloat (noise_float.go:26-354): same + decimal rounding.
- RandomBool (random_bool.go:26-136).

All compile to pure Column expressions — no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from greenmask_spark.transformers.base import (
    BuildContext,
    Transformer,
    keep_null_guard,
    register,
)

_INT_BOUNDS = {
    "smallint": (-(1 << 15), (1 << 15) - 1),
    "integer": (-(1 << 31), (1 << 31) - 1),
    "bigint": (-(1 << 63), (1 << 63) - 1),
}


def _int_default_bounds(spark_type) -> tuple[int, int]:
    s = spark_type.simpleString()
    if s in ("smallint", "tinyint"):
        return _INT_BOUNDS["smallint"]
    if s in ("int", "integer"):
        return _INT_BOUNDS["integer"]
    return (-(1 << 31), (1 << 31) - 1)  # bigint column, PG-int4-safe default


@register
class RandomInt(Transformer):
    name = "RandomInt"
    allowed_types = ("int2", "int4", "int8")
    defaults = {"keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        dlo, dhi = _int_default_bounds(ctx.spark_type)
        lo = ctx.param_col("min", dlo).cast("bigint")
        hi = ctx.param_col("max", dhi).cast("bigint")
        out = ctx.engine.uniform_int(ctx.col(), lo, hi).cast(ctx.spark_type)
        return keep_null_guard(ctx.col(), out, ctx.params.get("keep_null", True))

    def validate_params(self, params, spark_type=None):
        from greenmask_spark.transformers.base import _INT_TYPE_BOUNDS

        w = []
        lo, hi = params.get("min"), params.get("max")
        nums = isinstance(lo, (int, float)) and isinstance(hi, (int, float))
        if nums and lo > hi:
            w.append(f"RandomInt: min ({lo}) is greater than max ({hi})")
        if spark_type is not None:
            tlo, thi = _INT_TYPE_BOUNDS.get(
                spark_type.simpleString(), (None, None))
            if tlo is not None:
                for name, v in (("min", lo), ("max", hi)):
                    if isinstance(v, (int, float)) and not tlo <= v <= thi:
                        w.append(
                            f"RandomInt: {name} ({v}) is out of range of "
                            f"{spark_type.simpleString()} [{tlo}, {thi}]")
        return w


@register
class RandomFloat(Transformer):
    name = "RandomFloat"
    allowed_types = ("float4", "float8", "numeric")
    defaults = {"min": 0.0, "max": 1.0, "decimal": 4, "keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        lo = ctx.param_col("min", 0.0).cast("double")
        hi = ctx.param_col("max", 1.0).cast("double")
        u = ctx.engine.uniform_double(ctx.col())
        out = F.round(lo + u * (hi - lo), int(ctx.params.get("decimal", 4)))
        out = out.cast(ctx.spark_type)
        return keep_null_guard(ctx.col(), out, ctx.params.get("keep_null", True))

    def validate_params(self, params, spark_type=None):
        lo, hi = params.get("min"), params.get("max")
        if (isinstance(lo, (int, float)) and isinstance(hi, (int, float))
                and lo > hi):
            return [f"RandomFloat: min ({lo}) is greater than max ({hi})"]
        return []


@register
class RandomNumeric(Transformer):
    name = "RandomNumeric"
    allowed_types = ("numeric",)
    defaults = {"min": 0, "max": 10**9, "decimal": 4, "keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        # Exact integer draw scaled down in decimal space: avoids double
        # rounding; precision beyond 38 digits is documented-unsupported.
        dec = int(ctx.params.get("decimal", 4))
        scale = 10**dec
        lo = (ctx.param_col("min", 0).cast("decimal(38,18)") * scale).cast("bigint")
        hi = (ctx.param_col("max", 10**9).cast("decimal(38,18)") * scale).cast("bigint")
        draw = ctx.engine.uniform_int(ctx.col(), lo, hi)
        out = (draw.cast(f"decimal(38,{dec})") / scale).cast(f"decimal(38,{dec})")
        return keep_null_guard(ctx.col(), out, ctx.params.get("keep_null", True))


@register
class RandomBool(Transformer):
    name = "RandomBool"
    allowed_types = ("bool",)
    defaults = {"keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        bit = ctx.engine.uniform_int(ctx.col(), F.lit(0), F.lit(1))
        return keep_null_guard(
            ctx.col(), (bit == 1), ctx.params.get("keep_null", True)
        )


def _noise_core(
    ctx: BuildContext, value: Column
) -> Column:
    """value ± value*U(min_ratio,max_ratio) with sign from an independent
    draw (reference: generators/transformers/noise_int64.go:56-80)."""
    minr = ctx.param_col("min_ratio", 0.0).cast("double")
    maxr = ctx.param_col("max_ratio", 0.1).cast("double")
    u = ctx.engine.uniform_double(ctx.col(), draw=0)
    sign_bit = ctx.engine.uniform_int(ctx.col(), F.lit(0), F.lit(1), draw=1)
    sign = F.when(sign_bit == 1, F.lit(1.0)).otherwise(F.lit(-1.0))
    ratio = minr + u * (maxr - minr)
    noised = value + value * ratio * sign
    lo, hi = ctx.params.get("min"), ctx.params.get("max")
    if lo is not None:
        noised = F.greatest(noised, ctx.param_col("min").cast("double"))
    if hi is not None:
        noised = F.least(noised, ctx.param_col("max").cast("double"))
    return noised


@register
class NoiseInt(Transformer):
    name = "NoiseInt"
    allowed_types = ("int2", "int4", "int8")
    defaults = {"min_ratio": 0.0, "max_ratio": 0.1, "keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        noised = _noise_core(ctx, ctx.col().cast("double"))
        out = F.round(noised, 0).cast(ctx.spark_type)
        return keep_null_guard(ctx.col(), out, ctx.params.get("keep_null", True))


@register
class NoiseFloat(Transformer):
    name = "NoiseFloat"
    allowed_types = ("float4", "float8")
    defaults = {"min_ratio": 0.0, "max_ratio": 0.1, "decimal": 4, "keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        noised = _noise_core(ctx, ctx.col().cast("double"))
        out = F.round(noised, int(ctx.params.get("decimal", 4))).cast(ctx.spark_type)
        return keep_null_guard(ctx.col(), out, ctx.params.get("keep_null", True))


@register
class NoiseNumeric(Transformer):
    name = "NoiseNumeric"
    allowed_types = ("numeric",)
    defaults = {"min_ratio": 0.0, "max_ratio": 0.1, "decimal": 4, "keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        """Noise in scaled-bigint space (never value-through-double):

        vs       = value · 10^S           (exact: decimal × int → bigint)
        noise    = floor(vs · ratio)      (double product of exact operands —
                                           bit-identical across engines)
        noised   = vs ± noise, clamped
        rescale  = half-up integer rounding S → dec digits
        out      = noised / 10^dec as DECIMAL(38,dec), exact division

        This keeps every rounding step an op shared verbatim with the
        DuckDB oracle twin — the r1 hash-parity failure was the old
        cast("double") path re-rounding differently on each side
        (reference core: generators/transformers/noise_numeric.go works in
        decimal space for the same reason).

        Domain bound: exactness holds for |value|·10^S < 2^63 (bigint) and
        |scaled| < 2^53 (the noise product and rescale divide pass through
        double by design — the SAME IEEE ops on both engines, so parity
        holds beyond the bound, but absolute rounding may drift from pure
        integer arithmetic there)."""
        from pyspark.sql import types as T

        dec = int(ctx.params.get("decimal", 4))
        src_scale = (
            ctx.spark_type.scale
            if isinstance(ctx.spark_type, T.DecimalType)
            else dec
        )
        s = max(src_scale, dec)
        minr = ctx.param_col("min_ratio", 0.0).cast("double")
        maxr = ctx.param_col("max_ratio", 0.1).cast("double")
        u = ctx.engine.uniform_double(ctx.col(), draw=0)
        sign_bit = ctx.engine.uniform_int(ctx.col(), F.lit(0), F.lit(1), draw=1)
        sign = F.when(sign_bit == 1, F.lit(1)).otherwise(F.lit(-1)).cast("bigint")
        ratio = minr + u * (maxr - minr)

        vs = (ctx.col() * F.lit(10**s)).cast("bigint")
        noise = F.floor(vs.cast("double") * ratio).cast("bigint")
        noised = vs + sign * noise
        if ctx.params.get("min") is not None:
            lo = (ctx.param_col("min").cast(f"decimal(38,{s})")
                  * F.lit(10**s)).cast("bigint")
            noised = F.greatest(noised, lo)
        if ctx.params.get("max") is not None:
            hi = (ctx.param_col("max").cast(f"decimal(38,{s})")
                  * F.lit(10**s)).cast("bigint")
            noised = F.least(noised, hi)
        if s > dec:
            div = 10 ** (s - dec)
            noised = F.floor((noised + F.lit(div // 2)) / F.lit(float(div))).cast(
                "bigint"
            )
        out = (noised.cast(f"decimal(38,{dec})") / F.lit(10**dec)).cast(
            f"decimal(38,{dec})"
        )
        return keep_null_guard(ctx.col(), out, ctx.params.get("keep_null", True))
