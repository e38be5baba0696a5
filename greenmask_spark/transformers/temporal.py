"""Temporal transformers: RandomDate, RandomUnixTimestamp, NoiseDate.

Reference semantics:
- RandomDate (internal/db/postgres/transformers/random_date.go:28-283):
  uniform timestamp in [min,max] with a ``truncate`` part
  (year|month|day|hour|minute|second|millisecond|microsecond).
- RandomUnixTimestamp (random_unix_timestamp.go:22-263): like RandomDate
  over epoch numbers with min_unit/max_unit/unit in {sec,milli,micro,nano}.
- NoiseDate (noise_date.go:31-368, core generators/transformers/
  noise_timestamp.go): value ± U(min_ratio,max_ratio) of a max interval,
  with truncate part.

All pure Column expressions over epoch-millis arithmetic.
"""

from __future__ import annotations

from datetime import date, datetime, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

from greenmask_spark.transformers.base import (
    BuildContext,
    Transformer,
    keep_null_guard,
    register,
)

_TRUNC_MAP = {
    "year": "year",
    "month": "month",
    "day": "day",
    "hour": "hour",
    "minute": "minute",
    "second": "second",
}

_UNIT_TO_MS = {"sec": 1000, "milli": 1, "micro": 0.001, "nano": 0.000001}
_MS_FROM_UNIT = {"sec": 0.001, "milli": 1, "micro": 1000, "nano": 1000000}


def _to_epoch_ms(v, default: str) -> Column:
    """Parse a static min/max param (str/date/datetime/Column-dict) to epoch ms."""
    from greenmask_spark.transformers.base import resolve_param

    if v is None:
        v = default
    if isinstance(v, dict) and "column" in v:
        return F.unix_millis(resolve_param(v).cast("timestamp"))
    if isinstance(v, (int, float)):
        return F.lit(int(v))
    if isinstance(v, str):
        v = datetime.fromisoformat(v)
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        return F.lit(int(v.timestamp() * 1000))
    if isinstance(v, date):
        dt = datetime(v.year, v.month, v.day, tzinfo=timezone.utc)
        return F.lit(int(dt.timestamp() * 1000))
    return F.unix_millis(resolve_param(v).cast("timestamp"))


def _truncate(ts: Column, part: str | None) -> Column:
    if not part:
        return ts
    part = part.lower()
    if part in _TRUNC_MAP:
        return F.date_trunc(_TRUNC_MAP[part], ts)
    if part in ("millisecond", "microsecond"):
        return ts  # already ms-resolution; microsecond is identity here
    raise ValueError(f"unknown truncate part {part!r}")


@register
class RandomDate(Transformer):
    name = "RandomDate"
    allowed_types = ("date", "timestamp", "timestamptz")
    defaults = {"min": "2000-01-01", "max": "2030-01-01", "keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        lo = _to_epoch_ms(ctx.params.get("min"), "2000-01-01")
        hi = _to_epoch_ms(ctx.params.get("max"), "2030-01-01")
        ms = ctx.engine.uniform_int(ctx.col(), lo, hi)
        ts = _truncate(F.timestamp_millis(ms), ctx.params.get("truncate"))
        out = ts.cast(ctx.spark_type)
        return keep_null_guard(ctx.col(), out, ctx.params.get("keep_null", True))


@register
class RandomUnixTimestamp(Transformer):
    name = "RandomUnixTimestamp"
    allowed_types = ("int4", "int8")
    defaults = {"min_unit": "sec", "max_unit": "sec", "unit": "sec", "keep_null": True}

    @staticmethod
    def _idiv(col: Column, divisor: int) -> Column:
        """Exact floor division (shared helper — see base.exact_floor_div):
        decimal-space division for epoch magnitudes where double ``/``
        rounds, floor semantics so pre-epoch values convert like Go
        ``time.Unix()``."""
        from greenmask_spark.transformers.base import exact_floor_div

        return exact_floor_div(col, divisor)

    @classmethod
    def _to_ms(cls, col: Column, unit: str) -> Column:
        """Exact integer conversion unit → milliseconds (never via double:
        ns epochs overflow the double mantissa)."""
        if unit == "sec":
            return col * F.lit(1000)
        if unit == "milli":
            return col
        if unit == "micro":
            return cls._idiv(col, 1000)
        if unit == "nano":
            return cls._idiv(col, 1000000)
        raise ValueError(f"unknown unit {unit!r}")

    @classmethod
    def _from_ms(cls, ms: Column, unit: str) -> Column:
        if unit == "sec":
            return cls._idiv(ms, 1000)
        if unit == "milli":
            return ms
        if unit == "micro":
            return ms * F.lit(1000)
        if unit == "nano":
            return ms * F.lit(1000000)
        raise ValueError(f"unknown unit {unit!r}")

    def build(self, ctx: BuildContext) -> Column:
        p = ctx.params
        lo_ms = self._to_ms(
            ctx.param_col("min", 0).cast("bigint"), p.get("min_unit", "sec")
        )
        hi_ms = self._to_ms(
            ctx.param_col("max", 4102444800).cast("bigint"), p.get("max_unit", "sec")
        )
        ms = ctx.engine.uniform_int(ctx.col(), lo_ms, hi_ms)
        out = self._from_ms(ms, p.get("unit", "sec")).cast(ctx.spark_type)
        return keep_null_guard(ctx.col(), out, p.get("keep_null", True))


@register
class NoiseDate(Transformer):
    name = "NoiseDate"
    allowed_types = ("date", "timestamp", "timestamptz")
    defaults = {"max_interval": "P30D", "keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        p = ctx.params
        max_sec = _interval_to_seconds(p.get("max_interval", "P30D"))
        min_sec = _interval_to_seconds(p.get("min_interval", "PT0S"))
        u = ctx.engine.uniform_double(ctx.col(), draw=0)
        sign_bit = ctx.engine.uniform_int(ctx.col(), F.lit(0), F.lit(1), draw=1)
        sign = F.when(sign_bit == 1, F.lit(1)).otherwise(F.lit(-1))
        offset_ms = (
            F.lit(min_sec * 1000)
            + (u * F.lit((max_sec - min_sec) * 1000))
        ).cast("bigint") * sign
        base_ms = F.unix_millis(ctx.col().cast("timestamp"))
        ts = _truncate(F.timestamp_millis(base_ms + offset_ms), p.get("truncate"))
        out = ts.cast(ctx.spark_type)
        return keep_null_guard(ctx.col(), out, p.get("keep_null", True))


def _interval_to_seconds(s) -> int:
    """Parse a subset of ISO-8601 / PG-style intervals to whole seconds.

    The reference uses PG interval strings (noise_date.go); we accept
    ISO-8601 durations (P1DT2H), plain '<n> days/hours/...' and bare ints.
    """
    if isinstance(s, (int, float)):
        return int(s)
    s = s.strip()
    if s.upper().startswith("P"):
        import re

        m = re.fullmatch(
            r"P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)D)?"
            r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?",
            s.upper(),
        )
        if not m:
            raise ValueError(f"bad interval {s!r}")
        y, mo, d, h, mi, sec = (float(g) if g else 0.0 for g in m.groups())
        return int(y * 31557600 + mo * 2629800 + d * 86400 + h * 3600 + mi * 60 + sec)
    import re

    m = re.fullmatch(r"(\d+)\s*(year|month|day|hour|minute|second)s?", s.lower())
    if not m:
        raise ValueError(f"bad interval {s!r}")
    n, unit = int(m.group(1)), m.group(2)
    mult = {
        "year": 31557600,
        "month": 2629800,
        "day": 86400,
        "hour": 3600,
        "minute": 60,
        "second": 1,
    }[unit]
    return n * mult
