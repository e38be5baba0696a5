"""Transformer base classes + registry.

Reference model: transformers are registered in a global registry
(internal/db/postgres/transformers/utils/registry.go:23, 30 MustRegister
call sites → 51 named transformers), each declaring parameter definitions
with allowed column types, dynamic-mode support and defaults
(pkg/toolkit/parameter_definition.go:128-248).

Spark-first re-expression: a transformer is a *Column-expression builder*.
``build(ctx)`` returns the replacement expression for the target column;
the planner composes it with ``when`` conditions and ``keep_null`` and the
whole table becomes one ``df.select`` — fully inside Catalyst/codegen.

Dynamic parameters (pkg/toolkit/dynamic_parameter.go:97-160) collapse
naturally: a parameter bound to another column is just ``F.col(other)``
instead of ``F.lit(v)`` inside the same expression.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class BuildContext:
    """Everything a transformer needs to emit its expression."""

    column: str                       # target column name
    spark_type: T.DataType            # target column's Spark type
    params: dict[str, Any]            # static params (already defaulted)
    engine: Any                       # HashEngine | RandomEngine
    df_columns: list[str] = field(default_factory=list)
    #: boolean column marking rows a when-condition EXCLUDES: table-level
    #: transformers must pass those rows through untouched and must not
    #: expose them to subprocesses / template environments
    skip_col: str | None = None

    def col(self) -> Column:
        return F.col(self.column)

    def param_col(self, name: str, default: Any = None) -> Column:
        """Resolve a possibly-dynamic parameter to a Column.

        ``{"column": "x", "cast_to": fn}`` → column reference (dynamic mode);
        anything else → literal.
        """
        v = self.params.get(name, default)
        return resolve_param(v)


def resolve_param(v: Any) -> Column:
    """Dynamic-parameter resolution (pkg/toolkit/dynamic_parameter.go:97-160):

    ``{"column": ...}`` plus optional modes, applied in the reference's
    order:

    - ``default_value``: used when the source cell is NULL (the template /
      cast never see the NULL — reference checks rawValue == nil first);
    - ``template``: per-row transformation of the raw value before use
      (pandas-UDF tier — arbitrary template code is not a Column);
    - ``cast_to``: one of the 28 CAST_FUNCTIONS helpers.

    Anything that is not a dynamic dict resolves to a literal.
    """
    if isinstance(v, Column):
        return v
    if isinstance(v, dict) and "column" in v:
        src = F.col(v["column"])
        c = src
        if "template" in v:
            c = _render_param_template(c, v["template"])
        cast_to = v.get("cast_to")
        if cast_to:
            c = CAST_FUNCTIONS[cast_to](c)
        if "default_value" in v:
            dv = F.lit(v["default_value"])
            if cast_to:
                # the default bypasses template/cast (dynamic_parameter.go
                # Value(): usedDefaultValue skips both) but IS decoded to
                # the parameter's expected type (getValue) — run it through
                # the same cast helper so the when/otherwise branches agree
                # in type; otherwise a string default against a cast-to-int
                # branch coerces the WHOLE parameter to string
                dv = CAST_FUNCTIONS[cast_to](dv.cast("string"))
            c = F.when(src.isNull(), dv).otherwise(c)
        return c
    return F.lit(v)


def _render_param_template(c: Column, tpl: str) -> Column:
    """Per-row templated dynamic parameter: the template sees the source
    cell as ``value`` and renders the parameter's effective value.
    Arrow-batched pandas UDF (compile once per executor, render per row) —
    the slow tier, reserved for templates; plain column/cast dynamic params
    stay pure expressions inside codegen."""
    from pyspark.sql.functions import pandas_udf

    def render(s):  # s: pd.Series -> pd.Series (hints omitted: this module's
        # `from __future__ import annotations` would stringify them, which
        # PySpark's hint-based dispatch rejects)
        import pandas as pd

        from greenmask_spark.transformers.template import compile_template

        fn = compile_template(tpl)

        def one(x):
            if x is None:
                return None
            try:
                if pd.isna(x):
                    return None
            except (TypeError, ValueError):
                pass  # non-scalar cells (arrays) are never "na"
            return str(fn({}, value=x))

        return s.map(one)

    return pandas_udf(render, "string")(c)


def exact_floor_div(c: Column, divisor: int) -> Column:
    """Exact FLOOR division for epoch magnitudes (> 2^53, where double
    `/` rounds): decimal division keeps ≥6 fractional digits and
    ``floor`` matches time semantics for pre-epoch values (Go
    ``time.Unix()`` floors; a toward-zero truncation would shift negative
    epochs with sub-unit fractions by one unit)."""
    return F.floor(c.cast("decimal(38,0)") / F.lit(divisor)).cast("bigint")


#: backwards-compat alias (old name implied nano-only use)
_nano_idiv = exact_floor_div


def _unix_to_micros(c: Column, unit: str) -> Column:
    if unit == "sec":
        return c.cast("bigint") * F.lit(1_000_000)
    if unit == "milli":
        return c.cast("bigint") * F.lit(1000)
    if unit == "micro":
        return c.cast("bigint")
    return _nano_idiv(c.cast("bigint"), 1000)  # nano


def _micros_from_ts(c: Column, unit: str) -> Column:
    us = F.unix_micros(c.cast("timestamp"))
    if unit == "sec":
        return _nano_idiv(us, 1_000_000)
    if unit == "milli":
        return _nano_idiv(us, 1000)
    if unit == "micro":
        return us
    return us * F.lit(1000)  # nano


def _unix_time_casts() -> dict[str, Callable[[Column], Column]]:
    """The 24 Unix{Nano,Micro,Milli,Sec}↔{Date,Timestamp,TimestampTz}
    helpers (pkg/toolkit/type_caster_static_funtions.go:18-44). Spark's
    TimestampType is session-tz-aware, so the Tz variants share the
    timestamp implementation (documented PG→Spark type-collapse,
    SURVEY §1.4)."""
    out: dict[str, Callable[[Column], Column]] = {}
    for unit_name, unit in (("Nano", "nano"), ("Micro", "micro"),
                            ("Milli", "milli"), ("Sec", "sec")):
        def to_ts(c, u=unit):
            return F.timestamp_micros(_unix_to_micros(c, u))

        def to_date(c, u=unit):
            return F.to_date(F.timestamp_micros(_unix_to_micros(c, u)))

        def from_ts(c, u=unit):
            return _micros_from_ts(c, u)

        out[f"Unix{unit_name}ToDate"] = to_date
        out[f"Unix{unit_name}ToTimestamp"] = to_ts
        out[f"Unix{unit_name}ToTimestampTz"] = to_ts
        out[f"DateToUnix{unit_name}"] = from_ts
        out[f"TimestampToUnix{unit_name}"] = from_ts
        out[f"TimestampTzToUnix{unit_name}"] = from_ts
    return out


#: Cast helpers for dynamic params — all 28 of the reference's
#: CastFunctionsMap (pkg/toolkit/type_caster_static_funtions.go:46-…):
#: 24 unix↔time makers + IntToBool/BoolToInt/CastFloatToInt/CastIntToFloat,
#: plus a few string convenience casts (free in Spark).
CAST_FUNCTIONS: dict[str, Callable[[Column], Column]] = {
    **_unix_time_casts(),
    "IntToBool": lambda c: c.cast("bigint") != 0,
    "BoolToInt": lambda c: c.cast("boolean").cast("int"),
    "CastFloatToInt": lambda c: F.round(c.cast("double"), 0).cast("bigint"),
    "CastIntToFloat": lambda c: c.cast("double"),
    "IntToString": lambda c: c.cast("string"),
    "StringToInt": lambda c: c.cast("bigint"),
    "FloatToString": lambda c: c.cast("string"),
    "StringToFloat": lambda c: c.cast("double"),
    "DateToTimestamp": lambda c: c.cast("timestamp"),
    "TimestampToDate": lambda c: F.to_date(c),
}


class Transformer:
    """Base class. Subclasses set ``name``, ``allowed_types``, ``defaults``."""

    name: str = ""
    #: canonical PG type families this transformer accepts (validation only)
    allowed_types: tuple[str, ...] = ()
    defaults: dict[str, Any] = {}
    #: whether the expression is per-row pure (hash engine deterministic)
    supports_hash_engine: bool = True

    def build(self, ctx: BuildContext) -> Column:  # pragma: no cover
        raise NotImplementedError

    def validate_params(
        self, params: dict[str, Any], spark_type: T.DataType | None = None
    ) -> list[str]:
        """Return a list of warning strings (reference:
        pkg/toolkit/validation_warning.go); ``spark_type`` is the target
        column's type when known (for range/encode checks)."""
        return []


def can_encode(value: Any, spark_type: T.DataType | None) -> bool:
    """Static encode-check: can ``value`` round-trip into the column type?
    (reference: replace.go / random_choice.go ``validate`` parameter runs
    the PG text-format encoder against the declared column type)."""
    if value is None or spark_type is None:
        return True
    s = spark_type.simpleString()
    try:
        if s in ("tinyint", "smallint", "int", "integer", "bigint"):
            int(value)
        elif s in ("float", "double") or s.startswith("decimal"):
            float(value)
        elif s == "boolean":
            if not isinstance(value, bool) and str(value).lower() not in (
                "true", "false", "t", "f", "0", "1"
            ):
                return False
        elif s in ("date", "timestamp", "timestamp_ntz"):
            import datetime

            if not isinstance(value, (datetime.date, datetime.datetime)):
                datetime.datetime.fromisoformat(str(value))
        return True
    except (ValueError, TypeError):
        return False


_INT_TYPE_BOUNDS = {
    "smallint": (-(1 << 15), (1 << 15) - 1),
    "tinyint": (-(1 << 7), (1 << 7) - 1),
    "int": (-(1 << 31), (1 << 31) - 1),
    "integer": (-(1 << 31), (1 << 31) - 1),
    "bigint": (-(1 << 63), (1 << 63) - 1),
}


class TransformerRegistry:
    def __init__(self):
        self._by_name: dict[str, Transformer] = {}

    def register(self, t: Transformer) -> Transformer:
        if t.name in self._by_name:
            raise ValueError(f"transformer {t.name!r} already registered")
        self._by_name[t.name] = t
        return t

    def get(self, name: str) -> Transformer:
        try:
            return self._by_name[name]
        except KeyError:
            raise KeyError(
                f"unknown transformer {name!r}; known: {sorted(self._by_name)}"
            ) from None

    def names(self) -> list[str]:
        return sorted(self._by_name)

    def __contains__(self, name: str) -> bool:
        return name in self._by_name


#: The default registry, mirroring utils.DefaultTransformerRegistry.
DEFAULT_REGISTRY = TransformerRegistry()


def register(cls):
    """Class decorator: instantiate + register in the default registry."""
    DEFAULT_REGISTRY.register(cls())
    return cls


def keep_null_guard(original: Column, transformed: Column, keep_null: bool) -> Column:
    """NULL handling: the reference's ``keep_null`` leaves NULL cells as-is
    (e.g. internal/db/postgres/transformers/replace.go:25-266)."""
    if keep_null:
        return F.when(original.isNull(), original).otherwise(transformed)
    return transformed
