"""Template / TemplateRecord transformers.

Reference: internal/db/postgres/transformers/template.go:28-146 and
template_record.go:28-140 — Go templates with a function map
(pkg/toolkit/template_functions.go:71-199) rendering a cell (Template) or
mutating the whole record (TemplateRecord).

Dialect decision (SURVEY §7 known-hard #3): we do NOT emulate Go template
syntax. Templates are Jinja2 when available, else Python ``str.format``
maps; parity is by behavior on documented examples, not syntax. Both are
the pandas-UDF tier (Arrow-batched row materialization), mirroring the
reference which renders per row anyway.

Template context: ``record`` = dict of the row's typed values (the
reference's ``.GetValue``/``.GetRawValue`` duality collapses — Spark
columns are typed).
"""

from __future__ import annotations

import hashlib
import math
import random as _random
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from greenmask_spark.transformers.base import BuildContext, Transformer, register

try:
    import jinja2

    _JINJA = jinja2.Environment(undefined=jinja2.StrictUndefined)
except Exception:  # pragma: no cover - jinja2 not in container
    _JINJA = None


def template_functions() -> dict[str, Any]:
    """Analog of the reference FuncMap (template_functions.go:71-199)."""
    return {
        "masking": lambda s: "*" * len(s) if s else s,
        "truncateDate": lambda part, dt: dt.replace(
            **{
                "year": dict(month=1, day=1, hour=0, minute=0, second=0, microsecond=0),
                "month": dict(day=1, hour=0, minute=0, second=0, microsecond=0),
                "day": dict(hour=0, minute=0, second=0, microsecond=0),
                "hour": dict(minute=0, second=0, microsecond=0),
                "minute": dict(second=0, microsecond=0),
                "second": dict(microsecond=0),
            }[part]
        ),
        "sha256": lambda s: hashlib.sha256(str(s).encode()).hexdigest(),
        "md5": lambda s: hashlib.md5(str(s).encode()).hexdigest(),
        "randomInt": lambda lo, hi: _random.randint(lo, hi),
        "randomFloat": lambda lo, hi: _random.uniform(lo, hi),
        "roundFloat": lambda x, n: round(x, n),
        "abs": abs,
        "ceil": math.ceil,
        "floor": math.floor,
        "upper": lambda s: s.upper(),
        "lower": lambda s: s.lower(),
        "isNull": lambda v: v is None,
        "isNotNull": lambda v: v is not None,
        "coalesce": lambda *vs: next((v for v in vs if v is not None), None),
    }


def compile_template(tpl: str):
    """Compile once (plan time / per executor), render per row. Compiling in
    ``render_template`` per row costs ~10× the render itself."""
    if _JINJA is not None:
        t = _JINJA.from_string(tpl)
        funcs = template_functions()
        return lambda record, **kw: t.render(record=record, **funcs, **kw)
    # fallback mini-dialect: '{col}' substitution only
    return lambda record, **kw: tpl.format(
        **{k: ("" if v is None else v) for k, v in record.items()}
    )


def render_template(tpl: str, record: dict[str, Any]) -> Any:
    return compile_template(tpl)(record)


@register
class Template(Transformer):
    """Single-column template; context sees the whole row."""

    name = "Template"
    allowed_types = ("any",)
    defaults = {"keep_null": False}
    table_level = True  # needs full-row context

    def apply(self, df: DataFrame, ctx: BuildContext) -> DataFrame:
        tpl = ctx.params["template"]
        target = ctx.column
        target_type = ctx.spark_type
        cols = df.columns

        def _render(it):
            render = compile_template(tpl)
            for pdf in it:
                rendered = [
                    render(dict(zip(cols, row)))
                    for row in pdf[cols].itertuples(index=False, name=None)
                ]
                pdf[target] = pd.Series(rendered, index=pdf.index).astype(object)
                yield pdf

        schema = df.schema
        out = df.mapInPandas(_render, schema=_with_string(schema, target))
        return out.withColumn(target, F.col(target).cast(target_type))


@register
class TemplateRecord(Transformer):
    """Whole-record template mutation: the template returns nothing; it sets
    columns via the ``set`` callable (reference: TemplateRecord exposes
    record setters — template_record.go:28-140)."""

    name = "TemplateRecord"
    allowed_types = ("any",)
    defaults = {}
    table_level = True

    def apply(self, df: DataFrame, ctx: BuildContext) -> DataFrame:
        tpl = ctx.params["template"]
        affected: list[str] = ctx.params.get("columns") or []
        cols = df.columns
        schema = df.schema

        def _render(it):
            render = compile_template(tpl)
            for pdf in it:
                new_rows = []
                for row in pdf[cols].itertuples(index=False, name=None):
                    rec = dict(zip(cols, row))
                    updates: dict[str, Any] = {}

                    def _set(k, v, _u=updates):
                        _u[k] = v
                        return ""

                    render(rec, set=_set)
                    rec.update(updates)
                    new_rows.append(rec)
                yield pd.DataFrame(new_rows, columns=cols)

        _ = affected
        return df.mapInPandas(_render, schema=schema)

    def build(self, ctx: BuildContext) -> Column:  # pragma: no cover
        raise TypeError("TemplateRecord is table-level; use apply()")


def _with_string(schema, target):
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField(f.name, T.StringType() if f.name == target else f.dataType,
                          True)
            for f in schema.fields
        ]
    )
