"""Json transformer: ordered set/delete ops over JSON document columns.

Reference: internal/db/postgres/transformers/json.go:43-240 — ops are
``[{operation: set|delete, path, value | value_template, error_not_exist}]``
with gjson/sjson path syntax.

Spark-first: JSON columns are strings; generic path surgery needs document
materialization, so this is the pandas-UDF tier (Arrow-batched — the
reference pays a full parse per row too). Paths support dotted keys and
numeric array indices ('a.b.0.c'), covering the documented examples.
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from greenmask_spark.transformers.base import (
    BuildContext,
    Transformer,
    keep_null_guard,
    register,
)


def _split_path(path: str) -> list[str]:
    return path.split(".")


def _apply_set(doc: Any, keys: list[str], value: Any, error_not_exist: bool) -> Any:
    node = doc
    for i, k in enumerate(keys[:-1]):
        idx: Any = int(k) if k.lstrip("-").isdigit() and isinstance(node, list) else k
        try:
            nxt = node[idx]
        except (KeyError, IndexError, TypeError):
            if error_not_exist:
                raise KeyError(f"path segment {k!r} not found")
            if isinstance(node, dict):
                node[idx] = {}
                nxt = node[idx]
            else:
                return doc
        node = nxt
    last = keys[-1]
    idx = int(last) if last.lstrip("-").isdigit() and isinstance(node, list) else last
    try:
        node[idx] = value
    except (IndexError, TypeError):
        if error_not_exist:
            raise KeyError(f"path segment {last!r} not settable")
    return doc


def _apply_delete(doc: Any, keys: list[str], error_not_exist: bool) -> Any:
    node = doc
    for k in keys[:-1]:
        idx: Any = int(k) if k.lstrip("-").isdigit() and isinstance(node, list) else k
        try:
            node = node[idx]
        except (KeyError, IndexError, TypeError):
            if error_not_exist:
                raise KeyError(f"path segment {k!r} not found")
            return doc
    last = keys[-1]
    idx = int(last) if last.lstrip("-").isdigit() and isinstance(node, list) else last
    try:
        del node[idx]
    except (KeyError, IndexError, TypeError):
        if error_not_exist:
            raise KeyError(f"path {last!r} not found")
    return doc


@register
class Json(Transformer):
    name = "Json"
    allowed_types = ("json", "jsonb")
    defaults = {"keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        ops: list[dict] = ctx.params["operations"]
        for op in ops:
            if op.get("operation") not in ("set", "delete"):
                raise ValueError(f"Json: bad operation {op.get('operation')!r}")

        @pandas_udf("string")
        def _json_ops(s: pd.Series) -> pd.Series:
            def one(txt):
                if txt is None:
                    return None
                doc = json.loads(txt)
                for op in ops:
                    keys = _split_path(op["path"])
                    err = bool(op.get("error_not_exist"))
                    if op["operation"] == "set":
                        doc = _apply_set(doc, keys, op.get("value"), err)
                    else:
                        doc = _apply_delete(doc, keys, err)
                return json.dumps(doc, separators=(",", ":"))

            return s.map(one)

        out = _json_ops(ctx.col().cast("string")).cast(ctx.spark_type)
        return keep_null_guard(ctx.col(), out, ctx.params.get("keep_null", True))
