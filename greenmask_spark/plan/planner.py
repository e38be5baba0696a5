"""Config → plan → execution.

Reference pipeline (internal/db/postgres/context/config_builder.go:56-140):
per table, resolve transformer definitions from the registry, validate
parameters, compile ``when`` conditions, expand partition / FK-reference
inheritance; the result (entries.Table with TransformersContext) is the
logical plan.

Spark-first: a ``TablePlan`` is an ordered list of bound transformers;
``apply_plan`` folds them into ONE ``df.select`` whenever every step is a
pure Column expression (so a whole transformer chain compiles to a single
projection inside whole-stage codegen — zero extra passes over data), and
only breaks the chain where a table-level (mapInPandas) transformer sits.

``when`` semantics (reference dumpers/transformation_pipeline.go:132-175):
a false table-level condition skips ALL transformers for that record; a
false transformer-level condition skips that transformer. Both become
``F.when(cond, transformed).otherwise(original)`` — declarative, no
branching in Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from greenmask_spark.engines.kernel import make_engine
from greenmask_spark.transformers.base import (
    DEFAULT_REGISTRY,
    BuildContext,
    Transformer,
    TransformerRegistry,
)


@dataclass
class BoundTransformer:
    transformer: Transformer
    column: str | None          # None for table-level multi-column ops
    params: dict[str, Any]
    when: str | None = None     # SQL boolean expression over row columns
    engine_name: str = "hash"
    salt: str | None = None
    seed: int | None = None

    @property
    def is_table_level(self) -> bool:
        return getattr(self.transformer, "table_level", False)

    @property
    def is_multi_column(self) -> bool:
        return getattr(self.transformer, "multi_column", False)


@dataclass
class TablePlan:
    table: str
    steps: list[BoundTransformer] = field(default_factory=list)
    when: str | None = None          # table-level condition
    subset_cond: str | None = None   # raw filter ANDed into the scan
    query: str | None = None         # full custom SQL override
    limit: int | None = None         # validate-mode rows_limit


def build_plan(
    config: dict[str, Any],
    registry: TransformerRegistry = DEFAULT_REGISTRY,
) -> list[TablePlan]:
    """Compile a greenmask-style config dict into table plans.

    Config shape (mirrors the reference YAML, internal/domains/config.go):
    ``{"tables": [{"name", "when", "subset_conds", "query", "transformers":
    [{"name", "params": {...}, "when", "engine"}]}]}``.
    """
    plans = []
    for tcfg in config.get("tables", []):
        plan = TablePlan(
            table=tcfg["name"],
            when=tcfg.get("when"),
            subset_cond=" AND ".join(tcfg.get("subset_conds", [])) or None,
            query=tcfg.get("query"),
            limit=tcfg.get("rows_limit"),
        )
        for step in tcfg.get("transformers", []):
            t = registry.get(step["name"])
            params = {**t.defaults, **step.get("params", {})}
            plan.steps.append(
                BoundTransformer(
                    transformer=t,
                    column=params.pop("column", None),
                    params=params,
                    when=step.get("when"),
                    engine_name=step.get("engine", "hash"),
                    salt=step.get("salt"),
                    seed=step.get("seed"),
                )
            )
        plans.append(plan)
    return plans


def _guard(original: Column, transformed: Column, *whens: str | None) -> Column:
    cond = None
    for w in whens:
        if w:
            c = F.expr(w)
            cond = c if cond is None else (cond & c)
    if cond is None:
        return transformed
    return F.when(cond, transformed).otherwise(original)


def apply_plan(df: DataFrame, plan: TablePlan) -> DataFrame:
    """Execute a table plan. Consecutive expression steps fuse into single
    projections; table-level steps (Template/Cmd) break the chain."""
    if plan.subset_cond:
        df = df.filter(plan.subset_cond)
    if plan.limit is not None:
        df = df.limit(plan.limit)

    pending: dict[str, Column] = {}

    def flush(cur: DataFrame) -> DataFrame:
        nonlocal pending
        if not pending:
            return cur
        out = cur.select(
            *[pending.pop(c, F.col(c)).alias(c) for c in cur.columns]
        )
        pending = {}
        return out

    for step in plan.steps:
        engine = make_engine(step.engine_name, salt=step.salt, seed=step.seed)
        if step.is_table_level:
            df = flush(df)
            ctx = BuildContext(
                column=step.column or "",
                spark_type=(
                    df.schema[step.column].dataType if step.column else None
                ),
                params=step.params,
                engine=engine,
                df_columns=df.columns,
            )
            df = step.transformer.apply(df, ctx)
            continue

        if step.is_multi_column:
            any_col = step.params["columns"][0]["name"]
            ctx = BuildContext(
                column=any_col,
                spark_type=df.schema[any_col].dataType,
                params=step.params,
                engine=engine,
                df_columns=df.columns,
            )
            exprs = step.transformer.build_multi(ctx)
            for cname, expr in exprs.items():
                base = pending.get(cname, F.col(cname))
                # re-target: expressions reference original columns; chain by
                # flushing if the column was already pending
                if cname in pending:
                    df = flush(df)
                    base = F.col(cname)
                pending[cname] = _guard(base, expr, plan.when, step.when)
            continue

        cname = step.column
        if cname is None:
            raise ValueError(
                f"transformer {step.transformer.name} needs params.column"
            )
        if cname in pending:
            # chained transform on same column: flush so this step sees the
            # previous step's output (reference applies transformers in order)
            df = flush(df)
        ctx = BuildContext(
            column=cname,
            spark_type=df.schema[cname].dataType,
            params=step.params,
            engine=engine,
            df_columns=df.columns,
        )
        expr = step.transformer.build(ctx)
        pending[cname] = _guard(F.col(cname), expr, plan.when, step.when)

    return flush(df)


def apply_plans(
    tables: dict[str, DataFrame], plans: list[TablePlan]
) -> dict[str, DataFrame]:
    out = dict(tables)
    for plan in plans:
        if plan.table not in out:
            raise KeyError(f"plan references unknown table {plan.table!r}")
        out[plan.table] = apply_plan(out[plan.table], plan)
    return out
