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

import fnmatch
import re
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
    #: column → Spark DDL type, from config ``columns_type_override``
    #: (already resolved from PG type names by ``build_plan``)
    type_overrides: dict[str, str] = field(default_factory=dict)


def build_plan(
    config: dict[str, Any],
    registry: TransformerRegistry = DEFAULT_REGISTRY,
) -> list[TablePlan]:
    """Compile a greenmask-style config dict into table plans.

    Config shape (mirrors the reference YAML, internal/domains/config.go):
    ``{"tables": [{"name", "when", "subset_conds", "query", "transformers":
    [{"name", "params": {...}, "when", "engine"}]}]}``.
    """
    include = config.get("include_tables")
    exclude = config.get("exclude_tables", [])
    exclude_data = config.get("exclude_table_data", [])
    plans = []
    for tcfg in config.get("tables", []):
        name = tcfg["name"]
        # pg_dump-style table filters (reference:
        # internal/db/postgres/pgdump/pgdump.go:67-76,187-226) — glob
        # patterns; exclude wins over include.
        if include and not any(fnmatch.fnmatch(name, p) for p in include):
            continue
        if any(fnmatch.fnmatch(name, p) for p in exclude):
            continue
        plan = TablePlan(
            table=tcfg["name"],
            when=translate_expr_condition(tcfg.get("when")),
            subset_cond=" AND ".join(tcfg.get("subset_conds", [])) or None,
            query=tcfg.get("query"),
            limit=tcfg.get("rows_limit"),
            type_overrides={
                c: resolve_type_override(t)
                for c, t in (tcfg.get("columns_type_override") or {}).items()
            },
        )
        if any(fnmatch.fnmatch(name, p) for p in exclude_data):
            # --exclude-table-data: table stays in the plan (schema/manifest)
            # but dumps zero rows
            plan.limit = 0
        for step in tcfg.get("transformers", []):
            t = registry.get(step["name"])
            params = {**t.defaults, **step.get("params", {})}
            params = _render_static_template_params(params)
            plan.steps.append(
                BoundTransformer(
                    transformer=t,
                    column=params.pop("column", None),
                    params=params,
                    when=translate_expr_condition(step.get("when")),
                    engine_name=step.get("engine", "hash"),
                    salt=step.get("salt"),
                    seed=step.get("seed"),
                )
            )
        plans.append(plan)
    return plans


#: parameter names the reference marks SupportTemplate — static Go-template
#: rendering at parameter-scan time (pkg/toolkit/static_parameter.go:98-123;
#: the SetSupportTemplate(true) definitions across
#: internal/db/postgres/transformers/*.go). NOT a free-for-all: params
#: whose VALUE is itself template/program text (Template's `template`,
#: Cmd's executable args, RegexpReplace's regexp) must never pre-render.
STATIC_TEMPLATE_PARAMS = {
    "min", "max", "min_ratio", "max_ratio", "decimal", "value", "subnet",
    "min_length", "max_length", "min_unit", "max_unit", "truncate", "unit",
    "gender_mapping", "fallback_gender", "symbols",
}


def _render_static_template_params(params: dict) -> dict:
    """Render ``{{ ... }}`` parameter values once at plan build
    (parameters_templating.md: e.g. RandomDate
    ``min: "{{ EncodeValue(tsModify('-30 years', now())) }}"``)."""
    if not any(
        k in STATIC_TEMPLATE_PARAMS and isinstance(v, str) and "{{" in v
        for k, v in params.items()
    ):
        return params
    from greenmask_spark.transformers.template import render_static_param

    return {
        k: render_static_param(v)
        if k in STATIC_TEMPLATE_PARAMS and isinstance(v, str) and "{{" in v
        else v
        for k, v in params.items()
    }


#: PostgreSQL type name → Spark DDL type, for ``columns_type_override``
#: configs ported verbatim from reference YAML (reference:
#: internal/domains/config.go:171 ColumnsTypeOverride;
#: internal/db/postgres/context/config_builder.go:582-598 rebinds the
#: column's driver type so every later tier — conditions, transformer
#: parameter decoding, sinks — sees the overridden type). Spark DDL type
#: strings are also accepted as-is, so native configs need no PG names.
_PG_TO_SPARK_TYPE = {
    "int2": "smallint", "smallint": "smallint",
    "int4": "int", "int": "int", "integer": "int",
    "int8": "bigint", "bigint": "bigint",
    "float4": "float", "real": "float",
    "float8": "double", "double precision": "double",
    "numeric": "decimal(38,9)", "decimal": "decimal(38,9)",
    "money": "decimal(19,2)",
    "text": "string", "varchar": "string", "character varying": "string",
    "bpchar": "string", "char": "string", "character": "string",
    "name": "string", "uuid": "string", "json": "string",
    "jsonb": "string", "xml": "string", "cidr": "string",
    "inet": "string", "macaddr": "string", "macaddr8": "string",
    "bool": "boolean", "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp", "timestamptz": "timestamp",
    "timestamp without time zone": "timestamp",
    "timestamp with time zone": "timestamp",
    "time": "string", "timetz": "string",
    "interval": "interval day to second",
    "bytea": "binary",
}

#: width rank for the narrowing-cast validation warning (higher holds more)
_NUMERIC_RANK = {
    "smallint": 1, "int": 2, "bigint": 3, "float": 2, "double": 3,
}


def resolve_type_override(target: str) -> str:
    """Resolve a ``columns_type_override`` target type to a Spark DDL type.

    Accepts PG type names (``int4``, ``timestamptz``, ``varchar(30)``,
    ``numeric(10,2)``) and Spark DDL types verbatim. Unknown targets raise
    ``ValueError`` at plan build — the reference resolves the name against
    the pgtype map at schema build (config_builder.go:589-595), so a typo
    fails before any data moves, not mid-dump.
    """
    t = target.strip().lower()
    if t in _PG_TO_SPARK_TYPE:
        return _PG_TO_SPARK_TYPE[t]
    m = re.fullmatch(r"(numeric|decimal)\s*\((\d+)\s*(?:,\s*(\d+))?\)", t)
    if m:
        return f"decimal({m.group(2)},{m.group(3) or 0})"
    m = re.fullmatch(r"(varchar|character varying|char|bpchar|character)"
                     r"\s*\(\d+\)", t)
    if m:
        return "string"
    # Spark DDL type? Validate by parsing; without an active session fall
    # back to a primitive whitelist (complex types are accepted and left
    # to cast() to reject at apply time).
    err = ValueError(
        f"columns_type_override: unknown target type {target!r} "
        f"(expected a PostgreSQL type name or a Spark DDL type)")
    try:
        from pyspark.sql.types import _parse_datatype_string

        _parse_datatype_string(t)
        return t
    except ValueError:
        raise
    except Exception as e:
        if "ParseException" in type(e).__name__ or "PARSE" in str(e).upper():
            raise err from None
    if t in {"tinyint", "byte", "long", "short", "timestamp_ntz", "void",
             "interval year to month"} or re.match(r"(array|map|struct)<", t):
        return t
    raise err


def _apply_type_overrides(df: DataFrame, plan: TablePlan) -> DataFrame:
    """Cast overridden columns in ONE projection before the transformer
    chain, so conditions and transformers see the overridden type — the
    Spark twin of the reference's driver-type rebind (config_builder.go:
    582-598 + pkg/toolkit/column.go:58-62 OverrideType). Uses ``try_cast``
    (ANSI-safe): out-of-range / unparseable values become NULL with a
    narrowing warning, rather than failing the whole dump mid-flight; the
    DuckDB oracle twin is ``TRY_CAST``. Also warns on override keys naming
    columns the table doesn't have.
    """
    import warnings

    fields = {f.name: f.dataType for f in df.schema.fields}
    casts: dict[str, Column] = {}
    for c, target in plan.type_overrides.items():
        if c not in fields:
            warnings.warn(
                f"columns_type_override: table {plan.table!r} has no "
                f"column {c!r}; override ignored", stacklevel=3)
            continue
        src = fields[c].simpleString()
        tgt = target.split("(")[0]
        narrowing = (
            (src in _NUMERIC_RANK and tgt in _NUMERIC_RANK
             and _NUMERIC_RANK[tgt] < _NUMERIC_RANK[src])
            or (src == "string" and tgt != "string")
            or (src == "double" and tgt == "float")
            or (src in ("double", "float") and tgt in
                ("smallint", "int", "bigint"))
            or (src.startswith("decimal") and tgt in
                ("smallint", "int", "bigint", "float"))
        )
        if narrowing:
            warnings.warn(
                f"columns_type_override: {plan.table}.{c} {src} → {target} "
                f"is a narrowing cast; out-of-range or unparseable values "
                f"become NULL", stacklevel=3)
        casts[c] = F.col(c).try_cast(target).alias(c)
    if not casts:
        return df
    return df.select(*[casts.get(c, F.col(c)) for c in df.columns])


def _fold_conds(*conds: Column | None) -> Column | None:
    """AND together the non-None when-conditions (table-level ∧ step-level)
    — the single definition of how guards combine, shared by the
    column-expression and table-level (mapInPandas) paths."""
    cond = None
    for c in conds:
        if c is not None:
            cond = c if cond is None else (cond & c)
    return cond


def _guard(original: Column, transformed: Column,
           *conds: Column | None) -> Column:
    cond = _fold_conds(*conds)
    if cond is None:
        return transformed
    return F.when(cond, transformed).otherwise(original)


def translate_expr_condition(cond: str | None) -> str | None:
    """Reference condition dialect → Spark SQL, for configs ported
    verbatim.

    The reference's ``when`` uses expr-lang
    (docs/built_in_transformers/transformation_condition.md;
    pkg/toolkit/expr.go:116-172): ``record.col`` / ``raw_record.col``
    namespaces, ``== null`` / ``!= null`` null tests, ``&&``/``||``
    boolean operators. Our native dialect is Spark SQL; this shim
    triggers ONLY when a condition uses the record namespaces (a native
    Spark condition may legitimately use ``||`` as concat — it is never
    touched). Rewrites, outside string literals:

    - ``record.c`` / ``raw_record.c`` → ``c`` (Spark columns are typed;
      the raw/decoded duality collapses, same as the template tier);
    - ``x == null`` → ``x IS NULL``; ``x != null`` → ``x IS NOT NULL``;
    - ``&&`` → ``AND``; ``||`` → ``OR``.

    NOT translated (rewrite by hand in Spark SQL): expr-lang pipe
    syntax and stdlib calls (``record.j | jsonGet("a") == 1`` →
    ``get_json_object(j, '$.a') = 1``; ``record.id | has([1,2])`` →
    ``id IN (1, 2)``) — a full expr-lang front end is not worth its
    weight when Spark SQL is strictly more expressive here.
    """
    if not cond or "record." not in cond:
        return cond
    parts = re.split(r"('(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\")", cond)
    out = []
    for i, p in enumerate(parts):
        if i % 2 == 1:  # quoted literal — untouched
            out.append(p)
            continue
        p = re.sub(r"\braw_record\.", "", p)
        p = re.sub(r"\brecord\.", "", p)
        p = re.sub(r"==\s*null\b", " IS NULL", p)
        p = re.sub(r"!=\s*null\b", " IS NOT NULL", p)
        p = p.replace("&&", " AND ").replace("||", " OR ")
        out.append(re.sub(r"  +", " ", p))
    return "".join(out)


#: helper column holding the table-level ``when`` verdict, computed ONCE
#: against the ORIGINAL record before any transformer runs (reference:
#: dumpers/transformation_pipeline.go:165-175) — so mid-chain flushes can
#: never leak transformed values into the table condition.
_TABLE_WHEN = "__gm_table_when__"
#: row-skip flag materialized for table-level (mapInPandas) steps whose
#: combined when-condition is false/null for a row
_SKIP = "__gm_skip__"
#: per-column stash prefix used to restore skipped rows after a
#: table-level step (its Python stage cannot express F.when itself)
_STASH = "__gm_orig__"


def _step_reads(step: BoundTransformer,
                df_columns: list[str]) -> set[str]:
    """Columns a step READS beyond its target: dynamic params
    ({"column": ...} anywhere in the param tree), multi-column member
    inputs, and identifiers in ``when`` conditions. Used to decide when a
    fused projection must flush so this step sees prior steps' outputs
    (reference applies transformers sequentially over the record —
    dumpers/transformation_pipeline.go:130-145)."""
    reads: set[str] = set()

    def scan(obj):
        if isinstance(obj, dict):
            c = obj.get("column")
            if isinstance(c, str):
                reads.add(c)
            for v in obj.values():
                scan(v)
        elif isinstance(obj, (list, tuple)):
            for v in obj:
                scan(v)

    scan(step.params)
    if step.is_multi_column:
        reads.update(
            c["name"] if isinstance(c, dict) else c
            for c in step.params.get("columns", [])
        )
    colset = set(df_columns)
    if step.when:
        for tok in re.findall(r"[A-Za-z_][A-Za-z_0-9]*", step.when):
            if tok in colset:
                reads.add(tok)
    return reads


def apply_plan(df: DataFrame, plan: TablePlan) -> DataFrame:
    """Execute a table plan. Consecutive expression steps fuse into single
    projections; table-level steps (Template/Cmd) break the chain."""
    # size hint attached by load_tables (file bytes of the scan) —
    # captured BEFORE any transformation below replaces ``df`` with a
    # derived frame that no longer carries the attribute
    scan_bytes = getattr(df, "_graft_scan_bytes", None)
    if plan.query:
        # Custom per-table SQL override replaces the plain scan (reference:
        # entries/table.go:150-152 — COPY (<query>) TO STDOUT). The input
        # DataFrame is registered under the table name so the override can
        # reference it; Catalyst still pushes filters/pruning into the scan.
        df.createOrReplaceTempView(plan.table)
        df = df.sparkSession.sql(plan.query)
    if plan.subset_cond:
        df = df.filter(plan.subset_cond)
    if plan.limit is not None:
        df = df.limit(plan.limit)
    if plan.type_overrides:
        # after subset/limit (reference subset conds run in the DB against
        # original types) but before ``when``/transformers (the condition
        # language and transformer decode see the overridden type —
        # config_builder.go:582, record decode via Column.GetType)
        df = _apply_type_overrides(df, plan)
    if plan.when:
        df = df.withColumn(_TABLE_WHEN, F.expr(plan.when))
    table_cond = F.col(_TABLE_WHEN) if plan.when else None

    # the masking chain below is per-row-heavy (sha256 draws, regex
    # rewrites, template evaluation) — spread an under-parallel input
    # across the session's cores before paying it (guide §2: one
    # adaptive exchange repays itself above heavy per-row compute;
    # no-op at scale where the scan already yields >= cores splits).
    # AFTER limit/subset handling on purpose: a spread below a LIMIT
    # could change which rows survive it. The raised floor is
    # chain-specific: masking expressions cost ~µs/row, so below ~1 MB
    # of input the one-core pass beats the exchange round-trip
    # (measured: mask_customer 0.48 s unspread vs 0.70+ spread on a
    # 300 KB table, while orders-sized inputs keep a ~2x win).
    # NOT under a custom SQL override or a LIMIT: the spread key
    # (monotonically_increasing_id) is deterministic only over a
    # deterministic-order input — arbitrary plan.query SQL (joins,
    # aggregates) and LIMIT row selection don't pin in-partition row
    # order across task retries, the SPARK-38388 duplication/loss
    # hazard; filters/projections over the scan DO preserve scan
    # order, so subset/when/type-override plans keep the spread.
    # ``scan_bytes`` (file size attached by load_tables) makes the
    # under-floor decision py4j-free — the per-call stats() analysis
    # pass was the largest cost of the light masking chains locally.
    from greenmask_spark.session import spread_input

    if plan.query is None and plan.limit is None:
        df = spread_input(df, min_bytes=1 << 20, input_bytes=scan_bytes)

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
        if not step.is_table_level and pending and (
            _step_reads(step, df.columns) & set(pending)
        ):
            # this step READS a column with a pending transform — flush so
            # it sees that step's output, not the original value
            df = flush(df)
        if step.is_table_level:
            df = flush(df)
            # Table-level steps honor when-conditions too (reference
            # transformation_pipeline.go skips the transformer per record):
            # materialize a skip flag + stash the visible columns, run the
            # mapInPandas step, then restore stashed values on skipped
            # rows. Internal columns (helper/skip/stash) are hidden from
            # the transformer via ctx.df_columns so they never leak into a
            # Cmd subprocess record or a template environment.
            step_cond = F.expr(step.when) if step.when else None
            guard = _fold_conds(table_cond, step_cond)
            internal = {_TABLE_WHEN}
            if guard is not None:
                df = df.withColumn(_SKIP, ~F.coalesce(guard, F.lit(False)))
                internal.add(_SKIP)
            visible = [c for c in df.columns if c not in internal]
            # stash only the columns the step can WRITE (its target /
            # declared columns; all visible if undeclared) — the stash is
            # the type-exact restore for skipped rows, and keeping it
            # narrow avoids doubling the Arrow payload of wide tables
            writable = []
            if guard is not None:
                if step.column:
                    writable = [step.column]
                else:
                    writable = [
                        c["name"] if isinstance(c, dict) else c
                        for c in step.params.get("columns", [])
                    ] or list(visible)
                df = df.select(
                    "*", *[F.col(c).alias(_STASH + c) for c in writable]
                )
            ctx = BuildContext(
                column=step.column or "",
                spark_type=(
                    df.schema[step.column].dataType if step.column else None
                ),
                params=step.params,
                engine=engine,
                df_columns=visible,
                skip_col=_SKIP if guard is not None else None,
            )
            df = step.transformer.apply(df, ctx)
            if guard is not None:
                keep = [c for c in df.columns
                        if c != _SKIP and not c.startswith(_STASH)]
                df = df.select(*[
                    F.when(F.col(_SKIP), F.col(_STASH + c))
                    .otherwise(F.col(c)).alias(c)
                    if c in writable else F.col(c)
                    for c in keep
                ])
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
            step_cond = F.expr(step.when) if step.when else None
            for cname, expr in exprs.items():
                base = pending.get(cname, F.col(cname))
                # re-target: expressions reference original columns; chain by
                # flushing if the column was already pending
                if cname in pending:
                    df = flush(df)
                    base = F.col(cname)
                pending[cname] = _guard(base, expr, table_cond, step_cond)
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
        step_cond = F.expr(step.when) if step.when else None
        pending[cname] = _guard(F.col(cname), expr, table_cond, step_cond)

    out = flush(df)
    if plan.when:
        out = out.drop(_TABLE_WHEN)
    return out


def apply_plans(
    tables: dict[str, DataFrame], plans: list[TablePlan]
) -> dict[str, DataFrame]:
    out = dict(tables)
    for plan in plans:
        if plan.table not in out:
            raise KeyError(f"plan references unknown table {plan.table!r}")
        out[plan.table] = apply_plan(out[plan.table], plan)
    return out
