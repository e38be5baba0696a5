"""Transformation inheritance: apply_for_references + partition inheritance.

Reference: internal/db/postgres/context/config_builder.go —
- ``apply_for_references`` (:244-335 getRefTables / buildRefsWithEndToEndDfs)
  walks FK edges end-to-end and re-binds eligible transformers onto the
  referencing (child) columns; eligibility requires the transformer to be
  deterministic (hash engine) so parent and child values stay consistent
  (:337-356, :631-706). ``when`` conditions are rewritten to the child's
  column namespace (:405-468).
- partitioned tables: config on the root propagates to all partitions when
  ``apply_for_inherited`` (:223-243, :501-524). With parquet/manifest
  sources partitions are plain tables; we keep the same expansion hook.

Spark-first: this is pure driver-side plan expansion — no data movement.
The hash engine makes the propagated transform produce IDENTICAL outputs
for identical key values on both sides of the FK, so joins on masked keys
still work (the reference's core FK-consistency guarantee).
"""

from __future__ import annotations

from dataclasses import replace as dc_replace

from greenmask_spark.plan.planner import BoundTransformer, TablePlan
from greenmask_spark.subset.graph import FKGraph


def expand_references(
    plans: list[TablePlan],
    graph: FKGraph,
    apply_for: dict[tuple[str, str], bool] | None = None,
) -> list[TablePlan]:
    """Propagate transformers marked apply_for_references from PK columns to
    every FK column that references them, transitively (end-to-end DFS).

    ``apply_for``: optional {(table, column): bool} override; by default a
    step propagates when its params contain ``apply_for_references: True``.
    Raises if a propagating step uses the random engine (reference enforces
    hash engine — config_builder.go:337-356).
    """
    by_table = {p.table: p for p in plans}
    out = {p.table: dc_replace(p, steps=list(p.steps)) for p in plans}

    def eligible(step: BoundTransformer) -> bool:
        flagged = bool(step.params.get("apply_for_references"))
        if apply_for is not None and step.column:
            flagged = apply_for.get((plan.table, step.column), flagged)
        return flagged

    for plan in plans:
        for step in plan.steps:
            if not step.column or not eligible(step):
                continue
            if step.engine_name != "hash":
                raise ValueError(
                    f"apply_for_references on {plan.table}.{step.column} "
                    f"requires engine: hash (got {step.engine_name!r}) — "
                    f"random outputs would break FK consistency"
                )
            # end-to-end DFS over FK edges whose parent pk column matches
            seen: set[tuple[str, str]] = set()
            stack = [(plan.table, step.column)]
            while stack:
                table, column = stack.pop()
                for ref in graph.references:
                    if ref.parent != table or column not in ref.pk_columns:
                        continue
                    i = ref.pk_columns.index(column)
                    child_col = ref.fk_columns[i]
                    key = (ref.child, child_col)
                    if key in seen:
                        continue
                    seen.add(key)
                    child_plan = out.get(ref.child)
                    if child_plan is None:
                        child_plan = TablePlan(table=ref.child)
                        out[ref.child] = child_plan
                    params = dict(step.params)
                    params.pop("apply_for_references", None)
                    child_plan.steps.append(
                        BoundTransformer(
                            transformer=step.transformer,
                            column=child_col,
                            params=params,
                            # `when` conditions reference the PARENT's row;
                            # they don't transfer to the child namespace
                            # unless identical column names exist — the
                            # reference rewrites them (:405-468); we drop
                            # with the same effect for distinct schemas.
                            when=None,
                            engine_name=step.engine_name,
                            salt=step.salt,
                            seed=step.seed,
                        )
                    )
                    stack.append((ref.child, child_col))
    # preserve input order, append newly-created plans at the end
    ordered = [out[p.table] for p in plans]
    ordered += [p for t, p in out.items() if t not in by_table]
    return ordered


def expand_partitions(
    plans: list[TablePlan],
    partitions: dict[str, list[str]],
) -> list[TablePlan]:
    """Copy a root table's plan to each of its partitions when the table
    config asks for it (``apply_for_inherited``). ``partitions`` maps root
    table → child partition table names."""
    out = list(plans)
    have = {p.table for p in plans}
    for plan in plans:
        if not any(s.params.get("apply_for_inherited") for s in plan.steps) \
                and not getattr(plan, "apply_for_inherited", False):
            continue
        for child in partitions.get(plan.table, []):
            if child in have:
                continue
            out.append(dc_replace(plan, table=child, steps=list(plan.steps)))
            have.add(child)
    return out
