"""Subset planner: referentially-intact slices as DataFrame join plans.

Reference semantics (internal/db/postgres/subset/):
- tables with ``subset_conds`` are filtered by them (query.go:102-111);
- every other table keeps the rows that remain referentially intact:
  a child row survives iff each FK either points at a surviving parent row
  or (nullable FK) is NULL — the LEFT-join + "fk IS NULL OR matched"
  integrity check (graph.go:556-571, query.go);
- restriction propagates parent→child transitively (scope DFS,
  graph.go:216-248);
- cyclic components use recursive queries (graph.go:396-520); in Spark we
  run a deflationary fixpoint: repeatedly drop rows whose FK target was
  dropped, until stable — with localCheckpoint to cut lineage (no
  recursive CTE in Spark).

Scale notes: the propagated join payload is (pk columns) only — we
semi-join children against parent *key projections*, never full parent
rows, so the shuffle carries keys. Parent key sets that fit the broadcast
threshold auto-broadcast under AQE.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from greenmask_spark.subset.graph import FKGraph, Reference, condense, topo_order


@dataclass
class SubsetPlanner:
    graph: FKGraph
    conditions: dict[str, str] = field(default_factory=dict)
    checkpoint_every: int = 5
    max_iterations: int = 100

    def restricted_tables(self) -> set[str]:
        """Tables whose content the subset restricts: conditioned tables
        plus all FK descendants (transitively)."""
        out = set(self.conditions)
        changed = True
        while changed:
            changed = False
            for r in self.graph.references:
                if r.parent in out and r.child not in out:
                    out.add(r.child)
                    changed = True
        return out

    # -- join helpers -------------------------------------------------------

    @staticmethod
    def _integrity_filter(
        child: DataFrame, parent: DataFrame, ref: Reference
    ) -> DataFrame:
        """Keep child rows referentially intact w.r.t. the (already
        filtered) parent. Key-projection semi-join, not a full-row join.

        ``ref.condition`` is a polymorphic/virtual-reference discriminator
        (reference: domains/virtual_references.go, polymorphic_exprs in
        subset/query.go:37-42): rows NOT of this polymorphic type are
        unconstrained by the edge — the reference's integrity check is
        ``fk IS NULL OR pk IS NOT NULL OR NOT (poly_exprs)``
        (graph.go:993-1001). The condition must be child-side evaluable.
        Rows where the condition is NULL are CONSTRAINED like matching
        rows: in the reference predicate ``NOT (poly)`` contributes NULL,
        so survival reduces to ``fk IS NULL OR pk IS NOT NULL`` — which is
        why the join must NOT re-AND the condition (a NULL discriminator
        would nullify the join predicate and drop FK-matched rows the
        reference keeps)."""
        rest = None
        if ref.condition:
            rest = child.filter(F.expr(f"NOT ({ref.condition})"))
            child = child.filter(F.expr(f"({ref.condition}) IS NOT FALSE"))
        # NO .distinct() here: pk_columns are the parent's key (unique by
        # construction), left_semi semantics don't require a deduped build
        # side, and broadcast HashedRelations dedup keys anyway — a
        # distinct would add a full shuffle + aggregate per FK edge for
        # nothing (measured: one Exchange per edge at sf0.1).
        pkeys = parent.select(
            *[F.col(c).alias(f"__pk_{i}") for i, c in enumerate(ref.pk_columns)]
        )
        cond = None
        for i, fk in enumerate(ref.fk_columns):
            c = child[fk] == pkeys[f"__pk_{i}"]
            cond = c if cond is None else (cond & c)
        if not ref.nullable:
            kept = child.join(pkeys, cond, "left_semi")
            return kept if rest is None else kept.unionByName(rest)
        # nullable: survive when any FK col is NULL or the parent matched
        null_any = None
        for fk in ref.fk_columns:
            c = child[fk].isNull()
            null_any = c if null_any is None else (null_any | c)
        matched = child.join(pkeys, cond, "left_semi")
        kept = child.filter(null_any).unionByName(matched)
        return kept if rest is None else kept.unionByName(rest)

    # -- main entry ---------------------------------------------------------

    def plan(self, tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
        comps, cid, cadj = condense(self.graph)
        order = topo_order(cadj)  # parents-first
        restricted = self.restricted_tables()
        out: dict[str, DataFrame] = dict(tables)

        for comp_id in order:
            members = comps[comp_id]
            if not any(t in restricted or t in self.conditions for t in members):
                continue
            if len(members) == 1 and not self._self_refs(members[0]):
                t = members[0]
                df = out[t]
                if t in self.conditions:
                    df = df.filter(self.conditions[t])
                for ref in self.graph.parents_of(t):
                    if ref.parent == t:
                        continue
                    if ref.parent in restricted:
                        df = self._integrity_filter(df, out[ref.parent], ref)
                out[t] = df
            else:
                self._fixpoint_component(members, out, restricted)
        return out

    def _self_refs(self, table: str) -> list[Reference]:
        return [
            r for r in self.graph.references
            if r.child == table and r.parent == table
        ]

    def _fixpoint_component(
        self,
        members: list[str],
        out: dict[str, DataFrame],
        restricted: set[str],
    ) -> None:
        """Cyclic component: seed with local conditions + external parent
        integrity, then deflate until FK-closed (reference's recursive CTE
        'valid path' semantics re-expressed as a fixpoint)."""
        # seed: own conditions + integrity vs parents OUTSIDE the component
        for t in members:
            df = out[t]
            if t in self.conditions:
                df = df.filter(self.conditions[t])
            for ref in self.graph.parents_of(t):
                if ref.parent in members:
                    continue
                if ref.parent in restricted:
                    df = self._integrity_filter(df, out[ref.parent], ref)
            out[t] = df

        internal_refs = [
            r
            for r in self.graph.references
            if r.child in members and r.parent in members
        ]

        # Iterate on KEY PROJECTIONS, not full rows: a row's survival is a
        # function of its FK values only, and its effect on others is its PK
        # values only — so the fixpoint runs over (pk ∪ fk) columns. Each
        # iteration is eagerly checkpointed: the per-iteration cost stays
        # O(|keys|) instead of re-executing an ever-growing join lineage
        # (the O(k²) trap of naive loop-unrolled plans).
        proj_cols: dict[str, list[str]] = {}
        for t in members:
            cols: set[str] = set()
            for r in internal_refs:
                if r.parent == t:
                    cols.update(r.pk_columns)
                if r.child == t:
                    cols.update(r.fk_columns)
            proj_cols[t] = sorted(cols)

        keys = {
            t: out[t].select(*proj_cols[t]).localCheckpoint(eager=True)
            for t in members
        }
        counts = {t: keys[t].count() for t in members}

        for _ in range(self.max_iterations):
            new_keys = {}
            changed = False
            for t in members:
                df = keys[t]
                for ref in internal_refs:
                    if ref.child != t:
                        continue
                    df = self._integrity_filter(df, keys[ref.parent], ref)
                df = df.localCheckpoint(eager=True)
                n = df.count()
                if n != counts[t]:
                    changed = True
                counts[t] = n
                new_keys[t] = df
            keys = new_keys
            if not changed:
                break

        # final pass: one integrity semi-join of the full seed rows against
        # the converged parent key sets
        for t in members:
            df = out[t]
            for ref in internal_refs:
                if ref.child != t:
                    continue
                df = self._integrity_filter(df, keys[ref.parent], ref)
            out[t] = df
