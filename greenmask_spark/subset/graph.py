"""FK graph model + SCC condensation for the subset engine.

Reference: internal/db/postgres/subset/graph.go —
- nodes are in-scope tables, one edge child→parent per FK (graph.go:25-38,
  70-178), plus config-defined virtual references
  (internal/domains/virtual_references.go) incl. polymorphic expressions;
- Kosaraju SCC (graph.go:251-296) and condensed DAG (graph.go:298-360);
- nullability propagation decides INNER vs LEFT joins (graph.go:556-571).

This is driver-side planning over table *metadata* (tiny N) — pure Python,
no Spark involvement until the planner emits DataFrame operations.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Reference:
    """child.fk_columns references parent.pk_columns.

    ``nullable``: any FK column is nullable → subset uses LEFT JOIN + the
    "FK IS NULL OR parent matched" integrity check instead of INNER.
    ``condition``: extra SQL predicate ANDed into the join (the reference's
    polymorphic_exprs, domains/virtual_references.go).
    """

    child: str
    parent: str
    fk_columns: tuple[str, ...]
    pk_columns: tuple[str, ...]
    nullable: bool = False
    condition: str | None = None


@dataclass
class FKGraph:
    tables: list[str]
    references: list[Reference] = field(default_factory=list)

    def parents_of(self, table: str) -> list[Reference]:
        return [r for r in self.references if r.child == table]

    def children_of(self, table: str) -> list[Reference]:
        return [r for r in self.references if r.parent == table]

    def adjacency(self) -> dict[str, list[str]]:
        adj: dict[str, list[str]] = {t: [] for t in self.tables}
        for r in self.references:
            if r.child in adj and r.parent in adj:
                adj[r.child].append(r.parent)
        return adj


def find_scc(adj: dict[str, list[str]]) -> list[list[str]]:
    """Kosaraju strongly-connected components (reference graph.go:251-296:
    forward DFS ordering + reverse-graph marking). Iterative to be safe on
    deep graphs."""
    order: list[str] = []
    seen: set[str] = set()
    for start in adj:
        if start in seen:
            continue
        stack: list[tuple[str, int]] = [(start, 0)]
        seen.add(start)
        while stack:
            node, i = stack.pop()
            targets = adj[node]
            if i < len(targets):
                stack.append((node, i + 1))
                nxt = targets[i]
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append((nxt, 0))
            else:
                order.append(node)

    radj: dict[str, list[str]] = {t: [] for t in adj}
    for u, vs in adj.items():
        for v in vs:
            radj[v].append(u)

    comp: dict[str, int] = {}
    comps: list[list[str]] = []
    for start in reversed(order):
        if start in comp:
            continue
        cid = len(comps)
        members = [start]
        comp[start] = cid
        stack2 = [start]
        while stack2:
            node = stack2.pop()
            for nxt in radj[node]:
                if nxt not in comp:
                    comp[nxt] = cid
                    members.append(nxt)
                    stack2.append(nxt)
        comps.append(sorted(members))
    return comps


def condense(
    graph: FKGraph,
) -> tuple[list[list[str]], dict[str, int], dict[int, set[int]]]:
    """Condensed DAG over SCCs (reference graph.go:298-360).

    Returns (components, table→component id, component adjacency
    child-comp → parent-comps)."""
    comps = find_scc(graph.adjacency())
    cid = {t: i for i, members in enumerate(comps) for t in members}
    cadj: dict[int, set[int]] = {i: set() for i in range(len(comps))}
    for r in graph.references:
        if r.child in cid and r.parent in cid and cid[r.child] != cid[r.parent]:
            cadj[cid[r.child]].add(cid[r.parent])
    return comps, cid, cadj


def topo_order(cadj: dict[int, set[int]]) -> list[int]:
    """Parents-first topological order of the condensed DAG (reference
    graph.go:620-652 — used for restore ordering)."""
    state: dict[int, int] = {}
    out: list[int] = []

    def visit(n: int):
        if state.get(n) == 2:
            return
        if state.get(n) == 1:
            raise ValueError("condensed graph has a cycle (bug)")
        state[n] = 1
        for p in sorted(cadj.get(n, ())):
            visit(p)
        state[n] = 2
        out.append(n)

    for n in sorted(cadj):
        visit(n)
    return out


def elementary_cycles(adj: dict[str, list[str]]) -> list[list[str]]:
    """All elementary cycles via DFS with recursion stack (reference
    subset/component.go:95-195), deterministic ordering. Intended for
    within-SCC use where components are small."""
    cycles: set[tuple[str, ...]] = set()
    nodes = sorted(adj)

    def dfs(start: str, node: str, path: list[str], on_path: set[str]):
        for nxt in sorted(adj.get(node, ())):
            if nxt == start and len(path) >= 1:
                # canonical rotation: start from min element
                cyc = path[:]
                m = cyc.index(min(cyc))
                cycles.add(tuple(cyc[m:] + cyc[:m]))
            elif nxt not in on_path and nxt >= start:
                path.append(nxt)
                on_path.add(nxt)
                dfs(start, nxt, path, on_path)
                on_path.discard(nxt)
                path.pop()

    for start in nodes:
        dfs(start, start, [start], {start})
    return sorted(list(c) for c in cycles)
