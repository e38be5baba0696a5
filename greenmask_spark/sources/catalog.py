"""Live database-catalog introspection → FKGraph / Manifest.

Reference: internal/db/postgres/context/pg_catalog.go:37,149 — the
reference plans from ``pg_catalog`` inside a repeatable-read snapshot
transaction: table inventory, column types/nullability, primary keys and
foreign keys all come from the live catalog, and the FK graph the subset
engine consumes is built from that.

Spark-first adaptation: Spark reads the DATA via its JDBC source
(``spark.read.format("jdbc")``) or from dump files, but the *planning
metadata* is tiny and driver-side — so this module introspects any
DB-API 2.0 connection (psycopg2, duckdb, sqlite3, a JayDeBeApi JDBC
bridge, …) and emits the exact same ``FKGraph`` / ``TableMeta``
structures the config path builds, making a live database and a config
file interchangeable planner inputs.

Dialects:

- ``ansi`` (default; PostgreSQL, DuckDB, anything with
  information_schema): constraint graph from ``table_constraints`` +
  ``key_column_usage`` + ``referential_constraints`` — the portable
  projection of what pg_catalog.go reads from pg_constraint.
- ``sqlite``: PRAGMA ``table_info`` / ``foreign_key_list`` (no
  information_schema).

FK-column order follows ``ordinal_position`` on both sides, so composite
keys align child↔parent positionally (pg_catalog confkey/conkey
semantics). ``nullable`` on a Reference is true when ANY FK column is
nullable — the property the subset planner uses to pick LEFT-join
integrity semantics (graph.go:556-571).
"""

from __future__ import annotations

from greenmask_spark.sources.manifest import TableMeta
from greenmask_spark.subset.graph import FKGraph, Reference, condense, topo_order


def _rows(conn, sql: str, params: tuple = ()) -> list[tuple]:
    cur = conn.cursor() if hasattr(conn, "cursor") else conn
    res = cur.execute(sql, params) if params else cur.execute(sql)
    # duckdb cursors return self from execute(); sqlite3 likewise
    return (res or cur).fetchall()


def _placeholder(conn) -> str:
    """The connection's DB-API paramstyle placeholder: psycopg2 is
    pyformat (%s) — sending qmark '?' to PostgreSQL is a syntax error —
    while duckdb/sqlite3 are qmark."""
    import importlib

    mod = type(conn).__module__.split(".")[0]
    try:
        style = getattr(importlib.import_module(mod), "paramstyle", "qmark")
    except Exception:
        style = "qmark"
    return "%s" if style in ("pyformat", "format") else "?"


def _introspect_ansi(conn, schema: str | None):
    ph = _placeholder(conn)
    # EVERY catalog view filters on the schema (and key maps key on
    # (schema, constraint)): constraint names are only unique per
    # schema, so an unfiltered key_column_usage merges same-named
    # constraints from other schemas into corrupted column lists.
    where = f"WHERE table_schema = {ph}" if schema else ""
    cwhere = f"WHERE constraint_schema = {ph}" if schema else ""
    p = (schema,) if schema else ()
    cols = _rows(conn, f"""
        SELECT table_schema, table_name, column_name, data_type,
               is_nullable, ordinal_position
        FROM information_schema.columns {where}
        ORDER BY table_schema, table_name, ordinal_position
    """, p)
    cons = _rows(conn, f"""
        SELECT constraint_schema, table_schema, table_name,
               constraint_name, constraint_type
        FROM information_schema.table_constraints {where}
    """, p)
    kcu = _rows(conn, f"""
        SELECT constraint_schema, constraint_name, table_schema,
               table_name, column_name, ordinal_position
        FROM information_schema.key_column_usage {where}
        ORDER BY constraint_schema, constraint_name, ordinal_position
    """, p)
    refs = _rows(conn, f"""
        SELECT constraint_schema, constraint_name,
               unique_constraint_schema, unique_constraint_name
        FROM information_schema.referential_constraints {cwhere}
    """, p)

    # EVERY map is (table_schema, table_name)-keyed: with schema=None
    # against a multi-schema database, same-named tables in different
    # schemas must neither merge their columns nor overwrite each
    # other's primary keys.
    by_table: dict[tuple[str, str], list[dict]] = {}
    nullable: dict[tuple[str, str, str], bool] = {}
    for ts, t, c, dt, isnull, _pos in cols:
        by_table.setdefault((ts, t), []).append(
            {"name": c, "type": str(dt).lower(), "nullable": isnull == "YES"}
        )
        nullable[(ts, t, c)] = isnull == "YES"

    # emitted table names: bare when the scope is a single schema (the
    # config-path / FKGraph convention), schema-qualified otherwise
    schemas = {ts for ts, _t in by_table}
    def disp(ts: str, t: str) -> str:
        return t if len(schemas) <= 1 else f"{ts}.{t}"

    kcu_cols: dict[tuple, list[tuple[str, str, str]]] = {}
    for cs, cname, ts, t, c, _pos in kcu:
        kcu_cols.setdefault((cs, cname), []).append((ts, t, c))

    pk: dict[tuple[str, str], list[str]] = {}
    con_table = {(cs, cname): (ts, t) for cs, ts, t, cname, _ in cons}
    for cs, ts, t, cname, ctype in cons:
        if ctype == "PRIMARY KEY":
            pk[(ts, t)] = [c for (_ts, _t, c) in kcu_cols.get((cs, cname), ())]

    references: list[Reference] = []
    for fk_schema, fk_name_only, uniq_schema, uniq_name_only in refs:
        fk_name = (fk_schema, fk_name_only)
        uniq_name = (uniq_schema, uniq_name_only)
        child_cols = kcu_cols.get(fk_name, [])
        parent_cols = kcu_cols.get(uniq_name, [])
        if not child_cols or not parent_cols:
            continue
        child = con_table.get(fk_name, child_cols[0][:2])
        parent = con_table.get(uniq_name, parent_cols[0][:2])
        fk = tuple(c for (_ts, _t, c) in child_cols)
        pkc = tuple(c for (_ts, _t, c) in parent_cols)
        references.append(Reference(
            child=disp(*child), parent=disp(*parent),
            fk_columns=fk, pk_columns=pkc,
            nullable=any(nullable.get((*child, c), False) for c in fk),
        ))
    tables = [
        TableMeta(name=disp(ts, t), columns=cs, primary_key=pk.get((ts, t), []))
        for (ts, t), cs in sorted(by_table.items())
    ]
    return tables, references


def _introspect_sqlite(conn):
    names = [r[0] for r in _rows(
        conn,
        "SELECT name FROM sqlite_master WHERE type = 'table' "
        "AND name NOT LIKE 'sqlite_%' ORDER BY name",
    )]
    tables: list[TableMeta] = []
    references: list[Reference] = []
    nullable: dict[tuple[str, str], bool] = {}
    for t in names:
        cols = []
        pkcols: list[tuple[int, str]] = []
        for _cid, name, ctype, notnull, _dflt, pk_ord in _rows(
            conn, f"PRAGMA table_info({t})"
        ):
            cols.append({"name": name, "type": str(ctype).lower(),
                         "nullable": not notnull})
            nullable[(t, name)] = not notnull
            if pk_ord:
                pkcols.append((pk_ord, name))
        tables.append(TableMeta(
            name=t, columns=cols,
            primary_key=[c for _, c in sorted(pkcols)],
        ))
    for t in names:
        groups: dict[int, list[tuple[int, str, str, str]]] = {}
        for (fk_id, seq, parent, frm, to, *_rest) in _rows(
            conn, f"PRAGMA foreign_key_list({t})"
        ):
            groups.setdefault(fk_id, []).append((seq, parent, frm, to))
        for _fk_id, rows in sorted(groups.items()):
            rows.sort()
            parent = rows[0][1]
            fk = tuple(frm for _s, _p, frm, _to in rows)
            pkc = tuple(to for _s, _p, _frm, to in rows)
            references.append(Reference(
                child=t, parent=parent, fk_columns=fk, pk_columns=pkc,
                nullable=any(nullable.get((t, c), False) for c in fk),
            ))
    return tables, references


def introspect_catalog(
    conn,
    schema: str | None = None,
    dialect: str = "ansi",
) -> tuple[list[TableMeta], list[Reference]]:
    """(tables, references) from a live DB-API connection's catalog."""
    if dialect == "sqlite":
        return _introspect_sqlite(conn)
    if dialect != "ansi":
        raise ValueError(f"unknown dialect {dialect!r}")
    return _introspect_ansi(conn, schema)


def fk_graph_from_catalog(
    conn, schema: str | None = None, dialect: str = "ansi",
    include: list[str] | None = None,
) -> FKGraph:
    """The planner input: same shape the config path builds. ``include``
    restricts to an in-scope table subset (references crossing the scope
    boundary drop, matching config-scope semantics)."""
    tables, references = introspect_catalog(conn, schema, dialect)
    names = [t.name for t in tables]
    if include is not None:
        scope = set(include)
        names = [n for n in names if n in scope]
        references = [
            r for r in references
            if r.child in scope and r.parent in scope
        ]
    return FKGraph(tables=names, references=references)


def manifest_tables_from_catalog(
    conn, schema: str | None = None, dialect: str = "ansi",
) -> tuple[list[TableMeta], list[dict], list[str]]:
    """Manifest building blocks: TableMeta list, reference dicts (the
    Manifest JSON shape) and the parents-first restore order."""
    tables, references = introspect_catalog(conn, schema, dialect)
    g = FKGraph(tables=[t.name for t in tables], references=references)
    components, _comp_of, cadj = condense(g)
    order = [t for ci in topo_order(cadj) for t in sorted(components[ci])]
    ref_dicts = [
        {
            "child": r.child, "parent": r.parent,
            "fk_columns": list(r.fk_columns),
            "pk_columns": list(r.pk_columns),
            "nullable": r.nullable,
        }
        for r in references
    ]
    return tables, ref_dicts, order
