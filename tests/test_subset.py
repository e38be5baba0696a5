"""Subset engine tests: SCC/cycle algorithms on synthetic graphs (model:
reference subset/component_test.go) + join-plan semantics vs hand-computed
and DuckDB-oracle expectations."""

import duckdb
import pytest
from pyspark.sql import Row

from greenmask_spark.subset import FKGraph, Reference, SubsetPlanner
from greenmask_spark.subset.graph import condense, elementary_cycles, find_scc, topo_order


def test_scc_simple_dag():
    adj = {"a": ["b"], "b": ["c"], "c": []}
    comps = find_scc(adj)
    assert sorted(map(tuple, comps)) == [("a",), ("b",), ("c",)]


def test_scc_cycle_detected():
    adj = {"a": ["b"], "b": ["c"], "c": ["a"], "d": ["a"]}
    comps = find_scc(adj)
    assert ["a", "b", "c"] in comps and ["d"] in comps


def test_condense_and_topo():
    g = FKGraph(
        tables=["a", "b", "c", "d"],
        references=[
            Reference("b", "a", ("x",), ("id",)),
            Reference("c", "b", ("x",), ("id",)),
            Reference("c", "a", ("y",), ("id",)),
            Reference("d", "d", ("p",), ("id",)),
        ],
    )
    comps, cid, cadj = condense(g)
    order = topo_order(cadj)
    pos = {m: order.index(cid[m]) for m in "abcd"}
    assert pos["a"] < pos["b"] < pos["c"]


def test_elementary_cycles():
    adj = {"a": ["b"], "b": ["a", "c"], "c": ["a"]}
    cycles = elementary_cycles(adj)
    assert ["a", "b"] in cycles
    assert ["a", "b", "c"] in cycles


@pytest.fixture(scope="module")
def org(spark):
    """departments ← employees (nullable dept), employees.manager_id →
    employees.id (self-cycle)."""
    depts = spark.createDataFrame(
        [Row(id=1, name="eng", active=True), Row(id=2, name="ops", active=False)]
    )
    emps = spark.createDataFrame(
        [
            Row(id=10, dept_id=1, manager_id=None),
            Row(id=11, dept_id=1, manager_id=10),
            Row(id=12, dept_id=2, manager_id=11),
            Row(id=13, dept_id=None, manager_id=12),
            Row(id=14, dept_id=2, manager_id=99),  # dangling manager
        ]
    )
    return {"departments": depts, "employees": emps}


def test_subset_inner_semantics(org):
    g = FKGraph(
        tables=["departments", "employees"],
        references=[
            Reference("employees", "departments", ("dept_id",), ("id",),
                      nullable=False)
        ],
    )
    planner = SubsetPlanner(g, conditions={"departments": "active = true"})
    out = planner.plan(org)
    assert {r.id for r in out["departments"].collect()} == {1}
    # non-nullable FK: dept must survive; NULL dept row dropped too
    assert {r.id for r in out["employees"].collect()} == {10, 11}


def test_subset_nullable_left_semantics(org):
    g = FKGraph(
        tables=["departments", "employees"],
        references=[
            Reference("employees", "departments", ("dept_id",), ("id",),
                      nullable=True)
        ],
    )
    planner = SubsetPlanner(g, conditions={"departments": "active = true"})
    out = planner.plan(org)
    # nullable FK: NULL dept row (13) survives
    assert {r.id for r in out["employees"].collect()} == {10, 11, 13}


def test_subset_self_referencing_cycle_fixpoint(org):
    g = FKGraph(
        tables=["employees"],
        references=[
            Reference("employees", "employees", ("manager_id",), ("id",),
                      nullable=True)
        ],
    )
    planner = SubsetPlanner(g, conditions={"employees": "id <= 12"})
    out = planner.plan({"employees": org["employees"]})
    # 14 dropped by cond? no — id<=12 drops 13,14; manager chains intact:
    # 10 (null mgr), 11→10, 12→11 all survive
    assert {r.id for r in out["employees"].collect()} == {10, 11, 12}


def test_subset_cycle_cascading_removal(spark):
    """Dropping a row must cascade through the managers chain."""
    emps = spark.createDataFrame(
        [
            Row(id=1, manager_id=None),
            Row(id=2, manager_id=1),
            Row(id=3, manager_id=2),
            Row(id=4, manager_id=3),
        ]
    )
    g = FKGraph(
        tables=["employees"],
        references=[
            Reference("employees", "employees", ("manager_id",), ("id",),
                      nullable=False)
        ],
    )
    # cond removes the root (manager NULL is banned by non-nullable FK
    # once 1 is gone nothing can survive except... everything cascades)
    planner = SubsetPlanner(g, conditions={"employees": "id >= 2"})
    out = planner.plan({"employees": emps})
    # id=2 references removed id=1 → drop; then 3 → drop; then 4 → drop
    assert out["employees"].count() == 0


def test_subset_two_hop_vs_duckdb(tables, sf_dir):
    """Acyclic TPC-H slice vs a DuckDB oracle running reference-shaped SQL."""
    g = FKGraph(
        tables=["customer", "orders", "lineitem"],
        references=[
            Reference("orders", "customer", ("o_custkey",), ("c_custkey",)),
            Reference("lineitem", "orders", ("l_orderkey",), ("o_orderkey",)),
        ],
    )
    planner = SubsetPlanner(g, conditions={"customer": "c_acctbal > 9000"})
    out = planner.plan(
        {k: tables[k] for k in ("customer", "orders", "lineitem")}
    )
    got = sorted(
        (r.l_orderkey, r.l_linenumber) for r in out["lineitem"].collect()
    )
    duck = duckdb.connect()
    exp = duck.sql(
        f"""
        SELECT l_orderkey, l_linenumber
        FROM '{sf_dir}/lineitem.parquet'
        WHERE l_orderkey IN (
          SELECT o_orderkey FROM '{sf_dir}/orders.parquet'
          WHERE o_custkey IN (
            SELECT c_custkey FROM '{sf_dir}/customer.parquet'
            WHERE c_acctbal > 9000))
        ORDER BY 1, 2
        """
    ).fetchall()
    assert got == [tuple(r) for r in exp]


def test_polymorphic_null_discriminator(spark):
    """Reference truth table for `fk IS NULL OR pk IS NOT NULL OR NOT(poly)`:
    poly NULL rows are CONSTRAINED (kept iff FK matches), poly FALSE rows
    are unconstrained, poly TRUE rows are constrained."""
    from pyspark.sql import Row

    from greenmask_spark.subset import FKGraph, Reference, SubsetPlanner

    parents = spark.createDataFrame([Row(pid=1), Row(pid=2)])
    children = spark.createDataFrame([
        Row(cid=1, fk=1, kind="x"),     # poly TRUE, matched → keep
        Row(cid=2, fk=9, kind="x"),     # poly TRUE, unmatched → drop
        Row(cid=3, fk=9, kind="y"),     # poly FALSE → unconstrained, keep
        Row(cid=4, fk=1, kind=None),    # poly NULL, matched → keep
        Row(cid=5, fk=9, kind=None),    # poly NULL, unmatched → drop
    ])
    g = FKGraph(
        tables=["p", "c"],
        references=[Reference("c", "p", ("fk",), ("pid",),
                              condition="kind = 'x'")],
    )
    out = SubsetPlanner(g, {"p": "pid <= 2"}).plan({"p": parents,
                                                    "c": children})
    assert {r.cid for r in out["c"].collect()} == {1, 3, 4}


def test_catalog_introspection_duckdb_matches_config_graph():
    """A live-catalog FKGraph (information_schema path — what a PG/JDBC
    endpoint serves) equals the config-built one: same tables, same
    child/parent/fk/pk/nullable per reference."""
    import duckdb

    from greenmask_spark.sources.catalog import (
        fk_graph_from_catalog,
        manifest_tables_from_catalog,
    )
    from greenmask_spark.subset import FKGraph, Reference

    con = duckdb.connect()
    con.execute("""
        CREATE TABLE customer (c_custkey BIGINT PRIMARY KEY,
                               c_name VARCHAR NOT NULL);
        CREATE TABLE orders (o_orderkey BIGINT PRIMARY KEY,
                             o_custkey BIGINT REFERENCES customer(c_custkey));
        CREATE TABLE lineitem (l_orderkey BIGINT NOT NULL
                                 REFERENCES orders(o_orderkey),
                               l_linenumber INT);
    """)
    got = fk_graph_from_catalog(con, dialect="ansi")
    want = FKGraph(
        tables=["customer", "lineitem", "orders"],
        references=[
            Reference("lineitem", "orders", ("l_orderkey",), ("o_orderkey",),
                      nullable=False),
            Reference("orders", "customer", ("o_custkey",), ("c_custkey",),
                      nullable=True),
        ],
    )
    assert sorted(got.tables) == want.tables
    assert sorted(got.references, key=lambda r: r.child) == want.references

    tables, refs, order = manifest_tables_from_catalog(con)
    by_name = {t.name: t for t in tables}
    assert by_name["customer"].primary_key == ["c_custkey"]
    assert [c["name"] for c in by_name["customer"].columns] \
        == ["c_custkey", "c_name"]
    assert not by_name["customer"].columns[1]["nullable"]
    # parents-first restore order
    assert order.index("customer") < order.index("orders") \
        < order.index("lineitem")
    assert refs[0]["fk_columns"]


def test_catalog_introspection_sqlite_composite_fk():
    """PRAGMA path: composite FK column order aligns child↔parent
    positionally; nullable FK detected."""
    import sqlite3

    from greenmask_spark.sources.catalog import fk_graph_from_catalog

    con = sqlite3.connect(":memory:")
    con.executescript("""
        CREATE TABLE parent (a INT NOT NULL, b INT NOT NULL, v TEXT,
                             PRIMARY KEY (a, b));
        CREATE TABLE child (x INT, ca INT NOT NULL, cb INT,
                            FOREIGN KEY (ca, cb) REFERENCES parent (a, b));
    """)
    g = fk_graph_from_catalog(con, dialect="sqlite")
    (ref,) = g.references
    assert ref.child == "child" and ref.parent == "parent"
    assert ref.fk_columns == ("ca", "cb")
    assert ref.pk_columns == ("a", "b")
    assert ref.nullable  # cb is nullable
    assert g.tables == ["child", "parent"]


def test_catalog_graph_drives_subset_planner(spark, tables):
    """The introspected graph is a drop-in SubsetPlanner input — same
    subset rows as the config-defined graph on real testdata."""
    import duckdb

    from greenmask_spark.sources.catalog import fk_graph_from_catalog
    from greenmask_spark.subset import SubsetPlanner

    con = duckdb.connect()
    con.execute("""
        CREATE TABLE customer (c_custkey BIGINT PRIMARY KEY);
        CREATE TABLE orders (o_orderkey BIGINT PRIMARY KEY,
                             o_custkey BIGINT NOT NULL
                               REFERENCES customer(c_custkey));
    """)
    g = fk_graph_from_catalog(con, include=["customer", "orders"])
    t = {k: tables[k] for k in ("customer", "orders")}
    out = SubsetPlanner(g, conditions={"customer": "c_acctbal > 9000"}).plan(t)
    want = (
        tables["orders"]
        .join(tables["customer"].filter("c_acctbal > 9000"),
              tables["orders"]["o_custkey"]
              == tables["customer"]["c_custkey"], "left_semi")
    )
    assert out["orders"].count() == want.count()


def test_catalog_cross_schema_isolation():
    """Same-named tables/constraints in another schema must not corrupt
    the introspected PK/FK column lists (constraint names are only
    unique per schema)."""
    import duckdb

    from greenmask_spark.sources.catalog import introspect_catalog

    con = duckdb.connect()
    con.execute("CREATE SCHEMA archive")
    for sch in ("main", "archive"):
        # unqualified REFERENCES inside USE: duckdb's
        # referential_constraints view omits schema-qualified REFERENCES
        con.execute(f"USE {sch}" if sch != "main" else "USE memory.main")
        con.execute("""
            CREATE TABLE parents (
                id BIGINT, CONSTRAINT parents_pk PRIMARY KEY (id))
        """)
        con.execute("""
            CREATE TABLE kids (
                kid BIGINT PRIMARY KEY, pid BIGINT,
                CONSTRAINT kids_fk FOREIGN KEY (pid)
                    REFERENCES parents (id))
        """)
    con.execute("USE memory.main")
    tables, refs = introspect_catalog(con, schema="main")
    by_name = {t.name: t for t in tables}
    assert by_name["parents"].primary_key == ["id"]  # not duplicated
    assert len(refs) == 1
    assert refs[0].fk_columns == ("pid",) and refs[0].pk_columns == ("id",)


def test_catalog_multi_schema_unfiltered():
    """schema=None over a multi-schema DB: same-named tables neither
    merge their columns nor overwrite each other's primary keys — names
    come back schema-qualified so everything stays distinct."""
    import duckdb

    from greenmask_spark.sources.catalog import introspect_catalog

    con = duckdb.connect()
    con.execute("CREATE SCHEMA archive")
    con.execute("""
        CREATE TABLE main.t (a BIGINT, b VARCHAR,
                             CONSTRAINT t_pk PRIMARY KEY (a))
    """)
    con.execute("""
        CREATE TABLE archive.t (x BIGINT, y BIGINT, z VARCHAR,
                                CONSTRAINT t_pk PRIMARY KEY (x))
    """)
    tables, _refs = introspect_catalog(con, schema=None)
    by_name = {t.name: t for t in tables}
    assert {"main.t", "archive.t"} <= set(by_name)
    assert [c["name"] for c in by_name["main.t"].columns] == ["a", "b"]
    assert [c["name"] for c in by_name["archive.t"].columns] == ["x", "y", "z"]
    assert by_name["main.t"].primary_key == ["a"]
    assert by_name["archive.t"].primary_key == ["x"]


def test_catalog_placeholder_detection():
    import sys
    import types

    from greenmask_spark.sources.catalog import _placeholder

    fake = types.ModuleType("fakepg")
    fake.paramstyle = "pyformat"
    sys.modules["fakepg"] = fake
    try:
        FakeConn = type("Connection", (), {})
        FakeConn.__module__ = "fakepg"
        assert _placeholder(FakeConn()) == "%s"
    finally:
        del sys.modules["fakepg"]
    import sqlite3
    assert _placeholder(sqlite3.connect(":memory:")) == "?"
