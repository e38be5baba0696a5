"""Planner semantics: sequential visibility, table-when snapshot, custom
query override, include/exclude filters.

Reference semantics under test:
- transformers apply sequentially over the record, so a dynamic param /
  transformer-level ``when`` reads PRIOR steps' outputs
  (dumpers/transformation_pipeline.go:130-145);
- the table-level ``when`` is evaluated once per record against the
  ORIGINAL row (transformation_pipeline.go:165-175);
- a custom ``query`` replaces the table scan (entries/table.go:150-152);
- pg_dump-style include/exclude filters (pgdump/pgdump.go:67-76,187-226).
"""

import pytest
from pyspark.sql import functions as F

from greenmask_spark.plan import apply_plan, build_plan


def _one_plan(cfg):
    plans = build_plan(cfg)
    assert len(plans) == 1
    return plans[0]


def test_dynamic_param_sees_prior_step_output(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "id int, bound int")
    # step 1 replaces bound with 5; step 2's dynamic max reads bound and
    # must see 5 (not the original 10/20) → result in [0, 5]
    plan = _one_plan({"tables": [{"name": "t", "transformers": [
        {"name": "Replace", "params": {"column": "bound", "value": 5,
                                       "keep_null": False}, "salt": ""},
        {"name": "RandomInt", "params": {"column": "id", "min": 0,
                                         "max": {"column": "bound"}},
         "salt": ""},
    ]}]})
    rows = apply_plan(df, plan).collect()
    assert all(r.bound == 5 for r in rows)
    assert all(0 <= r.id <= 5 for r in rows)


def test_step_when_sees_prior_step_output(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, tag string")
    # step 1 rewrites tag to 'z'; step 2's when reads tag — sequential
    # semantics means the condition sees 'z', so every id gets masked
    plan = _one_plan({"tables": [{"name": "t", "transformers": [
        {"name": "Replace", "params": {"column": "tag", "value": "z",
                                       "keep_null": False}, "salt": ""},
        {"name": "Replace", "params": {"column": "id", "value": 0,
                                       "keep_null": False},
         "when": "tag = 'z'", "salt": ""},
    ]}]})
    rows = apply_plan(df, plan).collect()
    assert all(r.id == 0 for r in rows)


def test_table_when_sees_original_row(spark):
    df = spark.createDataFrame([(1, 1), (2, 0)], "id int, flag int")
    # table-when reads flag; step 1 zeroes flag. The table condition must
    # be snapshotted from the ORIGINAL record, so id is still masked for
    # the flag=1 row even though flag is 0 by the time step 2 runs.
    plan = _one_plan({"tables": [{"name": "t", "when": "flag = 1",
                                  "transformers": [
        {"name": "Replace", "params": {"column": "flag", "value": 0,
                                       "keep_null": False}, "salt": ""},
        {"name": "Replace", "params": {"column": "id", "value": 99,
                                       "keep_null": False}, "salt": ""},
    ]}]})
    rows = {r.id: r.flag for r in apply_plan(df, plan).collect()}
    assert rows == {99: 0, 2: 0}
    assert "__gm_table_when__" not in apply_plan(df, plan).columns


def test_query_override_replaces_scan(spark):
    df = spark.createDataFrame(
        [(1, 100.0), (2, 5.0), (3, 200.0)], "id int, val double")
    plan = _one_plan({"tables": [{
        "name": "t",
        "query": "SELECT id, val FROM t WHERE val > 50",
        "transformers": [
            {"name": "Replace", "params": {"column": "val", "value": 0.0,
                                           "keep_null": False}, "salt": ""},
        ]}]})
    rows = apply_plan(df, plan).collect()
    assert sorted(r.id for r in rows) == [1, 3]
    assert all(r.val == 0.0 for r in rows)


def test_include_exclude_filters():
    cfg = {
        "include_tables": ["cust*", "orders"],
        "exclude_tables": ["customer_archive"],
        "tables": [
            {"name": "customer"},
            {"name": "customer_archive"},
            {"name": "orders"},
            {"name": "lineitem"},
        ],
    }
    names = [p.table for p in build_plan(cfg)]
    assert names == ["customer", "orders"]


def test_exclude_table_data_keeps_schema_drops_rows(spark):
    df = spark.createDataFrame([(1,), (2,)], "id int")
    cfg = {"exclude_table_data": ["t"], "tables": [{"name": "t"}]}
    plan = build_plan(cfg)[0]
    out = apply_plan(df, plan)
    assert out.columns == ["id"]
    assert out.count() == 0


def test_unknown_transformer_raises():
    with pytest.raises(KeyError):
        build_plan({"tables": [{"name": "t", "transformers": [
            {"name": "NoSuchTransformer"}]}]})


def test_fused_chain_is_single_projection(spark):
    """Non-conflicting expression steps must fuse into one projection —
    the whole chain stays inside one WholeStageCodegen scan."""
    df = spark.createDataFrame([(1, "a", 2.0)], "id int, s string, v double")
    plan = _one_plan({"tables": [{"name": "t", "transformers": [
        {"name": "Replace", "params": {"column": "s", "value": "x",
                                       "keep_null": False}, "salt": ""},
        {"name": "RandomInt", "params": {"column": "id", "min": 0, "max": 9},
         "salt": ""},
        {"name": "NoiseFloat", "params": {"column": "v", "min_ratio": 0.0,
                                          "max_ratio": 0.1}, "salt": ""},
    ]}]})
    out = apply_plan(df, plan)
    # one Project over the scan — no intermediate exchanges/projects
    plan_str = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan_str.count("Project") == 1


def test_template_honors_when_conditions(spark):
    """Table-level transformers (Template) must honor table- and step-level
    when: rows failing the condition keep their original values."""
    from pyspark.sql import Row

    from greenmask_spark.plan import apply_plan, build_plan

    df = spark.createDataFrame([
        Row(id=1, name="a"), Row(id=2, name="b"), Row(id=3, name="c")])
    plan = build_plan({"tables": [{
        "name": "t",
        "when": "id != 1",
        "transformers": [
            {"name": "Template", "salt": "", "when": "id != 2",
             "params": {"column": "name",
                        "template": "X{{ record.id }}"}},
        ],
    }]})[0]
    out = {r.id: r.name for r in apply_plan(df, plan).collect()}
    assert out == {1: "a", 2: "b", 3: "X3"}


def test_table_when_helper_hidden_from_template_env(spark):
    """The internal when-helper column must not exist in the template
    record environment (a template iterating the record would leak it)."""
    from pyspark.sql import Row

    from greenmask_spark.plan import apply_plan, build_plan

    df = spark.createDataFrame([Row(id=1, name="a")])
    plan = build_plan({"tables": [{
        "name": "t",
        "when": "id > 0",
        "transformers": [
            {"name": "TemplateRecord", "salt": "",
             "params": {"columns": ["name"],
                        "template":
                        "{{ set('name', record.keys() | join(',')) }}"}},
        ],
    }]})[0]
    out = apply_plan(df, plan).collect()[0]
    assert out.name == "id,name", out.name


def test_plan_health_counts(spark, tables):
    """plan_health counts real executed-plan nodes; a cached subplan is
    audited once plus per-consumer cache reads."""
    from pyspark.sql import functions as F

    from greenmask_spark.plan.health import plan_health

    df = tables["nation"].groupBy("n_regionkey").count()
    df.count()
    h = plan_health(df)
    assert h["shuffles"] >= 1 and h["scans"] == 1 and h["python"] == 0

    cached = tables["nation"].select("n_nationkey").persist()
    two = cached.union(cached)
    two.count()
    h2 = plan_health(two)
    assert h2["cache_reads"] == 2 and h2["scans"] == 1  # fill counted once
    cached.unpersist()


# ---------------------------------------------------------------------------
# columns_type_override (reference: internal/domains/config.go:171,
# context/config_builder.go:582-598, pkg/toolkit/column.go:58-62)
# ---------------------------------------------------------------------------


def test_type_override_cast_before_transformers(spark):
    """text→int4 rebinds the driver type so RandomInt hashes the INT
    value (canonical string '7', not the raw text '007')."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from greenmask_spark.engines import kernel
    from greenmask_spark.plan import apply_plan, build_plan

    df = spark.createDataFrame([Row(id=1, v="007"), Row(id=2, v="12")])
    plan = build_plan({"tables": [{
        "name": "t",
        "columns_type_override": {"v": "int4"},
        "transformers": [
            {"name": "RandomInt", "salt": "",
             "params": {"column": "v", "min": 0, "max": 99}},
        ],
    }]})[0]
    out = apply_plan(df, plan)
    assert out.schema["v"].dataType.simpleString() == "int"
    got = {r.id: r.v for r in out.collect()}
    exp = df.select(
        "id",
        kernel.uniform_int(F.col("v").cast("int"), F.lit(0), F.lit(99), "")
        .cast("int").alias("v"),
    ).collect()
    assert got == {r.id: r.v for r in exp}
    # and the hash key really was the canonical int string: '007' ≡ '7'
    same = spark.createDataFrame([Row(id=1, v="7")])
    exp2 = apply_plan(same, plan).collect()[0].v
    assert got[1] == exp2


def test_type_override_pg_name_resolution():
    from greenmask_spark.plan.planner import resolve_type_override

    assert resolve_type_override("int4") == "int"
    assert resolve_type_override("timestamptz") == "timestamp"
    assert resolve_type_override("varchar(30)") == "string"
    assert resolve_type_override("numeric(10,2)") == "decimal(10,2)"
    assert resolve_type_override("double precision") == "double"
    assert resolve_type_override("TEXT") == "string"
    # Spark DDL passthrough
    assert resolve_type_override("decimal(5,1)") == "decimal(5,1)"


def test_type_override_invalid_target_raises():
    import pytest as _pytest

    from greenmask_spark.plan import build_plan

    with _pytest.raises(ValueError, match="unknown target type"):
        build_plan({"tables": [{
            "name": "t", "columns_type_override": {"v": "int44"},
        }]})


def test_type_override_narrowing_warns(spark):
    import warnings as _w

    from pyspark.sql import Row

    from greenmask_spark.plan import apply_plan, build_plan

    df = spark.createDataFrame([Row(big=2**40, s="x")])
    plan = build_plan({"tables": [{
        "name": "t", "columns_type_override": {"big": "int4"},
    }]})[0]
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        out = apply_plan(df, plan).collect()[0]
    assert any("narrowing" in str(r.message) for r in rec)
    # widening + missing column: no narrowing warning, a missing-col warning
    plan2 = build_plan({"tables": [{
        "name": "t",
        "columns_type_override": {"s": "text", "nope": "int8"},
    }]})[0]
    with _w.catch_warnings(record=True) as rec2:
        _w.simplefilter("always")
        apply_plan(df, plan2).collect()
    msgs = [str(r.message) for r in rec2]
    assert not any("narrowing" in m for m in msgs)
    assert any("no column 'nope'" in m for m in msgs)


def test_type_override_when_sees_overridden_type(spark):
    """The condition tier evaluates against the overridden type — a
    numeric comparison on a text-overridden-to-int column."""
    from pyspark.sql import Row

    from greenmask_spark.plan import apply_plan, build_plan

    df = spark.createDataFrame(
        [Row(id=1, v="5"), Row(id=2, v="50")])
    plan = build_plan({"tables": [{
        "name": "t",
        "when": "record.v > 10",
        "columns_type_override": {"v": "integer"},
        "transformers": [
            {"name": "Replace", "salt": "",
             "params": {"column": "v", "value": 0, "keep_null": False}},
        ],
    }]})[0]
    got = {r.id: r.v for r in apply_plan(df, plan).collect()}
    assert got == {1: 5, 2: 0}
