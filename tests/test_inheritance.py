"""apply_for_references expansion: FK-consistent masking across tables."""

import pytest
from pyspark.sql import Row

from greenmask_spark.plan import apply_plans, build_plan
from greenmask_spark.plan.inheritance import expand_partitions, expand_references
from greenmask_spark.subset import FKGraph, Reference


@pytest.fixture(scope="module")
def fk_tables(spark):
    users = spark.createDataFrame(
        [Row(user_id=101, name="u1"), Row(user_id=202, name="u2")]
    )
    posts = spark.createDataFrame(
        [Row(post_id=1, author_id=101), Row(post_id=2, author_id=202),
         Row(post_id=3, author_id=101)]
    )
    return {"users": users, "posts": posts}


GRAPH = FKGraph(
    tables=["users", "posts"],
    references=[Reference("posts", "users", ("author_id",), ("user_id",))],
)


def test_reference_expansion_keeps_fk_consistency(fk_tables):
    plans = build_plan({"tables": [{
        "name": "users",
        "transformers": [{"name": "RandomInt", "salt": "s1",
                          "params": {"column": "user_id", "min": 0,
                                     "max": 10**9,
                                     "apply_for_references": True}}],
    }]})
    expanded = expand_references(plans, GRAPH)
    assert [p.table for p in expanded] == ["users", "posts"]
    out = apply_plans(fk_tables, expanded)
    users = {r.name: r.user_id for r in out["users"].collect()}
    posts = {r.post_id: r.author_id for r in out["posts"].collect()}
    # masked FK still joins to masked PK
    assert posts[1] == users["u1"] and posts[3] == users["u1"]
    assert posts[2] == users["u2"]
    assert users["u1"] != 101  # actually masked


def test_reference_expansion_requires_hash_engine(fk_tables):
    plans = build_plan({"tables": [{
        "name": "users",
        "transformers": [{"name": "RandomInt", "engine": "random",
                          "params": {"column": "user_id",
                                     "apply_for_references": True}}],
    }]})
    with pytest.raises(ValueError, match="hash"):
        expand_references(plans, GRAPH)


def test_transitive_expansion(spark):
    """a.pk ← b.fk, b.pk ← c.fk: masking a.pk reaches c via b's pk? No —
    only columns that ARE the referenced pk chain propagate end-to-end."""
    g = FKGraph(
        tables=["a", "b", "c"],
        references=[
            Reference("b", "a", ("a_id",), ("id",)),
            Reference("c", "b", ("a_id_via_b",), ("a_id",)),
        ],
    )
    plans = build_plan({"tables": [{
        "name": "a",
        "transformers": [{"name": "RandomInt", "salt": "s",
                          "params": {"column": "id", "min": 0, "max": 10**6,
                                     "apply_for_references": True}}],
    }]})
    expanded = expand_references(plans, g)
    tcols = {(p.table, s.column) for p in expanded for s in p.steps}
    assert ("b", "a_id") in tcols
    assert ("c", "a_id_via_b") in tcols  # end-to-end DFS through b


def test_partition_expansion():
    plans = build_plan({"tables": [{
        "name": "events_root",
        "transformers": [{"name": "SetNull",
                          "params": {"column": "x",
                                     "apply_for_inherited": True}}],
    }]})
    out = expand_partitions(plans, {"events_root": ["events_p1", "events_p2"]})
    assert [p.table for p in out] == ["events_root", "events_p1", "events_p2"]
    assert out[1].steps[0].transformer.name == "SetNull"
