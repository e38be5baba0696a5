"""Custom transformer plugin registry.

Reference: custom/custom_cmd.go:44-305 (--print-definition bootstrap),
pkg/toolkit/definition.go:86 (definition schema),
tests/external_transformer/test.go (external harness).
"""

import sys

import pytest
from pyspark.sql import Row

from greenmask_spark.plan import apply_plan, build_plan
from greenmask_spark.transformers.base import TransformerRegistry
from greenmask_spark.transformers.custom import (
    discover_definition,
    load_custom_transformers,
    register_python_transformer,
)

CHILD = (
    "import sys, json\n"
    "if '--print-definition' in sys.argv:\n"
    "    print(json.dumps({'name': 'UpperText', 'description': 'upper',\n"
    "                      'driver': {'name': 'text'},\n"
    "                      'parameters': [{'name': 'columns',\n"
    "                                      'required': True}]}))\n"
    "    sys.exit(0)\n"
    "for line in sys.stdin:\n"
    "    print(line.rstrip('\\n').upper(), flush=True)\n"
)


def test_discover_definition():
    d = discover_definition(sys.executable, ("-c", CHILD))
    assert d.name == "UpperText"
    assert d.driver == "text"
    assert d.parameters[0]["name"] == "columns"


def test_load_and_apply_custom_cmd(spark):
    reg = TransformerRegistry()
    loaded = load_custom_transformers(
        [{"executable": sys.executable, "args": ["-c", CHILD]}], registry=reg)
    assert [t.name for t in loaded] == ["UpperText"]
    assert "UpperText" in reg

    df = spark.createDataFrame([Row(id=1, name="abc"), Row(id=2, name="xy")])
    plan = build_plan({"tables": [{"name": "t", "transformers": [
        {"name": "UpperText", "params": {"columns": ["name"]}}]}]},
        registry=reg)[0]
    out = {r.id: r.name for r in apply_plan(df, plan).collect()}
    assert out == {1: "ABC", 2: "XY"}


def test_custom_validate_params_required():
    reg = TransformerRegistry()
    (t,) = load_custom_transformers(
        [{"executable": sys.executable, "args": ["-c", CHILD]}], registry=reg)
    assert t.validate_params({}) != []
    assert t.validate_params({"columns": ["name"]}) == []


def test_custom_name_mismatch_raises():
    with pytest.raises(ValueError, match="declares name"):
        load_custom_transformers(
            [{"executable": sys.executable, "args": ["-c", CHILD],
              "name": "SomethingElse"}], registry=TransformerRegistry())


def test_register_python_transformer(spark):
    reg = TransformerRegistry()
    register_python_transformer(
        "Triple", lambda ctx: ctx.col() * 3,
        parameters=[{"name": "column", "required": True}], registry=reg)
    df = spark.createDataFrame([Row(id=1, v=2), Row(id=2, v=5)])
    plan = build_plan({"tables": [{"name": "t", "transformers": [
        {"name": "Triple", "params": {"column": "v"}}]}]}, registry=reg)[0]
    out = {r.id: r.v for r in apply_plan(df, plan).collect()}
    assert out == {1: 6, 2: 15}


def test_reregister_replaces():
    reg = TransformerRegistry()
    register_python_transformer("X", lambda ctx: ctx.col(), registry=reg)
    register_python_transformer("X", lambda ctx: ctx.col() + 1, registry=reg)
    assert reg.get("X") is not None
