"""Validation warnings with resolvable hashes.

Reference: pkg/toolkit/validation_warning.go:44-102 and
config_builder.go's parameter validation pass.
"""

from pyspark.sql import types as T

from greenmask_spark.plan import build_plan
from greenmask_spark.validate import (
    ValidationWarning,
    has_unresolved,
    is_fatal,
    validate_plans,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), nullable=False),
    T.StructField("name", T.StringType()),
    T.StructField("size", T.ShortType()),
    T.StructField("price", T.DoubleType()),
])


def _plans(*transformers):
    return build_plan({"tables": [{"name": "t",
                                   "transformers": list(transformers)}]})


def _validate(*transformers, pk=("id",), resolved=()):
    return validate_plans(_plans(*transformers), {"t": SCHEMA},
                          {"t": pk}, resolved=resolved)


def test_min_greater_than_max_warns():
    ws = _validate({"name": "RandomInt",
                    "params": {"column": "size", "min": 50, "max": 1}})
    assert any("greater than max" in w.msg for w in ws)


def test_int_type_range_warns():
    ws = _validate({"name": "RandomInt",
                    "params": {"column": "size", "min": 0, "max": 100000}})
    assert any("out of range of smallint" in w.msg for w in ws)


def test_pk_affected_warns():
    ws = _validate({"name": "RandomInt",
                    "params": {"column": "id", "min": 0, "max": 10}})
    assert any(w.meta.get("ConstraintType") == "PK" for w in ws)


def test_setnull_on_not_null_is_fatal():
    ws = _validate({"name": "SetNull", "params": {"column": "id"}})
    assert is_fatal(ws)
    assert any(w.meta.get("ConstraintType") == "NotNull" for w in ws)


def test_unknown_column_is_fatal():
    ws = _validate({"name": "SetNull", "params": {"column": "nope"}})
    assert is_fatal(ws)


def test_type_compat_error():
    # Masking only accepts text-family columns
    ws = _validate({"name": "Masking", "params": {"column": "price"}})
    assert any("not allowed for transformer 'Masking'" in w.msg for w in ws)


def test_replace_encode_check():
    ws = _validate({"name": "Replace",
                    "params": {"column": "size", "value": "not-a-number"}})
    assert any("cannot be encoded" in w.msg for w in ws)
    ok = _validate({"name": "Replace",
                    "params": {"column": "size", "value": "17"}})
    assert not any("cannot be encoded" in w.msg for w in ok)


def test_random_choice_encode_and_empty():
    ws = _validate({"name": "RandomChoice",
                    "params": {"column": "size", "values": ["1", "x"]}})
    assert any("cannot be encoded" in w.msg for w in ws)
    ws2 = _validate({"name": "RandomChoice",
                     "params": {"column": "size", "values": []}})
    assert any("values list is empty" in w.msg for w in ws2)


def test_resolved_hash_suppression_and_strict_mode():
    ws = _validate({"name": "RandomInt",
                    "params": {"column": "id", "min": 0, "max": 10}})
    pk_warns = [w for w in ws if w.meta.get("ConstraintType") == "PK"]
    assert pk_warns and has_unresolved(ws)
    hashes = [w.hash for w in ws]
    assert not has_unresolved(ws, resolved=hashes)
    # suppressing via validate_plans' resolved list removes them entirely
    left = _validate({"name": "RandomInt",
                      "params": {"column": "id", "min": 0, "max": 10}},
                     resolved=hashes)
    assert left == []


def test_hash_is_stable_and_meta_sensitive():
    a = ValidationWarning("m", "warning", {"TableName": "t", "Col": "x"})
    b = ValidationWarning("m", "warning", {"Col": "x", "TableName": "t"})
    c = ValidationWarning("m", "warning", {"Col": "y", "TableName": "t"})
    assert a.hash == b.hash
    assert a.hash != c.hash
