"""Per-transformer invariant tests (model: reference table-driven tests,
internal/db/postgres/transformers/*_test.go — range/regex/null/determinism)."""

import re

import pytest
from pyspark.sql import Row, functions as F, types as T

from greenmask_spark.plan import apply_plan, build_plan


def _plan_for(table, steps, **tbl_extra):
    return build_plan(
        {"tables": [{"name": table, "transformers": steps, **tbl_extra}]}
    )[0]


@pytest.fixture(scope="module")
def people(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("email", T.StringType()),
            T.StructField("age", T.IntegerType()),
            T.StructField("balance", T.DoubleType()),
            T.StructField("doc", T.StringType()),
            T.StructField("created_at", T.TimestampType()),
        ]
    )
    import datetime as dt

    rows = [
        Row(id=1, name="Alice Smith", email="alice@corp.com", age=30,
            balance=100.5, doc='{"a": {"b": 1}}',
            created_at=dt.datetime(2020, 5, 17, 10, 30)),
        Row(id=2, name="Bob Jones", email="bob@mail.org", age=45,
            balance=-20.0, doc='{"a": {"b": 2}}',
            created_at=dt.datetime(2021, 7, 4, 0, 0)),
        Row(id=3, name=None, email=None, age=None, balance=None, doc=None,
            created_at=None),
    ]
    return spark.createDataFrame(rows, schema)


def test_random_int_range_and_null(people):
    plan = _plan_for("p", [{"name": "RandomInt",
                            "params": {"column": "age", "min": 18, "max": 65}}])
    out = {r.id: r.age for r in apply_plan(people, plan).collect()}
    assert 18 <= out[1] <= 65 and 18 <= out[2] <= 65
    assert out[3] is None  # keep_null default


def test_random_int_deterministic_across_runs(people):
    plan = _plan_for("p", [{"name": "RandomInt",
                            "params": {"column": "age", "min": 0, "max": 10**6}}])
    a = {r.id: r.age for r in apply_plan(people, plan).collect()}
    b = {r.id: r.age for r in apply_plan(people, plan).collect()}
    assert a == b


def test_random_float_range(people):
    plan = _plan_for("p", [{"name": "RandomFloat",
                            "params": {"column": "balance", "min": 1.0,
                                       "max": 2.0, "decimal": 2}}])
    out = {r.id: r.balance for r in apply_plan(people, plan).collect()}
    assert 1.0 <= out[1] <= 2.0
    assert out[3] is None


def test_noise_int_within_ratio(people):
    plan = _plan_for("p", [{"name": "NoiseInt",
                            "params": {"column": "age", "min_ratio": 0.0,
                                       "max_ratio": 0.2}}])
    out = {r.id: r.age for r in apply_plan(people, plan).collect()}
    assert abs(out[1] - 30) <= 30 * 0.2 + 1
    assert abs(out[2] - 45) <= 45 * 0.2 + 1


def test_hash_sha256_and_md5(people):
    import hashlib

    plan = _plan_for("p", [{"name": "Hash",
                            "params": {"column": "name", "function": "sha256",
                                       "salt": "pep"}}])
    out = {r.id: r.name for r in apply_plan(people, plan).collect()}
    assert out[1] == hashlib.sha256(b"pepAlice Smith").hexdigest()
    assert out[3] is None


def test_replace_and_keep_null(people):
    plan = _plan_for("p", [{"name": "Replace",
                            "params": {"column": "name", "value": "REDACTED",
                                       "keep_null": False}}])
    out = {r.id: r.name for r in apply_plan(people, plan).collect()}
    assert out == {1: "REDACTED", 2: "REDACTED", 3: "REDACTED"}


def test_set_null(people):
    plan = _plan_for("p", [{"name": "SetNull", "params": {"column": "email"}}])
    out = apply_plan(people, plan).collect()
    assert all(r.email is None for r in out)


def test_dict_mapping_default(people):
    plan = _plan_for("p", [{"name": "Dict",
                            "params": {"column": "name",
                                       "values": {"Alice Smith": "A."},
                                       "default": "X"}}])
    out = {r.id: r.name for r in apply_plan(people, plan).collect()}
    assert out[1] == "A." and out[2] == "X" and out[3] is None


def test_masking_email_style(people):
    plan = _plan_for("p", [{"name": "Masking",
                            "params": {"column": "email", "type": "email"}}])
    out = {r.id: r.email for r in apply_plan(people, plan).collect()}
    assert out[1] == "ali****@corp.com"


def test_random_choice(people):
    plan = _plan_for("p", [{"name": "RandomChoice",
                            "params": {"column": "name",
                                       "values": ["x", "y", "z"]}}])
    out = {r.id: r.name for r in apply_plan(people, plan).collect()}
    assert out[1] in {"x", "y", "z"} and out[3] is None


def test_random_email_keep_domain(people):
    plan = _plan_for("p", [{"name": "RandomEmail",
                            "params": {"column": "email",
                                       "keep_original_domain": True}}])
    out = {r.id: r.email for r in apply_plan(people, plan).collect()}
    assert out[1].endswith("@corp.com") and out[1] != "alice@corp.com"
    assert out[2].endswith("@mail.org")


def test_random_uuid_shape_deterministic(people):
    plan = _plan_for("p", [{"name": "RandomUuid", "params": {"column": "name"}}])
    out = {r.id: r.name for r in apply_plan(people, plan).collect()}
    assert re.fullmatch(
        r"[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-a[0-9a-f]{3}-[0-9a-f]{12}", out[1]
    )


def test_random_date_range_and_truncate(people):
    plan = _plan_for("p", [{"name": "RandomDate",
                            "params": {"column": "created_at",
                                       "min": "2010-01-01", "max": "2011-01-01",
                                       "truncate": "day"}}])
    out = {r.id: r.created_at for r in apply_plan(people, plan).collect()}
    assert out[1].year in (2010, 2011)
    assert out[1].hour == 0 and out[1].minute == 0


def test_noise_date_bounded(people):
    plan = _plan_for("p", [{"name": "NoiseDate",
                            "params": {"column": "created_at",
                                       "max_interval": "P10D"}}])
    import datetime as dt

    out = {r.id: r.created_at for r in apply_plan(people, plan).collect()}
    assert abs((out[1] - dt.datetime(2020, 5, 17, 10, 30)).total_seconds()) \
        <= 10 * 86400 + 1


def test_random_ip_in_subnet(people):
    plan = _plan_for("p", [{"name": "RandomIp",
                            "params": {"column": "name",
                                       "subnet": "192.168.1.0/24"}}])
    out = {r.id: r.name for r in apply_plan(people, plan).collect()}
    assert out[1].startswith("192.168.1.")
    assert 1 <= int(out[1].rsplit(".", 1)[1]) <= 254


def test_random_mac_shape(people):
    plan = _plan_for("p", [{"name": "RandomMac", "params": {"column": "name"}}])
    out = {r.id: r.name for r in apply_plan(people, plan).collect()}
    assert re.fullmatch(r"([0-9a-f]{2}:){5}[0-9a-f]{2}", out[1])
    # locally-administered, unicast
    first = int(out[1][:2], 16)
    assert first & 0x02 and not first & 0x01


def test_regexp_replace(people):
    plan = _plan_for("p", [{"name": "RegexpReplace",
                            "params": {"column": "email", "regexp": "@.*$",
                                       "replace": "@x.y"}}])
    out = {r.id: r.email for r in apply_plan(people, plan).collect()}
    assert out[1] == "alice@x.y"


def test_random_string_length_and_alphabet(people):
    plan = _plan_for("p", [{"name": "RandomString",
                            "params": {"column": "name", "min_length": 3,
                                       "max_length": 7, "symbols": "ab"}}])
    out = {r.id: r.name for r in apply_plan(people, plan).collect()}
    assert 3 <= len(out[1]) <= 7 and set(out[1]) <= {"a", "b"}


def test_json_set_delete(people):
    plan = _plan_for("p", [{"name": "Json",
                            "params": {"column": "doc",
                                       "operations": [
                                           {"operation": "set", "path": "a.b",
                                            "value": 9},
                                           {"operation": "set", "path": "c",
                                            "value": "z"},
                                       ]}}])
    import json

    out = {r.id: r.doc for r in apply_plan(people, plan).collect()}
    assert json.loads(out[1]) == {"a": {"b": 9}, "c": "z"}
    assert out[3] is None


def test_random_person_correlated(people):
    plan = _plan_for("p", [{"name": "RandomPerson",
                            "params": {"columns": [
                                {"name": "name", "template": "{{ .FirstName }}"},
                                {"name": "email", "template": "{{ .LastName }}"},
                            ]}}])
    out = apply_plan(people, plan).collect()
    from greenmask_spark.transformers import lexicons as lex

    r1 = [r for r in out if r.id == 1][0]
    assert r1.name in lex.FIRST_NAMES_MALE + lex.FIRST_NAMES_FEMALE
    assert r1.email in lex.LAST_NAMES


def test_when_condition_table_and_step(people):
    plan = _plan_for(
        "p",
        [{"name": "Replace",
          "params": {"column": "name", "value": "R", "keep_null": False},
          "when": "age > 40"}],
    )
    out = {r.id: r.name for r in apply_plan(people, plan).collect()}
    assert out[1] == "Alice Smith" and out[2] == "R"


def test_chained_transformers_in_order(people):
    # first hash the name, then mask with the id rule — order matters;
    # id = overlay('****', 6, 10): 6 kept, 4 starred, tail kept
    plan = _plan_for(
        "p",
        [
            {"name": "Hash", "params": {"column": "name", "function": "md5"}},
            {"name": "Masking", "params": {"column": "name", "type": "id"}},
        ],
    )
    out = {r.id: r.name for r in apply_plan(people, plan).collect()}
    assert re.fullmatch(r"[0-9a-f]{6}\*{4}[0-9a-f]{22}", out[1])


def test_faker_family_shapes(people):
    steps = [
        {"name": "RandomLatitude", "params": {"column": "balance"}},
        {"name": "RandomPhoneNumber", "params": {"column": "email"}},
        {"name": "RandomUsername", "params": {"column": "name"}},
    ]
    plan = _plan_for("p", steps)
    out = {r.id: r for r in apply_plan(people, plan).collect()}
    assert -90 <= out[1].balance <= 90
    assert re.fullmatch(r"\(\d{3}\) \d{3}-\d{4}", out[1].email)
    assert re.fullmatch(r"[a-z]+_\d+", out[1].name)


def test_dynamic_parameter_column_bound(people):
    # RandomInt max bound read from another column per row: age in [0, id]
    plan = _plan_for("p", [{"name": "RandomInt",
                            "params": {"column": "age", "min": 0,
                                       "max": {"column": "id"}}}])
    out = {r.id: r.age for r in apply_plan(people, plan).collect()}
    assert 0 <= out[1] <= 1 and 0 <= out[2] <= 2
