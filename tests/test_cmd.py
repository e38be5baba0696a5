"""Cmd transformer protocol drivers + lifecycle enforcement.

Reference: internal/db/postgres/transformers/cmd.go:50-472 (timeout and
expected exit code are enforced per exchange), protocol drivers
pkg/toolkit/{json_api,csv_api,text_api}.go.
"""

import sys

import pytest
from pyspark.sql import Row

from greenmask_spark.plan import apply_plan, build_plan


def _plan_cmd(params):
    return build_plan({"tables": [{"name": "t", "transformers": [
        {"name": "Cmd", "params": params, "salt": ""}]}]})[0]


def _df(spark):
    return spark.createDataFrame([
        Row(id=1, name="alpha", score=1.5),
        Row(id=2, name="beta", score=2.5),
        Row(id=3, name=None, score=3.5),
    ])


UPPER_TEXT = ("import sys\n"
              "for line in sys.stdin:\n"
              "    print(line.rstrip('\\n').upper(), flush=True)")

CSV_REVERSE = ("import sys, csv\n"
               "r = csv.reader(sys.stdin)\n"
               "w = csv.writer(sys.stdout, lineterminator='\\n')\n"
               "for row in r:\n"
               "    row[1] = row[1][::-1] if row[1] != '\\\\N' else row[1]\n"
               "    w.writerow(row)\n"
               "    sys.stdout.flush()\n")


# json driver child implementing the reference RowDriver round trip
# (pkg/toolkit/raw_record_test.go:25 wire format): doubles ints,
# uppercases strings, passes nulls through as {"n": true}, and — to
# prove the host ignores non-affected keys — always emits a GARBAGE
# cell for column index 0.
JSON_CHILD = ("import sys, json\n"
              "for line in sys.stdin:\n"
              "    rec = json.loads(line)\n"
              "    out = {'0': {'d': 'GARBAGE', 'n': False}}\n"
              "    for k, cell in rec.items():\n"
              "        if cell['n']:\n"
              "            out[k] = {'d': None, 'n': True}\n"
              "        elif isinstance(cell['d'], (int, float)):\n"
              "            out[k] = {'d': cell['d'] * 2, 'n': False}\n"
              "        else:\n"
              "            out[k] = {'d': str(cell['d']).upper(),"
              " 'n': False}\n"
              "    print(json.dumps(out), flush=True)")


def test_cmd_json_driver_roundtrip(spark):
    """The reference's DEFAULT protocol driver (pkg/toolkit/
    json_api.go; wire format raw_record_test.go:25 '{"8":{"d":...,
    "n":...}}'): affected cells travel keyed by COLUMN INDEX with a
    "d"/"n" pair, typed values survive (int stays int, not a string),
    null-in flows as n=true and null-out comes back the same way, and
    only affected columns are copied back — the child's GARBAGE cell
    for unaffected index 0 must be ignored
    (json_api.go SetRowDriverToRecord iterates affectedColumns)."""
    plan = _plan_cmd({"executable": sys.executable,
                      "args": ["-u", "-c", JSON_CHILD],
                      "driver": "json", "columns": ["name", "score"]})
    rows = {r.id: r for r in apply_plan(_df(spark), plan).collect()}
    # typed round trip: score is numeric through json, not a string
    assert rows[1].name == "ALPHA" and rows[1].score == 3.0
    assert rows[2].name == "BETA" and rows[2].score == 5.0
    # null travels as {"n": true} both ways (no skip configured:
    # the CHILD saw the null and answered n=true)
    assert rows[3].name is None and rows[3].score == 7.0
    # unaffected column id=0 untouched despite the GARBAGE answer
    assert set(rows) == {1, 2, 3}


def test_cmd_json_driver_int_columns_and_defaults(spark):
    """json is the DEFAULT driver (cmd.go/defaults) — an unspecified
    driver lands here; int64 columns serialize (numpy scalars are not
    json-encodable without the host normalizing them) and a response
    MISSING an affected key leaves the original value unchanged."""
    from pyspark.sql import Row as R

    echo_half = ("import sys, json\n"
                 "for line in sys.stdin:\n"
                 "    rec = json.loads(line)\n"
                 "    out = {}\n"
                 "    for k, cell in rec.items():\n"
                 "        if not cell['n'] and isinstance(cell['d'], int)"
                 " and cell['d'] % 2 == 0:\n"
                 "            out[k] = {'d': cell['d'] + 100, 'n': False}\n"
                 "    print(json.dumps(out), flush=True)")
    df = spark.createDataFrame([R(id=1, n=10), R(id=2, n=11)])
    # no "driver" param: must default to json
    plan = _plan_cmd({"executable": sys.executable,
                      "args": ["-u", "-c", echo_half],
                      "columns": ["n"]})
    out = {r.id: r.n for r in apply_plan(df, plan).collect()}
    assert out == {1: 110, 2: 11}  # odd value: key omitted → unchanged


def test_cmd_json_driver_null_skip(spark):
    """skip_on_null_input with the json driver: null rows never reach
    the subprocess at all (the reference skips invocation, not just
    the write-back)."""
    asserting_child = ("import sys, json\n"
                       "for line in sys.stdin:\n"
                       "    rec = json.loads(line)\n"
                       "    assert not any(c['n'] for c in rec.values()),"
                       " 'null row leaked to child'\n"
                       "    out = {k: {'d': str(c['d']).upper(), 'n': False}"
                       " for k, c in rec.items()}\n"
                       "    print(json.dumps(out), flush=True)")
    plan = _plan_cmd({"executable": sys.executable,
                      "args": ["-u", "-c", asserting_child],
                      "driver": "json", "columns": ["name"],
                      "skip_on_null_input": True})
    out = {r.id: r.name for r in apply_plan(_df(spark), plan).collect()}
    assert out == {1: "ALPHA", 2: "BETA", 3: None}


def test_cmd_text_driver(spark):
    plan = _plan_cmd({"executable": sys.executable,
                      "args": ["-u", "-c", UPPER_TEXT],
                      "driver": "text", "columns": ["name"],
                      "skip_on_null_input": True})
    out = {r.id: r.name for r in apply_plan(_df(spark), plan).collect()}
    assert out == {1: "ALPHA", 2: "BETA", 3: None}


def test_cmd_csv_driver(spark):
    plan = _plan_cmd({"executable": sys.executable,
                      "args": ["-u", "-c", CSV_REVERSE],
                      "driver": "csv", "columns": ["name"],
                      "skip_on_null_input": True})
    rows = {r.id: r for r in apply_plan(_df(spark), plan).collect()}
    assert rows[1].name == "ahpla"
    assert rows[2].name == "ateb"
    assert rows[3].name is None        # skipped on null input
    assert rows[1].score == 1.5        # unaffected column untouched


def test_cmd_timeout_on_silent_subprocess(spark):
    silent = "import time\nimport sys\nlist(sys.stdin)\ntime.sleep(60)"
    plan = _plan_cmd({"executable": sys.executable,
                      "args": ["-u", "-c", "import time; time.sleep(60)"],
                      "driver": "text", "columns": ["name"], "timeout": 2})
    del silent
    with pytest.raises(Exception, match="TimeoutError|no output line"):
        apply_plan(_df(spark), plan).collect()


def test_cmd_unexpected_exit_code_raises(spark):
    child = ("import sys\n"
             "for line in sys.stdin:\n"
             "    print(line.rstrip('\\n'), flush=True)\n"
             "sys.exit(3)")
    plan = _plan_cmd({"executable": sys.executable,
                      "args": ["-u", "-c", child],
                      "driver": "text", "columns": ["name"], "timeout": 10})
    with pytest.raises(Exception, match="exit code 3"):
        apply_plan(_df(spark), plan).collect()

    ok_plan = _plan_cmd({"executable": sys.executable,
                         "args": ["-u", "-c", child],
                         "driver": "text", "columns": ["name"], "timeout": 10,
                         "expected_exit_code": 3})
    out = {r.id: r.name for r in apply_plan(_df(spark), ok_plan).collect()}
    assert out[1] == "alpha"


def test_cmd_csv_multiline_values(spark):
    """Quoted fields containing raw newlines span physical lines; the
    parent must reassemble the full CSV record (quote balance), not read
    one line and desync every following row."""
    df = spark.createDataFrame([
        Row(id=1, name="multi\nline"),
        Row(id=2, name="plain"),
        Row(id=3, name='quoted "x"\nplus'),
    ])
    plan = _plan_cmd({"executable": sys.executable,
                      "args": ["-u", "-c", CSV_REVERSE],
                      "driver": "csv", "columns": ["name"]})
    out = {r.id: r.name for r in apply_plan(df, plan).collect()}
    assert out == {1: "enil\nitlum", 2: "nialp", 3: 'sulp\n"x" detouq'}


def test_cmd_honors_table_level_when(spark):
    """Table-level when must gate table-level (subprocess) transformers
    too, and the internal when-helper column must NOT reach the child:
    the csv child asserts the exact field count."""
    import textwrap

    strict_child = textwrap.dedent("""
        import sys, csv
        r = csv.reader(sys.stdin)
        w = csv.writer(sys.stdout, lineterminator='\\n')
        for row in r:
            assert len(row) == 3, f"leaked column: {row}"
            row[1] = row[1].upper() if row[1] != '\\\\N' else row[1]
            w.writerow(row)
            sys.stdout.flush()
    """)
    plan = build_plan({"tables": [{
        "name": "t",
        "when": "id != 2",
        "transformers": [
            {"name": "Cmd", "salt": "",
             "params": {"executable": sys.executable,
                        "args": ["-u", "-c", strict_child],
                        "driver": "csv", "columns": ["name"]}},
        ],
    }]})[0]
    out = {r.id: r.name for r in apply_plan(_df(spark), plan).collect()}
    assert out[1] == "ALPHA"
    assert out[2] == "beta"        # when false → untouched
    assert out[3] is None
