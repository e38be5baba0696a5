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
