"""Cmd transformer: external program transforms rows over stdin/stdout.

Reference: internal/db/postgres/transformers/cmd.go:50-472 + protocol
drivers pkg/toolkit/{json_api,csv_api,text_api}.go — a subprocess receives
rows (JSON keyed by column index, CSV of all columns, or raw text of one
column) on stdin, one line per row, and must answer one line per row on
stdout. Timeouts, expected exit codes and null-skip policies
(``skip_on_null_input``, ``skip_on_behaviour any|all``) gate invocation.

Spark-first: one subprocess per *partition* inside ``mapInPandas`` (the
reference runs one per table; per-partition preserves the line protocol
while scaling horizontally — documented lifecycle delta, SURVEY §7 #6).

The per-row read deadline is enforced by a reader thread (cmd.go enforces
``timeout`` on every protocol exchange; a blocking ``readline`` would hang
a Spark task forever on a stuck subprocess), and the exit code is checked
against ``expected_exit_code`` after stdin closes (cmd.go:~validate exit).
"""

from __future__ import annotations

import csv
import io
import json
import queue
import subprocess
import threading

import pandas as pd
from pyspark.sql import Column, DataFrame

from greenmask_spark.transformers.base import BuildContext, Transformer, register

#: COPY-style NULL sentinel used by the csv driver (pkg/toolkit/csv_api.go)
_NULL = "\\N"


def _isnull(v) -> bool:
    """Arrow→pandas nulls arrive as None (object cols) OR NaN (numeric
    cols promoted to float64); both must hit the protocol NULL paths."""
    return v is None or (isinstance(v, float) and v != v)


def _plain(v):
    """numpy scalar → native Python (json.dumps rejects np.int64)."""
    return v.item() if hasattr(v, "item") else v


class _DeadlineReader:
    """Reads subprocess stdout lines on a daemon thread so every read has
    a hard deadline — a hung or under-producing subprocess raises instead
    of stalling the Spark task indefinitely."""

    def __init__(self, stream):
        self._q: queue.Queue = queue.Queue()
        t = threading.Thread(target=self._pump, args=(stream,), daemon=True)
        t.start()

    def _pump(self, stream):
        try:
            for line in stream:
                self._q.put(line)
        finally:
            self._q.put(None)

    def readline(self, timeout: float) -> str:
        try:
            line = self._q.get(timeout=timeout)
        except queue.Empty:
            raise TimeoutError(
                f"Cmd: subprocess produced no output line within {timeout}s"
            ) from None
        if line is None:
            raise RuntimeError("Cmd: subprocess closed stdout before answering")
        return line


def _py_caster(spark_type):
    s = spark_type.simpleString()
    if s in ("tinyint", "smallint", "int", "integer", "bigint"):
        return int
    if s in ("float", "double") or s.startswith("decimal"):
        return float
    if s == "boolean":
        return lambda v: v.lower() in ("true", "t", "1")
    return str


@register
class Cmd(Transformer):
    name = "Cmd"
    allowed_types = ("any",)
    defaults = {"driver": "json", "timeout": 60, "expected_exit_code": 0,
                "skip_on_behaviour": "all"}
    table_level = True

    def apply(self, df: DataFrame, ctx: BuildContext) -> DataFrame:
        p = ctx.params
        executable = p["executable"]
        args = list(p.get("args", []))
        driver = p.get("driver", "json")
        timeout = float(p.get("timeout", 60))
        expected_exit_code = int(p.get("expected_exit_code", 0))
        affected: list[str] = [
            c["name"] if isinstance(c, dict) else c
            for c in p.get("columns", [ctx.column] if ctx.column else [])
        ]
        skip_behaviour = p.get("skip_on_behaviour", "all")
        skip_on_null = bool(p.get("skip_on_null_input", False))
        # protocol record = VISIBLE columns only (planner-internal helper/
        # stash columns must never reach the subprocess)
        cols = list(ctx.df_columns) or df.columns
        col_idx = {c: i for i, c in enumerate(cols)}
        schema = df.schema
        casters = [_py_caster(schema[c].dataType) for c in cols]

        if driver not in ("json", "text", "csv"):
            raise ValueError(f"Cmd: unsupported driver {driver!r}")

        def _encode_csv(rec: list) -> str:
            buf = io.StringIO()
            # keep the default \r\n lineterminator: QUOTE_MINIMAL only
            # quotes fields containing chars OF the terminator — with
            # lineterminator="" a field's raw newline went out unquoted
            # and silently split the record
            w = csv.writer(buf, lineterminator="\r\n")
            w.writerow([_NULL if _isnull(v) else str(_plain(v))
                        for v in rec])
            return buf.getvalue().rstrip("\r\n")

        def _decode_csv(line: str) -> list[str]:
            return next(csv.reader(io.StringIO(line)))

        def _run(it):
            # Lazily started on the first non-empty batch: empty partitions
            # (common when tiny tables scatter over many partitions) must
            # not pay a subprocess spawn + lifecycle.
            proc = None
            reader = None

            def ensure_proc():
                nonlocal proc, reader
                if proc is None:
                    proc = subprocess.Popen(
                        [executable, *args],
                        stdin=subprocess.PIPE,
                        stdout=subprocess.PIPE,
                        text=True,
                        bufsize=1,
                    )
                    reader = _DeadlineReader(proc.stdout)
                return proc, reader

            try:
                for pdf in it:
                    out_rows = []
                    # when-condition skip flags (planner-materialized):
                    # excluded rows must NOT be serialized to the
                    # subprocess at all — the when may exist precisely to
                    # withhold those rows from the external program
                    when_skip = (
                        pdf[ctx.skip_col].tolist()
                        if ctx.skip_col and ctx.skip_col in pdf.columns
                        else None
                    )
                    for rowno, row in enumerate(
                        pdf[cols].itertuples(index=False, name=None)
                    ):
                        rec = list(row)
                        if when_skip is not None and when_skip[rowno]:
                            out_rows.append(rec)
                            continue
                        nulls = [_isnull(rec[col_idx[c]]) for c in affected]
                        skip = (
                            skip_on_null
                            and (all(nulls) if skip_behaviour == "all" else any(nulls))
                        )
                        if skip:
                            out_rows.append(rec)
                            continue
                        proc, reader = ensure_proc()
                        if driver == "json":
                            # the reference's RawRecord wire format
                            # (pkg/toolkit/raw_record_test.go:25):
                            # {"<col idx>": {"d": <value>, "n": <null?>}}
                            # — null rides the "n" flag, not "d"
                            payload = {
                                str(col_idx[c]): (
                                    {"d": None, "n": True}
                                    if _isnull(rec[col_idx[c]])
                                    else {"d": _plain(rec[col_idx[c]]),
                                          "n": False}
                                )
                                for c in affected
                            }
                            proc.stdin.write(json.dumps(payload) + "\n")
                            proc.stdin.flush()
                            resp = json.loads(reader.readline(timeout))
                            # only AFFECTED columns are copied back
                            # (json_api.go SetRowDriverToRecord iterates
                            # affectedColumns); extra keys in the answer
                            # are ignored, a missing affected key leaves
                            # the original value
                            for c in affected:
                                cell = resp.get(str(col_idx[c]))
                                if cell is not None:
                                    rec[col_idx[c]] = (
                                        None if cell.get("n") else cell.get("d")
                                    )
                        elif driver == "csv":
                            # csv driver ships the WHOLE record (reference
                            # csv_api encodes all attributes by index) and
                            # reads the whole record back; only affected
                            # columns are copied into the output row.
                            proc.stdin.write(_encode_csv(rec) + "\n")
                            proc.stdin.flush()
                            # a quoted field may contain raw newlines → the
                            # record spans physical lines; a record is
                            # complete when its double-quotes balance
                            line = reader.readline(timeout).rstrip("\n")
                            while line.count('"') % 2 == 1:
                                line += "\n" + reader.readline(
                                    timeout).rstrip("\n")
                            fields = _decode_csv(line)
                            for c in affected:
                                i = col_idx[c]
                                v = fields[i]
                                rec[i] = None if v == _NULL else casters[i](v)
                        else:  # text: single affected column raw line
                            c = affected[0]
                            v = rec[col_idx[c]]
                            proc.stdin.write(
                                ("" if _isnull(v) else str(_plain(v))) + "\n")
                            proc.stdin.flush()
                            rec[col_idx[c]] = reader.readline(timeout).rstrip("\n")
                        out_rows.append(rec)
                    # rebuild only the visible columns; planner-internal
                    # columns (skip/stash/when) pass through via pdf.copy
                    out = pdf.copy()
                    for i, c in enumerate(cols):
                        out[c] = pd.Series([r[i] for r in out_rows],
                                           index=pdf.index).astype(object)
                    yield out
                if proc is not None:
                    proc.stdin.close()
                    try:
                        rc = proc.wait(timeout=timeout)
                    except subprocess.TimeoutExpired:
                        raise TimeoutError(
                            f"Cmd: subprocess did not exit within {timeout}s "
                            f"after stdin closed"
                        ) from None
                    if rc != expected_exit_code:
                        raise RuntimeError(
                            f"Cmd: exit code {rc}, expected {expected_exit_code}"
                        )
            finally:
                if proc is not None and proc.poll() is None:
                    try:
                        proc.kill()
                        proc.wait(timeout=5)
                    except Exception:
                        pass

        return df.mapInPandas(_run, schema=schema)

    def build(self, ctx: BuildContext) -> Column:  # pragma: no cover
        raise TypeError("Cmd is table-level; use apply()")
