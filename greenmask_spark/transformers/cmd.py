"""Cmd transformer: external program transforms rows over stdin/stdout.

Reference: internal/db/postgres/transformers/cmd.go:50-472 + protocol
drivers pkg/toolkit/{json_api,csv_api,text_api}.go — a subprocess receives
rows (JSON keyed by column index, CSV, or raw text of one column) on
stdin, one line per row, and must answer one line per row on stdout.
Timeouts, expected exit codes and null-skip policies
(``skip_on_null_input``, ``skip_on_behaviour any|all``) gate invocation.

Spark-first: one subprocess per *partition* inside ``mapInPandas`` (the
reference runs one per table; per-partition preserves the line protocol
while scaling horizontally — documented lifecycle delta, SURVEY §7 #6).
"""

from __future__ import annotations

import json
import subprocess

import pandas as pd
from pyspark.sql import Column, DataFrame

from greenmask_spark.transformers.base import BuildContext, Transformer, register


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
        affected: list[str] = [
            c["name"] if isinstance(c, dict) else c
            for c in p.get("columns", [ctx.column] if ctx.column else [])
        ]
        skip_behaviour = p.get("skip_on_behaviour", "all")
        skip_on_null = bool(p.get("skip_on_null_input", False))
        cols = df.columns
        col_idx = {c: i for i, c in enumerate(cols)}
        schema = df.schema

        if driver not in ("json", "text"):
            raise ValueError(f"Cmd: unsupported driver {driver!r}")

        def _run(it):
            proc = subprocess.Popen(
                [executable, *args],
                stdin=subprocess.PIPE,
                stdout=subprocess.PIPE,
                text=True,
                bufsize=1,
            )
            try:
                for pdf in it:
                    out_rows = []
                    for row in pdf[cols].itertuples(index=False, name=None):
                        rec = list(row)
                        nulls = [rec[col_idx[c]] is None for c in affected]
                        skip = (
                            skip_on_null
                            and (all(nulls) if skip_behaviour == "all" else any(nulls))
                        )
                        if skip:
                            out_rows.append(rec)
                            continue
                        if driver == "json":
                            payload = {
                                str(col_idx[c]): {
                                    "d": rec[col_idx[c]],
                                    "n": rec[col_idx[c]] is None,
                                }
                                for c in affected
                            }
                            proc.stdin.write(json.dumps(payload) + "\n")
                            proc.stdin.flush()
                            resp = json.loads(proc.stdout.readline())
                            for c in affected:
                                cell = resp.get(str(col_idx[c]))
                                if cell is not None:
                                    rec[col_idx[c]] = (
                                        None if cell.get("n") else cell.get("d")
                                    )
                        else:  # text: single affected column raw line
                            c = affected[0]
                            v = rec[col_idx[c]]
                            proc.stdin.write(("" if v is None else str(v)) + "\n")
                            proc.stdin.flush()
                            rec[col_idx[c]] = proc.stdout.readline().rstrip("\n")
                        out_rows.append(rec)
                    yield pd.DataFrame(out_rows, columns=cols)
            finally:
                try:
                    proc.stdin.close()
                    proc.wait(timeout=timeout)
                except Exception:
                    proc.kill()

        return df.mapInPandas(_run, schema=schema)

    def build(self, ctx: BuildContext) -> Column:  # pragma: no cover
        raise TypeError("Cmd is table-level; use apply()")
