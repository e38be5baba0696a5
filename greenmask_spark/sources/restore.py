"""Restore INSERT path: row-format restore with conflict-skip.

Reference: internal/db/postgres/restorers/table_insert_format.go:88-278 —
the INSERT restorer builds ``INSERT INTO t (cols) [OVERRIDING SYSTEM
VALUE] VALUES (...) [ON CONFLICT DO NOTHING]`` statements, commits in
batches, and consults config exclusion lists (internal/domains/
config.go:115-130) to SKIP rows whose insert fails with a listed error
code or constraint name instead of aborting the restore.

Spark-first: the writer runs inside ``mapInPandas`` — one DB-API
connection per partition, executemany batches, per-row fallback on batch
failure so excluded errors skip exactly the offending rows. Returns a
summary DataFrame (inserted/skipped per partition) so the driver can
report restore totals without a side channel. Works with any DB-API
driver (psycopg, sqlite3, duckdb); the ``connection_factory`` must be a
top-level picklable callable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame

#: dialect → placeholder, conflict-skip clause style, and whether the
#: driver's ``rowcount`` after ``executemany`` is the TOTAL affected rows
#: (sqlite3) or unreliable/last-statement-only (psycopg2 documents it as
#: undefined; DB-API allows -1) — unreliable dialects count via per-row
#: execute when conflict-skip accounting is needed.
_DIALECTS = {
    "postgresql": {"placeholder": "%s", "ignore": "suffix",
                   "rowcount_total": False},
    "sqlite": {"placeholder": "?", "ignore": "or_ignore",
               "rowcount_total": True},
    "duckdb": {"placeholder": "?", "ignore": "suffix",
               "rowcount_total": False},
}

#: cap on bind parameters per multi-row INSERT (PostgreSQL's extended
#: protocol limit is 65535; stay well under it)
_MAX_PARAMS = 30000


@dataclass
class ErrorExclusions:
    """Restore error exclusion lists (domains/config.go:115-130): an
    insert failure is SKIPPED (not fatal) when its error code or violated
    constraint name is listed."""

    error_codes: list[str] = field(default_factory=list)
    constraints: list[str] = field(default_factory=list)

    def matches(self, exc: BaseException) -> bool:
        code = getattr(exc, "pgcode", None) or getattr(exc, "sqlstate", None)
        if code and code in self.error_codes:
            return True
        msg = str(exc)
        return any(c in msg for c in self.constraints) or any(
            c in msg for c in self.error_codes
        )


def build_insert_sql(
    table: str,
    columns: list[str],
    dialect: str = "postgresql",
    on_conflict_do_nothing: bool = False,
    overriding_system_value: bool = False,
    num_rows: int = 1,
) -> str:
    """The reference's statement shape (table_insert_format.go:88-150).
    ``num_rows`` > 1 emits a multi-row VALUES list — one round trip per
    batch, and (on drivers that report it) a single rowcount that is the
    exact inserted total under ON CONFLICT DO NOTHING."""
    d = _DIALECTS[dialect]
    verb = "INSERT"
    if on_conflict_do_nothing and d["ignore"] == "or_ignore":
        verb = "INSERT OR IGNORE"
    cols = ", ".join(columns)
    group = "(" + ", ".join([d["placeholder"]] * len(columns)) + ")"
    vals = ", ".join([group] * num_rows)
    overriding = " OVERRIDING SYSTEM VALUE" if (
        overriding_system_value and dialect == "postgresql") else ""
    sql = f"{verb} INTO {table} ({cols}){overriding} VALUES {vals}"
    if on_conflict_do_nothing and d["ignore"] == "suffix":
        sql += " ON CONFLICT DO NOTHING"
    return sql


def restore_copy(
    df: DataFrame,
    connection_factory: Callable[[], Any],
    table: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """COPY-protocol restore (reference restorers/table.go: COPY ... FROM
    STDIN replay of the dump stream) — the fast path next to
    ``restore_insert``.

    The row→COPY-text encoding runs JVM-side (``copy_encode`` expressions)
    BEFORE mapInPandas, so Python only pipes already-encoded lines into
    the driver's COPY stream — one ``copy_expert`` call per partition,
    fed by a file-like that drains the Arrow batches incrementally
    (never materializing a partition in memory). Works with any DB-API
    cursor exposing psycopg2's ``copy_expert``; returns a summary frame
    (rows_sent per partition)."""
    import pandas as pd

    from greenmask_spark.sources.copy_format import copy_encode

    cols = columns or list(df.columns)
    sql = f"COPY {table} ({', '.join(cols)}) FROM STDIN"
    lines = copy_encode(df, cols)

    def _write(it):
        conn = connection_factory()
        sent = 0

        class _Feed:
            """File-like over the incoming Arrow batches: read() hands the
            COPY stream to the driver chunk by chunk."""

            def __init__(self):
                self._chunks = self._gen()
                self._buf = ""

            def _gen(self):
                nonlocal sent
                for pdf in it:
                    if len(pdf):
                        sent += len(pdf)
                        yield "\n".join(pdf["line"]) + "\n"

            def read(self, size: int = -1) -> str:
                while size < 0 or len(self._buf) < size:
                    nxt = next(self._chunks, None)
                    if nxt is None:
                        break
                    self._buf += nxt
                out = self._buf if size < 0 else self._buf[:size]
                self._buf = self._buf[len(out):]
                return out

            readline = read

        try:
            cur = conn.cursor()
            if not hasattr(cur, "copy_expert"):
                raise NotImplementedError(
                    "restore_copy needs a cursor with copy_expert "
                    "(psycopg2-style); use restore_insert for plain DB-API"
                )
            cur.copy_expert(sql, _Feed())
            conn.commit()
        finally:
            try:
                conn.close()
            except Exception:
                pass
        yield pd.DataFrame({"rows_sent": [sent]})

    return lines.mapInPandas(_write, schema="rows_sent long")


def restore_insert(
    df: DataFrame,
    connection_factory: Callable[[], Any],
    table: str,
    dialect: str = "sqlite",
    on_conflict_do_nothing: bool = False,
    overriding_system_value: bool = False,
    batch_size: int = 1000,
    exclusions: ErrorExclusions | None = None,
) -> DataFrame:
    """Distributed INSERT restore. Returns a summary DataFrame
    (one row per partition: inserted, skipped) — call ``.agg(sum(...))``
    or ``collect`` to report totals. Execution is lazy like any Spark
    job; trigger it by consuming the summary."""
    import pandas as pd

    columns = list(df.columns)
    sql = build_insert_sql(table, columns, dialect,
                           on_conflict_do_nothing, overriding_system_value)
    excl = exclusions or ErrorExclusions()

    def _write(it):
        conn = connection_factory()
        inserted = skipped = 0
        try:
            cur = conn.cursor()
            batch: list[tuple] = []

            rowcount_total = _DIALECTS[dialect]["rowcount_total"]

            def flush():
                nonlocal inserted, skipped
                if not batch:
                    return
                # batch-local counters: globals update only AFTER the
                # batch commits — a mid-batch failure rolls back work that
                # must not have been counted (the replay path recounts
                # from scratch)
                b_ins = b_skip = 0
                try:
                    if on_conflict_do_nothing and not rowcount_total:
                        # executemany rowcount is undefined for this
                        # driver (psycopg2 reports the last statement
                        # only), so batch via multi-row VALUES — the
                        # reference's statement shape — where a SINGLE
                        # statement's rowcount is the exact inserted
                        # total: one round trip per chunk instead of one
                        # per row
                        group = max(1, _MAX_PARAMS // max(1, len(columns)))
                        for i in range(0, len(batch), group):
                            chunk = batch[i:i + group]
                            cur.execute(
                                build_insert_sql(
                                    table, columns, dialect,
                                    on_conflict_do_nothing,
                                    overriding_system_value,
                                    num_rows=len(chunk),
                                ),
                                [v for row in chunk for v in row],
                            )
                            rc = cur.rowcount
                            if rc is not None and rc >= 0:
                                b_ins += rc
                                b_skip += len(chunk) - rc
                            else:
                                # driver doesn't report rowcount: same
                                # optimistic accounting the per-row path
                                # used for rc=-1
                                b_ins += len(chunk)
                    else:
                        cur.executemany(sql, batch)
                        if on_conflict_do_nothing:
                            n = cur.rowcount if cur.rowcount and \
                                cur.rowcount > 0 else 0
                            b_ins = n
                            b_skip = len(batch) - n
                        else:
                            # no conflict clause: success means every row
                            # inserted (rowcount not consulted — DB-API
                            # leaves it undefined after executemany)
                            b_ins = len(batch)
                    conn.commit()
                    inserted += b_ins
                    skipped += b_skip
                    batch.clear()
                    return
                except Exception:
                    conn.rollback()
                    # batch failed: replay row-by-row so excluded errors
                    # skip exactly the offending rows
                    # (table_insert_format.go error-exclusion behavior).
                    # COMMIT per successful row: a later rollback must
                    # never discard earlier successes that were already
                    # counted (the reference commits per batch and
                    # re-runs failed batches row-wise the same way)
                    for row in batch:
                        try:
                            cur.execute(sql, row)
                            rc = cur.rowcount
                            inserted += 1 if rc != 0 else 0
                            skipped += 1 if rc == 0 else 0
                            conn.commit()
                        except Exception as row_exc:
                            conn.rollback()
                            if excl.matches(row_exc):
                                skipped += 1
                            else:
                                raise
                conn.commit()
                batch.clear()

            for pdf in it:
                for row in pdf[columns].itertuples(index=False, name=None):
                    batch.append(tuple(row))
                    if len(batch) >= batch_size:
                        flush()
            flush()
        finally:
            try:
                conn.close()
            except Exception:
                pass
        yield pd.DataFrame({"inserted": [inserted], "skipped": [skipped]})

    return df.mapInPandas(_write, schema="inserted long, skipped long")
