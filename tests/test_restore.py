"""Restore INSERT path with conflict-skip + error exclusions.

Reference: restorers/table_insert_format.go:88-278, exclusion config
internal/domains/config.go:115-130. Exercised against sqlite (DB-API,
in-repo) — the writer is dialect-parameterized; postgres uses the same
code path with ON CONFLICT DO NOTHING.
"""

import sqlite3

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from greenmask_spark.sources.restore import (
    ErrorExclusions,
    build_insert_sql,
    restore_insert,
)


def test_build_insert_sql_shapes():
    pg = build_insert_sql("t", ["a", "b"], "postgresql",
                          on_conflict_do_nothing=True,
                          overriding_system_value=True)
    assert pg == ("INSERT INTO t (a, b) OVERRIDING SYSTEM VALUE "
                  "VALUES (%s, %s) ON CONFLICT DO NOTHING")
    sq = build_insert_sql("t", ["a"], "sqlite", on_conflict_do_nothing=True)
    assert sq == "INSERT OR IGNORE INTO t (a) VALUES (?)"


@pytest.fixture
def db(tmp_path):
    path = str(tmp_path / "restore.db")
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE tgt (id INTEGER PRIMARY KEY, name TEXT)")
    conn.execute("INSERT INTO tgt VALUES (2, 'existing')")
    conn.commit()
    conn.close()
    return path


def _rows(spark):
    return spark.createDataFrame(
        [Row(id=1, name="a"), Row(id=2, name="conflict"),
         Row(id=3, name="c"), Row(id=4, name="d")]).coalesce(2)


def test_restore_insert_conflict_skip(spark, db):
    summary = restore_insert(
        _rows(spark),
        lambda: sqlite3.connect(db, timeout=30),
        "tgt", dialect="sqlite", on_conflict_do_nothing=True,
    ).agg(F.sum("inserted").alias("i"), F.sum("skipped").alias("s")).collect()[0]
    assert summary.i == 3 and summary.s == 1

    conn = sqlite3.connect(db)
    rows = dict(conn.execute("SELECT id, name FROM tgt ORDER BY id"))
    conn.close()
    assert rows == {1: "a", 2: "existing", 3: "c", 4: "d"}


def test_restore_insert_error_exclusion(spark, db):
    """Without conflict-skip SQL, the PK violation surfaces as an error —
    excluded via the error list, the row is skipped instead of fatal."""
    summary = restore_insert(
        _rows(spark),
        lambda: sqlite3.connect(db, timeout=30),
        "tgt", dialect="sqlite", on_conflict_do_nothing=False,
        exclusions=ErrorExclusions(constraints=["tgt.id"]),
    ).agg(F.sum("inserted").alias("i"), F.sum("skipped").alias("s")).collect()[0]
    assert summary.i == 3 and summary.s == 1


def test_restore_insert_unexcluded_error_is_fatal(spark, db):
    with pytest.raises(Exception, match="UNIQUE|IntegrityError"):
        restore_insert(
            _rows(spark),
            lambda: sqlite3.connect(db, timeout=30),
            "tgt", dialect="sqlite", on_conflict_do_nothing=False,
        ).agg(F.sum("inserted")).collect()
