"""Contract-sized lsh_recall_eval truth at big SF (VERDICT r11 task 5).

The registry row gates the eval universe with ``doc_id % 4 == 0`` —
right-sized for the driver's sf0.01 gate but quadratic-truth-infeasible
at sf1 (12,500 docs -> ~78M interpreted pair-Jaccards; the r11 sweep
killed the DuckDB replay at 35 min). The function was built for exactly
this: its sampling knob bounds the truth universe. This tool runs the
SAME contract — same shingles, same banding, same rounding — under a
WIDER deterministic doc_id gate on BOTH engines and value-compares the
one metrics row, so the sf1 evidence is value-exact instead of
rows-only.

Usage: python tools/sf1_lsh_truth.py [sf_dir] [modulus] [min_jaccard]
  (defaults: .scale/sf1, 64 -> ~780 docs at sf1, ~305k truth pairs,
  min_jaccard = the registry row's _LSH_EVAL_MIN_J). min_jaccard is a
  contract parameter of lsh_recall_eval; lowering it lets a sparse
  gated universe still exercise the truth/hit counting with NONZERO
  true pairs (true pairs at the registry threshold are too rare to
  survive a doc_id gate at sf1 — the planted near-dups pair ids
  ~15k apart on median).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from greenmask_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    mod = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    min_j = (float(sys.argv[3]) if len(sys.argv) > 3
             else entrymod._LSH_EVAL_MIN_J)

    import pyspark.sql.functions as F

    from greenmask_spark.functions.dedup import lsh_recall_eval

    spark = get_spark("sf1-lsh-truth")
    docs = entrymod._tables(spark, sf_dir, "documents")["documents"]
    sub = docs.filter(F.col("doc_id") % mod == 0)
    n_docs = sub.count()
    m = lsh_recall_eval(
        sub,
        min_jaccard=min_j,
        num_perm=entrymod._NUM_PERM,
        bands=entrymod._BANDS,
        k=entrymod._SHINGLE_K,
        sample_fraction=1.0,
        max_docs=20_000,
    )
    spark_row = (
        round(float(m["recall"]), 6),
        round(float(m["precision"]), 6),
        int(m["true_pairs"]),
        int(m["candidate_pairs"]),
    )

    sql = entrymod._oracle_lsh_recall_eval().replace(
        "doc_id % 4 = 0", f"doc_id % {mod} = 0"
    ).replace(
        f">= {entrymod._LSH_EVAL_MIN_J}", f">= {min_j}"
    )
    assert f"% {mod} = 0" in sql and f">= {min_j}" in sql
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}'"
    )
    duck_row = con.sql(sql).fetchall()[0]
    duck_row = (
        round(float(duck_row[0]), 6),
        round(float(duck_row[1]), 6),
        int(duck_row[2]),
        int(duck_row[3]),
    )

    print(f"universe: {n_docs} docs (doc_id % {mod} == 0) at {sf_dir}")
    print(f"spark : recall={spark_row[0]} precision={spark_row[1]} "
          f"true={spark_row[2]} cand={spark_row[3]}")
    print(f"duckdb: recall={duck_row[0]} precision={duck_row[1]} "
          f"true={duck_row[2]} cand={duck_row[3]}")
    ok = spark_row == duck_row
    print("VALUE-EXACT" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
