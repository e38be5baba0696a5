"""Semantic benchmark decontamination (functions/similarity.
semantic_decontaminate): the paraphrase-proof twin of
ngram_decontaminate. DuckDB parity over the REAL embeddings table
(the staged r13 driver-row oracle, proven here before any debut —
the kmeans_clusters convention), planted drop/keep behavior, the
invalid-row contract, the closure rail, the zero-exchange plan
guard, and the corpus step."""

import os
import sys

import duckdb
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, LongType, StructField, StructType,
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from greenmask_spark.functions.similarity import (  # noqa: E402
    semantic_decontaminate,
)

DIM = 8


def _df(spark, rows):
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ])
    return spark.createDataFrame(rows, schema)


def _unit(i, hot):
    v = [0.0] * DIM
    v[hot] = 1.0
    return (i, v)


def test_planted_drop_and_keep(spark):
    bench = _df(spark, [_unit(100, 0)])
    near = [0.99] + [0.02] * (DIM - 1)          # cos vs e0 ~ 0.999
    corpus = _df(spark, [
        _unit(0, 0),                            # identical -> dropped
        (1, near),                              # near-dup -> dropped
        _unit(2, 3),                            # orthogonal -> kept
        (3, [-1.0] + [0.0] * (DIM - 1)),        # opposite -> kept
    ])
    kept = semantic_decontaminate(corpus, bench, threshold=0.9)
    assert sorted(r.vec_id for r in kept.collect()) == [2, 3]
    assert kept.columns == ["vec_id", "embedding"]  # score dropped


def test_invalid_vectors_kept_with_null_score(spark):
    bench = _df(spark, [_unit(100, 0)])
    corpus = _df(spark, [
        _unit(0, 0),                       # dropped
        (1, None),                         # NULL vec -> kept, NULL score
        (2, [1.0, 0.0]),                   # wrong dim -> kept, NULL score
        (3, [0.0] * DIM),                  # zero norm -> kept, NULL score
        _unit(4, 1),                       # kept with a real score
    ])
    kept = semantic_decontaminate(
        corpus, bench, threshold=0.9, score_col="mc")
    got = {r.vec_id: r.mc for r in kept.collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1] is None and got[2] is None and got[3] is None
    assert got[4] == 0.0


def test_empty_benchmark_and_rail(spark):
    corpus = _df(spark, [_unit(0, 0)])
    with pytest.raises(ValueError, match="empty benchmark"):
        semantic_decontaminate(corpus, _df(spark, []), threshold=0.9)
    from greenmask_spark.functions import similarity as S

    orig = S._SEMDECON_MAX_CELLS
    S._SEMDECON_MAX_CELLS = 4
    try:
        with pytest.raises(ValueError, match="closure rail"):
            semantic_decontaminate(corpus, _df(spark, [_unit(9, 0)]),
                                   threshold=0.9)
    finally:
        S._SEMDECON_MAX_CELLS = orig


def test_rail_precheck_runs_before_any_full_collect(spark, monkeypatch):
    """r12 VERDICT "What's wrong" #2: the closure rail must fire from
    the distributed count+dim pre-check, NOT after a driver collect of
    the whole benchmark — every collect on the over-limit path returns
    at most one row (the pre-check agg)."""
    from pyspark.sql.classic.dataframe import DataFrame  # concrete impl

    from greenmask_spark.functions import similarity as S

    sizes = []
    orig_collect = DataFrame.collect

    def spy(self):
        rows = orig_collect(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    monkeypatch.setattr(S, "_SEMDECON_MAX_CELLS", 16)
    bench = _df(spark, [_unit(i, i % DIM) for i in range(10)])  # 80 cells
    corpus = _df(spark, [_unit(0, 0)])
    with pytest.raises(ValueError, match="closure rail"):
        semantic_decontaminate(corpus, bench, threshold=0.9)
    assert sizes and max(sizes) <= 1, sizes


def test_mixed_dim_benchmark_raises(spark):
    """A malformed benchmark (mixed embedding dims) raises instead of
    silently keying everything off one row's dimension and turning the
    decontamination filter into a no-op."""
    bench = _df(spark, [_unit(0, 0), (1, [1.0, 0.0])])
    corpus = _df(spark, [_unit(0, 0)])
    with pytest.raises(ValueError, match="mixed embedding dim"):
        semantic_decontaminate(corpus, bench, threshold=0.9)


def test_plan_is_scan_plus_one_arrow_stage(spark, sf_dir, tables):
    """The scale contract: benchmark in the closure, corpus pays one
    Arrow pass — zero exchanges however large the corpus."""
    from greenmask_spark.plan.health import plan_health

    emb = tables["embeddings"]
    out = semantic_decontaminate(
        emb, emb.filter(F.col("vec_id") % 17 == 0), threshold=0.45)
    out.count()
    h = plan_health(out)
    assert h["shuffles"] == 0, h
    assert h["python"] == 1, h


def test_registry_oracle_parity_sf0001(spark, sf_dir):
    """The staged r13 driver row vs its DuckDB oracle over the REAL
    embeddings table — identical survivors AND identical 4-dp max
    cosines (raw sequential-fold arithmetic on both engines, HALF_UP
    round on both)."""
    import __spark_entry__ as entrymod

    sdf = entrymod.q_semantic_decontaminate(spark, sf_dir)
    srows = sorted(
        (int(r.vec_id), None if r.max_cos is None else float(r.max_cos))
        for r in sdf.collect()
    )
    con = duckdb.connect()
    con.sql("CREATE VIEW embeddings AS FROM "
            f"'{os.path.join(sf_dir, 'embeddings.parquet')}'")
    drows = sorted(
        (int(a), None if b is None else float(b))
        for a, b in con.sql(
            entrymod._oracle_semantic_decontaminate()).fetchall()
    )
    assert len(srows) > 0
    # the benchmark slice itself must have been dropped (cos = 1.0)
    kept_ids = {i for i, _ in srows}
    assert not any(i % 17 == 0 for i in kept_ids)
    assert srows == drows


def test_corpus_step_and_describe(spark, sf_dir):
    from greenmask_spark.pipeline.corpus import (
        CORPUS_STEPS, describe_corpus_pipeline,
    )

    ctx = {"spark": spark, "sf_dir": sf_dir}
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    with_emb = CORPUS_STEPS["join_embeddings"](docs, {"_context": ctx})
    out = CORPUS_STEPS["semantic_decontaminate"](with_emb, {
        "_context": ctx, "benchmark": {"table": "embeddings",
                                       "where": "vec_id % 17 = 0"},
        "threshold": 0.45,
    })
    n_in, n_out = with_emb.count(), out.count()
    assert 0 < n_out < n_in  # the benchmark twins dropped
    with pytest.raises(ValueError, match="benchmark"):
        CORPUS_STEPS["semantic_decontaminate"](with_emb, {"_context": ctx})
    # --describe composes over empty frames: must not collect/train
    cfg = {
        "input": {"table": "documents"},
        "steps": [
            {"op": "join_embeddings"},
            {"op": "semantic_decontaminate",
             "benchmark": {"table": "embeddings"}, "threshold": 0.9,
             "score_col": "mc"},
        ],
    }
    rep = describe_corpus_pipeline(spark, cfg, sf_dir=sf_dir)
    steps = {r["step"]: r for r in rep}
    assert steps["semantic_decontaminate"]["added"] == ["mc"]
