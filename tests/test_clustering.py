"""Integer-exact k-means (functions/clustering.py): DuckDB iteration
parity (transcription-ready for a future driver row), partitioning
determinism, degenerate inputs, and the driver rail."""

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, LongType, StringType, StructField, StructType,
)

from greenmask_spark.functions.clustering import (
    assign_clusters, kmeans_assign, kmeans_train,
)

DIM, K, ITERS = 4, 3, 2


def _vectors(n=40):
    """Deterministic vectors whose components are multiples of 1/256 —
    exactly representable in float32 AND float64, so the Spark table
    (array<float>) and the DuckDB VALUES literals (doubles) quantize
    identically."""
    rng = np.random.default_rng(7)
    base = rng.integers(-256, 257, size=(n, DIM)) / 256.0
    # three planted clusters so iterations actually move the centroids
    base[:14, 0] += 2.0
    base[14:27, 1] -= 2.0
    return [(i, [float(x) for x in row]) for i, row in enumerate(base)]


def _df(spark, rows):
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ])
    return spark.createDataFrame(rows, schema)


def _duckdb_kmeans(rows, qbits=20):
    """The same init + ITERS Lloyd steps + final assignment, unrolled
    in ANSI SQL (floor division via the nonnegative modulus; argmin
    tie-break ORDER BY dist, cid)."""
    scale = 1 << qbits
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE v AS SELECT * FROM (VALUES "
        + ",".join(
            f"({i}, {', '.join(repr(x) for x in vec)})" for i, vec in rows
        )
        + f") x(vec_id, {', '.join(f'e{d}' for d in range(DIM))})"
    )
    qcols = ", ".join(
        f"CAST(floor(e{d} * {scale}) AS BIGINT) AS q{d}"
        for d in range(DIM)
    )
    sql = f"""
    WITH q AS (
      SELECT vec_id, {qcols},
             CAST(('0x' || substr(sha256(vec_id || ':kmeans:42'), 1, 15))
                  AS BIGINT) AS h
      FROM v),
    c0 AS (
      SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid,
             {', '.join(f'q{d} AS c{d}' for d in range(DIM))}
      FROM q ORDER BY h, vec_id LIMIT {K})"""
    prev = "c0"
    for it in range(1, ITERS + 1):
        dist = " + ".join(
            f"(q.q{d} - c.c{d}) * (q.q{d} - c.c{d})" for d in range(DIM)
        )
        floordivs = ", ".join(
            f"(sum(q{d}) - ((sum(q{d}) % count(*)) + count(*)) % count(*))"
            f" / count(*) AS m{d}"
            for d in range(DIM)
        )
        sql += f""",
    a{it} AS (
      SELECT q.vec_id, c.cid, {', '.join(f'q.q{d}' for d in range(DIM))}
      FROM q, {prev} c
      QUALIFY row_number() OVER (PARTITION BY q.vec_id
                                 ORDER BY {dist}, c.cid) = 1),
    s{it} AS (
      SELECT cid, {floordivs} FROM a{it} GROUP BY cid),
    c{it} AS (
      SELECT p.cid,
             {', '.join(
                 f'CAST(coalesce(s.m{d}, p.c{d}) AS BIGINT) AS c{d}'
                 for d in range(DIM))}
      FROM {prev} p LEFT JOIN s{it} s USING (cid))"""
        prev = f"c{it}"
    dist = " + ".join(
        f"(q.q{d} - c.c{d}) * (q.q{d} - c.c{d})" for d in range(DIM)
    )
    sql += f"""
    SELECT q.vec_id, CAST(c.cid AS INT) AS cid
    FROM q, {prev} c
    QUALIFY row_number() OVER (PARTITION BY q.vec_id
                               ORDER BY {dist}, c.cid) = 1
    ORDER BY q.vec_id"""
    out = con.sql(sql).fetchall()
    cents = con.sql(
        f"{sql.rsplit('SELECT q.vec_id', 1)[0]}"
        f" SELECT * FROM {prev} ORDER BY cid"
    )
    return out, [list(r)[1:] for r in cents.fetchall()]


def test_duckdb_iteration_parity(spark):
    rows = _vectors()
    df = _df(spark, rows)
    cents = kmeans_train(df, k=K, n_iters=ITERS, seed=42)
    got = sorted(
        (r.vec_id, r.cid)
        for r in assign_clusters(df, cents).collect()
    )
    want, want_cents = _duckdb_kmeans(rows)
    assert [list(c) for c in cents] == [
        [int(x) for x in c] for c in want_cents
    ]
    assert got == sorted(want)
    # the planted structure actually separated: >1 cluster in use
    assert len({c for _, c in got}) > 1


def test_partitioning_invariance(spark):
    rows = _vectors()
    a = sorted(
        (r.vec_id, r.cid)
        for r in kmeans_assign(_df(spark, rows), k=K, n_iters=ITERS)
        .collect()
    )
    b = sorted(
        (r.vec_id, r.cid)
        for r in kmeans_assign(
            _df(spark, rows).repartition(7), k=K, n_iters=ITERS
        ).collect()
    )
    assert a == b


def test_invalid_vectors_get_null_cid(spark):
    rows = _vectors(10) + [(100, None), (101, [0.5, 0.5])]  # null + short
    df = _df(spark, rows)
    cents = kmeans_train(df, k=2, n_iters=1)
    got = {r.vec_id: r.cid for r in assign_clusters(df, cents).collect()}
    assert got[100] is None and got[101] is None
    assert all(got[i] is not None for i, _ in rows[:10])


def test_sample_mod_trains_on_subset_assigns_all(spark):
    rows = _vectors(40)
    df = _df(spark, rows)
    out = kmeans_assign(df, k=2, n_iters=1, sample_mod=4)
    assert out.count() == 40


def test_small_sample_degrades_k(spark):
    rows = _vectors(2)
    cents = kmeans_train(_df(spark, rows), k=5, n_iters=1)
    assert len(cents) == 2


def test_empty_sample_raises(spark):
    df = _df(spark, _vectors(5)).filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="empty training sample"):
        kmeans_train(df, k=2, n_iters=1)


def test_nonfinite_vectors_get_null_cid_and_never_train(spark):
    """NaN/Inf components would make floor().astype(int64) undefined
    (platform-dependent INT64_MIN) and overflow the int64 squared
    distance — silently breaking cross-engine bit-exactness. They must
    follow the invalid-row contract instead: NULL cid on assignment,
    excluded from the init sample, ignored by the iteration sums."""
    good = _vectors(20)
    bad = [
        (100, [float("nan")] + [0.0] * (DIM - 1)),
        (101, [float("inf"), 0.0] + [0.0] * (DIM - 2)),
        (102, [0.0] * (DIM - 1) + [float("-inf")]),
    ]
    df = _df(spark, good + bad)
    cents = kmeans_train(df, k=K, n_iters=ITERS)
    got = {r.vec_id: r.cid for r in assign_clusters(df, cents).collect()}
    assert all(got[i] is None for i, _ in bad)
    assert all(got[i] is not None for i, _ in good)
    # training is unaffected by the poisoned rows: same centroids as
    # the clean frame (none of the bad ids lands in the k-row init
    # window, and the partial sums must skip them)
    assert cents == kmeans_train(_df(spark, good), k=K, n_iters=ITERS)
    # an all-nonfinite frame has nothing to train on
    with pytest.raises(ValueError, match="empty training sample"):
        kmeans_train(_df(spark, bad), k=2, n_iters=1)


def test_cell_rail(spark):
    df = _df(spark, _vectors(5))
    with pytest.raises(ValueError, match="driver rail"):
        kmeans_train(df, k=(1 << 20), n_iters=1)


def test_passthrough_keeps_columns_no_join(spark):
    rows = _vectors(20)
    df = _df(spark, rows).withColumn("extra", F.col("vec_id") * 2)
    out = kmeans_assign(df, k=2, n_iters=1, passthrough=True)
    assert out.columns == ["vec_id", "embedding", "extra", "cid"]
    got = {r.vec_id: r for r in out.collect()}
    assert all(got[i].extra == 2 * i for i, _ in rows)
    # matches the (id, cid) form exactly
    plain = {r.vec_id: r.cid
             for r in kmeans_assign(df, k=2, n_iters=1).collect()}
    assert {i: r.cid for i, r in got.items()} == plain
    # the scale contract: no rejoin — still zero exchanges
    from greenmask_spark.plan.health import plan_health
    out.count()
    assert plan_health(out)["shuffles"] == 0


def test_corpus_step_kmeans_cluster(spark):
    from greenmask_spark.pipeline.corpus import CORPUS_STEPS

    rows = [(i, f"doc {i}", v) for i, v in _vectors(20)]
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ])
    df = spark.createDataFrame(rows, schema)
    out = CORPUS_STEPS["kmeans_cluster"](df, {"k": 2, "n_iters": 1})
    assert out.columns == ["doc_id", "text", "embedding", "cid"]
    assert out.count() == 20
    assert out.filter(F.col("cid").isNull()).count() == 0


def test_kmeans_then_split_is_leakage_safe(spark):
    """The documented composition: kmeans_cluster → hash_split keyed
    on cid gives a SEMANTIC leakage-safe split (cluster_aware_split's
    guarantee, for embedding near-dups instead of lexical ones) —
    every member of a cluster lands in the same split."""
    from greenmask_spark.pipeline.corpus import CORPUS_STEPS

    rows = [(i, v) for i, v in _vectors(30)]
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ])
    df = spark.createDataFrame(rows, schema)
    out = CORPUS_STEPS["hash_split"](
        CORPUS_STEPS["kmeans_cluster"](df, {"k": 3, "n_iters": 2}),
        {"id_col": "cid"},
    )
    got = [(r.cid, r.split) for r in out.collect()]
    per_cluster = {}
    for cid, split in got:
        per_cluster.setdefault(cid, set()).add(split)
    assert all(len(s) == 1 for s in per_cluster.values())
    assert len(per_cluster) == 3


def test_assign_runs_on_a_stream(spark, tmp_path):
    """assign_clusters is stateless (centroids in the closure), so
    the identical plan runs on a streaming DataFrame — the
    bloom_contains licence."""
    rows = _vectors(20)
    src = str(tmp_path / "vec_stream_src")
    _df(spark, rows).write.parquet(src)
    batch = spark.read.parquet(src)
    cents = kmeans_train(batch, k=2, n_iters=1)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = assign_clusters(stream, cents)
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("kmeans_stream_out")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.vec_id: r.cid
           for r in spark.sql("SELECT * FROM kmeans_stream_out").collect()}
    want = {r.vec_id: r.cid
            for r in assign_clusters(batch, cents).collect()}
    assert got == want


def test_assign_plan_is_scan_plus_one_arrow_stage(spark):
    from greenmask_spark.plan.health import plan_health

    df = _df(spark, _vectors(20))
    cents = kmeans_train(df, k=2, n_iters=1)
    out = assign_clusters(df, cents)
    out.count()
    h = plan_health(out)
    assert h["shuffles"] == 0 and h["python"] == 1


def test_assignment_matches_brute_force_property(spark):
    """Property: for ARBITRARY float32 vectors (hypothesis-generated,
    ties and negatives included) the Arrow kernel's cid equals a
    from-scratch integer replay — exact quantization (floor after a
    power-of-two scale), int64 distances, first-minimum tie-break."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    comps = st.integers(min_value=-512, max_value=512)
    vec = st.lists(comps, min_size=3, max_size=3)

    @settings(max_examples=5, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.lists(vec, min_size=4, max_size=24))
    def check(int_vecs):
        # /256 keeps every component exact in float32 AND float64
        rows = [(i, [x / 256.0 for x in v])
                for i, v in enumerate(int_vecs)]
        cents = [q for _, q in rows[:3]]
        qc = [
            [int(np.floor(np.float64(np.float32(x)) * (1 << 20)))
             for x in c] for c in cents
        ]
        got = {r.vec_id: r.cid for r in assign_clusters(
            spark.createDataFrame(
                rows,
                StructType([
                    StructField("vec_id", LongType()),
                    StructField("embedding", ArrayType(FloatType())),
                ])), qc).collect()}
        cmat = np.array(qc, dtype=np.int64)
        for i, v in rows:
            q = np.floor(
                np.asarray(v, np.float64) * (1 << 20)).astype(np.int64)
            d = ((q[None, :] - cmat) ** 2).sum(axis=1)
            assert got[i] == int(d.argmin())

    check()


def test_registry_oracle_parity_sf0001(spark):
    """The STAGED r12 driver row end-to-end at sf0.001: Spark
    q_kmeans_clusters vs the generated dim-64 list-lambda DuckDB
    replay (__spark_entry__._oracle_kmeans_clusters) over the REAL
    embeddings table — exact (vec_id, cid) equality."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        (r.vec_id, r.cid)
        for r in entrymod.q_kmeans_clusters(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS FROM "
            f"'{sf_dir}/embeddings.parquet'")
    want = sorted(map(tuple, con.sql(
        entrymod._oracle_kmeans_clusters()).fetchall()))
    assert got == want and len(got) == 500


def test_float_centroids_drive_ivf_topk(spark):
    """The trained quantized centroids slot into the existing IVF ANN
    as its ``centroids`` argument (trained AND engine-reproducible,
    where train_ivf_centroids documents its float avg() is not); the
    probe stays deterministic under repartitioning."""
    from greenmask_spark.functions.clustering import kmeans_centroids_float
    from greenmask_spark.functions.similarity import ivf_topk

    rows = _vectors(40)
    corpus = _df(spark, rows)
    queries = _df(spark, rows[:3])
    cents = kmeans_centroids_float(corpus, k=4, n_iters=2)
    assert all(
        abs(c * (1 << 20) - round(c * (1 << 20))) == 0.0
        for row in cents for c in row
    )  # every component is an exact int/2^20
    a = sorted(map(tuple, ivf_topk(
        corpus, queries, k=3, n_probe=2, centroids=cents).collect()))
    b = sorted(map(tuple, ivf_topk(
        corpus.repartition(5), queries, k=3, n_probe=2,
        centroids=cents).collect()))
    assert a == b and len(a) == 9
    # ivf_topk excludes self-matches by contract; with the planted
    # structure each query's rank-1 neighbor comes from its own
    # cluster (ids 0..13 share the +2.0 offset on component 0)
    best = {qid: nid for qid, nid, score, rank in a if rank == 1}
    assert set(best) == {0, 1, 2}
    assert all(nid != qid and 0 <= nid < 14 for qid, nid in best.items())
