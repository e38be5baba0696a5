"""Mergeable-sketch tests: Bloom membership, Count-Min frequency,
HyperLogLog cardinality (functions/sketches.py).

Each family gets: semantic guarantees (one-sided errors), merge ≡
build-on-union (the shard-combine contract), a pure-Python bit-replay
or exactness check, a DuckDB SQL parity test (transcription-ready
driver oracle), and a plan-shape assertion for the scale claim.
"""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from greenmask_spark.functions.sketches import (
    BITS_PER_WORD,
    bloom_build,
    bloom_contains,
    bloom_dedup_against,
    bloom_merge,
    bloom_params,
    cms_build,
    cms_lookup,
    cms_merge,
    hll_cardinality,
    hll_merge,
    hll_registers,
)
from greenmask_spark.plan.health import plan_health


def _py_hash(value, seed: int) -> int:
    """Pure-Python twin of sketches.keyed_hash (concat_ws ':' skips
    None)."""
    parts = [] if value is None else [str(value)]
    parts.append(str(seed))
    payload = ":".join(parts)
    return int(hashlib.sha256(payload.encode()).hexdigest()[:15], 16)


def _py_bloom_words(values, num_bits, num_hashes):
    words = {}
    for v in values:
        for i in range(num_hashes):
            pos = _py_hash(v, i) % num_bits
            w, b = pos // BITS_PER_WORD, pos % BITS_PER_WORD
            words[w] = words.get(w, 0) | (1 << b)
    return words


def _materialize(spark, sketch):
    """Collect a (tiny) sketch frame and re-create it — the persisted-
    parquet deployment shape, so downstream plan assertions see the
    sketch as a leaf, not its build subtree."""
    rows = sketch.collect()
    return spark.createDataFrame(rows, sketch.schema)


# ---------------------------------------------------------------- Bloom


def test_bloom_params_sanity():
    m1, k1 = bloom_params(1000, 0.01)
    m2, _ = bloom_params(10000, 0.01)
    m3, _ = bloom_params(1000, 0.001)
    assert m2 > m1 and m3 > m1 and k1 >= 1
    # ~9.6 bits/key at 1% FP
    assert 9 <= m1 / 1000 <= 11
    with pytest.raises(ValueError):
        bloom_params(0)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_bloom_build_matches_python_replay(spark):
    vals = [f"doc-{i}" for i in range(50)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        r["word_idx"]: r["bits"]
        for r in bloom_build(df, "v", num_bits=1 << 10, num_hashes=3).collect()
    }
    assert got == _py_bloom_words(vals, 1 << 10, 3)


def test_bloom_no_false_negatives(spark):
    vals = [f"url-{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    m, k = bloom_params(200, 0.05)
    bloom = bloom_build(df, "v", m, k)
    flags = bloom_contains(df, "v", bloom, m, k).select("v", "maybe_seen")
    assert all(r["maybe_seen"] for r in flags.collect())


def test_bloom_fp_rate_bounded(spark):
    inserted = [f"url-{i}" for i in range(200)]
    novel = [f"other-{i}" for i in range(500)]
    m, k = bloom_params(200, 0.05)
    bloom = bloom_build(
        spark.createDataFrame([(v,) for v in inserted], "v string"), "v", m, k
    )
    flags = bloom_contains(
        spark.createDataFrame([(v,) for v in novel], "v string"),
        "v", bloom, m, k,
    )
    fp = flags.filter("maybe_seen").count() / len(novel)
    assert fp <= 0.15  # 3x the sized 5% — deterministic, just not tight


def test_bloom_merge_equals_union_build(spark):
    a = spark.createDataFrame([(f"a-{i}",) for i in range(80)], "v string")
    b = spark.createDataFrame([(f"b-{i}",) for i in range(80)], "v string")
    merged = bloom_merge(
        bloom_build(a, "v", 1 << 12, 4), bloom_build(b, "v", 1 << 12, 4)
    )
    direct = bloom_build(a.unionByName(b), "v", 1 << 12, 4)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_bloom_dedup_against_drops_every_true_duplicate(spark):
    ref = spark.createDataFrame(
        [(i, f"seen text {i}") for i in range(100)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        # 40 true duplicates of the reference + 60 novel docs
        [(1000 + i, f"seen text {i}") for i in range(40)]
        + [(2000 + i, f"novel text {i}") for i in range(60)],
        "doc_id long, text string",
    )
    out = bloom_dedup_against(corpus, ref, num_bits=1 << 12, num_hashes=4)
    kept = {r["doc_id"] for r in out.collect()}
    # one-sided: NO true duplicate survives
    assert all(d >= 2000 for d in kept)
    # and the FP cost is bounded: most novel docs survive
    assert len(kept) >= 50
    # helper columns never leak
    assert out.columns == corpus.columns


def test_bloom_contains_zero_shuffle_on_probe_side(spark):
    df = spark.createDataFrame([(f"v{i}",) for i in range(100)], "v string")
    bloom = _materialize(spark, bloom_build(df, "v", 1 << 10, 3))
    out = bloom_contains(df, "v", bloom, 1 << 10, 3)
    h = plan_health(out)
    # k broadcast left joins, zero exchanges, zero Python nodes
    assert h["shuffles"] == 0 and h["python"] == 0
    assert h["bcasts"] == 3


def test_bloom_contains_runs_on_a_stream(spark, tmp_path):
    seen = spark.createDataFrame(
        [(f"seen-{i}",) for i in range(20)], "v string"
    )
    bloom = _materialize(spark, bloom_build(seen, "v", 1 << 10, 3))
    src = str(tmp_path / "src")
    batch = spark.createDataFrame(
        [(f"seen-{i}",) for i in range(20)]
        + [(f"new-{i}",) for i in range(20)],
        "v string",
    )
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = bloom_contains(stream, "v", bloom, 1 << 10, 3).filter(
        ~F.col("maybe_seen")
    )
    q = (
        out.writeStream.format("memory")
        .queryName("bloom_stream_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    kept = {
        r["v"] for r in spark.sql("SELECT v FROM bloom_stream_out").collect()
    }
    assert all(v.startswith("new-") for v in kept)
    assert len(kept) >= 15  # FPs may eat a few, never the majority


def test_bloom_duckdb_parity(spark):
    """Build + membership replayed verbatim in DuckDB — the
    transcription-ready oracle for the driver row."""
    vals = [(i, f"text {i % 30}") for i in range(60)]
    df = spark.createDataFrame(vals, "doc_id long, text string")
    m, k = 1 << 10, 3
    ref = df.filter("doc_id % 2 = 0").select(
        F.sha2("text", 256).alias("d")
    )
    bloom = bloom_build(ref, "d", m, k)
    flags = bloom_contains(
        df.withColumn("d", F.sha2("text", 256)), "d", bloom, m, k
    ).select("doc_id", "maybe_seen")
    got = sorted(map(tuple, flags.collect()))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, 'text {i % 30}')" for i, _ in enumerate(vals))
        + ") t(doc_id, text)"
    )
    seeds = ",".join(f"({i})" for i in range(k))
    want = con.sql(f"""
      WITH ref AS (SELECT sha256(text) AS d FROM docs WHERE doc_id % 2 = 0),
      pos AS (
        SELECT CAST(('0x' || substr(sha256(concat_ws(':', d,
                 CAST(s.i AS VARCHAR))), 1, 15)) AS BIGINT) % {m} AS p
        FROM ref CROSS JOIN (VALUES {seeds}) s(i)),
      words AS (
        SELECT p // {BITS_PER_WORD} AS word_idx,
               bit_or(1::BIGINT << CAST(p % {BITS_PER_WORD} AS INT)) AS bits
        FROM pos GROUP BY 1),
      probe AS (
        SELECT doc_id,
               CAST(('0x' || substr(sha256(concat_ws(':', sha256(text),
                 CAST(s.i AS VARCHAR))), 1, 15)) AS BIGINT) % {m} AS p
        FROM docs CROSS JOIN (VALUES {seeds}) s(i))
      SELECT doc_id,
             bool_and(w.bits IS NOT NULL AND
               (w.bits & (1::BIGINT << CAST(p % {BITS_PER_WORD} AS INT))) != 0
             ) AS maybe_seen
      FROM probe LEFT JOIN words w ON probe.p // {BITS_PER_WORD} = w.word_idx
      GROUP BY doc_id ORDER BY doc_id
    """).fetchall()
    assert got == sorted(map(tuple, want))


# ------------------------------------------------------------ Count-Min


def test_cms_exact_when_wide_and_never_under_when_narrow(spark):
    rows = [(f"t{i % 20}",) for i in range(400)]  # each term appears 20x
    df = spark.createDataFrame(rows, "term string")
    exact = {r["term"]: r["n"] for r in
             df.groupBy("term").agg(F.count("*").alias("n")).collect()}
    probes = df.select("term").distinct()

    wide = cms_build(df, "term", depth=4, width=4096)
    est_wide = {r["term"]: r["est"] for r in
                cms_lookup(probes, "term", wide, 4, 4096).collect()}
    assert est_wide == exact  # no collisions at 20 terms / 4096 buckets

    narrow = cms_build(df, "term", depth=2, width=8)
    est_narrow = {r["term"]: r["est"] for r in
                  cms_lookup(probes, "term", narrow, 2, 8).collect()}
    assert all(est_narrow[t] >= exact[t] for t in exact)
    assert any(est_narrow[t] > exact[t] for t in exact)  # collisions real


def test_cms_weighted_counts(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 1)], "term string, w long"
    )
    cms = cms_build(df, "term", depth=3, width=1024, weight_col="w")
    est = {r["term"]: r["est"] for r in cms_lookup(
        df.select("term").distinct(), "term", cms, 3, 1024).collect()}
    assert est == {"a": 12, "b": 1}


def test_cms_negative_weights_filtered(spark):
    """Negative weights would silently break the never-undercount
    guarantee — cms_build filters them out (NULL weights contribute
    nothing), the same enforcement hits() applies to edge weights."""
    df = spark.createDataFrame(
        [("a", 5), ("a", -3), ("b", None), ("b", 2)],
        "term string, w long",
    )
    cms = cms_build(df, "term", depth=3, width=1024, weight_col="w")
    est = {r["term"]: r["est"] for r in cms_lookup(
        df.select("term").distinct(), "term", cms, 3, 1024).collect()}
    assert est["a"] >= 5 and est["b"] >= 2  # never under the clean sum
    # and the negative row was dropped, not subtracted: 'a' is not 2
    assert est["a"] != 2


def test_cms_merge_equals_union_build(spark):
    a = spark.createDataFrame([(f"x{i % 5}",) for i in range(50)], "t string")
    b = spark.createDataFrame([(f"x{i % 9}",) for i in range(90)], "t string")
    merged = cms_merge(
        cms_build(a, "t", 3, 64), cms_build(b, "t", 3, 64)
    )
    direct = cms_build(a.unionByName(b), "t", 3, 64)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_cms_unseen_value_estimates_zero_on_sparse_sketch(spark):
    df = spark.createDataFrame([("a",), ("b",)], "t string")
    cms = cms_build(df, "t", depth=4, width=4096)
    probe = spark.createDataFrame([("never-inserted",)], "t string")
    [row] = cms_lookup(probe, "t", cms, 4, 4096).collect()
    assert row["est"] == 0


def test_cms_duckdb_parity(spark):
    rows = [(i, f"w{i % 7}") for i in range(70)]
    df = spark.createDataFrame(rows, "i long, term string")
    d, w = 3, 16
    cms = cms_build(df, "term", d, w)
    est = cms_lookup(df.select("term").distinct(), "term", cms, d, w)
    got = sorted(map(tuple, est.collect()))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('w{i % 7}')" for i in range(70)) + ") x(term)"
    )
    seeds = ",".join(f"({i})" for i in range(d))
    want = con.sql(f"""
      WITH cells AS (
        SELECT s.i AS row_idx,
               CAST(('0x' || substr(sha256(concat_ws(':', term,
                 CAST(s.i AS VARCHAR))), 1, 15)) AS BIGINT) % {w} AS bucket,
               count(*) AS cnt
        FROM t CROSS JOIN (VALUES {seeds}) s(i) GROUP BY 1, 2),
      probe AS (
        SELECT term, s.i AS row_idx,
               CAST(('0x' || substr(sha256(concat_ws(':', term,
                 CAST(s.i AS VARCHAR))), 1, 15)) AS BIGINT) % {w} AS bucket
        FROM (SELECT DISTINCT term FROM t) CROSS JOIN (VALUES {seeds}) s(i))
      SELECT term, min(coalesce(c.cnt, 0)) AS est
      FROM probe LEFT JOIN cells c USING (row_idx, bucket)
      GROUP BY term ORDER BY term
    """).fetchall()
    assert got == sorted(map(tuple, want))


def test_cms_build_single_mapside_shuffle(spark):
    df = spark.createDataFrame([(f"t{i}",) for i in range(100)], "t string")
    h = plan_health(cms_build(df, "t", 4, 256))
    assert h["shuffles"] == 1 and h["python"] == 0


# ---------------------------------------------------------- HyperLogLog


def _py_hll_registers(values, p):
    m, field = 1 << p, 60 - p
    regs = {}
    for v in values:
        h = _py_hash(v, 0)
        bucket, rem = h % m, h // m
        rho = field + 1 if rem == 0 else field + 1 - rem.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_hll_registers_match_python_replay(spark):
    vals = [f"user-{i}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {r["bucket"]: r["register"]
           for r in hll_registers(df, "v", p=6).collect()}
    assert got == _py_hll_registers(vals, 6)


def test_hll_duplicates_do_not_move_registers(spark):
    vals = [(f"u{i}",) for i in range(100)]
    once = spark.createDataFrame(vals, "v string")
    thrice = spark.createDataFrame(vals * 3, "v string")
    assert sorted(map(tuple, hll_registers(once, "v", 8).collect())) == \
        sorted(map(tuple, hll_registers(thrice, "v", 8).collect()))


def test_hll_merge_equals_union_build(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(200)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(200)], "v string")
    merged = hll_merge(
        hll_registers(a, "v", 8), hll_registers(b, "v", 8)
    )
    direct = hll_registers(a.unionByName(b), "v", 8)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hll_cardinality_accuracy(spark):
    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], "v long")
    est = hll_cardinality(hll_registers(df, "v", p=10), p=10)
    assert abs(est / n - 1.0) < 0.15  # 1.04/sqrt(1024) ~ 3.3%; 4.5 sigma


def test_hll_small_range_linear_counting(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "v long")
    est = hll_cardinality(hll_registers(df, "v", p=8), p=8)
    assert abs(est - 10) <= 2


def test_hll_empty_and_rails(spark):
    empty = spark.createDataFrame([], "v string")
    regs = hll_registers(empty, "v", p=8)
    assert regs.count() == 0
    assert hll_cardinality(regs, p=8) == 0.0
    with pytest.raises(ValueError):
        hll_registers(empty, "v", p=3)


def test_hll_duckdb_parity(spark):
    vals = list(range(500))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    p, m, field = 6, 1 << 6, 54
    got = sorted(map(tuple, hll_registers(df, "v", p).collect()))
    con = duckdb.connect()
    want = con.sql(f"""
      WITH h AS (
        SELECT CAST(('0x' || substr(sha256(concat_ws(':',
                 CAST(v AS VARCHAR), '0')), 1, 15)) AS BIGINT) AS h
        FROM range(500) t(v))
      SELECT CAST(h % {m} AS INT) AS bucket,
             CAST(max(CASE WHEN h // {m} = 0 THEN {field + 1}
                      ELSE {field + 1} - length(bin(h // {m})) END)
                  AS INT) AS register
      FROM h GROUP BY 1 ORDER BY 1
    """).fetchall()
    assert got == sorted(map(tuple, want))


def test_hll_registers_single_mapside_shuffle(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "v long")
    h = plan_health(hll_registers(df, "v", 8))
    assert h["shuffles"] == 1 and h["python"] == 0


# ------------------------------------------------- streaming maintenance


def test_sketch_stream_hll_and_replay_idempotence(spark, tmp_path):
    """HLL registers maintained over a two-batch file stream equal the
    batch build over the union, and a replayed batch id (at-least-once
    restart) leaves the merged sketch unchanged — the per-batch
    overwrite layout is what makes a plain parquet sink exactly-once
    for sketch state."""
    from greenmask_spark.streaming.pipeline import (
        merged_sketch,
        sketch_stream,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    b1 = spark.createDataFrame([(f"u{i}",) for i in range(100)], "v string")
    b2 = spark.createDataFrame(
        [(f"u{i}",) for i in range(50, 200)], "v string"
    )
    b1.write.parquet(src)
    stream = spark.readStream.schema(b1.schema).parquet(src)
    q = sketch_stream(
        stream, lambda b: hll_registers(b, "v", p=8), state,
        query_name="hll_sketch_stream",
    )
    try:
        q.processAllAvailable()
        b2.write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    merged = merged_sketch(spark, state, hll_merge)
    direct = hll_registers(b1.unionByName(b2), "v", 8)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )

    # simulate an at-least-once replay: rewrite batch 0's directory the
    # way a restarted query would (same id, same deterministic content)
    hll_registers(b1, "v", 8).write.mode("overwrite").parquet(
        f"{state}/batch=0"
    )
    replayed = merged_sketch(spark, state, hll_merge)
    assert sorted(map(tuple, replayed.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_sketch_stream_bloom_membership(spark, tmp_path):
    """Bloom words accumulated over a stream answer membership for
    every streamed value (no false negatives across batches)."""
    from greenmask_spark.streaming.pipeline import (
        merged_sketch,
        sketch_stream,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    m, k = 1 << 12, 4
    b1 = spark.createDataFrame([(f"a{i}",) for i in range(60)], "v string")
    b2 = spark.createDataFrame([(f"b{i}",) for i in range(60)], "v string")
    b1.write.parquet(src)
    stream = spark.readStream.schema(b1.schema).parquet(src)
    q = sketch_stream(
        stream, lambda b: bloom_build(b, "v", m, k), state,
        query_name="bloom_sketch_stream",
    )
    try:
        q.processAllAvailable()
        b2.write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    bloom = merged_sketch(spark, state, bloom_merge)
    flags = bloom_contains(b1.unionByName(b2), "v", bloom, m, k)
    assert all(r["maybe_seen"] for r in flags.collect())


def test_merged_sketch_empty_state_raises(spark, tmp_path):
    from greenmask_spark.streaming.pipeline import merged_sketch

    empty = tmp_path / "nothing"
    empty.mkdir()
    with pytest.raises(ValueError, match="no sketch batches"):
        merged_sketch(spark, str(empty), hll_merge)


# -------------------------------------------------------------- Histogram


def test_histogram_sketch_counts_and_clamping(spark):
    from greenmask_spark.functions.sketches import histogram_sketch

    vals = [-5.0, 0.0, 9.9, 10.0, 55.0, 99.9, 100.0, 250.0, None]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r["bin"]: r["cnt"] for r in
           histogram_sketch(df, "v", lo=0.0, hi=100.0, bins=10).collect()}
    # -5 clamps to bin 0; 100 and 250 clamp to bin 9; NULL excluded
    assert got == {0: 3, 1: 1, 5: 1, 9: 3}
    import pytest as _p
    with _p.raises(ValueError, match="bins"):
        histogram_sketch(df, "v", 0.0, 1.0, bins=0)
    with _p.raises(ValueError, match="hi"):
        histogram_sketch(df, "v", 1.0, 1.0)


def test_histogram_merge_equals_union_build(spark):
    from greenmask_spark.functions.sketches import (
        histogram_merge,
        histogram_sketch,
    )

    a = spark.createDataFrame([(float(i % 50),) for i in range(200)],
                              "v double")
    b = spark.createDataFrame([(float(i % 90),) for i in range(300)],
                              "v double")
    merged = histogram_merge(
        histogram_sketch(a, "v", 0.0, 100.0, 32),
        histogram_sketch(b, "v", 0.0, 100.0, 32),
    )
    direct = histogram_sketch(a.unionByName(b), "v", 0.0, 100.0, 32)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_histogram_quantiles_within_bin_width(spark):
    import numpy as np

    from greenmask_spark.functions.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )

    data = [float((i * 37) % 1000) for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in data], "v double")
    bins, lo, hi = 100, 0.0, 1000.0
    hist = histogram_sketch(df, "v", lo, hi, bins)
    qs = (0.1, 0.5, 0.9, 0.99)
    est = histogram_quantiles(hist, lo, hi, bins, qs)
    width = (hi - lo) / bins
    for q, e in zip(qs, est):
        exact = float(np.quantile(data, q))
        assert abs(e - exact) <= width + 1e-9, (q, e, exact)

    import pytest as _p
    with _p.raises(ValueError, match="outside"):
        histogram_quantiles(hist, lo, hi, bins, (1.5,))
    empty = histogram_sketch(
        spark.createDataFrame([], "v double"), "v", lo, hi, bins
    )
    with _p.raises(ValueError, match="empty"):
        histogram_quantiles(empty, lo, hi, bins)


def test_histogram_single_mapside_shuffle(spark):
    from greenmask_spark.functions.sketches import histogram_sketch

    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    h = plan_health(histogram_sketch(df, "v", 0.0, 100.0, 16))
    assert h["shuffles"] == 1 and h["python"] == 0


# ------------------------------------------------------------ properties


def test_sketch_properties(spark):
    """Property sweep over arbitrary string multisets: Bloom never
    false-negatives an inserted value, Count-Min never underestimates
    any value's frequency, HLL registers are insensitive to
    duplication, and select-style merges equal union builds — the
    one-sided-error contracts at random inputs, not just fixtures."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vals = st.text(
        alphabet="abcdefghij :%'\"\\\né中", min_size=0, max_size=12
    )

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(vals, min_size=1, max_size=60))
    def check(values):
        df = spark.createDataFrame([(v,) for v in values], "v string")
        m, k = 1 << 10, 3
        bloom = bloom_build(df, "v", m, k)
        flags = bloom_contains(df, "v", bloom, m, k)
        assert all(r["maybe_seen"] for r in flags.collect())

        cms = cms_build(df, "v", depth=2, width=8)
        est = {r["v"]: r["est"] for r in
               cms_lookup(df.select("v").distinct(), "v", cms, 2, 8)
               .collect()}
        from collections import Counter
        exact = Counter(values)
        assert all(est[v] >= c for v, c in exact.items())

        once = spark.createDataFrame([(v,) for v in set(values)],
                                     "v string")
        assert sorted(map(tuple, hll_registers(df, "v", 6).collect())) \
            == sorted(map(tuple, hll_registers(once, "v", 6).collect()))

    check()


# -------------------------------------------------- review-driven edges


def test_bloom_dedup_against_null_text_matches_exact_semantics(spark):
    """NULL-text rows: the exact digest anti-join never matches NULL,
    so the bloom path must keep every NULL-text corpus row even when
    the reference also contains NULL text (un-special-cased, one NULL
    reference row would drop ALL NULL corpus rows with certainty)."""
    ref = spark.createDataFrame(
        [(1, "dup me"), (2, None)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(10, "dup me"), (11, None), (12, None), (13, "novel")],
        "doc_id long, text string",
    )
    out = bloom_dedup_against(corpus, ref, num_bits=1 << 10, num_hashes=3)
    kept = {r["doc_id"] for r in out.collect()}
    assert 10 not in kept          # true duplicate dropped
    assert {11, 12} <= kept        # NULL-text rows always kept
    assert 13 in kept              # novel survives at this sizing


def test_bloom_zero_hashes_rejected(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="num_hashes"):
        bloom_build(df, "v", 1 << 10, 0)
    bloom = bloom_build(df, "v", 1 << 10, 2)
    with pytest.raises(ValueError, match="num_hashes"):
        bloom_contains(df, "v", bloom, 1 << 10, 0)


def test_merged_sketch_reads_glob(spark, tmp_path):
    """merged_sketch reads all batches as one glob'd parquet scan —
    no driver-local directory listing — and the checkpoint dir that
    sketch_stream writes alongside does not pollute the glob."""
    from greenmask_spark.functions.sketches import hll_merge, hll_registers
    from greenmask_spark.streaming.pipeline import merged_sketch

    state = str(tmp_path / "state")
    a = spark.createDataFrame([(f"x{i}",) for i in range(50)], "v string")
    b = spark.createDataFrame([(f"y{i}",) for i in range(50)], "v string")
    hll_registers(a, "v", 7).write.parquet(f"{state}/batch=0")
    hll_registers(b, "v", 7).write.parquet(f"{state}/batch=1")
    (tmp_path / "state" / "_checkpoint").mkdir()
    merged = merged_sketch(spark, state, hll_merge)
    direct = hll_registers(a.unionByName(b), "v", 7)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


# ----------------------------------------------------- windowed distinct


def _wd_rows():
    # 3 six-hour windows; window k has 40*(k+1) distinct users, each
    # user appearing twice (duplicates must not move the estimate)
    rows = []
    for k in range(3):
        base = k * 6 * 3600
        for u in range(40 * (k + 1)):
            for rep in range(2):
                rows.append((base + (u * 7 + rep * 11) % 21000,
                             f"w{k}-user-{u}"))
    return rows


def test_windowed_distinct_accuracy_and_dup_insensitivity(spark):
    from greenmask_spark.functions.sketches import windowed_distinct

    df = spark.createDataFrame(
        [(r[0], r[1]) for r in _wd_rows()], "sec long, user string"
    ).select(F.timestamp_seconds("sec").alias("ts"), "user")
    got = {r["window_start"]: r["n_distinct_est"] for r in
           windowed_distinct(df, "ts", "user", "6 hours", p=9).collect()}
    assert len(got) == 3
    for k, (_, est) in enumerate(sorted(got.items())):
        exact = 40 * (k + 1)
        assert abs(est / exact - 1.0) < 0.2, (k, est, exact)


def test_windowed_distinct_duckdb_parity(spark):
    """Register aggregation AND the exact-integer-Z estimate replayed
    in SQL — transcription-ready oracle for a future driver row."""
    import duckdb

    from greenmask_spark.functions.sketches import windowed_distinct

    rows = _wd_rows()
    df = spark.createDataFrame(rows, "sec long, user string").select(
        F.timestamp_seconds("sec").alias("ts"), "user"
    )
    p, m = 7, 1 << 7
    s = 61 - p
    alpha = 0.7213 / (1 + 1.079 / m)
    num = float(alpha * m * m) * float(1 << s)
    got = sorted(
        (r["window_start"].isoformat(), r["window_end"].isoformat(),
         r["n_distinct_est"])
        for r in windowed_distinct(df, "ts", "user", "6 hours", p=p)
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({sec}, '{u}')" for sec, u in rows)
        + ") x(sec, user)"
    )
    us = 6 * 3600 * 1_000_000
    want = con.sql(f"""
      WITH regs AS (
        SELECT make_timestamp(CAST(floor(sec * 1000000.0 / {us})
                 AS BIGINT) * {us}) AS ws,
               CAST(h % {m} AS INT) AS bucket,
               MAX(CASE WHEN h // {m} = 0 THEN {60 - p + 1}
                   ELSE {60 - p + 1} - length(bin(h // {m})) END) AS register
        FROM (SELECT sec, CAST(('0x' || substr(sha256(concat_ws(':',
                "user", '0')), 1, 15)) AS BIGINT) AS h FROM t)
        GROUP BY 1, 2),
      agg AS (
        SELECT ws, count(*) AS nz,
               CAST(({m} - count(*)) AS BIGINT) * {1 << s}
               + sum(1::BIGINT << CAST({s} - register AS INT)) AS zfull
        FROM regs GROUP BY ws)
      SELECT ws AS window_start, ws + INTERVAL 6 HOUR AS window_end,
             round(CASE WHEN {num!r} / CAST(zfull AS DOUBLE)
                          <= {2.5 * m}
                        AND {m} - nz > 0
                   THEN {float(m)!r} * ln({float(m)!r}
                        / CAST({m} - nz AS DOUBLE))
                   ELSE {num!r} / CAST(zfull AS DOUBLE) END,
                   4) AS n_distinct_est
      FROM agg ORDER BY 1
    """).fetchall()
    want = sorted((a.isoformat(), b.isoformat(), e) for a, b, e in want)
    assert got == want


def test_windowed_distinct_stream_matches_batch(spark, tmp_path):
    from greenmask_spark.functions.sketches import (
        hll_estimate_col,
        windowed_distinct,
    )
    from greenmask_spark.streaming.pipeline import windowed_distinct_stream

    rows = _wd_rows()
    batch = spark.createDataFrame(rows, "sec long, user string").select(
        F.timestamp_seconds("sec").alias("ts"), "user"
    )
    src = str(tmp_path / "src")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    regs = windowed_distinct_stream(stream, "ts", "user", "6 hours",
                                    watermark="1 hour", p=9)
    q = (
        regs.writeStream.format("memory").queryName("wd_regs")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    est = (
        spark.table("wd_regs")
        .groupBy("window_start", "window_end")
        .agg(F.count("*").alias("nz"),
             F.expr("sum(shiftleft(CAST(1 AS BIGINT),"
                    " CAST(52 - register AS INT)))").alias("zs"))
        .select("window_start", "window_end",
                hll_estimate_col(F.col("nz"), F.col("zs"), 9)
                .alias("n_distinct_est"))
    )
    got = sorted(map(tuple, est.collect()))
    want = sorted(map(tuple, windowed_distinct(
        batch, "ts", "user", "6 hours", p=9).collect()))
    assert got == want
