"""Config-driven corpus pipeline: step composition, validation, CLI."""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today",
            source="web"),
        Row(doc_id=2, text="the quick brown fox jumps over the lazy dog today",
            source="web"),  # exact dup of 1
        Row(doc_id=3, text="short", source="web"),
        Row(doc_id=4, text="contact me at alice@example.com for the details "
                           "about the project timeline and the budget",
            source="mail"),
        Row(doc_id=5, text="a a a a a a a a a a a a a a a a", source="spam"),
    ]
    return spark.createDataFrame(rows)


def test_build_pipeline_steps(corpus):
    from greenmask_spark.pipeline import build_corpus_pipeline

    out = build_corpus_pipeline(corpus, [
        {"op": "dedup_exact"},
        {"op": "quality_filter", "min_tokens": 6},
        {"op": "scrub_pii"},
        {"op": "hash_split", "weights": {"train": 0.5, "test": 0.5}},
        {"op": "pack_sequences", "max_tokens": 32, "n_packers": 2},
    ])
    rows = {r.doc_id: r for r in out.collect()}
    # 2 deduped away, 3 dropped by min_tokens
    assert set(rows) == {1, 4, 5}
    assert "alice@example.com" not in rows[4].text
    assert all(r.split in ("train", "test") for r in rows.values())
    assert all(r.seq_id is not None and r.seq_offset >= 0
               for r in rows.values())


def test_pipeline_is_lazy_and_validates(corpus):
    from greenmask_spark.pipeline import build_corpus_pipeline

    with pytest.raises(ValueError, match="unknown op"):
        build_corpus_pipeline(corpus, [{"op": "nope"}])
    with pytest.raises(ValueError, match="mapping"):
        build_corpus_pipeline(corpus, ["dedup_exact"])


def test_repetition_and_line_steps(corpus):
    from greenmask_spark.pipeline import build_corpus_pipeline

    out = build_corpus_pipeline(corpus, [
        {"op": "repetition_filter", "max_top_bigram_frac": 0.5},
    ])
    kept = {r.doc_id for r in out.collect()}
    assert 5 not in kept and 1 in kept  # "a a a…" is one repeated bigram

    two_line = corpus.withColumn(
        "text", F.concat_ws("\n", "text", F.lit("shared footer line")))
    out2 = build_corpus_pipeline(two_line, [{"op": "dedup_lines"}])
    texts = {r.doc_id: r.text for r in out2.collect()}
    assert sum("shared footer line" in t for t in texts.values()) == 1
    assert set(texts) == {1, 2, 3, 4, 5}
    assert out2.columns == two_line.columns


def test_run_pipeline_from_config(spark, sf_dir, tmp_path):
    """End-to-end over driver testdata + jsonl sink via the CLI verb."""
    from greenmask_spark.cli import main

    outdir = tmp_path / "corpus_out"
    cfg = {
        "input": {"table": "documents"},
        "steps": [
            {"op": "dedup_exact"},
            {"op": "hash_sample", "fraction": 0.5},
            {"op": "hash_split"},
        ],
        "output": {"path": str(outdir), "format": "jsonl"},
    }
    cfgp = tmp_path / "corpus.json"
    cfgp.write_text(json.dumps(cfg))
    rc = main(["corpus", "--config", str(cfgp), "--sf-dir", sf_dir])
    assert rc == 0
    back = spark.read.json(str(outdir))
    n = back.count()
    assert 0 < n
    assert {"doc_id", "text", "split"} <= set(back.columns)
    # deterministic: re-running produces identical rows
    rc = main(["corpus", "--config", str(cfgp), "--sf-dir", sf_dir])
    assert rc == 0
    assert spark.read.json(str(outdir)).count() == n


def test_fuzzy_dedup_step(corpus):
    from greenmask_spark.pipeline import build_corpus_pipeline

    out = build_corpus_pipeline(corpus, [
        {"op": "fuzzy_dedup", "num_perm": 8, "bands": 4, "k": 3,
         "min_jaccard": 0.8},
    ])
    kept = {r.doc_id for r in out.collect()}
    assert 2 not in kept and 1 in kept


def test_multi_source_mixture_config(spark, sf_dir):
    from greenmask_spark.pipeline import run_corpus_pipeline

    cfg = {
        "inputs": {
            "a": {"table": "documents"},
            "b": {"table": "documents"},
        },
        "mixture": {"rates": {"a": 1.0, "b": 0.5}},
        "steps": [{"op": "hash_split"}],
    }
    out = run_corpus_pipeline(spark, cfg, sf_dir=sf_dir)
    counts = {r.source_name: r["count"]
              for r in out.groupBy("source_name").count().collect()}
    n = counts["a"]
    assert 0.3 * n < counts["b"] < 0.7 * n
    assert "split" in out.columns

    import pytest as _p
    with _p.raises(ValueError, match="mixture.rates"):
        run_corpus_pipeline(spark, {"inputs": {"a": {"table": "documents"}}},
                            sf_dir=sf_dir)


def test_semantic_dedup_step(spark, sf_dir):
    from greenmask_spark.pipeline import run_corpus_pipeline

    cfg = {
        "input": {"table": "documents"},
        "steps": [
            {"op": "join_embeddings", "table": "embeddings"},
            {"op": "semantic_dedup", "dim": 64, "threshold": 0.9},
        ],
    }
    out = run_corpus_pipeline(spark, cfg, sf_dir=sf_dir)
    n_docs = run_corpus_pipeline(
        spark, {"input": {"table": "documents"}, "steps": []}, sf_dir=sf_dir
    ).count()
    n = out.count()
    assert 0 < n <= n_docs
    assert "embedding" in out.columns and "text" in out.columns

    import pytest as _p
    with _p.raises(ValueError, match="dim"):
        run_corpus_pipeline(spark, {
            "input": {"table": "documents"},
            "steps": [{"op": "join_embeddings"},
                      {"op": "semantic_dedup"}],
        }, sf_dir=sf_dir)


def test_expression_steps_work_on_streams(spark, sf_dir, tmp_path):
    """Expression-only corpus steps (quality filter, PII scrub, split)
    compose onto a STREAMING DataFrame unchanged — the pipeline is plan
    construction, not execution, so Structured Streaming accepts it."""
    import shutil

    from greenmask_spark.pipeline import build_corpus_pipeline
    from greenmask_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    src = str(tmp_path / "docs_src")
    docs.limit(50).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = build_corpus_pipeline(stream, [
        {"op": "quality_filter", "min_tokens": 1},
        {"op": "scrub_pii"},
        {"op": "hash_split"},
    ])
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("corpus_stream")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM corpus_stream").collect()
    finally:
        q.stop()
    assert 0 < len(rows) <= 50
    assert all(r.split in ("train", "val", "test") for r in rows)


def test_web_hygiene_steps(spark):
    from greenmask_spark.pipeline import build_corpus_pipeline

    docs = spark.createDataFrame(
        [(i,
          f"https://{'Bad.com' if i % 2 else 'good.org'}/x?utm_source=s&p={i}",
          f"text {i}")
         for i in range(20)],
        ["doc_id", "url", "text"],
    )
    out = build_corpus_pipeline(docs, [
        {"op": "normalize_urls", "domain_col": "domain"},
        {"op": "blocklist", "domains": ["bad.com"], "domain_col": "domain"},
        {"op": "cap_per_domain", "max_docs": 3, "domain_col": "domain"},
    ])
    rows = out.collect()
    assert len(rows) == 3
    assert all(r.domain == "good.org" for r in rows)
    assert all("utm_source" not in r.url for r in rows)


def test_register_corpus_step(spark):
    from pyspark.sql import functions as F

    from greenmask_spark.pipeline import (
        CORPUS_STEPS,
        build_corpus_pipeline,
        register_corpus_step,
    )

    def upcase(df, p):
        return df.withColumn(p.get("col", "text"),
                             F.upper(F.col(p.get("col", "text"))))

    register_corpus_step("upcase_test", upcase)
    try:
        df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
        out = build_corpus_pipeline(df, [{"op": "upcase_test"}]).collect()
        assert out[0].text == "ABC"
        import pytest as _p
        with _p.raises(ValueError, match="already registered"):
            register_corpus_step("upcase_test", upcase)
        register_corpus_step("upcase_test", upcase, replace=True)
    finally:
        CORPUS_STEPS.pop("upcase_test", None)


def test_describe_pipeline(spark, sf_dir, capsys, tmp_path):
    import json

    from greenmask_spark.cli import main
    from greenmask_spark.pipeline.corpus import describe_corpus_pipeline

    cfg = {
        "input": {"table": "documents"},
        "steps": [
            {"op": "hash_split"},
            {"op": "fuzzy_dedup", "num_perm": 8, "bands": 4, "k": 3},
            {"op": "pack_sequences", "max_tokens": 64, "n_packers": 2},
        ],
    }
    rep = describe_corpus_pipeline(spark, cfg, sf_dir=sf_dir)
    steps = {r["step"]: r for r in rep}
    assert "doc_id" in steps["input"]["added"]
    assert steps["hash_split"]["added"] == ["split"]
    assert set(steps["pack_sequences"]["added"]) >= {"seq_id", "seq_pos"}

    cfgp = tmp_path / "c.json"
    cfgp.write_text(json.dumps(cfg))
    rc = main(["corpus", "--config", str(cfgp), "--sf-dir", sf_dir,
               "--describe"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "hash_split" in out and "+split" in out


def test_cluster_split_and_linear_score_steps(corpus):
    from greenmask_spark.pipeline import build_corpus_pipeline

    out = build_corpus_pipeline(corpus, [
        {"op": "linear_score",
         "weights": {"quick": 1.5, "spam": -3.0}},
        {"op": "cluster_split", "k": 3, "num_perm": 8, "bands": 4,
         "weights": {"train": 0.5, "test": 0.5}},
    ])
    rows = {r.doc_id: r for r in out.collect()}
    assert all(0.0 < r.score < 1.0 for r in rows.values())
    assert rows[1].score > rows[5].score  # 'quick' docs beat neutral
    # exact dups 1/2 share a split (same cluster)
    assert rows[1].split == rows[2].split


def test_describe_handles_context_steps(spark, sf_dir):
    """--describe must work for configs with context-requiring steps
    (join_embeddings) — validation must not compose without context."""
    from greenmask_spark.pipeline.corpus import describe_corpus_pipeline

    cfg = {
        "input": {"table": "documents"},
        "steps": [
            {"op": "join_embeddings"},
            {"op": "semantic_dedup", "dim": 64},
        ],
    }
    rep = describe_corpus_pipeline(spark, cfg, sf_dir=sf_dir)
    steps = {r["step"]: r for r in rep}
    assert steps["join_embeddings"]["added"] == ["embedding"]


def test_describe_handles_kmeans_cluster_step(spark, sf_dir):
    """--describe composes over EMPTY frames, but kmeans_cluster trains
    eagerly at composition time — without the dry_run context flag it
    would collect an empty init sample and raise ValueError('empty
    training sample'), crashing describe on a perfectly valid config.
    The dry-run path must report the schema without training."""
    from greenmask_spark.pipeline.corpus import describe_corpus_pipeline

    cfg = {
        "input": {"table": "documents"},
        "steps": [
            {"op": "join_embeddings"},
            {"op": "kmeans_cluster", "k": 4, "vec_col": "embedding"},
            {"op": "hash_split", "key_col": "cid",
             "weights": {"train": 0.9, "test": 0.1}},
        ],
    }
    rep = describe_corpus_pipeline(spark, cfg, sf_dir=sf_dir)
    steps = {r["step"]: r for r in rep}
    assert steps["kmeans_cluster"]["added"] == ["cid"]
    assert steps["hash_split"]["added"] == ["split"]


def test_linear_score_step_overwrites_existing_column(corpus):
    from greenmask_spark.pipeline import build_corpus_pipeline

    pre = corpus.withColumn("score", F.lit(0.0))
    out = build_corpus_pipeline(pre, [
        {"op": "linear_score", "weights": {"quick": 1.0},
         "min_score": 0.0},
    ])
    assert out.columns.count("score") == 1
    assert out.count() == corpus.count()


def test_ann_rerank_step(spark, sf_dir):
    """Production ANN from config: join embeddings, coarse IVF propose,
    exact rerank — result matches calling the library directly, and the
    lsh coarse path also runs."""
    from greenmask_spark.functions.similarity import (
        hash_centroids,
        ivf_topk,
        rerank_topk,
    )
    from greenmask_spark.pipeline import run_corpus_pipeline
    from greenmask_spark.session import load_tables

    cfg = {
        "input": {"table": "documents"},
        "steps": [
            {"op": "join_embeddings", "table": "embeddings"},
            {"op": "ann_rerank", "coarse": "ivf", "dim": 64,
             "coarse_k": 20, "k": 3, "query_filter": "doc_id < 3"},
        ],
    }
    got = {(r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
           for r in run_corpus_pipeline(spark, cfg, sf_dir=sf_dir).collect()}

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    corpus = docs.join(
        emb.withColumnsRenamed({"vec_id": "doc_id"}), "doc_id"
    ).select("doc_id", "embedding")
    queries = corpus.filter("doc_id < 3")
    cand = ivf_topk(corpus, queries, k=20, n_probe=4,
                    centroids=hash_centroids(64, 16, seed=42),
                    id_col="doc_id", vec_col="embedding")
    want = {(r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
            for r in rerank_topk(cand, corpus, queries, k=3,
                                 id_col="doc_id",
                                 vec_col="embedding").collect()}
    assert got == want and got

    cfg["steps"][1].update({"coarse": "lsh", "n_planes": 4})
    lsh_out = run_corpus_pipeline(spark, cfg, sf_dir=sf_dir)
    assert {"query_id", "neighbor_id", "cos_sim", "rank"} <= set(
        lsh_out.columns)
    assert lsh_out.count() >= 0

    import pytest as _p
    with _p.raises(ValueError, match="queries|query_filter"):
        run_corpus_pipeline(spark, {
            "input": {"table": "documents"},
            "steps": [{"op": "join_embeddings", "table": "embeddings"},
                      {"op": "ann_rerank", "dim": 64}],
        }, sf_dir=sf_dir)


def test_shuffle_and_packing_report_steps(spark, sf_dir):
    """Deterministic shuffle yields an identical order across runs;
    packing_report summarizes a pack_sequences output in one row."""
    from greenmask_spark.pipeline import run_corpus_pipeline

    cfg = {
        "input": {"table": "documents"},
        "steps": [{"op": "shuffle", "seed": 7}],
    }
    a = [r.doc_id for r in run_corpus_pipeline(spark, cfg, sf_dir=sf_dir)
         .limit(50).collect()]
    b = [r.doc_id for r in run_corpus_pipeline(spark, cfg, sf_dir=sf_dir)
         .limit(50).collect()]
    assert a == b and a != sorted(a)

    rep_cfg = {
        "input": {"table": "documents"},
        "steps": [
            {"op": "pack_sequences", "max_tokens": 512, "n_packers": 4},
            {"op": "packing_report", "max_tokens": 512},
        ],
    }
    rep = run_corpus_pipeline(spark, rep_cfg, sf_dir=sf_dir).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r.n_bins > 0 and r.n_docs > 0
    assert 0 < r.mean_fill <= 1 and 0 <= r.padding_frac < 1


def test_dedup_against_step(spark, sf_dir, tmp_path):
    """Config-driven incremental dedup: a shard deduped against a
    reference parquet drops its overlap and keeps the rest."""
    from greenmask_spark.pipeline import run_corpus_pipeline
    from greenmask_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ref_path = str(tmp_path / "ref.parquet")
    # reference = a hash-gated half of the corpus (different ids
    # would also work — the op keys on content, not ids)
    docs.filter("pmod(doc_id, 2) = 0").write.parquet(ref_path)

    cfg = {
        "input": {"table": "documents"},
        "steps": [{"op": "dedup_against",
                   "reference": {"path": ref_path, "format": "parquet"},
                   "level": "exact"}],
    }
    out = run_corpus_pipeline(spark, cfg, sf_dir=sf_dir)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    rows = docs.select("doc_id", "text").collect()
    even_texts = {r.text for r in rows if r.doc_id % 2 == 0}
    # exactly the odd docs whose TEXT does not duplicate a reference doc
    want = {r.doc_id for r in rows
            if r.doc_id % 2 == 1 and r.text not in even_texts}
    assert kept == want and kept

    import pytest as _p
    with _p.raises(ValueError, match="reference"):
        run_corpus_pipeline(spark, {
            "input": {"table": "documents"},
            "steps": [{"op": "dedup_against"}],
        }, sf_dir=sf_dir)


def test_bloom_dedup_step(spark, sf_dir, tmp_path):
    """Approximate seen-set dedup: one-sided vs the exact step — every
    doc the exact digest anti-join drops is also dropped here (no false
    negatives), and the extra (false-positive) drops stay bounded."""
    from greenmask_spark.pipeline import run_corpus_pipeline
    from greenmask_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ref_path = str(tmp_path / "bloom_ref.parquet")
    docs.filter("pmod(doc_id, 2) = 0").write.parquet(ref_path)

    base = {"input": {"table": "documents"}}
    exact = run_corpus_pipeline(spark, {
        **base,
        "steps": [{"op": "dedup_against", "level": "exact",
                   "reference": {"path": ref_path, "format": "parquet"}}],
    }, sf_dir=sf_dir)
    # sized from the reference cardinality through bloom_params
    n_ref = docs.filter("pmod(doc_id, 2) = 0").count()
    bloom = run_corpus_pipeline(spark, {
        **base,
        "steps": [{"op": "bloom_dedup", "n_items": n_ref,
                   "fp_rate": 0.01,
                   "reference": {"path": ref_path, "format": "parquet"}}],
    }, sf_dir=sf_dir)
    exact_kept = {r.doc_id for r in exact.select("doc_id").collect()}
    bloom_kept = {r.doc_id for r in bloom.select("doc_id").collect()}
    assert bloom_kept <= exact_kept  # never passes a true duplicate
    assert len(bloom_kept) >= 0.9 * len(exact_kept)  # FP cost bounded
    assert bloom.columns == docs.columns

    import pytest as _p
    with _p.raises(ValueError, match="reference"):
        run_corpus_pipeline(spark, {
            **base, "steps": [{"op": "bloom_dedup"}],
        }, sf_dir=sf_dir)


def test_select_to_budget_step(spark, sf_dir):
    """Config-driven token-budget cut: derives whitespace token counts
    when no token_col is given, keeps the n_chars-best prefix within
    budget, and leaks no helper column."""
    from greenmask_spark.pipeline import run_corpus_pipeline
    from greenmask_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    out = run_corpus_pipeline(spark, {
        "input": {"table": "documents"},
        "steps": [{"op": "select_to_budget", "token_budget": 5000,
                   "score_col": "n_chars"}],
    }, sf_dir=sf_dir)
    assert out.columns == docs.columns
    rows = out.collect()
    assert 0 < len(rows) < docs.count()
    # budget respected on the derived whitespace token counts
    total = sum(len(r.text.split()) for r in rows if r.text.strip())
    assert total <= 5000

    import pytest as _p
    with _p.raises(ValueError, match="token_budget"):
        run_corpus_pipeline(spark, {
            "input": {"table": "documents"},
            "steps": [{"op": "select_to_budget", "score_col": "n_chars"}],
        }, sf_dir=sf_dir)


def test_weighted_sample_step(spark, sf_dir):
    """Config-driven weighted draw: n rows back, deterministic across
    runs, weight column required."""
    from greenmask_spark.pipeline import run_corpus_pipeline

    cfg = {
        "input": {"table": "documents"},
        "steps": [{"op": "weighted_sample", "n": 50,
                   "weight_col": "n_chars"}],
    }
    a = {r.doc_id for r in
         run_corpus_pipeline(spark, cfg, sf_dir=sf_dir).collect()}
    b = {r.doc_id for r in
         run_corpus_pipeline(spark, cfg, sf_dir=sf_dir).collect()}
    assert a == b and len(a) == 50

    import pytest as _p
    with _p.raises(ValueError, match="weight_col"):
        run_corpus_pipeline(spark, {
            "input": {"table": "documents"},
            "steps": [{"op": "weighted_sample", "n": 5}],
        }, sf_dir=sf_dir)


def test_dedup_against_step_prepared_reference(spark, sf_dir, tmp_path):
    """The rolling-crawl config shape: the reference is keyed ONCE with
    prepare_reference and written to parquet; pointing the step's
    reference spec at that frame gives identical results to the raw
    corpus, for exact and fuzzy levels — no per-run re-shingling."""
    from greenmask_spark.functions.dedup import prepare_reference
    from greenmask_spark.pipeline import run_corpus_pipeline
    from greenmask_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    raw_ref = docs.filter("pmod(doc_id, 2) = 0")
    exact_path = str(tmp_path / "prep_exact.parquet")
    fuzzy_path = str(tmp_path / "prep_fuzzy.parquet")
    prepare_reference(raw_ref, "exact").write.parquet(exact_path)
    prepare_reference(raw_ref, "fuzzy", num_perm=8, k=3,
                      with_shingles=False).write.parquet(fuzzy_path)

    def run(ref_spec, **extra):
        cfg = {"input": {"table": "documents"},
               "steps": [{"op": "dedup_against", "reference": ref_spec,
                          **extra}]}
        out = run_corpus_pipeline(spark, cfg, sf_dir=sf_dir)
        return {r.doc_id for r in out.select("doc_id").collect()}

    raw_path = str(tmp_path / "raw_ref.parquet")
    raw_ref.write.parquet(raw_path)
    assert run({"path": exact_path}, level="exact") == \
        run({"path": raw_path}, level="exact")
    assert run({"path": fuzzy_path}, level="fuzzy", num_perm=8,
               bands=4, k=3) == \
        run({"path": raw_path}, level="fuzzy", num_perm=8, bands=4, k=3)


def test_dedup_against_step_prepared_verified_two_shards(
        spark, sf_dir, tmp_path):
    """The VERIFIED rolling-crawl shape: one prepared frame (stored
    WITH shingle sets — the default; ~k× storage vs band-only, see
    SCALE.md) serves min_jaccard-verified fuzzy dedup across TWO
    incoming shards with results identical to the recompute path; a
    band-only frame under min_jaccard fails loudly naming
    with_shingles; a num_perm mismatch between prepare and step params
    is a hard error, not silent mis-dedup."""
    import pytest

    from greenmask_spark.functions.dedup import prepare_reference
    from greenmask_spark.pipeline import run_corpus_pipeline
    from greenmask_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    raw_ref = docs.filter("pmod(doc_id, 3) = 0")
    prep_path = str(tmp_path / "prep_verified.parquet")
    prepare_reference(raw_ref, "fuzzy", num_perm=8, k=3).write.parquet(
        prep_path)
    raw_path = str(tmp_path / "raw_ref2.parquet")
    raw_ref.write.parquet(raw_path)
    shard1 = str(tmp_path / "shard1.parquet")
    shard2 = str(tmp_path / "shard2.parquet")
    docs.filter("pmod(doc_id, 3) = 1").write.parquet(shard1)
    docs.filter("pmod(doc_id, 3) != 1").write.parquet(shard2)

    def run(shard_path, ref_spec, **extra):
        cfg = {"input": {"path": shard_path, "format": "parquet"},
               "steps": [{"op": "dedup_against", "reference": ref_spec,
                          "level": "fuzzy", "num_perm": 8, "bands": 4,
                          "k": 3, **extra}]}
        out = run_corpus_pipeline(spark, cfg, sf_dir=sf_dir)
        return {r.doc_id for r in out.select("doc_id").collect()}

    for shard in (shard1, shard2):
        got = run(shard, {"path": prep_path}, min_jaccard=0.6)
        want = run(shard, {"path": raw_path}, min_jaccard=0.6)
        assert got == want
    # band-only frame + min_jaccard: loud, actionable
    lean_path = str(tmp_path / "prep_lean.parquet")
    prepare_reference(raw_ref, "fuzzy", num_perm=8, k=3,
                      with_shingles=False).write.parquet(lean_path)
    with pytest.raises(ValueError, match="with_shingles"):
        run(shard1, {"path": lean_path}, min_jaccard=0.6)
    # prepare/step num_perm contract enforced through the config path
    with pytest.raises(ValueError, match="num_perm"):
        cfg = {"input": {"path": shard1, "format": "parquet"},
               "steps": [{"op": "dedup_against",
                          "reference": {"path": prep_path},
                          "level": "fuzzy", "num_perm": 16, "bands": 4,
                          "k": 3}]}
        run_corpus_pipeline(spark, cfg, sf_dir=sf_dir).count()


def test_decontaminate_step(spark, sf_dir, tmp_path):
    """Config-driven benchmark decontamination: docs sharing any n-gram
    with the benchmark parquet drop; everything else survives."""
    from greenmask_spark.pipeline import run_corpus_pipeline
    from greenmask_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    bench_path = str(tmp_path / "bench.parquet")
    docs.filter("pmod(doc_id, 11) = 0").write.parquet(bench_path)
    out = run_corpus_pipeline(spark, {
        "input": {"table": "documents"},
        "steps": [{"op": "decontaminate", "n": 8,
                   "benchmark": {"path": bench_path, "format": "parquet"}}],
    }, sf_dir=sf_dir)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    # benchmark docs LONG ENOUGH to emit an 8-gram always collide with
    # their own grams (a sub-8-token benchmark doc legitimately cannot
    # flag anything — keep the assertion data-independent)
    ntok = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    long_bench = {r.doc_id for r in docs.filter("pmod(doc_id, 11) = 0")
                  .filter(ntok >= 8).select("doc_id").collect()}
    assert kept and long_bench and not (kept & long_bench)

    import pytest as _p
    with _p.raises(ValueError, match="benchmark"):
        run_corpus_pipeline(spark, {
            "input": {"table": "documents"},
            "steps": [{"op": "decontaminate"}],
        }, sf_dir=sf_dir)


def test_lm_score_step_model_table(spark, sf_dir):
    """A saved bucketed LM (save_ngram_lm) plugs into the lm_score step
    via model_table and scores identically to the train-per-run path."""
    from greenmask_spark.functions.lm import save_ngram_lm, train_ngram_lm
    from greenmask_spark.pipeline import run_corpus_pipeline
    from greenmask_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    save_ngram_lm(train_ngram_lm(docs, n=2), "lm_step_model", num_buckets=4)
    try:
        via_table = run_corpus_pipeline(spark, {
            "input": {"table": "documents"},
            "steps": [{"op": "lm_score", "n": 2,
                       "model_table": "lm_step_model"}],
        }, sf_dir=sf_dir)
        via_train = run_corpus_pipeline(spark, {
            "input": {"table": "documents"},
            "steps": [{"op": "lm_score", "n": 2,
                       "reference": {"table": "documents"}}],
        }, sf_dir=sf_dir)
        cols = ["doc_id", "lm_logprob", "ppl", "n_scored"]
        a = {tuple(r) for r in via_table.select(cols).collect()}
        b = {tuple(r) for r in via_train.select(cols).collect()}
        assert a == b and a
    finally:
        spark.sql("DROP TABLE IF EXISTS lm_step_model")


def test_lm_score_and_filter_steps(spark, sf_dir):
    """CCNet-style LM quality gate: a model trained on the REAL corpus
    gives planted gibberish a tail-end perplexity (all-OOV floor), and
    the config steps wire both scoring and filtering. Note the
    reference must be external: a self-trained bigram model scores a
    unique doc's own n-grams perfectly."""
    from greenmask_spark.functions.lm import ngram_lm_score, train_ngram_lm
    from greenmask_spark.pipeline import run_corpus_pipeline
    from greenmask_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    gib = spark.createDataFrame(
        [(999999, "zqx vbnk wpl jrt xcvq mnb zzyx qqwp llkj zxcv bnmq "
                  "wert asdf zxqv plmn qwer", "xx", "synthetic", 80)],
        docs.schema,
    )
    both = docs.unionByName(gib)

    model = train_ngram_lm(docs, n=2)
    rows = ngram_lm_score(both, model, n=2).filter(
        "ppl IS NOT NULL").collect()
    ppls = {r.id: r.ppl for r in rows}
    worst = sorted(ppls, key=lambda d: -ppls[d])[: max(1, len(ppls) // 20)]
    assert 999999 in worst  # all-OOV doc lands in the worst 5% tail

    # config steps: scoring attaches columns; filtering drops the tail;
    # reference spec resolves through pipeline context
    cfg = {
        "input": {"table": "documents"},
        "steps": [{"op": "lm_score", "n": 2,
                   "reference": {"table": "documents"}}],
    }
    scored = run_corpus_pipeline(spark, cfg, sf_dir=sf_dir)
    assert {"lm_logprob", "ppl", "n_scored"} <= set(scored.columns)
    n_scored = scored.filter("ppl IS NOT NULL").count()
    assert n_scored > 0

    cut = sorted(ppls.values())[int(len(ppls) * 0.5)]
    cfg_f = {
        "input": {"table": "documents"},
        "steps": [{"op": "lm_filter", "n": 2, "max_ppl": float(cut),
                   "reference": {"table": "documents"}}],
    }
    kept = run_corpus_pipeline(spark, cfg_f, sf_dir=sf_dir).count()
    assert 0 < kept < docs.count()


def test_strip_html_step(spark):
    from greenmask_spark.pipeline import build_corpus_pipeline

    df = spark.createDataFrame(
        [(1, "<p>Hello &amp; bye</p>", "web")],
        "doc_id long, text string, source string")
    out = build_corpus_pipeline(df, [{"op": "strip_html"}]).collect()[0]
    assert out.text == "Hello & bye"


def test_full_crawl_pipeline_with_r5_steps(spark, sf_dir, tmp_path):
    """Realistic crawl-processing chain composing the r5 additions with
    the existing stages: strip_html → incremental dedup vs an ingested
    shard → LM perplexity gate → quality filter → fuzzy dedup → split →
    pack. Asserts monotone shrinkage, schema contract, and that every
    stage actually did something."""
    from greenmask_spark.pipeline import run_corpus_pipeline
    from greenmask_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ref_path = str(tmp_path / "ingested.parquet")
    docs.filter("pmod(doc_id, 3) = 0").write.parquet(ref_path)

    cfg = {
        "input": {"table": "documents"},
        "steps": [
            {"op": "strip_html"},
            {"op": "dedup_against", "level": "exact",
             "reference": {"path": ref_path, "format": "parquet"}},
            {"op": "lm_filter", "n": 2, "max_ppl": 1e9,
             "keep_unscored": True,
             "reference": {"path": ref_path, "format": "parquet"}},
            {"op": "quality_filter", "min_tokens": 3},
            {"op": "fuzzy_dedup", "num_perm": 8, "bands": 4,
             "min_jaccard": 0.8},
            {"op": "hash_split", "weights": {"train": 0.9, "val": 0.1}},
            {"op": "pack_sequences", "max_tokens": 256, "n_packers": 4},
        ],
    }
    out = run_corpus_pipeline(spark, cfg, sf_dir=sf_dir)
    rows = out.collect()
    n_in = docs.count()
    kept_ids = {r.doc_id for r in rows}
    assert 0 < len(rows) < n_in                     # stages dropped rows
    # the ingested shard is gone: testdata has no markup, so strip_html
    # is the identity and the exact digest anti-join removes every
    # multiple-of-3 doc (plus any exact dup of one)
    assert not {i for i in kept_ids if i % 3 == 0}
    assert {"split", "seq_id", "seq_offset"} <= set(out.columns)
    assert all(r.split in ("train", "val") for r in rows)
    assert all(r.seq_offset >= 0 for r in rows)


def test_rolling_crawl_pipeline_with_r6_artifacts(spark, sf_dir, tmp_path):
    """The r6 production shape end to end: reference artifacts are
    computed ONCE (prepared dedup frame on parquet + bucketed LM model
    table) and two crawl shards run the same config against them —
    strip_html → benchmark decontamination → incremental dedup vs the
    prepared frame → LM perplexity gate via model_table →
    cluster-aware split. Asserts both shards process independently,
    benchmark/reference contamination is gone, and cluster-keyed
    splitting yields valid splits."""
    from greenmask_spark.functions.dedup import prepare_reference
    from greenmask_spark.functions.lm import save_ngram_lm, train_ngram_lm
    from greenmask_spark.pipeline import run_corpus_pipeline
    from greenmask_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ref = docs.filter("pmod(doc_id, 4) = 0")
    bench_path = str(tmp_path / "bench.parquet")
    docs.filter("pmod(doc_id, 13) = 0").write.parquet(bench_path)
    prep_path = str(tmp_path / "prep_ref.parquet")
    prepare_reference(ref, "exact").write.parquet(prep_path)
    save_ngram_lm(train_ngram_lm(ref, n=2), "r6_crawl_lm", num_buckets=4)
    try:
        cfg = {
            "input": {"table": "documents"},
            "steps": [
                {"op": "strip_html"},
                {"op": "decontaminate", "n": 8,
                 "benchmark": {"path": bench_path, "format": "parquet"}},
                {"op": "dedup_against", "level": "exact",
                 "reference": {"path": prep_path, "format": "parquet"}},
                {"op": "lm_filter", "n": 2, "max_ppl": 1e9,
                 "keep_unscored": True, "model_table": "r6_crawl_lm"},
                {"op": "cluster_split",
                 "weights": {"train": 0.9, "val": 0.1},
                 "num_perm": 8, "bands": 4},
            ],
        }

        def run_shard(mod: int):
            out = run_corpus_pipeline(spark, cfg, sf_dir=sf_dir)
            return out.filter(f"pmod(doc_id, 2) = {mod}").collect()

        shard0, shard1 = run_shard(0), run_shard(1)
        ids0 = {r.doc_id for r in shard0}
        ids1 = {r.doc_id for r in shard1}
        ids = ids0 | ids1
        assert ids
        # benchmark docs long enough to emit an 8-gram are gone
        # (sub-8-token benchmark docs legitimately cannot self-flag);
        # every reference digest (%4) is gone regardless of length
        ntok = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        long_bench = {r.doc_id for r in docs
                      .filter("pmod(doc_id, 13) = 0").filter(ntok >= 8)
                      .select("doc_id").collect()}
        assert long_bench and not (ids & long_bench)
        assert not {i for i in ids if i % 4 == 0}
        assert all(r.split in ("train", "val") for r in shard0 + shard1)
        # the two shard runs partition the FULL pipeline's surviving
        # universe: no overlap (disjoint parities) and no loss (their
        # union equals an unsharded run's ids)
        full_ids = {r.doc_id for r in
                    run_corpus_pipeline(spark, cfg, sf_dir=sf_dir)
                    .select("doc_id").collect()}
        assert ids0.isdisjoint(ids1)
        assert ids == full_ids
    finally:
        spark.sql("DROP TABLE IF EXISTS r6_crawl_lm")


def test_bpe_count_step(spark, sf_dir, tmp_path):
    """Config path for real token budgets: train BPE once, write the
    merge table, and the bpe_count step attaches counts that match the
    direct bpe_token_count call and feed pack_sequences."""
    from greenmask_spark.functions.bpe import (
        bpe_token_count,
        merges_to_df,
        train_bpe,
    )
    from greenmask_spark.pipeline import run_corpus_pipeline
    from greenmask_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    merges = train_bpe(docs.limit(100), num_merges=64)
    mp = str(tmp_path / "merges.parquet")
    merges_to_df(spark, merges).write.parquet(mp)

    out = run_corpus_pipeline(spark, {
        "input": {"table": "documents"},
        "steps": [
            {"op": "bpe_count", "merges": {"path": mp,
                                           "format": "parquet"}},
            {"op": "pack_sequences", "max_tokens": 512, "n_packers": 8},
        ],
    }, sf_dir=sf_dir)
    rows = out.limit(50).collect()
    assert rows and all(r.n_tokens > 0 for r in rows)
    direct = {r.doc_id: r.n for r in docs.select(
        "doc_id", bpe_token_count(F.col("text"), merges).alias("n")
    ).collect()}
    assert all(r.n_tokens == direct[r.doc_id] for r in rows)

    import pytest as _p
    with _p.raises(ValueError, match="merges"):
        run_corpus_pipeline(spark, {
            "input": {"table": "documents"},
            "steps": [{"op": "bpe_count"}],
        }, sf_dir=sf_dir)

    # an EMPTY merges table (train produced nothing / wrong path) is a
    # clear error, not a TypeError from head() returning None
    empty_mp = str(tmp_path / "empty_merges.parquet")
    merges_to_df(spark, []).write.parquet(empty_mp)
    with _p.raises(ValueError, match="empty"):
        run_corpus_pipeline(spark, {
            "input": {"table": "documents"},
            "steps": [{"op": "bpe_count",
                       "merges": {"path": empty_mp,
                                  "format": "parquet"}}],
        }, sf_dir=sf_dir)


def test_remove_repeated_spans_step(spark, sf_dir):
    """Config path for ExactSubstr removal: a planted cross-document
    boilerplate block disappears from every document containing it,
    unique text survives, and the step matches the direct call."""
    import hashlib

    from greenmask_spark.functions.dedup import remove_repeated_spans
    from greenmask_spark.pipeline import build_corpus_pipeline

    def filler(tag, n):
        out, i = [], 0
        while sum(len(x) for x in out) < n:
            out.append(hashlib.sha256(f"{tag}:{i}".encode()).hexdigest())
            i += 1
        return "".join(out)[:n]

    boiler = filler("banner", 80)
    # the char adjacent to the planted block must DIFFER per doc:
    # two docs sharing boiler + the same next hex char legitimately
    # repeat a 40-char window one past the block (observed: sha
    # fillers collide on their first char 1/16 per pair) and the cut
    # would rightly extend one char further
    uniq = "ghijkl"  # non-hex, cannot occur inside the sha fillers
    parts = {i: (filler(f"u{i}", 59) + uniq[i],
                 uniq[::-1][i] + filler(f"v{i}", 59)) for i in range(6)}
    rows = [(i, parts[i][0] + boiler + parts[i][1]) for i in range(6)]
    rows.append((99, filler("clean", 200)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = build_corpus_pipeline(
        df, [{"op": "remove_repeated_spans", "length": 40}])
    got = {r.doc_id: r.text for r in out.collect()}
    for i in range(6):
        assert boiler not in got[i]
        assert got[i] == parts[i][0] + parts[i][1]
    assert got[99] == filler("clean", 200)
    direct = {r.doc_id: r.text for r in
              remove_repeated_spans(df, length=40).collect()}
    assert got == direct
    # the exact heavy-hitter prefilter is config-reachable and
    # changes nothing
    pre = build_corpus_pipeline(
        df, [{"op": "remove_repeated_spans", "length": 40,
              "prefilter_buckets": 1 << 16}])
    assert {r.doc_id: r.text for r in pre.collect()} == got


def test_bm25_step(spark, sf_dir):
    """Config-driven BM25: scores attach and match the direct call,
    min_score filters, top_n keeps the most relevant with a
    deterministic tie-break, and a missing query fails loudly."""
    import pytest

    from greenmask_spark.functions.text_analysis import bm25_scores
    from greenmask_spark.pipeline import run_corpus_pipeline
    from greenmask_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    q = "spark table query"
    out = run_corpus_pipeline(spark, {
        "input": {"table": "documents"},
        "steps": [{"op": "bm25", "query": q}],
    }, sf_dir=sf_dir)
    got = {r.doc_id: r.bm25 for r in out.select("doc_id", "bm25").collect()}
    direct = {r.id: r.score for r in bm25_scores(docs, q).collect()}
    assert got == direct
    # original columns survive alongside the score
    assert {"doc_id", "text", "lang", "source", "n_chars", "bm25"} <= \
        set(out.columns)

    top = run_corpus_pipeline(spark, {
        "input": {"table": "documents"},
        "steps": [{"op": "bm25", "query": q, "top_n": 5}],
    }, sf_dir=sf_dir).select("doc_id").collect()
    want = sorted(direct, key=lambda i: (-direct[i], i))[:5]
    assert [r.doc_id for r in top] == want

    kept = run_corpus_pipeline(spark, {
        "input": {"table": "documents"},
        "steps": [{"op": "bm25", "query": q, "min_score": 0.0,
                   "score_col": "rel"}],
    }, sf_dir=sf_dir)
    assert kept.filter("rel < 0").count() == 0

    with pytest.raises(ValueError, match="query"):
        run_corpus_pipeline(spark, {
            "input": {"table": "documents"},
            "steps": [{"op": "bm25"}],
        }, sf_dir=sf_dir)


def test_checkpoint_step(spark, tmp_path):
    """checkpoint materializes state and continues from files: results
    unchanged, the parquet exists, and the continued plan reads from
    the checkpoint (no upstream lineage)."""
    import pytest

    from greenmask_spark.pipeline import build_corpus_pipeline

    df = spark.createDataFrame(
        [(i, f"doc number {i} with several words", "web")
         for i in range(10)],
        "doc_id long, text string, source string")
    ckpt = str(tmp_path / "ckpt")
    out = build_corpus_pipeline(df, [
        {"op": "quality_filter", "min_tokens": 3},
        {"op": "checkpoint", "path": ckpt},
        {"op": "hash_split", "weights": {"train": 0.5, "test": 0.5}},
    ])
    rows = out.collect()
    assert len(rows) == 10 and all(r.split in ("train", "test")
                                   for r in rows)
    assert spark.read.parquet(ckpt).count() == 10
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "parquet" in plan.lower()  # continues from the files
    with pytest.raises(ValueError, match="path"):
        build_corpus_pipeline(df, [{"op": "checkpoint"}])


def test_dsir_step(spark, sf_dir):
    """Config-driven DSIR: weights attach and match the direct call
    (target_filter slice), min_weight filters, select_n keeps the
    deterministic Gumbel-top-k subset."""
    from greenmask_spark.functions.sampling import (
        dsir_log_weights,
        dsir_resample,
    )
    from greenmask_spark.pipeline import build_corpus_pipeline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    B = 4096
    out = build_corpus_pipeline(docs, [
        {"op": "dsir", "target_filter": "lang = 'en'", "buckets": B},
    ])
    got = {r.doc_id: r.dsir_logw for r in out.collect()}
    direct = {r.id: r.dsir_logw for r in dsir_log_weights(
        docs, docs.filter("lang = 'en'"), buckets=B).collect()}
    assert got == direct
    assert set(out.columns) == set(docs.columns) | {"dsir_logw"}

    flt = build_corpus_pipeline(docs, [
        {"op": "dsir", "target_filter": "lang = 'en'", "buckets": B,
         "min_weight": 0.0},
    ])
    assert {r.doc_id for r in flt.collect()} == \
        {i for i, w in direct.items() if w >= 0.0}

    sel = build_corpus_pipeline(docs, [
        {"op": "dsir", "target_filter": "lang = 'en'", "buckets": B,
         "select_n": 25},
    ])
    want = {r.id for r in dsir_resample(
        docs, docs.filter("lang = 'en'"), 25, buckets=B).collect()}
    assert {r.doc_id for r in sel.collect()} == want and len(want) == 25

    import pytest

    with pytest.raises(ValueError, match="target"):
        build_corpus_pipeline(docs, [{"op": "dsir"}])


def test_fuzzy_dedup_threshold_config(corpus):
    """A 'threshold' config derives the LSH banding from the S-curve
    solver and defaults the verification bar; explicit bands win."""
    from greenmask_spark.functions.dedup import optimal_lsh_params
    from greenmask_spark.pipeline import build_corpus_pipeline

    out = build_corpus_pipeline(corpus, [
        {"op": "fuzzy_dedup", "num_perm": 8, "k": 3, "threshold": 0.8},
    ])
    kept = {r.doc_id for r in out.collect()}
    assert 2 not in kept and 1 in kept  # exact dup still collapses
    # the derived banding matches a direct solver call (and the direct
    # fuzzy_dedup with those params gives the same survivors)
    b, _ = optimal_lsh_params(0.8, 8)
    from greenmask_spark.functions.dedup import fuzzy_dedup

    direct = {r.doc_id for r in fuzzy_dedup(
        corpus, num_perm=8, bands=b, k=3, min_jaccard=0.8).collect()}
    assert kept == direct


def test_unknown_step_parameters_warn(spark, sf_dir):
    """A typo'd step parameter is read by nothing and silently changes
    semantics — validation warns with the step's real parameter list.
    Known params stay silent; custom steps and whole-dict-forwarding
    steps are exempt (their contract is unknowable)."""
    import warnings as w

    from greenmask_spark.pipeline import run_corpus_pipeline
    from greenmask_spark.pipeline.corpus import register_corpus_step

    base = {"input": {"table": "documents"}}
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        run_corpus_pipeline(spark, {
            **base,
            "steps": [{"op": "gopher_filter", "flags_col": "gq",
                       "min_words": 5}],
        }, sf_dir=sf_dir).count()
    msgs = [str(x.message) for x in rec if "IGNORED" in str(x.message)]
    assert len(msgs) == 1 and "min_words" in msgs[0] \
        and "flags_col" in msgs[0]  # the real params are suggested

    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        run_corpus_pipeline(spark, {
            **base,
            "steps": [{"op": "fuzzy_dedup", "threshold": 0.8}],
        }, sf_dir=sf_dir).count()
    assert not [x for x in rec if "IGNORED" in str(x.message)]

    register_corpus_step("noop_custom", lambda df, p: df, replace=True)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        run_corpus_pipeline(spark, {
            **base,
            "steps": [{"op": "noop_custom", "whatever": 1}],
        }, sf_dir=sf_dir).count()
    assert not [x for x in rec if "IGNORED" in str(x.message)]


def _membership_step(df, p):
    # reads one param via get, GATES another via membership — both are
    # legitimate reads the AST scan must record
    if "opt_flag" in p:
        return df.limit(int(p.get("n", 1)))
    return df


def _dynamic_get_step(df, p):
    key = "n"  # non-constant at the read site
    return df.limit(int(p.get(key, 1)))


def test_step_known_keys_membership_and_dynamic_get():
    """`'k' in p` counts as a parameter read; `p.get(variable)` makes
    the contract unknowable (None) instead of producing false IGNORED
    warnings for keys the scan cannot see."""
    from greenmask_spark.pipeline import corpus as corpus_mod
    from greenmask_spark.pipeline.corpus import (
        _STEP_KEYS_CACHE,
        _step_known_keys,
        register_corpus_step,
    )

    from greenmask_spark.pipeline.corpus import CORPUS_STEPS

    orig_mod = {fn: fn.__module__
                for fn in (_membership_step, _dynamic_get_step)}
    for fn, name in ((_membership_step, "t_membership"),
                     (_dynamic_get_step, "t_dynamic_get")):
        fn.__module__ = corpus_mod.__name__  # introspect like a builtin
        register_corpus_step(name, fn, replace=True)
        _STEP_KEYS_CACHE.pop(name, None)
    try:
        assert _step_known_keys("t_membership") == {"opt_flag", "n"}
        assert _step_known_keys("t_dynamic_get") is None
    finally:
        # fully unwind: cache AND registry entries AND the rebound
        # __module__, so no state leaks into the rest of the session
        for name in ("t_membership", "t_dynamic_get"):
            _STEP_KEYS_CACHE.pop(name, None)
            CORPUS_STEPS.pop(name, None)
        for fn, mod in orig_mod.items():
            fn.__module__ = mod


# ---------------------------------------------------------------------------
# corpus_funnel: one-pass per-stage survivor counts (DataFrame.observe)
# ---------------------------------------------------------------------------


def test_corpus_funnel_exact_counts(spark, sf_dir):
    """Every stage's count equals an independent run of that prefix —
    the observe-based funnel is exact, from ONE evaluating action."""
    from greenmask_spark.pipeline.corpus import (
        _resolve_input_df,
        build_corpus_pipeline,
        corpus_funnel,
    )

    cfg = {"input": {"table": "documents"},
           "steps": [{"op": "lang_id"},
                     {"op": "quality_filter", "langs": ["en"]},
                     {"op": "dedup_exact"},
                     {"op": "hash_sample", "fraction": 0.5}]}
    rows = corpus_funnel(spark, cfg, sf_dir=sf_dir)
    assert [r["op"] for r in rows] == [
        "input", "lang_id", "quality_filter", "dedup_exact", "hash_sample"]
    df0 = _resolve_input_df(spark, cfg, sf_dir)
    ctx = {"spark": spark, "sf_dir": sf_dir}
    want = [df0.count()] + [
        build_corpus_pipeline(df0, cfg["steps"][:i], ctx).count()
        for i in range(1, len(cfg["steps"]) + 1)
    ]
    assert [r["rows"] for r in rows] == want
    assert want[0] > want[2] > want[4] > 0  # the funnel actually funnels


def test_corpus_funnel_zero_survivor_stage(spark, sf_dir):
    """A gate that drops EVERY row must report 0 — AQE's
    empty-relation propagation would silently discard the
    observation nodes (the .get dies on a null metrics row); the
    funnel excludes that rewrite for its one action and restores the
    session conf afterwards."""
    from greenmask_spark.pipeline.corpus import corpus_funnel

    keys = ("spark.sql.adaptive.optimizer.excludedRules",
            "spark.sql.optimizer.excludedRules")
    before = tuple(spark.conf.get(k, None) for k in keys)
    cfg = {"input": {"table": "documents"},
           "steps": [{"op": "quality_filter", "langs": ["zz"]},
                     {"op": "dedup_exact"},
                     {"op": "lang_id"}]}
    rows = corpus_funnel(spark, cfg, sf_dir=sf_dir)
    counts = [r["rows"] for r in rows]
    assert counts[0] > 0 and counts[1:] == [0, 0, 0]
    assert tuple(spark.conf.get(k, None) for k in keys) == before


def test_corpus_funnel_cli(spark, sf_dir, tmp_path, capsys):
    from greenmask_spark.cli import main

    cfg = {"input": {"table": "documents"},
           "steps": [{"op": "lang_id"},
                     {"op": "quality_filter", "langs": ["en"]}]}
    cfgp = tmp_path / "funnel.json"
    cfgp.write_text(json.dumps(cfg))
    rc = main(["corpus", "--config", str(cfgp), "--sf-dir", sf_dir,
               "--funnel"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "input" in out and "quality_filter" in out
    # the per-stage delta annotation renders for post-input stages
    assert "(" in out and ")" in out


def test_ngram_novelty_step(spark):
    """The ngram_novelty corpus step: attaches the per-doc novelty
    column and the optional floor drops quilted re-posts but KEEPS
    unscorable (< n-token) docs."""
    from greenmask_spark.pipeline.corpus import CORPUS_STEPS

    base = "a b c d e f g h i j"
    rows = [(1, base), (2, base), (3, "tiny doc"),
            (4, "k l m n o p q r s")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = CORPUS_STEPS["ngram_novelty"](df, {})
    got = {r.doc_id: r.novelty for r in out.collect()}
    assert got == {1: 1.0, 2: 0.0, 3: None, 4: 1.0}
    kept = CORPUS_STEPS["ngram_novelty"](df, {"min_novelty": 0.5})
    assert {r.doc_id for r in kept.collect()} == {1, 3, 4}


def test_chunk_step(spark):
    """The chunk corpus step: in-place text replacement keeps the
    pipeline composable (same text column, new (doc_id, chunk_id)
    grain), whitespace-only docs drop, and a downstream expression
    step still sees a `text` column."""
    from greenmask_spark.pipeline.corpus import CORPUS_STEPS

    rows = [(1, "a b c d e f g h i j"), (2, "  "), (3, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = CORPUS_STEPS["chunk"](df, {"max_tokens": 4, "overlap": 1})
    assert out.columns == ["doc_id", "chunk_id", "text", "n_tokens"]
    got = {(r.doc_id, r.chunk_id): (r.text, r.n_tokens)
           for r in out.collect()}
    # n=10, stride=3: 1 + ceil(6/3) = 3 chunks
    assert got[(1, 0)] == ("a b c d", 4)
    assert got[(1, 1)] == ("d e f g", 4)
    assert got[(1, 2)] == ("g h i j", 4)
    assert not any(k[0] == 2 for k in got)
    assert got[(3, 0)] == ("solo", 1)
    # distinct chunk column keeps the original text alongside
    named = CORPUS_STEPS["chunk"](
        df, {"max_tokens": 4, "chunk_col": "chunk_text"})
    assert "chunk_text" in named.columns and "text" not in named.columns


def test_domain_gate_step(spark):
    from greenmask_spark.pipeline import build_corpus_pipeline

    rows = [
        # good.example.org: long docs -> passes min mean
        ("https://good.example.org/1", "w " * 40, 1),
        ("https://good.example.org/2", "w " * 60, 2),
        # bad.example.org: short docs -> mean below the gate, dropped
        ("https://bad.example.org/1", "w", 3),
        ("https://bad.example.org/2", "ww", 4),
        # NULL URL pools under the NULL domain (short -> dropped too)
        (None, "x", 5),
    ]
    df = spark.createDataFrame(rows, "url string, text string, doc_id int") \
        .withColumn("n_chars", F.length("text"))
    out = build_corpus_pipeline(df, [
        {"op": "domain_gate", "signals": ["n_chars"],
         "gates": {"n_chars": [20, None]}},
    ])
    assert {r.doc_id for r in out.collect()} == {1, 2}
    assert out.columns == df.columns  # gate drops rows, never columns

    # NULL-domain group passes when its docs do
    out2 = build_corpus_pipeline(df, [
        {"op": "domain_gate", "signals": ["n_chars"],
         "gates": {"n_chars": [1, None]}},
    ])
    assert {r.doc_id for r in out2.collect()} == {1, 2, 3, 4, 5}
