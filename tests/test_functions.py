"""Training-data operator tests: dedup, similarity, text analysis,
multimodal plumbing, validate diff."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="the quick brown fox jumps over the lazy dog"),  # exact dup
        Row(doc_id=3, text="the quick brown fox jumped over the lazy dog"),  # near dup
        Row(doc_id=4, text="completely different content about spark engines"),
        Row(doc_id=5, text="der hund und die katze sind nicht zu hause"),
        Row(doc_id=6, text=""),
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup(docs):
    from greenmask_spark.functions.dedup import dedup_exact, exact_duplicates

    kept = {r.doc_id for r in dedup_exact(docs).collect()}
    assert kept == {1, 3, 4, 5, 6}
    pairs = [(r.canonical_id, r.dup_id) for r in exact_duplicates(docs).collect()]
    assert pairs == [(1, 2)]


def test_minhash_lsh_finds_near_dups(docs):
    from greenmask_spark.functions.dedup import minhash_candidates, ngram_jaccard

    pairs = minhash_candidates(docs, num_perm=16, bands=8)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got          # identical docs always collide
    assert (1, 3) in got or (2, 3) in got  # near dup should collide in ≥1 band
    verified = ngram_jaccard(docs, pairs)
    j = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    assert j[(1, 2)] == 1.0
    if (1, 3) in j:
        assert 0.5 < j[(1, 3)] < 1.0


def test_ngram_jaccard_agg_path_matches_broadcast(docs):
    """The scale-safe explode+count-common-hashes strategy must produce
    exactly the broadcast strategy's results (forced via threshold=0)."""
    from greenmask_spark.functions.dedup import minhash_candidates, ngram_jaccard

    pairs = minhash_candidates(docs, num_perm=16, bands=8)
    bc = {(r.id_a, r.id_b): r.jaccard
          for r in ngram_jaccard(docs, pairs, strategy="broadcast").collect()}
    agg = {(r.id_a, r.id_b): r.jaccard
           for r in ngram_jaccard(docs, pairs, strategy="agg").collect()}
    auto_small = {(r.id_a, r.id_b): r.jaccard
                  for r in ngram_jaccard(docs, pairs, strategy="auto",
                                         broadcast_max_rows=0).collect()}
    assert bc == agg == auto_small
    assert bc, "no candidate pairs produced"


def test_cosine_pairs_blocked_distributed(spark):
    """Tiled all-pairs cosine: every qualifying pair exactly once, matching
    a brute-force numpy computation; no driver-side corpus collection."""
    import numpy as np

    from greenmask_spark.functions.similarity import cosine_pairs_blocked

    rng = [(i, [float(((i * 37 + d * 11) % 19) - 9) for d in range(8)])
           for i in range(40)]
    df = spark.createDataFrame(rng, "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b): r.cos_sim
           for r in cosine_pairs_blocked(df, 0.5, n_blocks=4).collect()}

    mat = np.array([v for _, v in rng])
    n = np.sqrt((mat * mat).sum(axis=1))
    sims = np.round((mat @ mat.T) / (n[:, None] * n[None, :]), 4)
    want = {}
    for i in range(len(rng)):
        for j in range(i + 1, len(rng)):
            if sims[i, j] >= 0.5:
                want[(i, j)] = sims[i, j]
    assert got == want
    assert len(got) > 0


def test_simhash_near_dups(docs):
    from greenmask_spark.functions.dedup import simhash_near_dups

    got = {(r.id_a, r.id_b): r.hamming for r in
           simhash_near_dups(docs, bits=16, max_hamming=4).collect()}
    assert got.get((1, 2)) == 0  # identical text → identical simhash


def test_text_analysis(docs):
    from greenmask_spark.functions.text_analysis import analyze

    out = {r.doc_id: r for r in analyze(docs).collect()}
    assert out[1].n_tokens == 9
    assert out[1].lang_pred == "en"
    assert out[5].lang_pred == "de"
    assert out[6].n_tokens == 0 and out[6].lang_pred == "und"
    assert out[1].fp == out[2].fp  # identical normalized text
    assert 0.0 <= out[4].quality <= 1.0


def test_winnow_fingerprints(docs, spark):
    from greenmask_spark.functions.text_analysis import (
        winnow_fingerprints,
        winnow_pairs,
    )

    out = {
        r.doc_id: r.wfp
        for r in docs.select(
            "doc_id", winnow_fingerprints(F.col("text")).alias("wfp")
        ).collect()
    }
    # identical docs → identical fingerprint sets
    assert out[1] == out[2] and len(out[1]) > 0
    # sets are sorted distinct
    assert out[1] == sorted(set(out[1]))
    # near-dup (one-word edit) shares most fingerprints; unrelated text few
    inter_near = len(set(out[1]) & set(out[3]))
    inter_far = len(set(out[1]) & set(out[4]))
    assert inter_near / len(out[1]) > 0.5
    assert inter_far < inter_near
    # brute-force reference on one doc: min of each w-window of k-gram
    # hashes (positional), distinct+sorted
    import hashlib

    def ref(text, k=5, w=4):
        norm = " ".join(text.lower().strip().split())
        grams = [norm[i:i + k] for i in range(max(len(norm) - k + 1, 1))]
        hs = [
            int(hashlib.sha256(g.encode()).hexdigest()[:15], 16) % 2147483647
            for g in grams
        ]
        wins = [
            min(hs[i:i + w]) for i in range(max(len(hs) - w + 1, 1))
        ]
        return sorted(set(wins))

    assert out[3] == ref("the quick brown fox jumped over the lazy dog")
    # candidate pairs: the exact+near dups pair up, unrelated don't
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_pairs(docs, min_shared=2).collect()
    }
    assert (1, 2) in got and (1, 3) in got
    assert (1, 4) not in got


def test_repetition_profile(spark):
    from greenmask_spark.functions.text_analysis import repetition_profile

    df = spark.createDataFrame(
        [
            (1, "menu\nhome\nmenu\nhome\nmenu"),       # 3 dup lines of 5
            (2, "buy now buy now buy now"),            # 'buy now' 3x of 5 bigrams
            (3, "a perfectly normal sentence here"),
            (4, ""),
            (5, "one"),                                # no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r.id: r for r in repetition_profile(df).collect()}
    assert got[1].n_lines == 5 and got[1].dup_line_frac == 0.6
    assert got[2].top_bigram_frac == 0.6 and got[2].n_bigrams == 5
    assert got[3].dup_line_frac == 0.0 and got[3].top_bigram_frac == 0.25
    assert got[4].n_lines == 0 and got[4].top_bigram_frac == 0.0
    assert got[5].n_bigrams == 0 and got[5].top_bigram_frac == 0.0


def test_term_frequencies(spark):
    from greenmask_spark.functions.text_analysis import term_frequencies

    df = spark.createDataFrame(
        [("the cat and the hat",), ("the dog",), ("",)], "text string"
    )
    got = {r.term: (r.tf, r.df_docs)
           for r in term_frequencies(df).collect()}
    assert got["the"] == (3, 2)
    assert got["cat"] == (1, 1)
    assert got["dog"] == (1, 1)
    top = term_frequencies(df, top_k=1).collect()
    assert len(top) == 1 and top[0].term == "the"


def test_dedup_lines(spark):
    from greenmask_spark.functions.dedup import dedup_lines

    df = spark.createDataFrame(
        [
            (1, "unique one\nshared banner\nunique two"),
            (2, "shared banner\nother text\n\nafter blank"),
            (3, "shared banner"),           # fully claimed → empty
            (4, "solo\nsolo"),              # in-document repeat dedups too
        ],
        "doc_id long, text string",
    )
    got = {r.id: r.text for r in dedup_lines(df).collect()}
    assert got[1] == "unique one\nshared banner\nunique two"
    assert got[2] == "other text\n\nafter blank"
    assert got[3] == ""
    assert got[4] == "solo"
    assert set(got) == {1, 2, 3, 4}


def test_cross_split_contamination(tables, spark):
    from greenmask_spark.functions.sampling import (
        cross_split_contamination,
        hash_split,
    )

    docs = hash_split(tables["documents"], key_col="doc_id")
    # planted leak: copy one doc's text onto an id assigned to a
    # different split, then ask for cross-split near-dup candidates
    rows = docs.select("doc_id", "text", "split").collect()
    by_split = {}
    for r in rows:
        by_split.setdefault(r.split, r)
    a, b = by_split["train"], by_split["test"]
    leak = spark.createDataFrame(
        [(a.doc_id, a.text, "train"), (b.doc_id, a.text, "test")],
        "doc_id long, text string, split string",
    )
    got = cross_split_contamination(leak).collect()
    assert len(got) == 1
    pair = got[0]
    assert {pair.split_a, pair.split_b} == {"train", "test"}
    assert {pair.id_a, pair.id_b} == {a.doc_id, b.doc_id}
    # explicit pairs frame passes through and keeps only cross-split rows
    pairs = spark.createDataFrame(
        [(a.doc_id, b.doc_id)], "id_a long, id_b long")
    got2 = cross_split_contamination(leak, pairs=pairs).collect()
    assert len(got2) == 1


def test_quantize_embeddings(tables):
    from greenmask_spark.functions.quantize import (
        dequantize_vec,
        quantize_embeddings,
        quantize_vec,
    )

    emb = tables["embeddings"].limit(50)
    q = quantize_embeddings(emb)
    schema = dict(q.dtypes)
    assert schema["qvec"] == "struct<q:array<tinyint>,scale:double>"
    # round-trip error bounded by scale/254 per component (half a quantum)
    err = (
        emb.select(
            "vec_id",
            F.col("embedding").alias("v"),
            quantize_vec(F.col("embedding")).alias("qs"),
        )
        .select(
            "v",
            F.col("qs.scale").alias("s"),
            dequantize_vec(F.col("qs")).alias("vhat"),
        )
        .select(
            F.aggregate(
                F.zip_with(
                    "v", "vhat", lambda a, b: F.abs(a.cast("double") - b)
                ),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            ).alias("max_err"),
            "s",
        )
        .collect()
    )
    for r in err:
        assert r.max_err <= r.s / 254.0 + 1e-9, (r.max_err, r.s)
    # zero vector → zeros with scale 0
    import pyspark.sql.types as T

    spark = emb.sparkSession
    z = spark.createDataFrame(
        [(1, [0.0] * 4)],
        T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]),
    )
    got = z.select(quantize_vec(F.col("embedding")).alias("qs")).collect()[0].qs
    assert got.scale == 0.0 and list(got.q) == [0, 0, 0, 0]


def test_scrub_pii(spark):
    from greenmask_spark.functions.text_analysis import pii_hits, scrub_pii

    rows = [
        ("contact bob.smith+x@corp.example.com or (555) 123-4567 now",),
        ("card 4111 1111 1111 1111 ssn 123-45-6789 host 10.0.0.1",),
        ("no pii here at all",),
        ("",),
    ]
    df = spark.createDataFrame(rows, "s string")
    got = df.select(
        scrub_pii(F.col("s")).alias("t"),
        pii_hits(F.col("s")).alias("n"),
    ).collect()
    assert got[0].t == "contact [EMAIL] or [PHONE] now"
    assert got[0].n == 2
    assert got[1].t == "card [CARD] ssn [SSN] host [IP]"
    assert got[1].n == 3
    assert got[2].t == "no pii here at all" and got[2].n == 0
    assert got[3].t == "" and got[3].n == 0
    # kind selection: scrub only emails, leave the phone
    only_email = df.select(
        scrub_pii(F.col("s"), kinds=("email",)).alias("t")).collect()
    assert only_email[0].t == "contact [EMAIL] or (555) 123-4567 now"
    # overlap: the IP inside the email redacts once and counts once
    ov = spark.createDataFrame([("mail 1.2.3.4@corp.example.com",)], "s string")
    r = ov.select(scrub_pii(F.col("s")).alias("t"),
                  pii_hits(F.col("s")).alias("n")).collect()[0]
    assert r.t == "mail [EMAIL]" and r.n == 1


def test_hash_split_and_sample(tables):
    from greenmask_spark.functions.sampling import (
        hash_sample,
        hash_split,
        stratified_hash_sample,
    )

    docs = tables["documents"]
    n = docs.count()
    out = hash_split(docs, key_col="doc_id")
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == n
    # proportions hold within hash-binomial tolerance
    assert abs(counts["train"] / n - 0.8) < 0.1
    # deterministic: same assignment on re-run
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in hash_split(docs, key_col="doc_id").collect()}
    assert a == b
    # sample: subset, deterministic, composable fractions
    s = hash_sample(docs, 0.5, key_col="doc_id")
    ids = {r.doc_id for r in s.select("doc_id").collect()}
    assert ids <= {r.doc_id for r in docs.select("doc_id").collect()}
    s2 = hash_sample(s, 0.5, key_col="doc_id", seed=7)
    assert {r.doc_id for r in s2.select("doc_id").collect()} <= ids
    # stratified: only listed strata survive, each hash-gated
    lang_counts = {r.lang: r.n for r in
                   docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
                   .collect()} if "lang" in docs.columns else {}
    if lang_counts:
        pick = sorted(lang_counts)[0]
        st = stratified_hash_sample(
            docs, {pick: 1.0}, strata_col="lang", key_col="doc_id")
        got = {r.lang for r in st.select("lang").collect()}
        assert got == {pick}
        assert st.count() == lang_counts[pick]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_split(docs, {"a": 0.5, "b": 0.6}, key_col="doc_id")
    with _pytest.raises(ValueError):
        hash_sample(docs, 1.5, key_col="doc_id")


def test_bpe_token_count(spark):
    from greenmask_spark.functions.text_analysis import bpe_token_count

    df = spark.createDataFrame(
        [("Hello, world!",),   # Hello | , | _world | ! → 4
         ("don't",),           # don | 't → 2
         ("a b 12",),          # a | _b | _12 → 3
         ("",)],               # → 0
        "s string",
    )
    got = [r.n for r in df.select(bpe_token_count(F.col("s")).alias("n")).collect()]
    assert got == [4, 2, 3, 0]


def test_cosine_topk(spark):
    from greenmask_spark.functions.similarity import cosine_topk

    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
            Row(vec_id=1, embedding=[0.9, 0.1, 0.0]),
            Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),
            Row(vec_id=3, embedding=[0.0, 0.0, 1.0]),
        ]
    )
    q = emb.filter(F.col("vec_id") == 0)
    out = cosine_topk(emb, q, k=2).collect()
    assert [r.neighbor_id for r in out] == [1, 2]
    assert out[0].cos_sim > 0.99


def test_cosine_lsh_recall(tables):
    """LSH top-k should recover most of the exact top-k on real embeddings."""
    from greenmask_spark.functions.similarity import cosine_topk, cosine_topk_lsh

    emb = tables["embeddings"]
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id): r.cos_sim
             for r in cosine_topk(emb, q, k=3).collect()}
    approx = {(r.query_id, r.neighbor_id): r.cos_sim
              for r in cosine_topk_lsh(emb, q, k=3, dim=64, n_planes=2).collect()}
    # testdata embeddings are near-random (best cos ≈ 0.37), so hyperplane
    # LSH recall is inherently modest; with 2 planes P(bucket match) ≈ 0.38
    # per true neighbor → P(zero overlap of 15) < 0.1%. Check the overlap
    # exists AND that scores agree exactly where both found the pair.
    hits = set(exact) & set(approx)
    assert hits, "LSH found none of the exact top-3 neighbors"
    for pair in hits:
        assert exact[pair] == approx[pair]


def test_lsh_batch_kernel_matches_expression(tables):
    """The vectorized Arrow-batch LSH tagger must be value-identical to
    the lsh_bucket expression form (same sequential dim-order fold →
    same sign bits), and emit the same L2 norm as the JVM norm() fold."""
    from greenmask_spark.functions.similarity import (
        _hyperplanes,
        _lsh_tag_batch,
        lsh_bucket,
        norm,
    )

    emb = tables["embeddings"].limit(200)
    planes = _hyperplanes(64, 8, seed=42)
    got = {
        r.vec_id: (r.bucket, r.n)
        for r in _lsh_tag_batch(
            emb.select("vec_id", "embedding"), planes, "embedding",
            "bucket", "n",
        ).collect()
    }
    want = {
        r.vec_id: (r.bucket, r.n)
        for r in emb.select(
            "vec_id",
            lsh_bucket("embedding", 64, 8).alias("bucket"),
            norm(F.col("embedding")).alias("n"),
        ).collect()
    }
    assert got == want  # exact equality, norms included


def test_ivf_recall_and_determinism(tables):
    """IVF probe of 4/8 lists should recover a solid share of the exact
    top-k, scores must agree exactly on hits, and training must be
    deterministic (hash-gated sample + fixed init → same centroids)."""
    from greenmask_spark.functions.similarity import (
        cosine_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    emb = tables["embeddings"]
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id): r.cos_sim
             for r in cosine_topk(emb, q, k=3).collect()}
    approx = {(r.query_id, r.neighbor_id): r.cos_sim
              for r in ivf_topk(emb, q, k=3, n_centroids=8, n_probe=4).collect()}
    hits = set(exact) & set(approx)
    # probing half the lists on near-random vectors: expect ≥ 1/3 recall
    assert len(hits) >= len(exact) // 3, (len(hits), len(exact))
    for pair in hits:
        assert exact[pair] == approx[pair]

    c1 = train_ivf_centroids(emb, n_centroids=8, n_iters=1)
    c2 = train_ivf_centroids(emb.repartition(7), n_centroids=8, n_iters=1)
    assert c1 == c2, "IVF training must not depend on partitioning"


def test_ivf_partition_of_corpus(spark):
    """Every corpus vector lands in exactly one inverted list; assignment
    is the vectorized Arrow-batch argmin — no interpreted HOF in the plan."""
    from greenmask_spark.functions.similarity import _assign_centroids

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 3), float((i + 1) % 3)])
         for i in range(30)]
    )
    cents = [[0.0, 1.0], [1.0, 2.0], [2.0, 0.0]]
    out = _assign_centroids(df, cents, vec_col="embedding")
    assert "aggregate(" not in out._jdf.queryExecution().optimizedPlan().toString()
    cids = [r.cid for r in out.collect()]
    assert all(c in (0, 1, 2) for c in cids)
    # vectors equal to a centroid must map to it
    exact = out.filter(F.col("embedding") == F.array(F.lit(0.0), F.lit(1.0)))
    assert {r.cid for r in exact.collect()} == {0}


def test_multimodal_plumbing(spark):
    from greenmask_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        sample_frames,
    )

    rows = [
        (1, "image", "image/png", b"\x89PNG fake bytes", 64, 64, None),
        (2, "video", "video/mp4", b"\x00\x00ftyp fake", None, None, 3500),
        (3, "image", "image/png", None, None, None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.media_id: r for r in extract_features(df, dim=4, fake=True).collect()}
    assert len(feats[1].feature) == 4
    assert feats[1].n_bytes == 15
    assert feats[3].feature is None
    frames = sample_frames(df, every_ms=1000).collect()
    assert [r.frame_ts_ms for r in frames] == [0, 1000, 2000, 3000]


def _udf_err_text(excinfo) -> str:
    """Full text of a Spark-executed Python failure: depending on conf
    the driver surfaces PythonException (str carries the worker
    traceback) or a raw Py4JJavaError (the traceback hides in
    java_exception) — check both."""
    e = excinfo.value
    return str(e) + str(getattr(e, "java_exception", ""))


def _collect_retry(df, attempts: int = 2):
    """Collect with ONE retry for actions that run right after an
    intentionally-failed Python UDF action: a reused python worker
    whose previous task raised can poison the next task with
    CancelledKeyException (a known worker-reuse flake; local mode has
    maxFailures=1 so Spark itself won't retry). Deterministic results
    make the retry safe."""
    last = None
    for _ in range(attempts):
        try:
            return df.collect()
        except Exception as e:  # pragma: no cover - flake path
            last = e
    raise last


def _assert_loud_udf_failure(excinfo, *markers: str) -> None:
    """The honesty contract under test is that the ACTION FAILED — no
    silent passthrough. The marker text (the stub's own message) must
    be present UNLESS the failure is the known worker-reuse
    infrastructure flake (CancelledKeyException / worker crash), whose
    surfaced text omits the Python frames entirely — accepting any
    Py4JJavaError would stop pinning that NotImplementedError is what
    actually fires."""
    t = _udf_err_text(excinfo)
    assert any(m in t for m in markers) or any(
        infra in t
        for infra in ("CancelledKeyException", "Python worker")
    ), t


def _drain_poisoned_workers(spark) -> None:
    """Run (and discard) a tiny UDF action after an intentional UDF
    failure so a poisoned reused python worker dies HERE, inside the
    test that caused it, instead of failing the next test's first UDF
    action (see _collect_retry for the mechanism)."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("int", PandasUDFType.SCALAR)
    def _noop(s):
        return pd.Series(s)

    probe = spark.range(4).select(_noop(F.col("id").cast("int")))
    for _ in range(2):
        try:
            probe.collect()
            return
        except Exception:
            continue


def test_multimodal_decode_stub_raises(spark):
    from greenmask_spark.functions.multimodal import MEDIA_SCHEMA, extract_features

    df = spark.createDataFrame(
        [(1, "image", "image/png", b"x", None, None, None)], MEDIA_SCHEMA
    )
    with pytest.raises(Exception) as ei:
        extract_features(df, fake=False).collect()
    _assert_loud_udf_failure(ei, "NotImplementedError")
    _drain_poisoned_workers(spark)


def test_validate_diff_and_schema_diff(spark):
    from pyspark.sql import types as T

    from greenmask_spark.validate import diff_report, schema_diff
    from greenmask_spark.validate.diff import implicit_changes

    orig = spark.createDataFrame(
        [Row(id=1, a="x", b=10), Row(id=2, a="y", b=None)]
    )
    masked = spark.createDataFrame(
        [Row(id=1, a="MASKED", b=10), Row(id=2, a="y", b=None)]
    )
    d = diff_report(orig, masked, pk=["id"])
    rows = {r.id: r for r in d.collect()}
    assert rows[1].n_changed == 1 and rows[1].chg_a and not rows[1].chg_b
    assert rows[2].n_changed == 0  # null == null (null-safe)
    assert implicit_changes(d, declared_affected=[]) == ["a"]
    assert implicit_changes(d, declared_affected=["a"]) == []

    before = T.StructType([T.StructField("a", T.StringType()),
                           T.StructField("b", T.IntegerType())])
    after = T.StructType([T.StructField("a", T.LongType()),
                          T.StructField("c", T.StringType())])
    events = schema_diff(before, after)
    kinds = {(e["event"], e["column"]) for e in events}
    assert ("column_removed", "b") in kinds
    assert ("column_added", "c") in kinds
    assert ("column_type_changed", "a") in kinds


def test_salted_agg_matches_plain(tables):
    """Skew-safe two-stage agg must equal the plain groupBy exactly."""
    from greenmask_spark.functions.skew import salted_agg

    li = tables["lineitem"]
    plain = {
        (r.l_returnflag,): (r.n, r.qmin, r.qmax)
        for r in li.groupBy("l_returnflag").agg(
            F.count("l_quantity").alias("n"),
            F.min("l_quantity").alias("qmin"),
            F.max("l_quantity").alias("qmax"),
        ).collect()
    }
    salted = {
        (r.l_returnflag,): (r.n, r.qmin, r.qmax)
        for r in salted_agg(
            li, ["l_returnflag"],
            {"n": ("count", "l_quantity"),
             "qmin": ("min", "l_quantity"),
             "qmax": ("max", "l_quantity")},
            buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_algebraic(tables):
    import pytest as _pytest

    from greenmask_spark.functions.skew import salted_agg

    with _pytest.raises(ValueError, match="not algebraic"):
        salted_agg(tables["lineitem"], ["l_returnflag"],
                   {"a": ("avg", "l_quantity")})


def test_replicate_skew_join_matches_plain(tables):
    from greenmask_spark.functions.skew import replicate_skew_join

    orders = tables["orders"].select("o_orderkey", "o_orderdate")
    li = tables["lineitem"].select("l_orderkey", "l_quantity").withColumnRenamed(
        "l_orderkey", "o_orderkey")
    plain = li.join(orders, on=["o_orderkey"]).count()
    salted = replicate_skew_join(li, orders, on=["o_orderkey"], buckets=4)
    assert salted.count() == plain
    assert set(salted.columns) == {"o_orderkey", "l_quantity", "o_orderdate"}


def test_replicate_skew_join_alias_spellings(tables):
    """Spark's no-underscore aliases (leftouter/leftsemi/…) are valid
    left-anchored spellings and must pass the safety check; right/full
    outer stay rejected under any spelling."""
    import pytest as _pytest

    from greenmask_spark.functions.skew import replicate_skew_join

    orders = tables["orders"].select("o_orderkey", "o_orderdate")
    li = tables["lineitem"].select("l_orderkey", "l_quantity").withColumnRenamed(
        "l_orderkey", "o_orderkey")
    plain = li.join(orders, on=["o_orderkey"], how="leftouter").count()
    assert replicate_skew_join(
        li, orders, on=["o_orderkey"], buckets=4, how="leftouter"
    ).count() == plain
    for bad in ("rightouter", "right_outer", "full", "fullouter", "cross"):
        with _pytest.raises(ValueError, match="duplicate unmatched"):
            replicate_skew_join(li, orders, on=["o_orderkey"], how=bad)


def test_resize_raw_images_exact(spark):
    """Nearest-neighbor resize of a raw H×W×C buffer: exact pixel math,
    corrupt payloads null out instead of failing."""
    import numpy as np
    from pyspark.sql import Row as R

    from greenmask_spark.functions.multimodal import resize_raw_images

    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    rows = [
        R(media_id=1, kind="image", mime="raw", payload=img.tobytes(),
          width=4, height=4, duration_ms=None),
        R(media_id=2, kind="image", mime="raw", payload=b"\x00\x01",  # corrupt
          width=4, height=4, duration_ms=None),
    ]
    from greenmask_spark.functions.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in resize_raw_images(df, 2, 2).collect()}

    want = img[[0, 2]][:, [0, 2], :]  # yi=xi=[0,2] for 4→2
    got = np.frombuffer(out[1].payload, dtype=np.uint8).reshape(2, 2, 3)
    assert (got == want).all()
    assert out[1].width == 2 and out[1].height == 2
    assert out[2].payload is None

    # upsample 4→8 replicates pixels 2×
    up = {r.media_id: r for r in resize_raw_images(df, 8, 8).collect()}
    gup = np.frombuffer(up[1].payload, dtype=np.uint8).reshape(8, 8, 3)
    assert (gup[::2, ::2] == img).all() and (gup[1::2, 1::2] == img).all()


def test_exact_floor_div_pre_epoch(spark):
    """Floor (not truncate-toward-zero) for negative epochs — Go
    time.Unix() semantics; and exact beyond the double mantissa."""
    from greenmask_spark.transformers.base import exact_floor_div

    df = spark.createDataFrame(
        [(-500_000,), (500_000,), (1_700_000_000_123_456_789,),
         (-1_000_001,)], "v long")
    got = [r.o for r in df.select(
        exact_floor_div(F.col("v"), 1_000_000).alias("o")).collect()]
    assert got == [-1, 0, 1_700_000_000_123, -2]


def test_replicate_skew_join_rejects_outer(tables):
    import pytest as _pytest

    from greenmask_spark.functions.skew import replicate_skew_join

    with _pytest.raises(ValueError, match="duplicate"):
        replicate_skew_join(tables["orders"], tables["customer"],
                            on=["o_custkey"], how="full")


def test_simhash_near_dups_codegen_plan(docs):
    """The public near-dup API must use the aggregated simhash_df form —
    no interpreted aggregate() HOF anywhere in its plan."""
    from greenmask_spark.functions.dedup import simhash_near_dups

    df = simhash_near_dups(docs, bits=16, max_hamming=4)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "aggregate(" not in plan


def test_ngram_jaccard_builds_without_running_jobs(docs, spark):
    """Query construction must not trigger an action (the r3 'auto' mode
    ran an eager df.count() full-corpus scan at plan-build)."""
    from greenmask_spark.functions.dedup import ngram_jaccard

    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    sc = spark.sparkContext
    sc.setJobGroup("ngram-build", "plan construction")
    try:
        for strat in ("agg", "broadcast", "auto"):
            ngram_jaccard(docs, pairs, strategy=strat)
        ran = list(sc.statusTracker().getJobIdsForGroup("ngram-build"))
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert ran == []
    # and auto still resolves to a working strategy
    got = {(r.id_a, r.id_b): r.jaccard
           for r in ngram_jaccard(docs, pairs, strategy="auto").collect()}
    assert got[(1, 2)] == 1.0


def test_resize_images_honest(spark):
    """resize_images must never silently return unresized payloads:
    compressed encoded formats raise at decode (no codec in this env);
    raw buffers delegate to the real nearest-neighbor resize; PPM P6
    payloads decode for REAL and resize end-to-end from bytes."""
    import numpy as np
    from pyspark.sql import Row as R

    from greenmask_spark.functions.multimodal import MEDIA_SCHEMA, resize_images

    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    df = spark.createDataFrame(
        [R(media_id=1, kind="image", mime="raw", payload=img.tobytes(),
           width=4, height=4, duration_ms=None)], MEDIA_SCHEMA)
    out = resize_images(df, 2, 2, payload_format="raw").collect()[0]
    assert out.width == 2 and out.height == 2
    want = img[[0, 2]][:, [0, 2], :]
    assert (np.frombuffer(out.payload, dtype=np.uint8).reshape(2, 2, 3)
            == want).all()
    # PPM P6 bytes → REAL decode → resize, fully end-to-end
    ppm = b"P6\n# c\n4 4\n255\n" + img.tobytes()
    df2 = spark.createDataFrame(
        [R(media_id=2, kind="image", mime="image/x-portable-pixmap",
           payload=ppm, width=None, height=None, duration_ms=None)],
        MEDIA_SCHEMA)
    out2 = resize_images(df2, 2, 2).collect()[0]
    assert out2.width == 2 and out2.height == 2
    assert (np.frombuffer(out2.payload, dtype=np.uint8).reshape(2, 2, 3)
            == want).all()
    # a raw buffer is NOT an encoded format: the decode raises at
    # action time (the plan is lazy), never a silent passthrough.
    # LAST in the test: an intentionally-failed UDF task can poison a
    # reused python worker for the next UDF action (see _collect_retry)
    with pytest.raises(Exception) as ei:
        resize_images(df, 2, 2).collect()
    _assert_loud_udf_failure(ei, "NotImplementedError", "decodable format")
    _drain_poisoned_workers(spark)


def test_multimodal_real_decoders(spark):
    """The self-contained formats decode for REAL — PPM and BMP byte
    parsing reproduce known pixels (incl. BMP bottom-up BGR with row
    padding), WAV decodes via the stdlib, and extract_features
    (fake=False) computes real windowed stats from the decoded
    streams while still raising loudly for compressed formats."""
    import io
    import struct
    import wave

    import numpy as np
    from pyspark.sql import Row as R

    from greenmask_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        decode_image_bytes,
        decode_images,
        decode_wav_bytes,
        extract_features,
    )

    # --- PPM: 2x2 with distinct corner colors + header comment
    px = np.array([[[255, 0, 0], [0, 255, 0]],
                   [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8)
    ppm = b"P6 # inline\n2 2\n255\n" + px.tobytes()
    w, h, raw = decode_image_bytes(ppm)
    assert (w, h) == (2, 2)
    assert np.array_equal(
        np.frombuffer(raw, dtype=np.uint8).reshape(2, 2, 3), px)

    # --- BMP: same pixels, bottom-up BGR, 4-byte row padding (2px*3=6
    # bytes → stride 8)
    stride = 8
    rows = []
    for r in (1, 0):  # bottom-up storage
        row = b"".join(bytes([b, g, rr]) for rr, g, b in px[r])
        rows.append(row + b"\x00" * (stride - len(row)))
    pixel_data = b"".join(rows)
    bmp = (b"BM" + struct.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                         len(pixel_data), 2835, 2835, 0, 0)
           + pixel_data)
    w, h, raw = decode_image_bytes(bmp)
    assert (w, h) == (2, 2)
    assert np.array_equal(
        np.frombuffer(raw, dtype=np.uint8).reshape(2, 2, 3), px)

    # --- WAV: 16-bit PCM mono ramp
    samples = np.array([0, 16384, -16384, 32767], dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(samples.tobytes())
    rate, arr = decode_wav_bytes(buf.getvalue())
    assert rate == 8000
    assert np.allclose(arr, samples / 32768.0)

    # --- unknown bytes stay None at the kernel level
    assert decode_image_bytes(b"\x89PNG...") is None
    assert decode_wav_bytes(b"\x89PNG...") is None

    # --- Spark tier: decode_images fills metadata from the REAL decode
    df = spark.createDataFrame(
        [R(media_id=1, kind="image", mime="image/x-portable-pixmap",
           payload=ppm, width=None, height=None, duration_ms=None),
         R(media_id=2, kind="image", mime="image/bmp", payload=bmp,
           width=None, height=None, duration_ms=None),
         R(media_id=3, kind="image", mime="image/png",
           payload=b"\x89PNG fake", width=640, height=480,
           duration_ms=None)],
        MEDIA_SCHEMA)
    ok = {r.media_id: r for r in _collect_retry(decode_images(
        df.filter("media_id < 3")))}
    assert ok[1].width == 2 and ok[1].height == 2
    assert ok[1].mime == "image/raw" and ok[1].payload == ok[2].payload
    with pytest.raises(Exception) as ei:
        decode_images(df).collect()
    _assert_loud_udf_failure(ei, "NotImplementedError", "decodable format")
    nulled = {r.media_id: r for r in _collect_retry(decode_images(
        df, on_unsupported="null"))}
    assert nulled[3].payload is None and nulled[1].payload is not None
    # the undecodable row keeps its DECLARED metadata — only the
    # payload nulls out
    assert nulled[3].width == 640 and nulled[3].height == 480
    assert nulled[3].mime == "image/png"

    # --- real features: image = per-slice mean intensity; wav payload
    wav_bytes = buf.getvalue()
    media = spark.createDataFrame(
        [R(media_id=1, kind="image", mime="ppm", payload=ppm,
           width=None, height=None, duration_ms=None),
         R(media_id=2, kind="audio", mime="wav", payload=wav_bytes,
           width=None, height=None, duration_ms=None)],
        MEDIA_SCHEMA)
    feats = {r.media_id: r.feature for r in
             _collect_retry(extract_features(media, dim=4, fake=False))}
    flat = px.reshape(-1).astype(float) / 255.0  # 12 values → slices of 3
    want_img = [float(flat[i * 3:(i + 1) * 3].mean()) for i in range(4)]
    assert np.allclose(feats[1], want_img, atol=1e-6)
    # per-window RMS; one sample per window here, so RMS == |sample|
    want_wav = [float(abs(s)) for s in samples / 32768.0]
    assert np.allclose(feats[2], want_wav, atol=1e-6)
    # multi-sample windows: TRUE RMS (sqrt of mean square), not the
    # mean of absolute magnitudes — the two differ on this ramp
    feats2 = {r.media_id: r.feature for r in _collect_retry(
        extract_features(media.filter("media_id = 2"), dim=2,
                         fake=False))}
    scaled = samples / 32768.0
    want_rms = [float(np.sqrt(np.mean(scaled[:2] ** 2))),
                float(np.sqrt(np.mean(scaled[2:] ** 2)))]
    assert np.allclose(feats2[2], want_rms, atol=1e-6)
    assert not np.allclose(
        feats2[2], [float(np.abs(scaled[:2]).mean()),
                    float(np.abs(scaled[2:]).mean())], atol=1e-4)
    # compressed format still raises loudly under fake=False
    bad = spark.createDataFrame(
        [R(media_id=9, kind="image", mime="image/png",
           payload=b"\x89PNG fake", width=None, height=None,
           duration_ms=None)], MEDIA_SCHEMA)
    with pytest.raises(Exception) as ei:
        extract_features(bad, fake=False).collect()
    _assert_loud_udf_failure(ei, "NotImplementedError", "PPM")
    _drain_poisoned_workers(spark)


def test_dynamic_param_template_and_default(spark):
    """Dynamic-parameter modes (pkg/toolkit/dynamic_parameter.go:97-160):
    default_value substitutes when the source cell is NULL (template/cast
    never see the NULL); template transforms the raw value per row."""
    from greenmask_spark.transformers.base import resolve_param

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "id long, src int")

    dv = resolve_param({"column": "src", "default_value": 99})
    assert [r.o for r in df.select(dv.alias("o")).orderBy("id").collect()] \
        == [10, 99, 30]

    tpl = resolve_param({
        "column": "src",
        "template": "{{ value * 2 }}",
        "cast_to": "StringToInt",
        "default_value": -1,
    })
    assert [r.o for r in df.select(tpl.alias("o")).orderBy("id").collect()] \
        == [20, -1, 60]


def test_connected_components_vs_union_find(spark):
    """Alternating large-star/small-star vs a driver-side union-find on
    random graphs (chains, cliques, isolated pairs, forests)."""
    import random

    from greenmask_spark.functions.dedup import connected_components

    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(20, 70))
        ]
        # a long chain stresses O(log n) convergence vs label propagation
        edges += [(100 + i, 101 + i) for i in range(30)]
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        nodes = set()
        for a, b in edges:
            if a != b:
                nodes.update((a, b))
                union(a, b)
        expected = {x: find(x) for x in nodes}
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {
            r.node: r.component
            for r in connected_components(df, "id_a", "id_b").collect()
        }
        assert got == expected, f"trial {trial}"


def test_connected_components_empty(spark):
    from greenmask_spark.functions.dedup import connected_components

    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_dedup_clusters_and_fuzzy_dedup(docs):
    from greenmask_spark.functions.dedup import dedup_clusters, fuzzy_dedup

    clusters = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters(docs, k=3, num_perm=8, bands=4).collect()
    }
    # every doc is labeled; exact dups 1/2 share a cluster rooted at min id
    assert set(clusters) == {1, 2, 3, 4, 5, 6}
    assert clusters[1] == 1 and clusters[2] == 1
    # cluster ids are always the cluster minimum
    assert all(cid <= d for d, cid in clusters.items())
    kept = {r.doc_id for r in fuzzy_dedup(docs, k=3, num_perm=8, bands=4).collect()}
    assert 2 not in kept and 1 in kept
    # representatives are exactly the docs that are their own cluster root
    assert kept == {d for d, cid in clusters.items() if d == cid}


def test_semantic_near_dup_and_dedup(spark):
    """SemDeDup: within-centroid pairs match a numpy brute force restricted
    to same-cluster pairs; dedup keeps cluster minima."""
    import numpy as np

    from greenmask_spark.functions.similarity import (
        hash_centroids,
        semantic_dedup,
        semantic_near_dup,
    )

    rng = np.random.default_rng(7)
    dim, n = 8, 40
    base = rng.normal(size=(n, dim))
    # make 1≈0, 11≈10 (near-identical), others random
    base[1] = base[0] + 1e-4
    base[11] = base[10] - 1e-4
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = hash_centroids(dim, 4, seed=3)

    # brute-force twin: same centroid assignment, same rounding
    cmat = np.array(cents)
    acc = np.zeros((n, len(cents)))
    for d in range(dim):
        diff = base[:, d, None] - cmat[None, :, d]
        acc = acc + diff * diff
    cid = np.argmin(acc, axis=1)
    nrm = np.sqrt((base * base).sum(axis=1))
    sims = np.round((base @ base.T) / (nrm[:, None] * nrm[None, :]), 4)
    expected = {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if cid[i] == cid[j] and sims[i, j] >= 0.99
    }
    got = {
        (r.id_a, r.id_b)
        for r in semantic_near_dup(df, cents, threshold=0.99).collect()
    }
    assert got == expected
    assert (0, 1) in got and (10, 11) in got

    kept = {
        r.vec_id for r in semantic_dedup(df, cents, threshold=0.99).collect()
    }
    assert 0 in kept and 1 not in kept
    assert 10 in kept and 11 not in kept
    assert len(kept) == n - len({b for _, b in expected})


def test_cosine_pd_bit_identical(spark):
    """Arrow-batched cosine must be BIT-identical to the expression form
    (same sequential fold) — it feeds rank decisions."""
    import numpy as np

    from greenmask_spark.functions.similarity import cosine, cosine_pd

    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(size=16)],
         [float(x) for x in rng.normal(size=16)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    from pyspark.sql import functions as F

    out = df.select(
        cosine(F.col("a"), F.col("b")).alias("expr"),
        cosine_pd(F.col("a"), F.col("b")).alias("pd"),
    ).collect()
    assert all(r.expr == r.pd for r in out)


def test_sample_mixture(spark):
    from greenmask_spark.functions.sampling import sample_mixture

    a = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    b = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    mix = sample_mixture({"web": a, "code": b}, {"web": 0.5, "code": 2.5})
    rows = mix.groupBy("source_name").count().collect()
    counts = {r.source_name: r["count"] for r in rows}
    # web ~500 (hash-gated), code exactly 2000 + ~500
    assert 400 < counts["web"] < 600
    assert 2400 < counts["code"] < 2600
    # upsampled epochs have disambiguated keys → no duplicate keys overall
    code = mix.filter("source_name = 'code'")
    assert code.select("doc_id").distinct().count() == counts["code"]
    # deterministic
    mix2 = sample_mixture({"web": a, "code": b}, {"web": 0.5, "code": 2.5})
    assert mix2.groupBy("source_name").count().collect() == rows

    import pytest as _p
    with _p.raises(ValueError):
        sample_mixture({"web": a}, {})


def test_pack_sequences(spark):
    """Greedy packing matches a driver-side reference; bins never exceed
    the budget (except single overflow docs); deterministic across
    partitionings."""
    import random

    from greenmask_spark.functions.sampling import pack_sequences

    rng = random.Random(5)
    rows = [(i, rng.randrange(1, 3000)) for i in range(500)]
    rows.append((500, 9000))  # overflow doc
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = pack_sequences(df, max_tokens=4096, n_packers=8).collect()
    assert len(out) == 501

    by_bin = {}
    for r in out:
        by_bin.setdefault(r.seq_id, []).append(r)
    for seq, members in by_bin.items():
        members.sort(key=lambda r: r.seq_pos)
        total = sum(r.n_tokens for r in members)
        if len(members) == 1:
            pass  # may be a legitimate overflow doc
        else:
            assert total <= 4096, seq
        # offsets are the running sum in seq_pos order
        acc = 0
        for r in members:
            assert r.seq_offset == acc
            acc += r.n_tokens
    ov = [r for r in out if r.overflow]
    assert [r.id for r in ov] == [500]
    assert len(by_bin[ov[0].seq_id]) == 1  # overflow doc is alone in its bin

    # partitioning-independence
    out2 = pack_sequences(df.repartition(13), max_tokens=4096, n_packers=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_dedup_clusters_jaccard_verify(docs):
    """min_jaccard drops low-similarity LSH collisions before clustering:
    with an impossible threshold every doc is its own cluster."""
    from greenmask_spark.functions.dedup import dedup_clusters

    clusters = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters(
            docs, k=3, num_perm=8, bands=4, min_jaccard=1.01
        ).collect()
    }
    assert all(d == cid for d, cid in clusters.items())
    # exact dups survive any threshold <= 1.0
    clusters2 = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters(
            docs, k=3, num_perm=8, bands=4, min_jaccard=1.0
        ).collect()
    }
    assert clusters2[2] == 1


def test_dedup_clusters_unpersists_verify_caches(docs, monkeypatch):
    """The verification stage's persist() handles must be released once
    the verified pair set is materialized — a long-lived session running
    many corpora must not accumulate dead cache entries."""
    import greenmask_spark.functions.dedup as dd

    captured = []
    real = dd.ngram_jaccard

    def spy(*a, **kw):
        out = real(*a, **kw)
        captured.append(kw.get("_persisted"))
        return out

    monkeypatch.setattr(dd, "ngram_jaccard", spy)
    dd.dedup_clusters(docs, k=3, num_perm=8, bands=4, min_jaccard=0.5).collect()
    (handles,) = captured
    assert len(handles) == 2 and all(not h.is_cached for h in handles)
    # reuse plumbs through: recompute path never persists anything
    captured.clear()
    out = dd.dedup_clusters(
        docs, k=3, num_perm=8, bands=4, min_jaccard=0.5, reuse="recompute"
    ).collect()
    (handles,) = captured
    assert handles == [] and len(out) == docs.count()


def test_connected_components_nonconvergence_raises(spark):
    from greenmask_spark.functions.dedup import connected_components

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


def test_pack_sequences_properties(spark):
    """Property: for arbitrary token-count multisets, packing (a) keeps
    every doc exactly once, (b) never exceeds the budget for multi-doc
    bins, (c) flags exactly the docs longer than the budget, and
    (d) yields contiguous offsets in seq_pos order."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from greenmask_spark.functions.sampling import pack_sequences

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(st.integers(1, 1500), min_size=1, max_size=50),
           st.integers(512, 2048))
    def check(tokens, budget):
        df = spark.createDataFrame(list(enumerate(tokens)),
                                   ["doc_id", "n_tokens"])
        out = pack_sequences(df, max_tokens=budget, n_packers=4)
        rows = out.collect()
        assert sorted(r.id for r in rows) == list(range(len(tokens)))
        by_bin = {}
        for r in rows:
            by_bin.setdefault(r.seq_id, []).append(r)
        for members in by_bin.values():
            members.sort(key=lambda r: r.seq_pos)
            if len(members) > 1:
                assert sum(r.n_tokens for r in members) <= budget
            off = 0
            for r in members:
                assert r.seq_offset == off
                off += r.n_tokens
        assert {r.id for r in rows if r.overflow} == \
            {i for i, t in enumerate(tokens) if t > budget}

    check()


def test_asof_join_vs_pandas(spark):
    """Backward/forward/tolerance semantics must match pandas.merge_asof
    (by key, inclusive, nearest-not-beyond) on random data."""
    import numpy as np
    import pandas as pd

    from greenmask_spark.functions.asof import asof_join

    rng = np.random.default_rng(21)
    left_pd = pd.DataFrame({
        "k": rng.integers(0, 4, 60),
        "ts": rng.choice(np.arange(0, 1000), 60, replace=False).astype("int64"),
        "v": np.arange(60),
    })
    right_pd = pd.DataFrame({
        "k": rng.integers(0, 4, 30),
        "ts": rng.choice(np.arange(0, 1000), 30, replace=False).astype("int64"),
        "price": rng.normal(size=30).round(3),
    })
    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)

    for direction in ("backward", "forward"):
        for tol in (None, 100):
            got = asof_join(left, right, on="k", direction=direction,
                            tolerance=tol).toPandas()
            exp = pd.merge_asof(
                left_pd.sort_values("ts"),
                right_pd.sort_values("ts").rename(columns={"ts": "ts_right"}),
                left_on="ts", right_on="ts_right", by="k",
                direction=direction,
                **({"tolerance": tol} if tol is not None else {}),
            )
            g = got.sort_values("v").reset_index(drop=True)
            e = exp.sort_values("v").reset_index(drop=True)
            for col in ("price", "ts_right"):
                ga, ea = g[col].to_numpy(), e[col].to_numpy()
                both_nan = pd.isna(ga) & pd.isna(ea)
                assert (both_nan | (ga == ea)).all(), (direction, tol, col)


def test_asof_join_null_payload(spark):
    """A NULL payload value on the MATCHED right row must surface as NULL,
    not fall back to an older right row's value (merge_asof semantics:
    right (3,5.0),(10,NULL), left ts=12 -> price=NULL, ts_right=10)."""
    from greenmask_spark.functions.asof import asof_join

    left = spark.createDataFrame([(1, 12)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 3, 5.0), (1, 10, None)], "k long, ts long, price double"
    )
    r = asof_join(left, right, on="k").collect()[0]
    assert r.ts_right == 10 and r.price is None
    # tolerance keyed on the matched row's ts: stale check uses ts_right=10
    r2 = asof_join(left, right, on="k", tolerance=1).collect()[0]
    assert r2.ts_right is None and r2.price is None


def test_asof_join_name_collision_and_validation(spark):
    import pytest as _p

    from greenmask_spark.functions.asof import asof_join

    left = spark.createDataFrame([(1, 10, "a")], "k long, ts long, v string")
    right = spark.createDataFrame([(1, 5, "b")], "k long, ts long, v string")
    out = asof_join(left, right, on="k")
    assert {"k", "ts", "v", "v_right", "ts_right"} == set(out.columns)
    r = out.collect()[0]
    assert r.v == "a" and r.v_right == "b" and r.ts_right == 5
    with _p.raises(ValueError, match="direction"):
        asof_join(left, right, on="k", direction="nearest")


def test_range_join_vs_bruteforce(spark):
    import random

    from greenmask_spark.functions.asof import range_join

    rng = random.Random(3)
    pts = [(i, rng.randrange(0, 500)) for i in range(80)]
    ivs = []
    for j in range(25):
        s = rng.randrange(0, 480)
        ivs.append((j, s, s + rng.randrange(1, 120)))
    p = spark.createDataFrame(pts, ["pid", "t"])
    iv = spark.createDataFrame(ivs, ["iid", "start", "end"])
    expected = {(pid, iid) for pid, t in pts for iid, s, e in ivs
                if s <= t < e}
    for bs in (16, 64, 1000):
        got = {(r.pid, r.iid)
               for r in range_join(p, iv, "t", bucket_size=bs).collect()}
        assert got == expected, bs
    # left join keeps unmatched points
    left = range_join(p, iv, "t", bucket_size=64, how="left").collect()
    matched_pids = {pid for pid, _ in expected}
    null_pids = {r.pid for r in left if r.iid is None}
    assert null_pids == {pid for pid, _ in pts} - matched_pids


def test_recall_at_k(spark):
    from greenmask_spark.functions.similarity import recall_at_k

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], ["query_id", "neighbor_id"])
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 20), (2, 21)], ["query_id", "neighbor_id"])
    assert recall_at_k(approx, exact) == 0.75  # (1/2 + 2/2) / 2
    assert recall_at_k(exact, exact) == 1.0


def test_normalize_url_and_domain(spark):
    from pyspark.sql import functions as F

    from greenmask_spark.functions.web import normalize_url, url_domain

    cases = {
        "HTTPS://Example.COM:443/Path/?utm_source=x&q=1#frag":
            "https://example.com/Path/?q=1",
        "http://example.com:80/": "http://example.com",
        "https://sub.Example.com/a?gclid=z": "https://sub.example.com/a",
        "https://example.com/a?q=1&utm_medium=m&r=2":
            "https://example.com/a?q=1&r=2",
        "https://example.com/a?utm_source=x": "https://example.com/a",
        "https://example.com/Path/Sub": "https://example.com/Path/Sub",
        # "ref" is content-bearing (git refs, thread refs) — NOT stripped
        "https://example.com/blob/x?ref=main":
            "https://example.com/blob/x?ref=main",
    }
    df = spark.createDataFrame([(k,) for k in cases], ["url"])
    got = {r.url: r.n for r in df.select(
        "url", normalize_url(F.col("url")).alias("n")).collect()}
    assert got == cases
    # but the param set is caller-overridable
    custom = df.select("url", normalize_url(
        F.col("url"), tracking_params=("ref",)).alias("n")).collect()
    assert {r.n for r in custom if "blob" in r.url} == {
        "https://example.com/blob/x"}
    doms = {r.url: (r.d, r.reg) for r in df.select(
        "url",
        url_domain(F.col("url")).alias("d"),
        url_domain(F.col("url"), registered_only=True).alias("reg"),
    ).collect()}
    assert doms["https://sub.Example.com/a?gclid=z"] == (
        "sub.example.com", "example.com")


def test_blocklist_and_domain_cap(spark):
    from greenmask_spark.functions.web import cap_per_domain, filter_blocklist

    docs = spark.createDataFrame(
        [(i, f"https://{'spam.com' if i % 3 == 0 else 'ok.org'}/p/{i}",
          "spam.com" if i % 3 == 0 else "ok.org")
         for i in range(30)],
        ["doc_id", "url", "source"],
    )
    bl = spark.createDataFrame([("SPAM.com",)], ["domain"])
    kept = filter_blocklist(docs, bl, url_col="url")
    assert kept.count() == 20 and kept.columns == docs.columns

    capped = cap_per_domain(docs, 5)
    counts = {r.source: r["count"]
              for r in capped.groupBy("source").count().collect()}
    assert counts == {"spam.com": 5, "ok.org": 5}
    # deterministic selection at any partitioning
    a = {r.doc_id for r in capped.collect()}
    b = {r.doc_id for r in cap_per_domain(docs.repartition(7), 5).collect()}
    assert a == b


def test_dynamic_param_default_type_agrees_with_cast(spark):
    """A STRING default (how YAML configs often arrive) against a
    cast-to-int branch must not coerce the parameter to string."""
    from greenmask_spark.transformers.base import resolve_param

    df = spark.createDataFrame(
        [(1, "10"), (2, None)], "id long, src string")
    p = resolve_param({
        "column": "src", "cast_to": "StringToInt", "default_value": "50"})
    out = df.select(p.alias("o")).orderBy("id")
    assert dict(out.dtypes)["o"] in ("int", "bigint")
    assert [r.o for r in out.collect()] == [10, 50]


def test_cosine_pd_null_and_ragged(spark):
    """NULL / length-mismatched vectors → NULL, matching the expression
    form — never a task crash."""
    from pyspark.sql import functions as F

    from greenmask_spark.functions.similarity import cosine, cosine_pd

    df = spark.createDataFrame(
        [(1, [1.0, 2.0], [3.0, 4.0]),
         (2, None, [3.0, 4.0]),
         (3, [1.0, 2.0], None),
         (4, [1.0, 2.0, 3.0], [1.0, 2.0])],
        "id long, a array<double>, b array<double>")
    rows = df.select(
        "id",
        cosine(F.col("a"), F.col("b")).alias("expr"),
        cosine_pd(F.col("a"), F.col("b")).alias("pd"),
    ).orderBy("id").collect()
    for r in rows:
        assert r.expr == r.pd, r
    assert rows[0].pd is not None and rows[1].pd is None \
        and rows[2].pd is None and rows[3].pd is None


def test_normalize_url_renamed_column_and_scheme_ports(spark):
    """The URL expression must derive every part from the passed Column
    (a decoy column named 'url' must not leak in), and default-port
    stripping must be scheme-paired."""
    from pyspark.sql import functions as F

    from greenmask_spark.functions.web import normalize_url

    df = spark.createDataFrame(
        [("https://Example.com:443/Keep?utm_source=x", "http://decoy/zzz"),
         ("https://example.com:80/x", "d"),
         ("http://example.com:443/x", "d")],
        ["page_url", "url"])
    got = [r.n for r in df.select(
        normalize_url(F.col("page_url")).alias("n")).collect()]
    assert got == [
        "https://example.com/Keep",
        "https://example.com:80/x",   # https on :80 is a distinct fetch
        "http://example.com:443/x",   # http on :443 likewise
    ]


def test_corpus_summary(spark, sf_dir):
    from greenmask_spark.functions.text_analysis import corpus_summary
    from greenmask_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    rep = corpus_summary(docs).collect()
    assert len(rep) == docs.select("source").distinct().count()
    for r in rep:
        assert r.n_docs > 0 and r.total_tokens > 0
        assert r.p50_tokens <= r.p95_tokens
        assert 0 < r.top_lang_share <= 1.0
        assert r.top_lang is not None
    assert sum(r.n_docs for r in rep) == docs.count()


def test_deterministic_shuffle_and_training_shards(spark, tmp_path):
    from greenmask_spark.functions.sampling import (
        deterministic_shuffle,
        write_training_shards,
    )

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    o1 = [r.doc_id for r in deterministic_shuffle(df).collect()]
    o2 = [r.doc_id for r in
          deterministic_shuffle(df.repartition(13)).collect()]
    assert o1 == o2                      # partitioning-independent order
    assert o1 != sorted(o1)              # actually shuffled
    assert sorted(o1) == list(range(500))
    assert o1 != [r.doc_id for r in
                  deterministic_shuffle(df, seed=7).collect()]

    out = str(tmp_path / "shards")
    write_training_shards(df, out, rows_per_shard=50)
    import glob
    files = sorted(glob.glob(out + "/part-*"))
    assert len(files) >= 500 // 50
    back = spark.read.parquet(out)
    assert back.count() == 500
    # no shard exceeds the cap
    for f in files:
        assert spark.read.parquet(f).count() <= 50


def test_dedup_paragraphs(spark):
    from greenmask_spark.functions.dedup import dedup_lines

    rows = [(1, "para one\nline two\n\nshared para"),
            (2, "different start\n\nshared para")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.id: r.text
           for r in dedup_lines(df, sep="\n\n").collect()}
    assert "shared para" in out[1] and "shared para" not in out[2]
    # line mode would also kill "line two"? no — it's unique; but the
    # paragraph mode must keep intra-paragraph lines intact
    assert "line two" in out[1]


def test_cluster_aware_split(spark):
    from greenmask_spark.functions.dedup import dedup_clusters
    from greenmask_spark.functions.sampling import (
        cluster_aware_split,
        cross_split_contamination,
    )

    # many near-identical doc pairs: plain hash_split leaks some pair
    # across the boundary; cluster-aware never does
    import random

    rng = random.Random(17)
    rows = []
    for i in range(0, 200, 2):
        # distinct random body per pair so pairs cluster separately
        body = " ".join(
            "".join(rng.choices("abcdefghijklmnop", k=8)) for _ in range(12)
        )
        rows.append((i, body))
        rows.append((i + 1, body))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    clusters = dedup_clusters(df, k=5, num_perm=8, bands=4)
    split = cluster_aware_split(df, clusters,
                                {"train": 0.5, "test": 0.5})
    leaks = cross_split_contamination(split).count()
    assert leaks == 0
    # both members of each pair share a split
    m = {r.doc_id: r.split for r in split.collect()}
    assert all(m[i] == m[i + 1] for i in range(0, 200, 2))
    assert {"train", "test"} == set(m.values())  # both splits populated


def test_pack_sequences_sep_tokens(spark):
    from greenmask_spark.functions.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, 100) for i in range(10)], ["doc_id", "n_tokens"])
    # budget 202: without separators 2 docs/bin; with sep_tokens=2
    # each doc costs 102 → still 2 fit (204 > 202? no: 102+102=204 > 202
    # → only 1 per bin)
    plain = pack_sequences(df, max_tokens=202, n_packers=1)
    with_sep = pack_sequences(df, max_tokens=202, n_packers=1, sep_tokens=2)
    assert plain.select("seq_id").distinct().count() == 5
    assert with_sep.select("seq_id").distinct().count() == 10


def test_linear_text_score(spark):
    import math

    from greenmask_spark.functions.text_analysis import linear_text_score

    docs = spark.createDataFrame(
        [(1, "good good text"), (2, "bad bad bad"), (3, "neutral words")],
        ["doc_id", "text"])
    weights = spark.createDataFrame(
        [("good", 2.0), ("bad", -2.0)], ["term", "weight"])
    out = {r.id: r.score for r in linear_text_score(docs, weights).collect()}
    # doc1 mean = (2+2+0)/3; doc2 = -2; doc3 = 0 → sigmoid ordering
    assert out[2] < out[3] < out[1]
    assert abs(out[3] - 0.5) < 1e-9
    assert abs(out[1] - 1 / (1 + math.exp(-4.0 / 3))) < 1e-9


def test_linear_text_score_empty_docs_keep_prior(spark):
    import math

    from greenmask_spark.functions.text_analysis import linear_text_score

    docs = spark.createDataFrame(
        [(1, "good"), (2, ""), (3, "   ")], ["doc_id", "text"])
    weights = spark.createDataFrame([("good", 2.0)], ["term", "weight"])
    out = {r.id: r.score
           for r in linear_text_score(docs, weights, bias=1.0).collect()}
    assert set(out) == {1, 2, 3}
    prior = 1 / (1 + math.exp(-1.0))
    assert abs(out[2] - prior) < 1e-9 and abs(out[3] - prior) < 1e-9


def test_corpus_summary_null_group(spark):
    from pyspark.sql import functions as F

    from greenmask_spark.functions.text_analysis import corpus_summary

    df = spark.createDataFrame(
        [("web", "some text here"), (None, "orphan document text")],
        ["source", "text"])
    rep = corpus_summary(df).collect()
    assert sum(r.n_docs for r in rep) == 2  # NULL group not dropped
    assert any(r.source is None for r in rep)


def test_linear_text_score_duplicate_weight_terms(spark):
    from greenmask_spark.functions.text_analysis import linear_text_score

    docs = spark.createDataFrame([(1, "good stuff")], ["doc_id", "text"])
    dup_w = spark.createDataFrame(
        [("Good", 1.0), ("good", 2.0)], ["term", "weight"])
    merged_w = spark.createDataFrame([("good", 3.0)], ["term", "weight"])
    a = linear_text_score(docs, dup_w).collect()[0].score
    b = linear_text_score(docs, merged_w).collect()[0].score
    assert a == b  # duplicates sum, never fan out the token join


def test_operator_edge_cases(spark):
    """Empty/singleton inputs flow through the heavy operators without
    surprises (the failure mode reviews keep finding in other engines)."""
    from greenmask_spark.functions.asof import asof_join, range_join
    from greenmask_spark.functions.dedup import (
        dedup_clusters,
        minhash_candidates,
        ngram_jaccard,
    )
    from greenmask_spark.functions.similarity import cosine_pairs_blocked

    docs1 = spark.createDataFrame([(1, "only one document here")],
                                  ["doc_id", "text"])
    # single doc: no pairs, one singleton cluster
    assert minhash_candidates(docs1, k=3).count() == 0
    cl = dedup_clusters(docs1, k=3).collect()
    assert [(r.doc_id, r.cluster_id) for r in cl] == [(1, 1)]

    # empty candidate pairs → empty jaccard, both strategies
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    for strat in ("agg", "broadcast"):
        assert ngram_jaccard(docs1, empty_pairs, strategy=strat).count() == 0

    # one embedding: no pairs out of the tiler
    one = spark.createDataFrame([(1, [1.0, 0.0])],
                                "vec_id long, embedding array<double>")
    assert cosine_pairs_blocked(one, 0.5, n_blocks=3).count() == 0

    # as-of with an empty right side: left rows survive with NULL payload
    left = spark.createDataFrame([(1, 10, "x")], "k long, ts long, v string")
    empty_right = spark.createDataFrame([], "k long, ts long, price double")
    out = asof_join(left, empty_right, on="k").collect()
    assert len(out) == 1 and out[0].price is None

    # range join with no intervals
    pts = spark.createDataFrame([(1, 5)], ["pid", "t"])
    no_iv = spark.createDataFrame([], "iid long, start long, end long")
    assert range_join(pts, no_iv, "t").count() == 0
    assert range_join(pts, no_iv, "t", how="left").count() == 1


def test_pack_sequences_bfd(spark):
    """BFD packs at least as tightly as sequential; invariants hold;
    deterministic across partitionings."""
    import random

    from greenmask_spark.functions.sampling import (
        pack_sequences,
        packing_stats,
    )

    rng = random.Random(13)
    rows = [(i, rng.choice([3000, 900, 700, 400, 90])) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    seq = pack_sequences(df, max_tokens=4096, n_packers=4)
    bfd = pack_sequences(df, max_tokens=4096, n_packers=4, strategy="bfd")
    s_stats = packing_stats(seq, 4096).first()
    b_stats = packing_stats(bfd, 4096).first()
    assert b_stats.n_docs == s_stats.n_docs == 400
    assert b_stats.n_bins <= s_stats.n_bins
    assert b_stats.padding_frac <= s_stats.padding_frac

    # bin-budget + offset invariants for bfd
    by_bin = {}
    for r in bfd.collect():
        by_bin.setdefault(r.seq_id, []).append(r)
    for members in by_bin.values():
        members.sort(key=lambda r: r.seq_pos)
        assert sum(r.n_tokens for r in members) <= 4096 or len(members) == 1
        off = 0
        for r in members:
            assert r.seq_offset == off
            off += r.n_tokens

    again = pack_sequences(df.repartition(11), max_tokens=4096,
                           n_packers=4, strategy="bfd").collect()
    assert sorted(map(tuple, bfd.collect())) == sorted(map(tuple, again))

    import pytest as _p
    with _p.raises(ValueError, match="strategy"):
        pack_sequences(df, strategy="worst-fit")


def test_rerank_topk_coarse_to_fine(spark):
    """int8-coarse IVF (wide m) + exact re-rank recovers near-exact
    top-k; re-ranking exact candidates IS the exact answer."""
    import numpy as np

    from greenmask_spark.functions.quantize import quantize_embeddings
    from greenmask_spark.functions.similarity import (
        cosine_topk,
        hash_centroids,
        ivf_topk,
        recall_at_k,
        rerank_topk,
    )

    rng = np.random.default_rng(3)
    n, dim = 300, 16
    mat = rng.normal(size=(n, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    queries = df.filter("vec_id < 5")
    exact = cosine_topk(df, queries, k=5)

    # sanity: re-ranking the exact answer reproduces it
    rr = rerank_topk(exact, df, queries, k=5)
    assert sorted(map(tuple, rr.collect())) == sorted(
        map(tuple, exact.collect()))

    # coarse int8 IVF (wide m) → fine re-rank: high recall vs exact
    q8 = quantize_embeddings(df).select(
        "vec_id",
        F.transform("qvec.q", lambda x: x.cast("double")).alias("embedding"),
    )
    cents = hash_centroids(dim, 8, seed=5)
    coarse = ivf_topk(
        q8, q8.filter("vec_id < 5"), k=60, n_probe=4, centroids=cents)
    fine = rerank_topk(coarse, df, queries, k=5)
    rec = recall_at_k(fine, exact)
    assert rec >= 0.8, rec


def test_normalize_text_unicode_folding(spark):
    from greenmask_spark.functions.dedup import dedup_exact
    from greenmask_spark.functions.text_analysis import normalize_text

    rows = [
        (1, "The ｑuick broｗn fox"),       # fullwidth q/w
        (2, "the quick brown fox"),
        (3, "café deluxe"),                     # é composed
        (4, "café   deluxe"),                  # e + combining acute
        (5, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.n for r in df.select(
        "doc_id",
        normalize_text(F.col("text")).alias("n")).collect()}
    assert out[1] == out[2] == "the quick brown fox"
    assert out[3] == out[4] == "café deluxe"
    assert out[5] is None

    # normalized column feeds exact dedup: 4 docs collapse to 2
    normed = df.filter("text IS NOT NULL").withColumn(
        "text", normalize_text(F.col("text")))
    assert dedup_exact(normed).count() == 2

    import pytest as _p
    with _p.raises(ValueError, match="normalization form"):
        df.select(normalize_text(F.col("text"), form="NFX"))


def test_ann_taggers_tolerate_null_and_ragged_vectors(spark):
    """One bad row (NULL / wrong-dim embedding) must not kill a tagging
    stage at scale: LSH gives bucket 0 + NULL norm (expression-form
    semantics), IVF gives NULL cid (drops at the probe join)."""
    from greenmask_spark.functions.similarity import (
        _assign_centroids,
        _hyperplanes,
        _lsh_tag_batch,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, None), (3, [1.0])],
        "id long, v array<double>",
    )
    lsh = {r.id: (r.bucket, r.n) for r in _lsh_tag_batch(
        df, _hyperplanes(4, 3, seed=42), "v", "bucket", "n").collect()}
    assert lsh[2] == (0, None) and lsh[3] == (0, None)
    assert lsh[1][1] is not None

    ivf = {r.id: (r.cid, r.n) for r in _assign_centroids(
        df, [[0.0] * 4, [1.0, 2.0, 3.0, 4.0]], "v", "cid", "n").collect()}
    assert ivf[1][0] == 1 and ivf[2] == (None, None) and ivf[3] == (None, None)


def test_dedup_against_reference_corpus(spark):
    """Incremental dedup: a new shard drops docs that duplicate the
    reference corpus (exact and fuzzy+verified), keeps novel docs, and
    never touches the reference. Overlapping id values between the two
    corpora must not confuse the verify stage."""
    from greenmask_spark.functions.dedup import dedup_against

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest tonight")
    ref = spark.createDataFrame(
        [(1, base), (2, "completely different reference text about ships "
                        "sailing across the wide open ocean")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "a totally novel document about cooking pasta at home"),
         (2, base),                                  # exact dup of ref 1
         (3, base.replace("tonight", "tonite")),     # near dup of ref 1
         (4, "another novel doc on gardening and soil quality today")],
        "doc_id long, text string",
    )
    exact = {r.doc_id for r in dedup_against(new, ref).collect()}
    assert exact == {1, 3, 4}  # only the byte-identical doc dropped

    fuzzy = {r.doc_id for r in dedup_against(
        new, ref, level="fuzzy", num_perm=8, bands=4, k=3,
        min_jaccard=0.7).collect()}
    assert fuzzy == {1, 4}     # near dup dropped too, novel docs kept

    # impossible threshold: band collisions alone must not drop docs
    none_dropped = {r.doc_id for r in dedup_against(
        new, ref, level="fuzzy", num_perm=8, bands=4, k=3,
        min_jaccard=1.01).collect()}
    assert none_dropped == {1, 2, 3, 4}

    import pytest as _p
    with _p.raises(ValueError, match="level"):
        dedup_against(new, ref, level="nope")


def test_dedup_against_prepared_reference(spark):
    """The rolling-crawl shape: prepare_reference computes the keyed
    form once; dedup_against over the prepared frame must return
    byte-identical results to the recompute path, across multiple
    shards, for exact AND fuzzy(+verify) levels — and a fuzzy verify
    without stored shingles fails loudly."""
    import pytest

    from greenmask_spark.functions.dedup import dedup_against, prepare_reference

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest tonight")
    ref = spark.createDataFrame(
        [(1, base), (2, "completely different reference text about ships "
                        "sailing across the wide open ocean")],
        "doc_id long, text string",
    )
    shard1 = spark.createDataFrame(
        [(1, "a totally novel document about cooking pasta at home"),
         (2, base),
         (3, base.replace("tonight", "tonite"))],
        "doc_id long, text string",
    )
    shard2 = spark.createDataFrame(
        [(7, base),  # exact dup again — reference reused, not recomputed
         (8, "another novel doc on gardening and soil quality today")],
        "doc_id long, text string",
    )
    prep_exact = prepare_reference(ref, "exact").cache()
    prep_fuzzy = prepare_reference(
        ref, "fuzzy", num_perm=8, k=3).cache()
    for shard in (shard1, shard2):
        got = {r.doc_id for r in dedup_against(shard, prep_exact).collect()}
        want = {r.doc_id for r in dedup_against(shard, ref).collect()}
        assert got == want
        got_f = {r.doc_id for r in dedup_against(
            shard, prep_fuzzy, level="fuzzy", num_perm=8, bands=4, k=3,
            min_jaccard=0.7).collect()}
        want_f = {r.doc_id for r in dedup_against(
            shard, ref, level="fuzzy", num_perm=8, bands=4, k=3,
            min_jaccard=0.7).collect()}
        assert got_f == want_f
        # band-only fuzzy (no verify) also agrees
        got_b = {r.doc_id for r in dedup_against(
            shard, prep_fuzzy, level="fuzzy", num_perm=8, bands=4,
            k=3).collect()}
        want_b = {r.doc_id for r in dedup_against(
            shard, ref, level="fuzzy", num_perm=8, bands=4, k=3).collect()}
        assert got_b == want_b
    assert {r.doc_id for r in dedup_against(
        shard1, prep_fuzzy, level="fuzzy", num_perm=8, bands=4, k=3,
        min_jaccard=0.7).collect()} == {1}
    # verify without stored shingles: loud, actionable
    lean = prepare_reference(ref, "fuzzy", num_perm=8, k=3,
                             with_shingles=False)
    assert "__ref_hs" not in lean.columns
    with pytest.raises(ValueError, match="with_shingles"):
        dedup_against(shard1, lean, level="fuzzy", num_perm=8, bands=4,
                      k=3, min_jaccard=0.7)
    prep_exact.unpersist()
    prep_fuzzy.unpersist()


def test_dedup_against_prepared_contract_validated(spark):
    """The num_perm/k contract between prepare_reference and
    dedup_against is ENFORCED, not just documented: a mismatched call
    would read past the stored signature (NULL band keys → silently
    wrong dedup), so it raises with the stored values named; legacy
    frames without the metadata columns still catch a signature-length
    mismatch."""
    import pytest

    from greenmask_spark.functions.dedup import dedup_against, prepare_reference

    ref = spark.createDataFrame(
        [(1, "some reference text with enough words to shingle over")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(9, "a new shard document that shares nothing with it")],
        "doc_id long, text string",
    )
    prep = prepare_reference(ref, "fuzzy", num_perm=8, k=3)
    assert {"__ref_num_perm", "__ref_k"} <= set(prep.columns)
    with pytest.raises(ValueError, match="num_perm=8"):
        dedup_against(new, prep, level="fuzzy", num_perm=16, bands=4, k=3)
    with pytest.raises(ValueError, match="k=3"):
        dedup_against(new, prep, level="fuzzy", num_perm=8, bands=4, k=5)
    # matched call passes the gate (and still dedups correctly)
    assert dedup_against(new, prep, level="fuzzy", num_perm=8, bands=4,
                         k=3).count() == 1
    # legacy frame (no metadata columns): sig-length mismatch still
    # raises, naming the missing-metadata limitation
    legacy = prep.drop("__ref_num_perm", "__ref_k")
    with pytest.raises(ValueError, match="legacy"):
        dedup_against(new, legacy, level="fuzzy", num_perm=16, bands=4,
                      k=3)
    # an EMPTY prepared reference is valid (nothing to dedup against)
    empty = prepare_reference(
        ref.filter("doc_id < 0"), "fuzzy", num_perm=8, k=3)
    assert dedup_against(new, empty, level="fuzzy", num_perm=16,
                         bands=4, k=4).count() == 1


def test_dedup_against_prepared_equivalence_property(spark):
    """Property: for ANY corpus pair (including empty strings,
    whitespace-only and duplicate texts), dedup_against over a
    prepare_reference frame returns exactly the recompute path's ids,
    at every level."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from greenmask_spark.functions.dedup import dedup_against, prepare_reference

    words = st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon",
                         "zeta", "eta", "theta"]),
        min_size=0, max_size=12,
    ).map(" ".join)

    @settings(max_examples=4, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(words, min_size=1, max_size=8),
           st.lists(words, min_size=1, max_size=8))
    def check(ref_texts, new_texts):
        ref = spark.createDataFrame(
            [(i, t) for i, t in enumerate(ref_texts)],
            "doc_id long, text string")
        new = spark.createDataFrame(
            [(100 + i, t) for i, t in enumerate(new_texts)],
            "doc_id long, text string")
        pe = prepare_reference(ref, "exact")
        pf = prepare_reference(ref, "fuzzy", num_perm=8, k=3)
        for prepped, kwargs in (
            (pe, {"level": "exact"}),
            (pf, {"level": "fuzzy", "num_perm": 8, "bands": 4, "k": 3}),
            (pf, {"level": "fuzzy", "num_perm": 8, "bands": 4, "k": 3,
                  "min_jaccard": 0.6}),
        ):
            got = {r.doc_id for r in
                   dedup_against(new, prepped, **kwargs).collect()}
            want = {r.doc_id for r in
                    dedup_against(new, ref, **kwargs).collect()}
            assert got == want, (kwargs, ref_texts, new_texts)

    check()


def test_bpe_train_and_encode(spark):
    """Classic BPE on the Sennrich et al. toy corpus: the first merges
    are the expected high-frequency pairs, encoding is deterministic
    and reconstructs the input, unseen words back off to characters,
    token counts feed pack_sequences as a real budget, and the merge
    table round-trips through its DataFrame form."""
    from greenmask_spark.functions.bpe import (
        EOW,
        bpe_encode,
        bpe_token_count,
        merges_from_df,
        merges_to_df,
        train_bpe,
    )

    # the canonical BPE example: {low:5, lower:2, newest:6, widest:3}
    rows = []
    rid = 0
    for word, freq in (("low", 5), ("lower", 2), ("newest", 6),
                       ("widest", 3)):
        for _ in range(freq):
            rows.append((rid, word))
            rid += 1
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(corpus, num_merges=10, min_pair_freq=2)
    # 'es' (freq 9 from newest+widest) is the first merge; 'est</w>'
    # forms within the first few
    assert merges[0] == ("e", "s")
    assert ("es", "t" + EOW) in merges[:3]

    df = spark.createDataFrame(
        [(1, "newest widest"), (2, "low lower"), (3, "zzz"), (4, None)],
        "doc_id long, text string",
    )
    enc = {r.doc_id: r.toks for r in df.select(
        "doc_id", bpe_encode(F.col("text"), merges).alias("toks")
    ).collect()}
    # tokens reconstruct the input (EOW marks word ends)
    assert "".join(enc[1]).replace(EOW, " ").strip() == "newest widest"
    assert "".join(enc[2]).replace(EOW, " ").strip() == "low lower"
    # seen whole words compress well below character count
    assert len(enc[1]) < len("newestwidest")
    # unseen word backs off toward characters but stays lossless
    assert "".join(enc[3]).replace(EOW, "") == "zzz"
    assert enc[4] is None

    counts = {r.doc_id: r.n for r in df.select(
        "doc_id", bpe_token_count(F.col("text"), merges).alias("n")
    ).collect()}
    assert counts[1] == len(enc[1]) and counts[4] is None

    # merge-table round trip through the storable frame
    rt = merges_from_df(merges_to_df(spark, merges))
    assert rt == merges

    # real-token packing: budget respected with the BPE count column
    from greenmask_spark.functions.sampling import pack_sequences

    budget = df.filter("text IS NOT NULL").withColumn(
        "n_tokens", bpe_token_count(F.col("text"), merges))
    packed = pack_sequences(budget, max_tokens=8, n_packers=2).collect()
    fill: dict[str, int] = {}
    docs_in: dict[str, int] = {}
    for r in packed:
        fill[r.seq_id] = fill.get(r.seq_id, 0) + r.n_tokens
        docs_in[r.seq_id] = docs_in.get(r.seq_id, 0) + 1
    # every multi-doc bin respects the REAL token budget (a single
    # over-budget doc legitimately gets a bin of its own)
    assert all(fill[b] <= 8 for b in fill if docs_in[b] > 1)


def test_bpe_train_vocab_rail(spark):
    """train_bpe counts the floored vocabulary BEFORE collecting it:
    above max_vocab the call raises with sizing guidance (the
    lsh_recall_eval medicine — no unguarded driver collect), the
    min_word_freq floor shrinks the counted table, and the default
    floor of 2 drops hapax words from training."""
    import pytest

    from greenmask_spark.functions.bpe import train_bpe

    # 30 distinct words, each appearing twice (so the default
    # min_word_freq=2 floor keeps them all)
    rows = [(i, f"word{i:02d} word{i:02d}") for i in range(30)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="max_vocab"):
        train_bpe(corpus, num_merges=4, max_vocab=10)
    # the floor is applied BEFORE the rail count: floor at 3 empties
    # the table, so even max_vocab=10 passes (and yields no merges) —
    # AND warns at the cause, pointing at min_word_freq, instead of
    # letting bpe_count fail later with "empty merges table"
    with pytest.warns(UserWarning, match="min_word_freq"):
        assert train_bpe(corpus, num_merges=4, max_vocab=10,
                         min_word_freq=3) == []

    # default min_word_freq=2: hapax-only corpora train nothing (warned)
    hapax = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string")
    with pytest.warns(UserWarning, match="min_word_freq"):
        assert train_bpe(hapax, num_merges=4) == []
    # while min_word_freq=1 restores the classic behavior, silently
    import warnings as _w

    def _no_floor_warning(call):
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            out = call()
        assert not [r for r in rec if "min_word_freq" in str(r.message)]
        return out

    assert _no_floor_warning(
        lambda: train_bpe(hapax, num_merges=4, min_word_freq=1)) != []
    # a genuinely EMPTY corpus doesn't blame the floor
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert _no_floor_warning(lambda: train_bpe(empty, num_merges=4)) == []


def test_bpe_gpt2_pretokenize(spark):
    """GPT-2-style pre-tokenization: punctuation and contractions
    split off before merging, so merges never bridge a class boundary;
    encode matches training's splitter (the stored table records the
    mode); token counts exceed the whitespace path on punctuated text
    by a bounded factor."""
    from greenmask_spark.functions.bpe import (
        EOW,
        bpe_encode,
        bpe_token_count,
        merges_to_df,
        train_bpe,
    )

    rows = [(i, "it's low-cost, it's low-cost!") for i in range(5)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    m_ws = train_bpe(corpus, num_merges=20, min_word_freq=1)
    m_gpt = train_bpe(corpus, num_merges=20, min_word_freq=1,
                      pretokenize="gpt2")
    # whitespace mode happily merges across the apostrophe/hyphen;
    # gpt2 mode never does: no merged symbol mixes a letter with
    # punctuation (the contraction tokens "'s</w>" are the exception
    # and exactly the GPT-2 behavior)
    for a, b in m_gpt:
        sym = (a + b).replace(EOW, "")
        if sym.startswith("'"):
            continue  # contraction unit
        has_alpha = any(c.isalpha() for c in sym)
        has_punct = any(not c.isalnum() for c in sym)
        assert not (has_alpha and has_punct), sym
    # whitespace mode DOES produce such a bridge on this corpus
    # (\"it's\" / \"low-cost,\" are single training units)
    bridged = [
        (a + b) for a, b in m_ws
        if any(c.isalpha() for c in (a + b).replace(EOW, ""))
        and any(not c.isalnum() for c in (a + b).replace(EOW, ""))
    ]
    assert bridged

    df = spark.createDataFrame(
        [(1, "it's low-cost, isn't it?")], "doc_id long, text string")
    toks = df.select(
        bpe_encode(F.col("text"), m_gpt, pretokenize="gpt2").alias("t")
    ).head()["t"]
    # lossless modulo EOW/whitespace: rejoining reconstructs the text
    assert "".join(toks).replace(EOW, "") == "it'slow-cost,isn'tit?"
    # the contraction pre-token trained as a unit surfaces whole
    assert "'s" + EOW in toks

    n_ws = df.select(bpe_token_count(
        F.col("text"), m_ws).alias("n")).head()["n"]
    n_gpt = df.select(bpe_token_count(
        F.col("text"), m_gpt, pretokenize="gpt2").alias("n")).head()["n"]
    # pre-tokenization splits more units, but within a pinned factor
    # of the whitespace path (not an explosion to characters)
    assert n_ws <= n_gpt <= 3 * n_ws

    # the storable frame records the mode alongside lowercase
    mdf = merges_to_df(spark, m_gpt, pretokenize="gpt2")
    assert mdf.head()["pretokenize"] == "gpt2"
    import pytest

    with pytest.raises(ValueError, match="pretokenize"):
        train_bpe(corpus, num_merges=2, pretokenize="bogus")


def _pseudo_text(tag: str, n: int) -> str:
    """Deterministic filler with no repeated 30-char windows (sha256
    blocks — a cyclic generator would self-collide)."""
    import hashlib

    out = []
    i = 0
    while sum(len(x) for x in out) < n:
        out.append(hashlib.sha256(f"{tag}:{i}".encode()).hexdigest())
        i += 1
    return "".join(out)[:n]


def test_repeated_substring_spans(spark):
    """ExactSubstr detection (Lee et al. 2022): windows inside a span
    repeated ACROSS documents flag in both, a WITHIN-document repeat
    flags too, unique text never flags, stride=1 catches arbitrary
    alignment, and the verified output is a subset of the hash-only
    candidates."""
    from greenmask_spark.functions.dedup import (
        repeated_substring_spans,
        substring_spans,
    )

    boiler = _pseudo_text("boiler", 60)
    a = _pseudo_text("a", 40) + boiler + _pseudo_text("a2", 40)
    b = _pseudo_text("b", 25) + boiler + _pseudo_text("b2", 55)
    block = _pseudo_text("blk", 40)
    c = block + _pseudo_text("c", 30) + block  # within-doc repeat
    d = _pseudo_text("d", 120)                 # clean
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d), (5, None), (6, "short")],
        "doc_id long, text string",
    )
    spans = repeated_substring_spans(docs, length=30, stride=1)
    got = {(r.id, r.pos) for r in spans.collect()}
    by_doc = {}
    for i, p in got:
        by_doc.setdefault(i, set()).add(p)
    # every window fully inside the cross-doc boiler span flags, at
    # each doc's own (different) alignment
    assert {p for p in range(41, 72)} <= by_doc[1]
    assert {p for p in range(26, 57)} <= by_doc[2]
    # the within-doc repeated block flags at both its occurrences
    assert {p for p in range(1, 12)} <= by_doc[3]
    assert {p for p in range(71, 82)} <= by_doc[3]
    # clean / NULL / too-short docs never flag
    assert 4 not in by_doc and 5 not in by_doc and 6 not in by_doc
    # windows crossing the span boundary carry unique context → unflagged
    assert 40 not in by_doc[1] and 72 not in by_doc[1]

    # hash-only candidates ⊇ verified spans (the verify stage can only
    # remove 60-bit collisions, never add)
    cand = {(r.id, r.pos) for r in repeated_substring_spans(
        docs, length=30, stride=1, verify=False).collect()}
    assert got <= cand

    # default path (no _persisted handle) must NOT leave the window
    # stream pinned in the CacheManager for the session — the largest
    # intermediate in the module would otherwise accumulate across
    # pipeline runs. DataFrame.persist registers in the CacheManager
    # (pinned until explicit unpersist); the eager localCheckpoint the
    # default path returns does not — so CacheManager emptiness right
    # after the call is exactly "the stream was unpersisted". (The
    # guard tolerates cache left behind by OTHER tests/fixtures.)
    cm = spark._jsparkSession.sharedState().cacheManager()
    was_empty = cm.isEmpty()
    extra = repeated_substring_spans(docs, length=30, stride=1)
    if was_empty:
        assert cm.isEmpty(), "window-stream persist leaked"
    assert {(r.id, r.pos) for r in extra.collect()} == got

    # the caller-owned handle path still works: handle surfaces,
    # caller unpersists
    handles = []
    spans2 = repeated_substring_spans(
        docs, length=30, stride=1, _persisted=handles)
    assert {(r.id, r.pos) for r in spans2.collect()} == got
    assert len(handles) == 1
    for h in handles:
        h.unpersist()

    # the flat window stream covers every stride-aligned position
    w = substring_spans(docs.filter("doc_id = 4"), length=30, stride=7)
    assert [r.pos for r in w.orderBy("pos").collect()] == \
        list(range(1, 120 - 30 + 2, 7))

    # heavy-hitter bucket prefilter is EXACT (a strict superset
    # filter): results identical to the plain path even with a tiny
    # bucket count that forces heavy mod-collisions, and with a large
    # one where most buckets are cold
    for m in (2, 1 << 20):
        pre = {(r.id, r.pos) for r in repeated_substring_spans(
            docs, length=30, stride=1, prefilter_buckets=m).collect()}
        assert pre == got, f"prefilter_buckets={m} changed results"

    import pytest

    with pytest.raises(ValueError, match="stride"):
        substring_spans(docs, length=30, stride=0)
    with pytest.raises(ValueError, match="prefilter_buckets"):
        repeated_substring_spans(docs, length=30, prefilter_buckets=1)


def test_remove_repeated_spans(spark):
    """ExactSubstr removal: every character covered by a repeated
    window is cut (overlapping windows merge into one cut), unique
    text survives byte-for-byte, and clean/NULL docs pass through the
    repair join untouched."""
    from greenmask_spark.functions.dedup import remove_repeated_spans

    boiler = _pseudo_text("boiler", 60)
    pre_a, post_a = _pseudo_text("a", 40), _pseudo_text("a2", 40)
    pre_b, post_b = _pseudo_text("b", 25), _pseudo_text("b2", 55)
    docs = spark.createDataFrame(
        [(1, pre_a + boiler + post_a),
         (2, pre_b + boiler + post_b),
         (3, _pseudo_text("d", 120)),
         (4, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in remove_repeated_spans(
        docs, length=30, stride=1).collect()}
    # the repeated region is excised exactly; unique context survives
    assert out[1] == pre_a + post_a
    assert out[2] == pre_b + post_b
    assert out[3] == _pseudo_text("d", 120)
    assert out[4] is None
    # schema preserved (same columns in, same out)
    cols = remove_repeated_spans(docs, length=30).columns
    assert cols == ["doc_id", "text"]


def test_repeated_substring_spans_property(spark):
    """Property (full spec replay in Python): for ANY corpus — tiny
    alphabets force heavy within- and cross-document repeats — the
    flagged (id, pos) set equals exactly the stride-sampled windows
    whose text occurs >= 2 times."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from greenmask_spark.functions.dedup import repeated_substring_spans

    texts = st.lists(
        st.text(alphabet="ab", min_size=0, max_size=14),
        min_size=1, max_size=5,
    )

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(texts, st.integers(2, 4), st.integers(1, 2))
    def check(bodies, length, stride):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(bodies)],
            "doc_id long, text string")
        got = {(r.id, r.pos) for r in repeated_substring_spans(
            df, length=length, stride=stride).collect()}
        # spec replay: stride-sampled windows, grouped by text
        windows = {}
        for i, t in enumerate(bodies):
            for p in range(1, len(t) - length + 2, stride):
                windows.setdefault(t[p - 1:p - 1 + length], []).append(
                    (i, p))
        want = {span for g, spans in windows.items()
                if len(spans) >= 2 for span in spans}
        assert got == want, (bodies, length, stride)

    check()


def test_bpe_gpt2_pretok_engine_parity(spark):
    """The load-bearing claim behind pretokenize='gpt2': the ASCII-class
    pattern splits IDENTICALLY under Java regex (training's
    regexp_extract_all) and Python re (encode's findall) — checked over
    adversarial inputs (contractions, digit/letter/punct boundaries,
    unicode letters falling into the punct class on both sides)."""
    import re

    from greenmask_spark.functions.bpe import GPT2_PRETOK

    # re.ASCII is load-bearing: Java \s is ASCII-only, Python \s is
    # Unicode — the encode side must compile with re.ASCII (as
    # bpe_encode does) or a word-internal U+00A0/U+2009/U+0085 splits
    # differently between the engines
    pat = re.compile(GPT2_PRETOK, re.ASCII)
    samples = [
        "it's", "don't", "they're", "we've", "i'm", "you'll", "he'd",
        "o'clock", "'''", "a1b2c3", "low-cost,", "x'y", "'s", "'",
        "abc'", "42", "3.14", "...!?", "café", "naïve", "日本語x9",
        "tab\tmixed", "under_score", "MiXeD'Re",
        # Unicode whitespace INSIDE a word (survives the ASCII
        # whitespace split): NBSP, thin space, NEL, ogham space mark —
        # all must land in the punctuation run on BOTH engines
        "a\xa0b", "x\u2009y", "p\u0085q", "m\u1680n", "1\xa02",
        "price:\xa0$9", "\xa0", "\u2009\u2009",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)],
                               "i long, w string")
    got = {r.i: r.toks for r in df.select(
        "i", F.regexp_extract_all("w", F.lit(GPT2_PRETOK), F.lit(0))
        .alias("toks")).collect()}
    for i, s in enumerate(samples):
        assert got[i] == pat.findall(s), (s, got[i], pat.findall(s))


def test_ngram_decontaminate(spark):
    """GPT-3 Appendix-C benchmark decontamination: a training doc
    EMBEDDING a benchmark n-gram drops even when the doc as a whole is
    dissimilar; short docs never flag; min_hits raises the bar; the
    benchmark side itself is untouched."""
    from greenmask_spark.functions.dedup import ngram_decontaminate

    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [(10, "a long article that quotes the quick brown fox jumps "
              "over the lazy dog and then talks about other things at "
              "length for many more words"),
         (11, "a completely unrelated piece about cooking pasta with "
              "plenty of words and no overlap whatsoever here"),
         (12, "quick brown fox"),  # shorter than n -> can never flag
         (13, "the quick brown fox jumps over the lazy dog")],  # exact
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in ngram_decontaminate(
        train, bench, n=5).collect()}
    assert kept == {11, 12}
    # min_hits=2 distinct colliding grams: doc 10 contains the whole
    # 9-token quote -> five 5-gram windows collide; still drops
    kept2 = {r.doc_id for r in ngram_decontaminate(
        train, bench, n=5, min_hits=2).collect()}
    assert kept2 == {11, 12}
    # a benchmark gram count above any doc's overlap keeps everything
    kept3 = {r.doc_id for r in ngram_decontaminate(
        train, bench, n=5, min_hits=99).collect()}
    assert kept3 == {10, 11, 12, 13}
    # shuffle-join fallback agrees with the broadcast path
    kept4 = {r.doc_id for r in ngram_decontaminate(
        train, bench, n=5, broadcast=False).collect()}
    assert kept4 == kept


def test_ngram_lm_train_and_score(spark):
    """Stupid Backoff (Brants et al. 2007) end to end: counts match
    hand-counted n-grams; per-doc scores match the pure-Python
    reference to float tolerance (incl. OOV floor and bigram→unigram
    backoff); short docs get NULL scores with n_scored = 0."""
    from greenmask_spark.functions.lm import (
        _py_stupid_backoff_logprob,
        lm_quality_filter,
        ngram_lm_score,
        train_ngram_lm,
    )

    ref = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the cat ran"),
         (3, "a dog sat")],
        "doc_id long, text string",
    )
    model = train_ngram_lm(ref, n=2)
    counts = {r.gram: r.cnt for r in model.filter("order > 0").collect()}
    total = model.filter("order = 0").collect()[0].cnt
    assert counts["the"] == 3 and counts["cat"] == 2 and counts["sat"] == 2
    assert counts["the cat"] == 2 and counts["cat sat"] == 1
    assert total == 12

    new = spark.createDataFrame(
        [(10, "the cat sat"),           # all bigrams seen
         (11, "the zebra sat"),         # OOV word -> unigram floor
         (12, "cat"),                   # too short for n=2
         (13, "")],                     # empty
        "doc_id long, text string",
    )
    got = {r.id: r for r in ngram_lm_score(new, model, n=2).collect()}
    for doc_id, text in ((10, "the cat sat"), (11, "the zebra sat")):
        want = _py_stupid_backoff_logprob(
            text.split(), counts, n=2, alpha=0.4, total=total)
        assert abs(got[doc_id].lm_logprob - round(want, 6)) < 1e-5, doc_id
        assert got[doc_id].ppl == round(10 ** -got[doc_id].lm_logprob, 4)
    assert got[12].lm_logprob is None and got[12].n_scored == 0
    assert got[13].lm_logprob is None and got[13].n_scored == 0
    # fluent text scores strictly better than OOV text
    assert got[10].ppl < got[11].ppl

    # filter: threshold between the two scored docs
    cut = (got[10].ppl + got[11].ppl) / 2
    kept = {r.doc_id for r in lm_quality_filter(
        new, model, max_ppl=cut, n=2).collect()}
    assert kept == {10}
    kept2 = {r.doc_id for r in lm_quality_filter(
        new, model, max_ppl=cut, n=2, keep_unscored=True).collect()}
    assert kept2 == {10, 12, 13}


def test_ngram_lm_score_plan_stays_jvm(spark, tables):
    """The scoring plan must carry no Python boundary and no cartesian
    blowup — grams join count tables, that's it."""
    from greenmask_spark.functions.lm import ngram_lm_score, train_ngram_lm
    from greenmask_spark.plan.health import plan_health

    docs = tables["documents"].limit(200)
    model = train_ngram_lm(docs)
    out = ngram_lm_score(docs, model, n=2, broadcast_model=True)
    out.count()
    h = plan_health(out)
    assert h["python"] == 0


def test_ngram_lm_bucketed_model_reuse(spark, tables, tmp_path):
    """The model-reuse fast path: a save_ngram_lm/load_ngram_lm round
    trip scores hash-identically to the in-memory model, and — with
    broadcasts disabled so the join strategy is visible — the bucketed
    model side feeds the per-order joins WITHOUT an exchange (the
    10B-gram model shuffles once at save time, not once per shard)."""
    from greenmask_spark.functions.lm import (
        load_ngram_lm,
        ngram_lm_score,
        save_ngram_lm,
        train_ngram_lm,
    )

    docs = tables["documents"].limit(120)
    train = docs.filter("doc_id % 2 = 0")
    shard = docs.filter("doc_id % 2 = 1")
    model = train_ngram_lm(train, n=2)
    save_ngram_lm(model, "lm_bucket_test", num_buckets=4)
    try:
        loaded = load_ngram_lm(spark, "lm_bucket_test")
        direct = {tuple(r) for r in
                  ngram_lm_score(shard, model, n=2).collect()}
        bucketed = {tuple(r) for r in
                    ngram_lm_score(shard, loaded, n=2).collect()}
        assert bucketed == direct and direct

        thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = ngram_lm_score(shard, loaded, n=2)
            out.count()
            plan = out._jdf.queryExecution().executedPlan().toString()
            # every model-side scan selects its buckets; an Exchange
            # directly over a bucketed file scan would mean the model
            # re-shuffled per shard
            assert "SelectedBucketsCount" in plan
            import re

            assert not re.search(
                r"Exchange hashpartitioning\((?:gram|cnt)\b", plan), plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    finally:
        spark.sql("DROP TABLE IF EXISTS lm_bucket_test")


def test_strip_html(spark):
    """Tag removal: scripts/styles drop with content, block closers
    become newlines, entities decode, text survives intact."""
    from greenmask_spark.functions.text_analysis import strip_html

    html = (
        "<html><head><style>body { color: red }</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><!-- comment --><h1>Title</h1>"
        "<p>Hello &amp; welcome to <b>the</b> site.</p>"
        "<ul><li>one</li><li>two &lt;3&#33;</li></ul>"
        "<div>Line A<br>Line B</div></body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, None), (3, "plain text")],
                               "id long, text string")
    out = {r.id: r.t for r in df.select(
        "id", strip_html(F.col("text")).alias("t")).collect()}
    got = out[1]
    assert "script" not in got and "not text" not in got
    assert "color" not in got and "-->" not in got
    assert "<p" not in got and "<div" not in got and "<b>" not in got
    assert "Hello & welcome to the site." in got
    assert "two <3" in got          # &lt; decoded, &#33; dropped
    assert "Title\n" in got          # h1 closer -> newline
    assert "Line A\nLine B" in got   # <br> -> newline
    assert out[2] is None and out[3] == "plain text"
    # &amp; decodes LAST: escaped markup shown as text must not
    # double-unescape ('&amp;lt;' is displayed as the literal '&lt;',
    # '&amp;#65;' as '&#65;' — neither may become '<' or be blanked)
    esc = spark.createDataFrame(
        [(1, "a &amp;lt;b&amp;gt; c &amp;#65; d")], "id long, text string")
    got_esc = esc.select(strip_html(F.col("text")).alias("t")).head().t
    assert got_esc == "a &lt;b&gt; c &#65; d"
    # plan stays codegen (no Python)
    plan = df.select(strip_html(F.col("text"))) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_train_quality_classifier_roundtrip(spark):
    """Learned weights separate planted classes, and scoring them
    through linear_text_score reproduces the MLlib model's own
    probabilities (same z = sum coef*count + intercept)."""
    from greenmask_spark.functions.classifier import train_quality_classifier
    from greenmask_spark.functions.text_analysis import linear_text_score

    good_words = ["research", "analysis", "method", "result", "theory"]
    bad_words = ["click", "winner", "free", "casino", "pills"]
    rows = []
    for i in range(40):
        gw = [good_words[(i + j) % 5] for j in range(6)]
        bw = [bad_words[(i + j) % 5] for j in range(6)]
        rows.append((i, " ".join(gw), 1))
        rows.append((100 + i, " ".join(bw), 0))
    labeled = spark.createDataFrame(rows, "doc_id long, text string, label int")

    weights, bias = train_quality_classifier(labeled, vocab_size=64)
    assert set(r.term for r in weights.collect()) == \
        set(good_words) | set(bad_words)

    test = spark.createDataFrame(
        [(1, "research method and analysis of the result"),
         (2, "click here winner free casino pills")],
        "doc_id long, text string",
    )
    scored = {r.id: r.score for r in linear_text_score(
        test, weights, normalize=False, bias=bias).collect()}
    assert scored[1] > 0.9 > 0.1 > scored[2]

    # consistency with the underlying LR: re-score the training docs and
    # check ordering agreement on the labels (separable data -> perfect)
    tr_scores = {r.id: r.score for r in linear_text_score(
        labeled, weights, normalize=False, bias=bias).collect()}
    assert all(tr_scores[i] > 0.5 for i in range(40))
    assert all(tr_scores[100 + i] < 0.5 for i in range(40))


def test_bm25_scores_and_topk(spark):
    """Okapi BM25 against the hand formula: tf saturation, length
    normalization, negative IDF for >half-corpus terms, zero for
    query-miss docs, deterministic top-k tie-break."""
    import math

    from greenmask_spark.functions.text_analysis import bm25_scores, bm25_topk

    docs = spark.createDataFrame(
        [(1, "spark spark query"),        # tf(spark)=2, dl=3
         (2, "spark table"),              # tf(spark)=1, dl=2
         (3, "unrelated words entirely"),
         (4, "spark")],                   # tf=1, dl=1
        "doc_id long, text string",
    )
    got = {r.id: r.score for r in bm25_scores(docs, "spark").collect()}
    N, avgdl, df_t, k1, b = 4, 9 / 4, 3, 1.2, 0.75
    idf = math.log((N - df_t + 0.5) / (df_t + 0.5))

    def s(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert math.isclose(got[1], s(2, 3), rel_tol=1e-12)
    assert math.isclose(got[2], s(1, 2), rel_tol=1e-12)
    assert got[3] == 0.0
    assert math.isclose(got[4], s(1, 1), rel_tol=1e-12)
    # 'spark' is in 3 of 4 docs -> idf = ln(1.5/3.5) < 0 (classic
    # probabilistic form, no Lucene +1 floor)
    assert idf < 0 and got[1] < 0
    # a rare term scores positively and multi-term queries sum
    got2 = {r.id: r.score for r in
            bm25_scores(docs, "table query").collect()}
    assert got2[2] > 0 and got2[1] > 0 and got2[3] == 0.0 and got2[4] == 0.0

    top = bm25_topk(docs, "table query", n=2).collect()
    assert [r.id for r in top] == sorted(
        got2, key=lambda i: (-got2[i], i))[:2]

    # include_misses=False (scale path): only matching docs, same scores
    sparse = {r.id: r.score for r in
              bm25_scores(docs, "table query",
                          include_misses=False).collect()}
    assert set(sparse) == {1, 2}
    assert all(math.isclose(sparse[i], got2[i], rel_tol=1e-12)
               for i in sparse)
    # topk defaults to the sparse path: n beyond the match count
    # returns ONLY matches (no arbitrary 0.0 padding)...
    top4 = bm25_topk(docs, "table query", n=4).collect()
    assert [r.id for r in top4] == [2, 1]
    # ...unless include_misses=True restores dense padding semantics
    top4d = bm25_topk(docs, "table query", n=4,
                      include_misses=True).collect()
    assert len(top4d) == 4 and [r.id for r in top4d[:2]] == [2, 1]

    import pytest

    with pytest.raises(ValueError, match="empty query"):
        bm25_scores(docs, "   ")


def test_bm25_scores_multi(spark):
    """One-pass multi-query BM25 equals the per-query bm25_scores loop
    exactly (same idf/df_t/tf math — df_t is a corpus property), with
    BOTH misses settings; a dict prompt set works; an empty query
    yields no rows instead of raising (batch runs must not die on one
    malformed prompt); and the plan audit shows the corpus scan count
    does NOT grow with the number of queries (the whole point — a
    loop would scan once per prompt)."""
    import math

    from greenmask_spark.functions.text_analysis import (
        bm25_scores,
        bm25_scores_multi,
        bm25_topk_multi,
    )
    from greenmask_spark.plan.health import plan_health

    docs = spark.createDataFrame(
        [(1, "spark spark query"),
         (2, "spark table"),
         (3, "unrelated words entirely"),
         (4, "spark"),
         (5, "query table query words")],
        "doc_id long, text string",
    )
    prompts = {"qa": "spark query", "qb": "table", "qc": "words table"}
    multi = bm25_scores_multi(docs, prompts, include_misses=True)
    got = {(r.query_id, r.id): r.score for r in multi.collect()}
    assert len(got) == 3 * 5
    for qid, q in prompts.items():
        solo = {r.id: r.score for r in bm25_scores(docs, q).collect()}
        for i, want in solo.items():
            assert math.isclose(got[(qid, i)], want, rel_tol=1e-12), (qid, i)
    # sparse path: only matching (query, doc) pairs, same scores
    sparse = {(r.query_id, r.id): r.score
              for r in bm25_scores_multi(docs, prompts).collect()}
    assert {k for k, v in got.items() if v != 0.0} <= set(sparse)
    for k, v in sparse.items():
        assert math.isclose(v, got[k], rel_tol=1e-12)

    # a DataFrame prompt set + an all-whitespace query: no rows for it
    qdf = spark.createDataFrame(
        [("qa", "spark query"), ("bad", "   ")],
        "query_id string, query string")
    out = bm25_scores_multi(docs, qdf)
    assert {r.query_id for r in out.collect()} == {"qa"}

    # top-k per query: rank ties to smallest id, per-query cut
    top = bm25_topk_multi(docs, prompts, n=2).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r.query_id, []).append((r.rank, r.id))
    for qid in prompts:
        solo = {r.id: r.score
                for r in bm25_scores(docs, prompts[qid],
                                     include_misses=False).collect()}
        want = [i for i in sorted(solo, key=lambda i: (-solo[i], i))][:2]
        assert [i for _, i in sorted(by_q[qid])] == want, qid

    # scan count is independent of the prompt count (single pass)
    def scans(queries):
        out = bm25_scores_multi(docs, queries)
        out.collect()  # finalize AQE
        return plan_health(out)["scans"]

    assert scans({"q1": "spark"}) == scans(prompts)


def test_bm25_indexed(spark):
    """The persisted-index retrieval path: bm25_build_index → (save/
    load bucketed) → bm25_scores_indexed matches bm25_scores_multi
    exactly (df_t/idf/tf identical — postings per term ARE document
    frequency) without ever re-reading the corpus; explicit stats
    restore exact parity on corpora with zero-token documents (which
    leave no postings)."""
    import math

    from greenmask_spark.functions.text_analysis import (
        bm25_build_index,
        bm25_index_stats,
        bm25_load_index,
        bm25_save_index,
        bm25_scores_indexed,
        bm25_scores_multi,
        tokens,
    )

    docs = spark.createDataFrame(
        [(1, "spark spark query"),
         (2, "spark table"),
         (3, "unrelated words entirely"),
         (4, "spark"),
         (5, "query table query words"),
         (6, "   ")],  # zero tokens: no postings
        "doc_id long, text string",
    )
    prompts = {"qa": "spark query", "qb": "words table"}
    index = bm25_build_index(docs)
    rows = {(r.term, r.id): (r.tf, r.dl) for r in index.collect()}
    assert rows[("spark", 1)] == (2, 3) and rows[("query", 5)] == (2, 4)
    assert not any(i == 6 for _, i in rows)

    # explicit stats = the full-corpus numbers bm25_scores uses
    # (N counts doc 6, avgdl averages its 0 length)
    full_stats = docs.select(
        F.size(F.filter(tokens(F.col("text")),
                        lambda t: t != "")).alias("n")
    ).agg(F.count(F.lit(1)).alias("N"), F.avg("n").alias("avgdl"))
    want = {(r.query_id, r.id): r.score
            for r in bm25_scores_multi(docs, prompts).collect()}
    got = {(r.query_id, r.id): r.score
           for r in bm25_scores_indexed(index, prompts,
                                        stats=full_stats).collect()}
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-12), k

    # derived stats differ ONLY through N/avgdl (here: one empty doc)
    st = bm25_index_stats(index).collect()[0]
    assert st.N == 5 and math.isclose(st.avgdl, 13 / 5)

    # misses path ranges over the index's distinct ids
    dense = bm25_scores_indexed(index, prompts, stats=full_stats,
                                include_misses=True)
    assert dense.count() == 2 * 5  # doc 6 has no postings to miss on

    # bucketed save/load round trip scores identically
    spark.sql("DROP TABLE IF EXISTS bm25_idx_test")
    try:
        bm25_save_index(index, "bm25_idx_test", num_buckets=4)
        loaded = bm25_load_index(spark, "bm25_idx_test")
        again = {(r.query_id, r.id): r.score
                 for r in bm25_scores_indexed(loaded, prompts,
                                              stats=full_stats).collect()}
        assert set(again) == set(want)
        for k in want:
            assert math.isclose(again[k], want[k], rel_tol=1e-12), k
    finally:
        spark.sql("DROP TABLE IF EXISTS bm25_idx_test")


def test_train_nb_weights(spark):
    """Closed-form NB log-odds training: weights match the hand
    formula exactly, Bernoulli presence (not counts) drives df,
    min_df/vocab_size bound the table, and the trained table separates
    the planted classes through linear_text_score."""
    import math

    from greenmask_spark.functions.classifier import train_nb_weights
    from greenmask_spark.functions.text_analysis import linear_text_score

    labeled = spark.createDataFrame(
        [(1, "good good great solid", 1),     # 'good' twice: df counts ONCE
         (2, "good fine great", 1),
         (3, "bad awful spam", 0),
         (4, "bad spam good", 0)],
        "doc_id long, text string, label int",
    )
    weights, bias = train_nb_weights(labeled, alpha=1.0)
    w = {r.term: r for r in weights.collect()}
    # n_pos = n_neg = 2; 'good': df_pos=2 (presence, not 3), df_neg=1
    assert (w["good"].df_pos, w["good"].df_neg) == (2, 1)
    assert math.isclose(
        w["good"].weight,
        math.log((2 + 1) / (2 + 2)) - math.log((1 + 1) / (2 + 2)),
        rel_tol=1e-12,
    )
    assert (w["great"].df_pos, w["great"].df_neg) == (2, 0)
    assert (w["spam"].df_pos, w["spam"].df_neg) == (0, 2)
    assert w["great"].weight > 0 > w["spam"].weight
    assert math.isclose(bias, math.log(3 / 3), rel_tol=1e-12)

    # vocab bounding: top-df terms survive, ties broken by term
    small, _ = train_nb_weights(labeled, vocab_size=2)
    assert small.count() == 2
    floored, _ = train_nb_weights(labeled, min_df=2)
    assert {r.term for r in floored.collect()} == {
        "good", "great", "bad", "spam"}

    # the artifact drives the scorer like the LR table does
    test = spark.createDataFrame(
        [(10, "great good fine"), (11, "awful spam bad")],
        "doc_id long, text string")
    scored = {r.id: r.score for r in linear_text_score(
        test, weights.select("term", "weight"), normalize=False,
        bias=bias).collect()}
    assert scored[10] > 0.5 > scored[11]


def test_lsh_recall_eval(docs):
    """The recall/precision dial: planted near-dups are in the truth
    set; an LSH config with full bands finds them (recall 1.0 here);
    counts are consistent."""
    from greenmask_spark.functions.dedup import lsh_recall_eval

    m = lsh_recall_eval(docs, min_jaccard=0.5, num_perm=8, bands=8, k=3,
                        sample_fraction=1.0)
    assert 0.0 <= m["recall"] <= 1.0 and 0.0 <= m["precision"] <= 1.0
    assert m["true_pairs"] > 0       # the fixture plants near-dups
    assert m["recall"] == 1.0        # 8 bands of 1 row → max sensitivity
    # stricter banding can only lower candidate count
    m2 = lsh_recall_eval(docs, min_jaccard=0.5, num_perm=8, bands=2, k=3,
                         sample_fraction=1.0)
    assert m2["candidate_pairs"] <= m["candidate_pairs"]


def test_lsh_recall_eval_quadratic_rails(docs):
    """The eval dial must refuse an accidental all-pairs join: the doc
    count is checked against max_docs BEFORE the quadratic stage, and
    sampling defaults ON (0.01) rather than full-corpus."""
    import inspect

    import pytest

    from greenmask_spark.functions.dedup import lsh_recall_eval

    with pytest.raises(ValueError, match="max_docs"):
        lsh_recall_eval(docs, sample_fraction=1.0, max_docs=2)
    # the default is a sample, not the full corpus
    sig = inspect.signature(lsh_recall_eval)
    assert sig.parameters["sample_fraction"].default == 0.01
    # the pre-r6 "no sampling" spelling stays valid: None == 1.0 (and
    # still subject to the max_docs rail), not an opaque TypeError
    with pytest.raises(ValueError, match="max_docs"):
        lsh_recall_eval(docs, sample_fraction=None, max_docs=2)
    m_none = lsh_recall_eval(docs, min_jaccard=0.5, num_perm=8,
                             bands=8, k=3, sample_fraction=None)
    m_full = lsh_recall_eval(docs, min_jaccard=0.5, num_perm=8,
                             bands=8, k=3, sample_fraction=1.0)
    assert m_none == m_full


def test_png_decode_stdlib():
    """PNG decodes for REAL with only stdlib zlib: truecolor exercising
    all five scanline filters, palette, gray, RGBA (alpha dropped), and
    honest None for out-of-scope variants (16-bit, interlaced).
    Fixtures are written by an independent in-test encoder (struct +
    zlib, public spec), pixels asserted exactly."""
    import struct
    import zlib

    import numpy as np

    from greenmask_spark.functions.multimodal import decode_image_bytes

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    def png(w, h, color, filtered_rows, plte=None, depth=8, interlace=0):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
        body = b"".join(filtered_rows)
        out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        if plte is not None:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", zlib.compress(body)) + chunk(b"IEND", b"")

    # --- truecolor 3x5, one row per filter type; unfiltered target px
    px = np.arange(3 * 5 * 3, dtype=np.uint32).reshape(5, 3, 3)
    px = ((px * 37 + 11) % 256).astype(np.uint8)
    rows = []
    prev = np.zeros(9, dtype=np.uint8)
    for r, ftype in enumerate([0, 1, 2, 3, 4]):  # None Sub Up Avg Paeth
        cur = px[r].reshape(9).astype(np.int64)
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            left = np.concatenate([[0, 0, 0], cur[:-3]])
            enc = cur - left
        elif ftype == 2:
            enc = cur - prev
        elif ftype == 3:
            left = np.concatenate([[0, 0, 0], cur[:-3]])
            enc = cur - ((left + prev) >> 1)
        else:
            left = np.concatenate([[0, 0, 0], cur[:-3]])
            ul = np.concatenate([[0, 0, 0], prev[:-3]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, ul))
            enc = cur - pred
        rows.append(bytes([ftype]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur.astype(np.int64)
    got = decode_image_bytes(png(3, 5, 2, rows))
    assert got is not None
    w, h, raw = got
    assert (w, h) == (3, 5)
    assert np.array_equal(
        np.frombuffer(raw, dtype=np.uint8).reshape(5, 3, 3), px)

    # --- palette 2x2: indices map through PLTE to exact colors
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    idx_rows = [b"\x00" + bytes([0, 3]), b"\x00" + bytes([2, 1])]
    w, h, raw = decode_image_bytes(png(2, 2, 3, idx_rows, plte=plte))
    assert (w, h) == (2, 2)
    want = np.array([[[255, 0, 0], [7, 8, 9]],
                     [[0, 0, 255], [0, 255, 0]]], dtype=np.uint8)
    assert np.array_equal(
        np.frombuffer(raw, dtype=np.uint8).reshape(2, 2, 3), want)
    # out-of-range palette index → None, not a crash
    bad = [b"\x00" + bytes([0, 9]), b"\x00" + bytes([2, 1])]
    assert decode_image_bytes(png(2, 2, 3, bad, plte=plte)) is None

    # --- gray 2x1 replicates to RGB; RGBA drops alpha
    w, h, raw = decode_image_bytes(png(2, 1, 0, [b"\x00" + bytes([5, 250])]))
    assert (w, h) == (2, 1) and raw == bytes([5, 5, 5, 250, 250, 250])
    rgba_row = b"\x00" + bytes([1, 2, 3, 128, 4, 5, 6, 7])
    w, h, raw = decode_image_bytes(png(2, 1, 6, [rgba_row]))
    assert (w, h) == (2, 1) and raw == bytes([1, 2, 3, 4, 5, 6])

    # --- honest None: 16-bit depth, Adam7 interlace, truncated stream
    assert decode_image_bytes(
        png(2, 1, 0, [b"\x00" + bytes(4)], depth=16)) is None
    assert decode_image_bytes(
        png(2, 1, 0, [b"\x00" + bytes([5, 250])], interlace=1)) is None
    trunc = png(3, 5, 2, rows)[:60]
    assert decode_image_bytes(trunc) is None


def test_png_decode_spark_tier(spark):
    """decode_images fills width/height/mime from a REAL PNG decode —
    the full Arrow round trip, not just the byte kernel."""
    import struct
    import zlib

    import numpy as np
    from pyspark.sql import Row as R

    from greenmask_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        decode_images,
        extract_features,
    )

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    px = np.array([[[10, 20, 30], [40, 50, 60]]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    body = b"\x00" + px.tobytes()
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(body)) + chunk(b"IEND", b""))
    df = spark.createDataFrame(
        [R(media_id=1, kind="image", mime="image/png", payload=payload,
           width=None, height=None, duration_ms=None)], MEDIA_SCHEMA)
    out = _collect_retry(decode_images(df))[0]
    assert (out.width, out.height, out.mime) == (2, 1, "image/raw")
    assert np.array_equal(
        np.frombuffer(out.payload, dtype=np.uint8).reshape(1, 2, 3), px)
    # real features flow from the decoded pixels
    feat = _collect_retry(extract_features(df, dim=2, fake=False))[0].feature
    flat = px.reshape(-1).astype(float) / 255.0
    assert np.allclose(feat, [flat[:3].mean(), flat[3:].mean()], atol=1e-6)


def test_extract_links_and_host_graph(spark):
    """Link extraction keeps quoted absolute http(s) hrefs (either
    quote style, any attribute/scheme case), drops relative, mailto
    and unquoted ones; host_graph aggregates weighted host pairs with
    self-loops removed and eTLD+1 rollup on demand."""
    from greenmask_spark.functions.web import extract_links, host_graph

    pages = spark.createDataFrame([
        (1, "https://a.example.com/p1",
         '<a href="https://b.example.org/x">1</a>'
         "<a href='http://c.example.net/y'>2</a>"
         '<A HREF="HTTPS://D.Example.IO/Z">3</A>'
         '<a href="/relative">4</a>'
         '<a href="mailto:x@y.z">5</a>'
         '<a href=https://unquoted.example.com/skip>6</a>'
         '<a href="">7</a>'),
        (2, "https://a.example.com/p2",
         '<a href="https://b.example.org/x2">same host pair</a>'
         '<a href="https://a.example.com/self">self loop</a>'),
        (3, "https://e.example.com/p3", "no links here"),
    ], "doc_id long, url string, text string")
    links = extract_links(pages)
    got = {(r.id, r.href) for r in links.collect()}
    assert got == {
        (1, "https://b.example.org/x"),
        (1, "http://c.example.net/y"),
        (1, "HTTPS://D.Example.IO/Z"),
        (2, "https://b.example.org/x2"),
        (2, "https://a.example.com/self"),
    }
    # relative links survive with absolute_only=False
    rel = extract_links(pages, absolute_only=False)
    assert (1, "/relative") in {(r.id, r.href) for r in rel.collect()}

    joined = links.join(
        pages.select(F.col("doc_id").alias("id"), "url"), "id")
    g = {(r.src, r.dst): r.w for r in
         host_graph(joined, "url", "href").collect()}
    assert g == {
        ("a.example.com", "b.example.org"): 2,  # two pages, one host pair
        ("a.example.com", "c.example.net"): 1,
        ("a.example.com", "d.example.io"): 1,   # host lowercased
    }  # self-loop dropped, linkless page absent
    g2 = {(r.src, r.dst): r.w for r in
          host_graph(joined, "url", "href",
                     registered_only=True).collect()}
    # eTLD+1 rollup: a/b/c/d hosts collapse to example.{com,org,net,io}
    assert g2 == {
        ("example.com", "example.org"): 2,
        ("example.com", "example.net"): 1,
        ("example.com", "example.io"): 1,
    }
    # keeping self-loops is an explicit opt-in
    g3 = host_graph(joined, "url", "href", drop_self=False)
    assert ("a.example.com", "a.example.com") in {
        (r.src, r.dst) for r in g3.collect()}


def test_robots_engine(spark):
    """parse_robots + robots_filter: group detection (contiguous UA
    runs, *-group isolation from agent-specific groups), empty-value
    no-ops, comment/unknown-directive skipping, the conservative
    wildcard policy (Disallow truncates, Allow drops), and RFC 9309
    longest-match with the allow tie-break."""
    from greenmask_spark.functions.web import parse_robots, robots_filter

    robots = spark.createDataFrame([
        ("a.com", "# comment\n"
                  "User-agent: googlebot\n"
                  "Disallow: /google-only\n"
                  "User-agent: *\n"
                  "Disallow: /private\n"
                  "Allow: /private/public\n"
                  "Disallow: /tmp*junk\n"
                  "Allow: /ok$\n"
                  "Disallow:\n"
                  "Crawl-delay: 5\n\n"
                  "User-agent: badbot\n"
                  "User-agent: *\n"
                  "Disallow: /both\n"),
        ("b.com", "User-agent: evil\nDisallow: /\n"),  # no * group
        ("tie.com", "User-agent: *\n"
                    "Disallow: /p/\n"
                    "Allow: /p/\n"),  # equal specificity → allow wins
        ("spec.com", "User-agent: *\n"
                     "Disallow: /secret*\n"
                     "Allow: /secret\n"),  # truncation must not demote
    ], "domain string, text string")
    rules = parse_robots(robots)
    got = {(r.domain, r.allow, r.prefix, r.spec) for r in rules.collect()}
    assert got == {
        ("a.com", False, "/private", 8),
        ("a.com", True, "/private/public", 15),
        # /tmp*junk truncates to the /tmp match prefix but KEEPS the
        # 9-octet pattern specificity (RFC ranks by pattern length)
        ("a.com", False, "/tmp", 9),
        ("a.com", False, "/both", 5),  # multi-UA run including *
        ("tie.com", False, "/p/", 3),
        ("tie.com", True, "/p/", 3),
        ("spec.com", False, "/secret", 8),
        ("spec.com", True, "/secret", 7),
    }  # Allow /ok$ dropped (meta in an Allow); b.com has no * rules

    urls = spark.createDataFrame([
        (1, "https://a.com/private/x"),         # blocked
        (2, "https://a.com/private/public/y"),  # longest match allows
        (3, "https://a.com/open"),              # no matching rule
        (4, "https://a.com/google-only"),       # agent-specific group
        (5, "https://a.com/tmp123junk"),        # truncated wildcard blocks
        (6, "https://a.com/both/z"),            # blocked
        (7, "https://b.com/anything"),          # no * rules for domain
        (8, "https://c.com/whatever"),          # no rules at all
        (9, "https://a.com/ok"),                # $-Allow dropped → no match
        (10, "https://tie.com/p/q"),            # tie → allow wins
        # the truncated 'Disallow: /secret*' (spec 8) must outrank
        # 'Allow: /secret' (spec 7) — truncation widens what a
        # Disallow matches but never demotes it below an Allow
        (11, "https://spec.com/secret/file"),   # blocked
        # empty path + query roots at '/': a blanket Disallow covers it
        (12, "https://root.com?x=1"),           # blocked by Disallow /
        (13, "https://root.com/ok"),            # /ok not under /priv
    ], "id long, url string")
    rules2 = rules.unionByName(spark.createDataFrame(
        [("root.com", False, "/", 1), ("root.com", True, "/ok", 3)],
        "domain string, allow boolean, prefix string, spec int"))
    kept = sorted(r.id for r in robots_filter(urls, rules2).collect())
    assert kept == [2, 3, 4, 7, 8, 9, 10, 13]

    # config-driven corpus step (inline robots bodies)
    from greenmask_spark.pipeline import build_corpus_pipeline

    docs = spark.createDataFrame([
        (1, "keep me", "https://a.com/open"),
        (2, "drop me", "https://a.com/private/x"),
    ], "doc_id long, text string, url string")
    out = build_corpus_pipeline(docs, [{
        "op": "robots_filter",
        "robots": [["a.com", "User-agent: *\nDisallow: /private\n"]],
    }])
    assert [r.doc_id for r in out.collect()] == [1]


def test_cap_per_domain_two_phase(spark):
    """The r8 two-phase domain cap keeps exact semantics: over-quota
    domains keep exactly N rows chosen by hash rank of the key
    (reproducible at any partitioning), under-quota domains pass
    through untouched (they skip the window sort entirely), a NULL
    domain is one quota bucket (null-safe join, as the old
    single-window shape treated it), and the kept subset replays
    driver-side from the same salted hash."""
    import pytest

    from greenmask_spark.functions.web import cap_per_domain

    rows = ([(i, "big") for i in range(40)]
            + [(100 + i, "small") for i in range(5)]
            + [(200 + i, None) for i in range(15)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_domain(df, 10)
    got = [(r.doc_id, r.source) for r in out.collect()]
    by_dom = {}
    for i, d in got:
        by_dom.setdefault(d, set()).add(i)
    assert len(by_dom["big"]) == 10
    assert by_dom["small"] == {100 + i for i in range(5)}
    assert len(by_dom[None]) == 10  # NULL domain IS a quota bucket
    assert len(got) == len(set(got))  # no duplicated rows
    assert out.columns == df.columns
    # deterministic at any partitioning
    again = cap_per_domain(df.repartition(7), 10)
    assert {(r.doc_id, r.source) for r in again.collect()} == set(got)
    # the kept rows are the hash-rank minimum — replay the salted hash
    import hashlib

    def h(k):
        return hashlib.sha256(f"{k}:cap:42".encode()).hexdigest()

    want_big = set(sorted(range(40), key=lambda k: (h(k), k))[:10])
    assert by_dom["big"] == want_big

    with pytest.raises(ValueError, match="max_docs"):
        cap_per_domain(df, 0)


def test_c4_filter_rules(spark):
    """The C4 cleaning pass (Raffel 2020 §2.2): line rules drop
    unterminated/short/javascript lines and REWRITE the text; page
    rules drop lorem-ipsum/curly-brace/under-sentence pages; audit
    mode keeps every page with flags; the corpus step composes."""
    from greenmask_spark.functions.text_analysis import c4_filter
    from greenmask_spark.pipeline.corpus import build_corpus_pipeline

    prose = ("the first sentence is here. the second one follows! "
             "does a third exist? it does. and a fifth closes it.")
    docs = spark.createDataFrame(
        [(1, prose + "\nno terminal punctuation line\nok line kept."),
         (2, prose + "\nlorem ipsum dolor sit amet."),
         (3, prose + "\nfunction f() { return 1; }."),
         (4, "only two sentences. that is all!"),
         (5, prose + "\nthis uses JavaScript heavily."),
         (6, None)],
        "doc_id long, text string",
    )
    audit = {r.doc_id: r for r in c4_filter(docs, flags_col="f").collect()}
    # line rules rewrote the text: unterminated line gone, kept line stays
    assert "no terminal punctuation" not in audit[1].text
    assert audit[1].text.endswith("ok line kept.")
    assert audit[1].f.passed
    # page rules flag exactly their violator
    assert not audit[2].f.no_lorem_ipsum and audit[2].f.min_sentences_ok
    assert not audit[3].f.no_curly_brace
    assert not audit[4].f.min_sentences_ok  # 2 sentences < 5
    # the javascript LINE drops (line rule), the page then still has
    # 5 sentences from the prose and passes
    assert "JavaScript" not in audit[5].text and audit[5].f.passed
    assert not any(audit[6].f) or audit[6].f == tuple(
        False for _ in range(4))  # NULL text fails all rules

    kept = {r.doc_id for r in c4_filter(docs).collect()}
    assert kept == {1, 5}

    # corpus step: same drop set
    step = build_corpus_pipeline(docs, [{"op": "c4_filter"}])
    assert {r.doc_id for r in step.collect()} == {1, 5}
    # min_sentences is configurable
    loose = build_corpus_pipeline(
        docs, [{"op": "c4_filter", "min_sentences": 2}])
    assert 4 in {r.doc_id for r in loose.collect()}


def test_cap_per_domain_nondeterministic_input(spark):
    """cap_per_domain reads its input three times, so a rand()-style
    upstream could disagree between the count pass and the branches —
    over-admitting or dropping rows (the one data-corruption path the
    r8 verdict found). The guard detects non-determinism in the
    analyzed plan and pins the input with an eager localCheckpoint, so
    the result still satisfies the exact quota invariants; a plain
    projection pays only the plan walk."""
    from greenmask_spark.functions.web import cap_per_domain
    from greenmask_spark.plan.health import plan_has_nondeterministic

    base = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("dom"), (F.col("id") % 3).cast("string"))
        .alias("source"),
    )
    assert plan_has_nondeterministic(base) is False
    nd = base.filter(F.rand() < 0.6)  # no seed: non-deterministic
    assert plan_has_nondeterministic(nd) is True

    out = cap_per_domain(nd, 20).collect()
    by_dom: dict = {}
    for r in out:
        by_dom.setdefault(r.source, []).append(r.doc_id)
    for dom, ids in by_dom.items():
        # exact quota, and no row admitted twice (the over-admission
        # symptom of count-pass/branch disagreement)
        assert len(ids) <= 20, dom
        assert len(ids) == len(set(ids)), dom
    # rand() < 0.6 over 400 rows: all three domains are over quota
    # with overwhelming probability → each keeps exactly the cap
    assert sorted(by_dom) == ["dom0", "dom1", "dom2"]
    assert all(len(ids) == 20 for ids in by_dom.values())


def test_pq_topk_codes_without_codebooks_raises(spark):
    """Prebuilt codes + freshly-trained codebooks would score in a
    mismatched quantization space and return silently wrong neighbors;
    pq_topk now raises like ivf_pq_topk's index guard."""
    import pytest

    from greenmask_spark.functions.similarity import (
        hash_pq_codebooks,
        pq_encode,
        pq_topk,
    )

    df = spark.createDataFrame(
        [(i, [float(i), float(i + 1)]) for i in range(6)],
        "vec_id long, embedding array<double>")
    books = hash_pq_codebooks(2, m=2, k_sub=2, seed=7)
    codes = pq_encode(df, books)
    with pytest.raises(ValueError, match="codes require the codebooks"):
        pq_topk(df, df.limit(1), codes=codes)
    # the valid combination still runs
    got = pq_topk(df, df.limit(1), codebooks=books, codes=codes, k=2)
    assert got.count() == 2


def test_png_encode_roundtrip(spark):
    """encode_png_bytes is the exact inverse of the PNG decoder for
    truecolor, and the Spark tier round-trips decode → resize →
    re-encode with pixel-exact payloads and correct metadata."""
    import numpy as np
    from pyspark.sql import Row as R

    from greenmask_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        decode_image_bytes,
        decode_images,
        encode_images,
        encode_png_bytes,
        resize_raw_images,
    )

    px = ((np.arange(4 * 3 * 3, dtype=np.uint32) * 53 + 7) % 256).astype(
        np.uint8).reshape(3, 4, 3)
    payload = encode_png_bytes(4, 3, px.tobytes())
    w, h, raw = decode_image_bytes(payload)
    assert (w, h) == (4, 3) and raw == px.tobytes()

    import pytest

    with pytest.raises(ValueError, match="does not match"):
        encode_png_bytes(4, 3, px.tobytes()[:-1])

    # Spark tier: encoded → decode_images → resize → encode_images
    df = spark.createDataFrame(
        [R(media_id=1, kind="image", mime="image/png", payload=payload,
           width=None, height=None, duration_ms=None),
         R(media_id=2, kind="image", mime="image/raw", payload=b"xx",
           width=9, height=9, duration_ms=None),  # corrupt dims → NULL
         R(media_id=3, kind="image", mime="image/raw", payload=b"",
           width=0, height=5, duration_ms=None),  # zero dims: the
        #   empty payload "matches" 0*5*3 bytes — must NULL, not crash
         R(media_id=4, kind="image", mime="image/raw", payload=b"xyz",
           width=None, height=1, duration_ms=None)],  # NULL width:
        #   Arrow promotes the int column to float64 NaN — the guard
        #   must pd.isna it, not `is None`
        MEDIA_SCHEMA)
    out = {r.media_id: r for r in _collect_retry(
        encode_images(resize_raw_images(decode_images(
            df, on_unsupported="null"), 2, 2)))}
    assert out[1].mime == "image/png" and (out[1].width,
                                           out[1].height) == (2, 2)
    w2, h2, raw2 = decode_image_bytes(out[1].payload)
    yi = (np.arange(2) * 3) // 2
    xi = (np.arange(2) * 4) // 2
    assert (w2, h2) == (2, 2) and raw2 == px[yi[:, None], xi, :].tobytes()
    assert out[2].payload is None  # corrupt row skipped, not failed
    assert out[3].payload is None  # zero-dim row skipped, not failed
    assert out[4].payload is None  # NaN-width row skipped, not failed


def test_image_dhash_and_near_dups(spark):
    """Perceptual image hashing: dhash_image_bytes matches a pure-
    Python replay (including non-divisible pooling boundaries), is
    codec-invariant (PPM/PNG of the same pixels), honors the
    skip/raise policy, and image_near_dups' pigeonhole banding is
    COMPLETE — identical to the brute-force popcount over all pairs."""
    import random

    import numpy as np
    import pytest as pt

    from greenmask_spark.functions.multimodal import (
        dhash_image_bytes,
        encode_png_bytes,
        image_dhash,
        image_near_dups,
    )

    def ppm(w, h, px):
        return b"P6\n%d %d\n255\n" % (w, h) + b"".join(bytes(t) for t in px)

    def replay(w, h, px, hash_size=8):
        nw, nh = hash_size + 1, hash_size
        gray = [299 * px[i][0] + 587 * px[i][1] + 114 * px[i][2]
                for i in range(w * h)]
        ce = [(i * w) // nw for i in range(nw)] + [w]
        re_ = [(i * h) // nh for i in range(nh)] + [h]
        acc = 0
        for r in range(nh):
            for c in range(nw - 1):
                def bs(cc):
                    return sum(gray[y * w + x]
                               for y in range(re_[r], re_[r + 1])
                               for x in range(ce[cc], ce[cc + 1]))
                ln = (re_[r + 1] - re_[r]) * (ce[c + 1] - ce[c])
                rn = (re_[r + 1] - re_[r]) * (ce[c + 2] - ce[c + 1])
                acc = (acc << 1) | (1 if bs(c) * rn > bs(c + 1) * ln else 0)
        return acc - (1 << 64 if acc >= 1 << 63 else 0)

    rng = random.Random(99)
    # exact-2x2 and NON-divisible geometries both match the replay
    for w, h in ((18, 16), (20, 13), (9, 8), (37, 21)):
        px = [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
              for _ in range(w * h)]
        assert dhash_image_bytes(ppm(w, h, px)) == replay(w, h, px), (w, h)
    # codec-invariant: PNG of the same pixels hashes identically
    px = [(rng.randrange(256),) * 3 for _ in range(18 * 16)]
    raw = b"".join(bytes(t) for t in px)
    assert dhash_image_bytes(ppm(18, 16, px)) == \
        dhash_image_bytes(encode_png_bytes(18, 16, raw))
    # policy: undecodable / sub-grid images
    assert dhash_image_bytes(b"JUNKJUNKJUNK") is None
    assert dhash_image_bytes(ppm(4, 4, [(0, 0, 0)] * 16)) is None
    media = spark.createDataFrame(
        [(1, ppm(18, 16, px)), (2, b"JUNKJUNKJUNK"), (3, None)],
        "media_id long, payload binary")
    got = {r.media_id: r.dhash for r in image_dhash(media).collect()}
    assert got[1] is not None and got[2] is None and got[3] is None
    with pt.raises(Exception, match="not a decodable"):
        image_dhash(media, on_undecodable="raise").collect()

    # near-dup completeness: banded join == brute force over all pairs
    hashes = []
    for i in range(30):
        hv = rng.getrandbits(64)
        hashes.append(hv - (1 << 64 if hv >= 1 << 63 else 0))
    base = hashes[0] & ((1 << 64) - 1)
    for flips in (1, 2, 3, 4, 7):  # planted neighbors around hashes[0]
        hv = base
        for b in rng.sample(range(64), flips):
            hv ^= 1 << b
        hashes.append(hv - (1 << 64 if hv >= 1 << 63 else 0))
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "media_id long, dhash long")
    got_pairs = {(r.id_a, r.id_b): r.hamming
                 for r in image_near_dups(df, max_hamming=3).collect()}
    brute = {}
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = bin((hashes[i] ^ hashes[j]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                brute[(i, j)] = d
    assert got_pairs == brute and len(brute) >= 3
    # max_hamming=0 degenerates to exact-duplicate detection
    df0 = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 8)], "media_id long, dhash long")
    assert {(r.id_a, r.id_b) for r in
            image_near_dups(df0, max_hamming=0).collect()} == {(1, 2)}
    # distinct_hashes (the crawl-scale skew mode): a hash repeated many
    # times enters the join once via its min-id representative —
    # result equals brute force over the distinct (hash → min id) set
    dup = spark.createDataFrame(
        [(i, hashes[i % 8]) for i in range(40)],
        "media_id long, dhash long")
    reps = {}  # hash → min id
    for i in range(40):
        reps.setdefault(hashes[i % 8], i)
    rb = {}
    vals = sorted(reps.items(), key=lambda kv: kv[1])
    for x in range(len(vals)):
        for y in range(x + 1, len(vals)):
            d = bin((vals[x][0] ^ vals[y][0]) & ((1 << 64) - 1)).count("1")
            if 0 < d <= 3:
                rb[tuple(sorted((vals[x][1], vals[y][1])))] = d
    got_r = {(r.id_a, r.id_b): r.hamming for r in
             image_near_dups(dup, max_hamming=3,
                             distinct_hashes=True).collect()}
    assert got_r == rb


def test_audio_fingerprint(spark):
    """Energy-delta acoustic fingerprint: matches a pure-Python replay
    for 8- and 16-bit PCM, honors the skip/raise policy, composes
    with the hash-agnostic Hamming banding for near-dup clips."""
    import io
    import random
    import struct
    import wave

    from greenmask_spark.functions.multimodal import (
        audio_fingerprint,
        audio_fingerprint_bytes,
        image_near_dups,
    )

    def wav(samples, width):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(width)
            wf.setframerate(8000)
            if width == 1:
                wf.writeframes(bytes(s + 128 for s in samples))
            else:
                wf.writeframes(b"".join(
                    struct.pack("<h", s) for s in samples))
        return buf.getvalue()

    def replay(samples, n_bits=64):
        nf = n_bits + 1
        edges = [(i * len(samples)) // nf for i in range(nf)] \
            + [len(samples)]
        en = [sum(s * s for s in samples[edges[i]:edges[i + 1]])
              for i in range(nf)]
        acc = 0
        for i in range(n_bits):
            acc = (acc << 1) | (1 if en[i + 1] > en[i] else 0)
        return acc - (1 << 64 if acc >= 1 << 63 else 0)

    rng = random.Random(41)
    s8 = [rng.randrange(-128, 128) for _ in range(1040)]
    s16 = [rng.randrange(-32768, 32768) for _ in range(777)]  # inexact edges
    assert audio_fingerprint_bytes(wav(s8, 1)) == replay(s8)
    assert audio_fingerprint_bytes(wav(s16, 2)) == replay(s16)
    assert audio_fingerprint_bytes(b"JUNKJUNKJUNK") is None
    assert audio_fingerprint_bytes(wav(s8[:10], 1)) is None  # < 65 samples

    media = spark.createDataFrame(
        [(1, wav(s8, 1)), (2, wav(s16, 2)), (3, b"NOPE"), (4, None)],
        "media_id long, payload binary")
    got = {r.media_id: r.afp for r in audio_fingerprint(media).collect()}
    assert got[1] == replay(s8) and got[2] == replay(s16)
    assert got[3] is None and got[4] is None
    import pytest as pt
    with pt.raises(Exception, match="not PCM WAV"):
        audio_fingerprint(media, on_undecodable="raise").collect()

    # a lightly perturbed clip is a near-dup of its original
    s8b = list(s8)
    for i in range(16):  # one frame's worth of samples nudged
        s8b[i] = max(-128, min(127, s8b[i] + 1))
    fp = spark.createDataFrame(
        [(1, replay(s8)), (2, replay(s8b))], "media_id long, afp long")
    pairs = image_near_dups(fp, hash_col="afp", max_hamming=3).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]


def test_pq_encode_and_topk(spark):
    """Product quantization (Jégou et al. 2011): codes are the
    per-subspace argmin against the codebooks (hand-replayed), NULL /
    wrong-dim vectors get NULL codes, and pq_topk's ADC distances
    equal the hand-computed LUT sums with ascending-distance ranking,
    self-pairs excluded."""
    import numpy as np

    from greenmask_spark.functions.similarity import (
        hash_pq_codebooks,
        pq_encode,
        pq_topk,
    )

    dim, m, k_sub = 8, 4, 4
    books = hash_pq_codebooks(dim, m=m, k_sub=k_sub, seed=7)
    assert len(books) == m and len(books[0]) == k_sub
    assert len(books[0][0]) == dim // m
    assert books == hash_pq_codebooks(dim, m=m, k_sub=k_sub, seed=7)
    assert books != hash_pq_codebooks(dim, m=m, k_sub=k_sub, seed=8)

    import pytest

    with pytest.raises(ValueError, match="divisible"):
        hash_pq_codebooks(10, m=4)

    rng = np.random.RandomState(3)
    vecs = rng.randn(12, dim).astype(float)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(12)]
    rows.append((98, None))
    rows.append((99, [1.0, 2.0]))  # wrong dim
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")

    coded = {r.vec_id: r.pq_code for r in
             pq_encode(df, books).collect()}
    assert coded[98] is None and coded[99] is None

    def code_of(v):
        out = []
        for s in range(m):
            sub = v[s * 2:(s + 1) * 2]
            dists = [sum((sub[d] - c[d]) ** 2 for d in range(2))
                     for c in books[s]]
            out.append(int(np.argmin(dists)))
        return out

    for i in range(12):
        assert coded[i] == code_of(vecs[i]), i

    # ADC: distances match the hand LUT sum; ranking ascending
    queries = df.filter("vec_id = 0")
    top = pq_topk(df, queries, k=3, codebooks=books).collect()
    assert [r.rank for r in top] == [1, 2, 3]
    assert all(r.query_id == 0 and r.neighbor_id != 0 for r in top)

    def adc(qv, cd):
        tot = 0.0
        for s in range(m):
            sub = qv[s * 2:(s + 1) * 2]
            c = books[s][cd[s]]
            tot += sum((sub[d] - c[d]) ** 2 for d in range(2))
        return round(tot, 4)

    want = sorted(
        ((adc(vecs[0], coded[i]), i) for i in range(1, 12)))[:3]
    got = [(r.adc_dist, r.neighbor_id) for r in top]
    for (wd, wi), (gd, gi) in zip(want, got):
        assert gi == wi and abs(gd - wd) < 1e-9

    # precomputed codes path returns the same thing
    codes_df = pq_encode(df, books)
    top2 = pq_topk(df, queries, k=3, codebooks=books,
                   codes=codes_df).collect()
    assert [(r.neighbor_id, r.adc_dist) for r in top2] == \
        [(r.neighbor_id, r.adc_dist) for r in top]


def test_train_pq_codebooks(spark):
    """Trained PQ codebooks: deterministic at any partitioning,
    correct shape, and they quantize a clustered corpus tighter than
    the data-independent hash books (lower mean ADC self-distance)."""
    import numpy as np

    from greenmask_spark.functions.similarity import (
        hash_pq_codebooks,
        pq_encode,
        train_pq_codebooks,
    )

    dim, m, k_sub = 8, 4, 4
    rng = np.random.RandomState(11)
    centers = rng.randn(4, dim) * 3
    vecs = np.vstack([
        centers[i % 4] + rng.randn(dim) * 0.1 for i in range(64)
    ])
    # the FIRST row is a truncated vector: dim inference must pick the
    # majority size (8), not the first row's (2) — first-row inference
    # would either abort on divisibility or filter out every good row
    rows = [(-1, [9.0, 9.0])]
    rows += [(i, [float(x) for x in vecs[i]]) for i in range(64)]
    # one NULL and one short vector land inside the sample_mod=1
    # training sample — training must skip them, not crash (the
    # pq_encode one-bad-row contract)
    rows += [(98, None), (99, [1.0, 2.0])]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    books = train_pq_codebooks(df, m=m, k_sub=k_sub, sample_mod=1)
    assert len(books) == m and len(books[0]) == k_sub
    assert len(books[0][0]) == dim // m
    # init is partitioning-stable by construction; the Lloyd means are
    # floating-point aggregates whose combine order follows the
    # partitioning, so equality holds to ulps, not bit-exactly (same
    # caveat as train_ivf_centroids — which is why the ORACLE rows use
    # the hash codebooks)
    again = train_pq_codebooks(df.repartition(5), m=m, k_sub=k_sub,
                               sample_mod=1)
    assert np.allclose(np.array(books), np.array(again), atol=1e-9)

    def mean_qerr(bk):
        coded = {r.vec_id: r.pq_code
                 for r in pq_encode(df, bk).collect()}
        tot = 0.0
        for i in range(64):
            for s in range(m):
                sub = vecs[i][s * 2:(s + 1) * 2]
                c = bk[s][coded[i][s]]
                tot += sum((sub[d] - c[d]) ** 2 for d in range(2))
        return tot / 64

    trained = mean_qerr(books)
    hashed = mean_qerr(hash_pq_codebooks(dim, m=m, k_sub=k_sub))
    assert trained < hashed * 0.5, (trained, hashed)

    # end-to-end retrieval quality: within a tight cluster PQ codes
    # collapse (that's the point — 32x compression can't rank
    # sub-quantization-cell residuals), so the meaningful property is
    # cluster membership: every ADC top-5 neighbor comes from the
    # query's own cluster (inter-cluster distance >> quantization
    # error with trained books)
    from greenmask_spark.functions.similarity import pq_topk

    queries = df.filter("vec_id < 4")
    got = {}
    for r in pq_topk(df, queries, k=5, codebooks=books).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    for qid in range(4):
        assert len(got[qid]) == 5
        assert all(n % 4 == qid % 4 for n in got[qid]), (qid, got[qid])


def test_ivf_pq_topk(spark):
    """IVF-PQ composition: the probe restricts candidates to the
    query's n_probe inverted lists, ADC scores from codes alone, and
    with full probing (n_probe = n_centroids) the result is IDENTICAL
    to flat pq_topk — the probe is a pure candidate filter, never a
    score change. The persisted-index path returns the same thing."""
    import numpy as np

    from greenmask_spark.functions.similarity import (
        hash_centroids,
        hash_pq_codebooks,
        ivf_pq_index,
        ivf_pq_topk,
        pq_topk,
    )

    dim, m, k_sub, nc = 8, 4, 4, 4
    rng = np.random.RandomState(5)
    vecs = rng.randn(32, dim)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(32)],
        "vec_id long, embedding array<double>")
    cents = hash_centroids(dim, nc, seed=9)
    books = hash_pq_codebooks(dim, m=m, k_sub=k_sub, seed=9)
    queries = df.filter("vec_id < 3")

    flat = [(r.query_id, r.neighbor_id, r.adc_dist, r.rank)
            for r in pq_topk(df, queries, k=4, codebooks=books)
            .orderBy("query_id", "rank").collect()]
    full = [(r.query_id, r.neighbor_id, r.adc_dist, r.rank)
            for r in ivf_pq_topk(df, queries, k=4, n_probe=nc,
                                 centroids=cents, codebooks=books)
            .orderBy("query_id", "rank").collect()]
    assert full == flat

    # restricted probing: a SUBSET of the flat candidates, ADC scores
    # agree on shared pairs, ranks stay 1..k'
    part = ivf_pq_topk(df, queries, k=4, n_probe=1,
                       centroids=cents, codebooks=books).collect()
    flat_scores = {(q, n): d for q, n, d, _ in flat}
    all_flat = {(r.query_id, r.neighbor_id): r.adc_dist
                for r in pq_topk(df, queries, k=31, codebooks=books)
                .collect()}
    by_q = {}
    for r in part:
        by_q.setdefault(r.query_id, []).append(r)
        assert all_flat[(r.query_id, r.neighbor_id)] == r.adc_dist
    for q, rows in by_q.items():
        assert [r.rank for r in
                sorted(rows, key=lambda r: r.rank)] == \
            list(range(1, len(rows) + 1))

    # a prebuilt index without its artifacts must refuse (silent
    # retrain would probe a mismatched cid/code space)
    import pytest as _pt

    with _pt.raises(ValueError, match="prebuilt index"):
        ivf_pq_topk(df, queries, index=ivf_pq_index(df, cents, books))

    # prepared-index path is identical to inline tagging
    idx = ivf_pq_index(df, cents, books)
    assert set(idx.columns) == {"neighbor_id", "cid", "pq_code"}
    again = [(r.query_id, r.neighbor_id, r.adc_dist, r.rank)
             for r in ivf_pq_topk(df, queries, k=4, n_probe=nc,
                                  centroids=cents, codebooks=books,
                                  index=idx)
             .orderBy("query_id", "rank").collect()]
    assert again == full


def test_mixture_rate_helpers(spark):
    """temperature_rates and unimax_rates: budget conservation, the
    alpha extremes, the epoch cap, and end-to-end composition with
    sample_mixture."""
    import math

    import pytest

    from greenmask_spark.functions.sampling import (
        sample_mixture,
        temperature_rates,
        unimax_rates,
    )

    counts = {"big": 8000, "mid": 1500, "tiny": 100}

    # alpha=1: natural proportions — every rate identical (= B/N)
    r1 = temperature_rates(counts, budget=4800, alpha=1.0)
    assert all(math.isclose(v, 0.5) for v in r1.values())
    # alpha=0: uniform across sources — equal BUDGET per source
    r0 = temperature_rates(counts, budget=300, alpha=0.0)
    assert all(math.isclose(r0[s] * counts[s], 100.0) for s in counts)
    # 0<alpha<1 sits between: small sources upweighted, budget conserved
    rh = temperature_rates(counts, budget=4800, alpha=0.5)
    assert rh["tiny"] > rh["mid"] > rh["big"]
    assert math.isclose(sum(rh[s] * counts[s] for s in counts), 4800)
    # zero-count sources get rate 0.0 (NOT dropped) so the dict stays
    # total over counts and composes with sample_mixture's validation
    rz = temperature_rates({**counts, "z": 0}, 100)
    assert rz["z"] == 0.0 and set(rz) == set(counts) | {"z"}
    uz = unimax_rates({**counts, "z": 0}, 100)
    assert uz["z"] == 0.0
    with pytest.raises(ValueError, match="non-empty"):
        temperature_rates({"z": 0}, 100)

    # UniMax: uniform where possible, epoch-capped where not
    u = unimax_rates(counts, budget=3000, max_epochs=4.0)
    # tiny is capped at 4 epochs (400 docs), the rest split evenly
    assert math.isclose(u["tiny"], 4.0)
    assert math.isclose(u["big"] * 8000, 1300)
    assert math.isclose(u["mid"] * 1500, 1300)
    assert math.isclose(sum(u[s] * counts[s] for s in counts), 3000)
    # budget beyond total capacity: everything runs max_epochs
    u2 = unimax_rates(counts, budget=10**9, max_epochs=2.0)
    assert all(math.isclose(v, 2.0) for v in u2.values())
    # rates feed sample_mixture end-to-end (upsampling included)
    src = {
        "a": spark.range(40).withColumnRenamed("id", "doc_id"),
        "b": spark.range(10).withColumnRenamed("id", "doc_id"),
    }
    rates = unimax_rates({"a": 40, "b": 10}, budget=40, max_epochs=3.0)
    out = sample_mixture(src, rates)
    got = out.groupBy("source_name").count().collect()
    by = {r.source_name: r["count"] for r in got}
    # b is epoch-capped upsampling (rate > 1 → exact integer copies
    # plus a hash-gated fraction); a is an exact-rate downsample whose
    # realized count concentrates near rate*n
    assert by["b"] >= 10  # at least one full epoch survives
    assert 0 < by["a"] < 40


def test_dsir_weights_and_resample(spark):
    """DSIR (Xie et al. 2023): log importance weights match a full
    driver-side replay of the hashed-ngram Laplace models, target-like
    raw docs outweigh off-distribution ones, token-less docs weigh
    0.0, and Gumbel-top-k selection replays from the same salted
    hash."""
    import hashlib
    import math

    from greenmask_spark.functions.sampling import (
        dsir_log_weights,
        dsir_resample,
    )

    target_rows = [(100 + i, "the quick brown fox jumps") for i in range(3)]
    raw_rows = [
        (1, "the quick brown fox jumps"),   # exactly on-target
        (2, "the quick brown dog sleeps"),  # partial overlap
        (3, "zzz qqq vvv www yyy"),         # off-distribution
        (4, ""),                            # token-less
        (5, None),                          # NULL text
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(target_rows, "doc_id long, text string")
    B, S = 4096, 1.0
    got = {r.id: r.dsir_logw for r in
           dsir_log_weights(raw, tgt, buckets=B, smoothing=S).collect()}

    # driver-side replay
    def grams(t):
        ts = [x for x in t.strip().lower().split() if x] if t else []
        return ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]

    def bucket(g):
        return int(hashlib.sha256(g.encode()).hexdigest()[:15], 16) % B

    cr, ct = {}, {}
    for _i, t in raw_rows:
        for g in grams(t):
            cr[bucket(g)] = cr.get(bucket(g), 0) + 1
    for _i, t in target_rows:
        for g in grams(t):
            ct[bucket(g)] = ct.get(bucket(g), 0) + 1
    Tr, Tt = sum(cr.values()), sum(ct.values())

    def weight(t):
        w = 0.0
        for g in grams(t):
            b = bucket(g)
            w += (math.log(ct.get(b, 0) + S) - math.log(Tt + S * B)
                  - math.log(cr[b] + S) + math.log(Tr + S * B))
        return round(w, 6)

    for i, t in raw_rows:
        if t:
            assert abs(got[i] - weight(t)) < 1e-9, (i, got[i], weight(t))
    assert got[4] == 0.0 and got[5] == 0.0
    assert got[1] > got[2] > got[3]  # on-target > partial > off

    # Gumbel-top-k: deterministic, n rows, replays from the unit hash
    top = dsir_resample(raw, tgt, n=2, buckets=B).collect()
    assert len(top) == 2
    from greenmask_spark.functions.sampling import _RESOLUTION, _unit_hash

    hs = {r.id: r.h for r in
          dsir_log_weights(raw, tgt, buckets=B).select(
              "id", _unit_hash(F.col("id"), "dsir", 42).alias("h")
          ).collect()}
    g = {i: got[i] - math.log(-math.log((hs[i] + 0.5) / _RESOLUTION))
         for i in got}
    want = sorted(g, key=lambda i: (-g[i], i))[:2]
    assert sorted(r.id for r in top) == sorted(want)
    # precomputed-weights path identical
    w = dsir_log_weights(raw, tgt, buckets=B)
    top2 = dsir_resample(raw, tgt, n=2, buckets=B, weights=w).collect()
    assert {r.id for r in top2} == {r.id for r in top}

    import pytest

    with pytest.raises(ValueError, match="smoothing"):
        dsir_log_weights(raw, tgt, smoothing=0.0)


def test_pagerank_fixed_point(spark):
    """Fixed-point integer PageRank: bit-identical to a pure-Python
    integer replay AND to a DuckDB SQL unroll (the determinism claim
    is exactness, not approximation), stable under repartitioning,
    dangling mass redistributed, heavier edges pull more rank."""
    import duckdb

    from greenmask_spark.functions.linkgraph import RANK_SCALE, pagerank

    #     1 -> 2 (w3), 1 -> 3 (w1), 2 -> 3, 3 -> 1, 4 -> 3, 5 dangling
    edges = [(1, 2, 3), (1, 3, 1), (2, 3, 1), (3, 1, 1), (4, 3, 1),
             (3, 5, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    out = {r.node: r.rank_fp for r in
           pagerank(df, n_iters=4, weight_col="w").collect()}
    assert set(out) == {1, 2, 3, 4, 5}

    # pure-Python integer replay — must match EXACTLY
    def replay(n_iters, d=850_000, ppm=1_000_000, scale=RANK_SCALE):
        ew = {}
        for s, t, w in edges:
            ew[(s, t)] = ew.get((s, t), 0) + w
        nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
        W = {}
        for (s, _), w in ew.items():
            W[s] = W.get(s, 0) + w
        n = len(nodes)
        r = {v: scale for v in nodes}
        base = (ppm - d) * scale // ppm
        for _ in range(n_iters):
            inflow = {v: 0 for v in nodes}
            for (s, t), w in ew.items():
                inflow[t] += (r[s] // W[s]) * w + ((r[s] % W[s]) * w) // W[s]
            dang = sum(r[v] for v in nodes if v not in W)
            nr = {}
            for v in nodes:
                x = inflow[v] + dang // n
                nr[v] = base + (x // ppm) * d + ((x % ppm) * d) // ppm
            r = nr
        return r

    assert out == replay(4)

    # exactness under any partitioning — not approximate agreement
    again = {r.node: r.rank_fp for r in
             pagerank(df.repartition(7), n_iters=4,
                      weight_col="w").collect()}
    assert again == out

    # DuckDB unroll (2 iters) — cross-engine bit parity
    two = {r.node: r.rank_fp for r in
           pagerank(df, n_iters=2, weight_col="w").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES "
                + ",".join(f"({s},{t},{w})" for s, t, w in edges)
                + ") AS t(src, dst, w)")
    it = """
    SELECT n.node,
           {base} + (x // 1000000) * 850000 + ((x % 1000000) * 850000)
             // 1000000 AS r
    FROM (SELECT n.node,
                 coalesce(i.inflow, 0)
                 + (SELECT coalesce(sum(r.r), 0) FROM {rank} r
                    WHERE r.node NOT IN (SELECT src FROM e)) // {n} AS x,
                 n.node AS _k
          FROM nodes n LEFT JOIN (
            SELECT e.dst, sum((r.r // W.W) * e.w
                              + ((r.r % W.W) * e.w) // W.W) AS inflow
            FROM e JOIN {rank} r ON e.src = r.node
            JOIN (SELECT src, sum(w) AS W FROM e GROUP BY src) W
              ON e.src = W.src
            GROUP BY e.dst) i ON n.node = i.dst) n(node, x, _k)
    """
    sql = f"""
    WITH nodes AS (SELECT DISTINCT src AS node FROM e
                   UNION SELECT DISTINCT dst FROM e),
    r0 AS (SELECT node, {RANK_SCALE}::BIGINT AS r FROM nodes),
    r1 AS ({it.format(base=(150000 * RANK_SCALE) // 1000000,
                      rank='r0', n=5)}),
    r2 AS ({it.format(base=(150000 * RANK_SCALE) // 1000000,
                      rank='r1', n=5)})
    SELECT node, r FROM r2
    """
    duck = {node: r for node, r in con.execute(sql).fetchall()}
    assert duck == two

    # structural sanity: 3 collects from everyone → top rank; the
    # weighted 1->2 edge (w3) gives 2 more than 4 (which only spends)
    assert max(out, key=out.get) == 3
    assert out[2] > out[4]
    # mass approximately conserved (integer truncation only)
    assert abs(sum(out.values()) - 5 * RANK_SCALE) < 5 * 2_000_000

    import pytest

    with pytest.raises(ValueError, match="n_iters"):
        pagerank(df, n_iters=0)


def test_hits_fixed_point(spark):
    """Fixed-point integer HITS: bit-identical to a pure-Python
    integer replay AND to a DuckDB SQL unroll, stable under
    repartitioning; the quantized-divisor rescale (div by
    max(1, max_raw DIV SCALE)) replaces textbook float normalization
    without touching the ranking."""
    import duckdb

    from greenmask_spark.functions.linkgraph import RANK_SCALE, hits

    # 1 and 2 are hubs over authorities {4,5,6}; 3 endorses only 6;
    # the w3 edge makes 4 the strongest authority
    edges = [(1, 4, 3), (1, 5, 1), (1, 6, 1), (2, 4, 1), (2, 5, 1),
             (3, 6, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    out = {r.node: (r.hub_fp, r.auth_fp) for r in
           hits(df, n_iters=3, weight_col="w").collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}

    def replay(n_iters, scale=RANK_SCALE):
        ew = {}
        for s, t, w in edges:
            ew[(s, t)] = ew.get((s, t), 0) + w
        nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
        h = {v: scale for v in nodes}
        a = None
        for _ in range(n_iters):
            araw = {v: 0 for v in nodes}
            for (s, t), w in ew.items():
                araw[t] += h[s] * w
            qa = max(1, max(araw.values()) // scale)
            a = {v: araw[v] // qa for v in nodes}
            hraw = {v: 0 for v in nodes}
            for (s, t), w in ew.items():
                hraw[s] += a[t] * w
            qh = max(1, max(hraw.values()) // scale)
            h = {v: hraw[v] // qh for v in nodes}
        return {v: (h[v], a[v]) for v in nodes}

    assert out == replay(3)

    # exactness under any partitioning
    again = {r.node: (r.hub_fp, r.auth_fp) for r in
             hits(df.repartition(7), n_iters=3, weight_col="w").collect()}
    assert again == out

    # DuckDB unroll (2 iters) — cross-engine bit parity
    two = {r.node: (r.hub_fp, r.auth_fp) for r in
           hits(df, n_iters=2, weight_col="w").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES "
                + ",".join(f"({s},{t},{w})" for s, t, w in edges)
                + ") AS t(src, dst, w)")
    sc = RANK_SCALE
    step = """
    ar{i} AS (SELECT e.dst AS node, CAST(sum(h.h * e.w) AS BIGINT) AS raw
              FROM e JOIN h{p} h ON e.src = h.node GROUP BY e.dst),
    a{i} AS (SELECT n.node,
                    CAST(coalesce(ar.raw, 0)
                         // (SELECT greatest(1, coalesce(max(raw), 0)
                             // {sc}) FROM ar{i}) AS BIGINT) AS a
             FROM nodes n LEFT JOIN ar{i} ar ON n.node = ar.node),
    hr{i} AS (SELECT e.src AS node, CAST(sum(a.a * e.w) AS BIGINT) AS raw
              FROM e JOIN a{i} a ON e.dst = a.node GROUP BY e.src),
    h{i} AS (SELECT n.node,
                    CAST(coalesce(hr.raw, 0)
                         // (SELECT greatest(1, coalesce(max(raw), 0)
                             // {sc}) FROM hr{i}) AS BIGINT) AS h
             FROM nodes n LEFT JOIN hr{i} hr ON n.node = hr.node)
    """
    sql = f"""
    WITH nodes AS (SELECT DISTINCT src AS node FROM e
                   UNION SELECT DISTINCT dst FROM e),
    h0 AS (SELECT node, {sc}::BIGINT AS h FROM nodes),
    {step.format(i=1, p=0, sc=sc)},
    {step.format(i=2, p=1, sc=sc)}
    SELECT h.node, h.h, a.a FROM h2 h JOIN a2 a USING (node)
    """
    duck = {node: (h, a) for node, h, a in con.execute(sql).fetchall()}
    assert duck == two

    # structural sanity: 1 is the best hub (covers every authority,
    # with the heavy edge); 4 the best authority (both strong hubs,
    # one at weight 3); pure authorities have 0 hub and vice versa
    hubs = {v: ha[0] for v, ha in out.items()}
    auths = {v: ha[1] for v, ha in out.items()}
    assert max(hubs, key=hubs.get) == 1
    assert max(auths, key=auths.get) == 4
    assert hubs[4] == hubs[5] == hubs[6] == 0
    assert auths[1] == auths[2] == auths[3] == 0

    with pytest.raises(ValueError, match="n_iters"):
        hits(df, n_iters=0)


def test_gopher_quality_rules(spark):
    """The Gopher A1.1 rule bundle: each rule trips on a crafted
    violator while a plain prose doc passes all; NULL fails all;
    audit mode attaches the per-rule struct."""
    from greenmask_spark.functions.text_analysis import (
        gopher_filter,
        gopher_quality_flags,
    )

    prose = ("the quick brown fox jumps over the lazy dog and then "
             "continues to run with great speed because it must have "
             "been chased by hunters that morning of the long winter "
             "and nothing could be done about that sad state of "
             "affairs so it kept running through fields and woods")
    docs = spark.createDataFrame([
        (1, prose),                                    # passes all
        (2, "too few words to have fifty of them"),    # word count
        (3, " ".join(["a"] * 60)),                     # mean word len < 3
        # 100 words, 5 of them '########' = 40 symbol OCCURRENCES →
        # ratio 0.4 (token-level counting would see 5/100 and pass)
        (4, " ".join(["the full sentence keeps going on and on with "
                      "many plain words here"] * 5
                     + ["########"] * 5)),          # symbol ratio
        (5, "\n".join(["- item of the list to have"] * 20)),  # bullets
        (6, "\n".join(["the thing went on..."] * 20)),        # ellipsis
        (7, " ".join(["123", "456", "789", "the", "of"] * 20)),  # alpha
        (8, " ".join(["giraffe", "penguin", "wombat"] * 30)),    # stops
        (9, None),
    ], "doc_id long, text string")
    flags = {r.doc_id: r.f.asDict() for r in docs.select(
        "doc_id", gopher_quality_flags(F.col("text")).alias("f")
    ).collect()}
    assert flags[1]["passed"] is True
    assert flags[2]["word_count_ok"] is False
    assert flags[3]["mean_word_len_ok"] is False
    assert flags[4]["symbol_ratio_ok"] is False
    assert flags[5]["bullet_lines_ok"] is False
    assert flags[6]["ellipsis_lines_ok"] is False
    assert flags[7]["alpha_words_ok"] is False
    assert flags[8]["stopwords_ok"] is False
    assert all(flags[9][k] is False for k in flags[9])
    for i in (2, 3, 4, 5, 6, 7, 8, 9):
        assert flags[i]["passed"] is False, i

    kept = gopher_filter(docs).collect()
    assert [r.doc_id for r in kept] == [1]
    # AUDIT MODE: flags attach to EVERY row, nothing filtered — hit
    # rates per rule are measurable before committing to drops
    audit = {r.doc_id: r.gq for r in
             gopher_filter(docs, flags_col="gq").collect()}
    assert len(audit) == 9
    assert audit[1].passed is True and audit[4].passed is False
    assert audit[4].symbol_ratio_ok is False

    # config-driven step
    from greenmask_spark.pipeline import build_corpus_pipeline

    out = build_corpus_pipeline(docs, [{"op": "gopher_filter"}])
    assert [r.doc_id for r in out.collect()] == [1]


def test_ivf_pq_duckdb_parity(spark):
    """Cross-engine parity for the IVF-PQ composition: a DuckDB SQL
    replay (centroid assignment + probe, per-subspace codes, ordered
    ADC sums, ranked top-k) matches the Spark result row for row —
    the r9 oracle row, proven here first."""
    import duckdb
    import numpy as np

    from greenmask_spark.functions.similarity import (
        hash_centroids,
        hash_pq_codebooks,
        ivf_pq_topk,
    )

    dim, nc, m, k_sub, n_probe, k = 8, 4, 4, 4, 2, 3
    rng = np.random.RandomState(23)
    vecs = rng.randn(20, dim).round(6)  # clean literals for SQL
    cents = hash_centroids(dim, nc, seed=5)
    books = hash_pq_codebooks(dim, m=m, k_sub=k_sub, seed=5)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<double>")
    queries = df.filter("vec_id < 3")
    got = [(r.query_id, r.neighbor_id, r.adc_dist, r.rank)
           for r in ivf_pq_topk(df, queries, k=k, n_probe=n_probe,
                                centroids=cents, codebooks=books)
           .orderBy("query_id", "rank").collect()]

    def arr(v):
        return "[" + ",".join(repr(float(x)) for x in v) + "]"

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, {arr(vecs[i])}::DOUBLE[])"
                   for i in range(20))
        + ") AS t(vec_id, v)")
    cent_vals = ",".join(f"({i}, {arr(c)}::DOUBLE[])"
                         for i, c in enumerate(cents))
    cb_vals = ",".join(
        f"({s}, {j}, {arr(c)}::DOUBLE[])"
        for s, book in enumerate(books) for j, c in enumerate(book))
    dsub = dim // m
    sql = f"""
    WITH cent(i, c) AS (SELECT * FROM (VALUES {cent_vals})),
    cb(s, j, c) AS (SELECT * FROM (VALUES {cb_vals})),
    cd AS (  -- centroid distances for assignment AND probes
      SELECT e.vec_id, cent.i,
             list_sum(list_transform(list_zip(e.v, cent.c),
                      x -> (x[1]-x[2])*(x[1]-x[2]))) AS d
      FROM e CROSS JOIN cent),
    cdr AS (SELECT vec_id, i,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d, i) AS rn
            FROM cd),
    assigned AS (SELECT vec_id, i AS cid FROM cdr WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, i AS cid FROM cdr
               WHERE vec_id < 3 AND rn <= {n_probe}),
    sd AS (  -- per-subspace code distances + query LUT entries
      SELECT e.vec_id, cb.s, cb.j,
             list_sum(list_transform(
               list_zip(e.v[cb.s*{dsub}+1:(cb.s+1)*{dsub}], cb.c),
               x -> (x[1]-x[2])*(x[1]-x[2]))) AS dist
      FROM e CROSS JOIN cb),
    code AS (SELECT vec_id, s, j FROM (
               SELECT vec_id, s, j,
                      row_number() OVER (PARTITION BY vec_id, s
                                         ORDER BY dist, j) AS rn
               FROM sd) WHERE rn = 1),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             round(list_sum(list(lq.dist ORDER BY lq.s)), 4) AS adc_dist
      FROM probes p
      JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.query_id
      JOIN code c ON c.vec_id = a.vec_id
      JOIN sd lq ON lq.vec_id = p.query_id AND lq.s = c.s AND lq.j = c.j
      GROUP BY p.query_id, a.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, adc_dist,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY adc_dist, neighbor_id) AS INTEGER) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, adc_dist, rank FROM ranked
    WHERE rank <= {k} ORDER BY query_id, rank
    """
    duck = [tuple(r) for r in con.execute(sql).fetchall()]
    assert duck == got


def test_gopher_flags_duckdb_parity(spark):
    """The seven Gopher rules replay in plain SQL (DuckDB) and agree
    flag-for-flag with the Spark expressions over a mixed bag of
    passers and violators — the r9 oracle-row recipe."""
    import duckdb

    from greenmask_spark.functions.text_analysis import (
        GOPHER_STOPWORDS,
        gopher_quality_flags,
    )

    prose = ("the quick brown fox jumps over the lazy dog and then "
             "continues to run with great speed because it must have "
             "been chased by hunters that morning of the long winter "
             "and nothing could be done about that sad state of "
             "affairs so it kept running through fields and woods")
    docs = [
        (1, prose),
        (2, "short of words"),
        (3, " ".join(["the full sentence keeps going on and on"] * 7
                     + ["########"] * 4)),
        (4, "\n".join(["- bullet of the day to have"] * 30)),
        (5, " ".join(["123456", "the", "of"] * 30)),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: tuple(r.f) for r in df.select(
        "doc_id", gopher_quality_flags(F.col("text")).alias("f")
    ).collect()}

    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES "
                + ",".join("(%d, '%s')" % (i, t.replace("'", "''"))
                           for i, t in docs)
                + ") AS t(doc_id, text)")
    sql = f"""
    WITH s AS (
      SELECT doc_id,
        list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                    t -> t <> '') AS toks,
        list_filter(string_split(text, chr(10)),
                    l -> trim(l) <> '') AS lines
      FROM d),
    m AS (
      SELECT doc_id, len(toks) AS n,
        greatest(len(toks), 1) AS nn,
        greatest(len(lines), 1) AS nl,
        list_sum(list_transform(toks, t -> length(t)))
          / greatest(len(toks), 1) AS mwl,
        coalesce(list_sum(list_transform(toks, t ->
          (length(t) - length(replace(t, '#', '')))
          + (length(t) - length(replace(t, '…', '')))
          + (length(t) - length(replace(t, '...', ''))) // 3)), 0)
          AS n_sym,
        len(list_filter(lines, l ->
          starts_with(trim(l), '•') OR starts_with(trim(l), '-')
          OR starts_with(trim(l), '*'))) AS bullet,
        len(list_filter(lines, l ->
          ends_with(trim(l), '...') OR ends_with(trim(l), '…')))
          AS ellipsis,
        len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]')))
          AS alpha,
        len(list_intersect(toks, [{stops}])) AS stops
      FROM s)
    SELECT doc_id,
           n >= 50 AND n <= 100000,
           mwl >= 3.0 AND mwl <= 10.0,
           CAST(n_sym AS DOUBLE) / nn <= 0.1,
           CAST(bullet AS DOUBLE) / nl <= 0.9,
           CAST(ellipsis AS DOUBLE) / nl <= 0.3,
           CAST(alpha AS DOUBLE) / nn >= 0.8,
           stops >= 2
    FROM m ORDER BY doc_id
    """
    for row in con.execute(sql).fetchall():
        doc_id, flags = row[0], tuple(row[1:])
        assert flags == got[doc_id][:7], (doc_id, flags, got[doc_id])
        assert got[doc_id][7] == all(flags), doc_id


def test_select_to_budget_matches_naive_window(spark):
    """Two-phase budget selection is bit-identical to the naive global
    window cumsum at ANY bucket count — bucketing only partitions the
    work."""
    from pyspark.sql import Window as W

    from greenmask_spark.functions.sampling import select_to_budget

    rows = [(i, (i * 37) % 101, 10 + (i * 13) % 50) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, score long, toks long")

    naive_w = W.orderBy(
        F.col("score").cast("double").desc_nulls_last(), "doc_id"
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    budget = 3000
    naive = {r.doc_id for r in
             df.withColumn("c", F.sum("toks").over(naive_w))
               .filter(F.col("c") <= budget).collect()}
    for nb in (1, 7, 4096):
        got = select_to_budget(df, budget, "toks", "score",
                               n_buckets=nb)
        ids = {r.doc_id for r in got.collect()}
        assert ids == naive, f"n_buckets={nb}"
        assert got.columns == df.columns


def test_select_to_budget_edges(spark):
    from greenmask_spark.functions.sampling import select_to_budget

    df = spark.createDataFrame(
        [(1, 5.0, 10), (2, None, 1), (3, 5.0, None), (4, 9.0, 100)],
        "doc_id long, score double, toks long",
    )
    # budget >= total keeps everything (NULL toks count 0)
    assert select_to_budget(df, 1000, "toks", "score").count() == 4
    # positive-token corpus at budget 0 keeps nothing with tokens; the
    # NULL-token row at score 5.0 only enters if everything above fits
    kept = {r.doc_id for r in
            select_to_budget(df, 0, "toks", "score").collect()}
    assert kept == set()
    # NULL score sorts LAST: with budget 111 the prefix is 4 (100),
    # then 1 (10), then 3 (0) — doc 2's NULL score is cut
    kept = {r.doc_id for r in
            select_to_budget(df, 110, "toks", "score").collect()}
    assert kept == {1, 3, 4}
    # ... and is admitted once the budget covers it
    kept = {r.doc_id for r in
            select_to_budget(df, 111, "toks", "score").collect()}
    assert kept == {1, 2, 3, 4}
    # equal scores tie-break by id: 1 beats 3? both kept above; make a
    # tie where only one fits
    tie = spark.createDataFrame(
        [(7, 1.0, 5), (2, 1.0, 5)], "doc_id long, score double, toks long"
    )
    assert {r.doc_id for r in
            select_to_budget(tie, 5, "toks", "score").collect()} == {2}

    import pytest

    with pytest.raises(ValueError, match="token_budget"):
        select_to_budget(df, -1, "toks", "score")
    with pytest.raises(ValueError, match="n_buckets"):
        select_to_budget(df, 1, "toks", "score", n_buckets=0)


def test_select_to_budget_nondeterministic_input_pinned(spark):
    """A rand()-filtered input is pinned (cap_per_domain rule), so the
    multi-read plan still satisfies the budget invariant exactly."""
    from greenmask_spark.functions.sampling import select_to_budget

    df = (
        spark.range(500)
        .withColumn("doc_id", F.col("id"))
        .withColumn("score", (F.col("id") * 7 % 97).cast("double"))
        .withColumn("toks", F.lit(10))
        .filter(F.rand(seed=5) < 0.6)
        .select("doc_id", "score", "toks")
    )
    out = select_to_budget(df, 200, "toks", "score")
    rows = out.collect()
    assert sum(r.toks for r in rows) <= 200
    assert len(rows) == 20  # 10-token docs exactly fill the budget


def test_weighted_sample(spark):
    """Gumbel-top-k weighted sampling: deterministic at any
    partitioning, proportional to weights across seeds, one-sided
    rails, and an exact DuckDB replay of the selection."""
    import duckdb

    from greenmask_spark.functions.sampling import weighted_sample

    rows = [(i, 10.0 if i < 20 else 1.0) for i in range(220)]
    df = spark.createDataFrame(rows, "doc_id long, w double")

    got = {r.doc_id for r in weighted_sample(df, 50, "w").collect()}
    again = {r.doc_id for r in
             weighted_sample(df.repartition(9), 50, "w").collect()}
    assert got == again and len(got) == 50

    # inclusion ∝ weight: the 20 heavy docs (w=10) should dominate
    # their 10% headcount share; average over seeds for stability
    heavy_hits = 0
    for seed in range(10):
        s = {r.doc_id for r in
             weighted_sample(df, 50, "w", seed=seed).collect()}
        heavy_hits += sum(1 for d in s if d < 20)
    assert heavy_hits / 10 >= 10  # ~14 expected; 10 = loose floor

    # rails: n=0 empty; NULL/non-positive weights never sampled; n
    # beyond the eligible count returns exactly the eligible rows
    bad = spark.createDataFrame(
        [(1, None), (2, 0.0), (3, -1.0), (4, 2.0)], "doc_id long, w double"
    )
    assert weighted_sample(bad, 0, "w").count() == 0
    assert {r.doc_id for r in weighted_sample(bad, 10, "w").collect()} == {4}
    import pytest as _p
    with _p.raises(ValueError, match="n="):
        weighted_sample(df, -1, "w")

    # DuckDB replay of the whole draw (hash → u → Gumbel key → top-n)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, {w})" for i, w in rows)
                + ") x(doc_id, w)")
    want = {r[0] for r in con.sql("""
      SELECT doc_id FROM (
        SELECT doc_id,
               ln(w) - ln(-ln((CAST(('0x' || substr(sha256(
                 doc_id || ':wsample:42'), 1, 15)) AS BIGINT) % 1000000
                 + 0.5) / 1000000.0)) AS g
        FROM t WHERE w IS NOT NULL AND w > 0
        ORDER BY g DESC, doc_id LIMIT 50)
    """).fetchall()}
    assert want == got


def test_select_to_budget_negative_tokens_clamp_to_zero(spark):
    """Negative token counts count as 0 (monotone cumulative sums are
    required for prefix semantics) — and the two-phase plan still
    matches the clamped naive window."""
    from pyspark.sql import Window as W

    from greenmask_spark.functions.sampling import select_to_budget

    df = spark.createDataFrame(
        [(1, 5.0, 20), (2, 5.0, -15), (3, 4.0, 5), (4, 3.0, -1)],
        "doc_id long, score double, toks long",
    )
    naive_w = W.orderBy(
        F.col("score").cast("double").desc_nulls_last(), "doc_id"
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    clamped = df.withColumn("t0", F.greatest(F.lit(0), F.col("toks")))
    for budget in (0, 10, 20, 24, 25, 26):
        naive = {r.doc_id for r in
                 clamped.withColumn("c", F.sum("t0").over(naive_w))
                 .filter(F.col("c") <= budget).collect()}
        got = {r.doc_id for r in
               select_to_budget(df, budget, "toks", "score",
                                n_buckets=4).collect()}
        assert got == naive, budget


def test_dedup_against_levels_merged_parity(spark, sf_dir):
    """The r13-merged dedup_against_levels row (exact + band +
    verified legs) vs its DuckDB UNION-ALL oracle over the REAL
    documents table — proven here BEFORE the merged shape's driver
    debut (the kmeans_clusters / semantic_decontaminate convention).
    The verified leg is the former standalone dedup_against_verified
    row folded in with its original parameters."""
    import os as _os

    import duckdb

    import __spark_entry__ as entrymod

    sdf = entrymod.q_dedup_against_levels(spark, sf_dir)
    srows = sorted(
        (r.level, int(r.doc_id), r.lang, int(r.n_chars))
        for r in sdf.collect()
    )
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS FROM "
            f"'{_os.path.join(sf_dir, 'documents.parquet')}'")
    drows = sorted(
        (a, int(b), c, int(d))
        for a, b, c, d in con.sql(
            entrymod._oracle_dedup_against_levels()).fetchall()
    )
    assert len(srows) > 0
    assert {lv for lv, *_ in srows} == {"exact", "band", "verified"}
    assert srows == drows


def test_ngram_novelty_semantics(spark):
    """Planted-corpus contract for ngram_novelty: a verbatim re-post
    scores 0.0 (its grams' first owner is the earlier doc), unique
    text scores 1.0, sub-n-token docs return (0, 0, NULL), and a
    partially-quilted doc scores exactly its new-gram fraction."""
    from greenmask_spark.functions.dedup import ngram_novelty

    base = "a b c d e f g h i j"           # 10 toks -> 3 distinct 8-grams
    quilt = "a b c d e f g h x"            # 9 toks -> 2 grams: one from
    # base ("a..h" window) is NOT a gram of base (base's grams start at
    # a/b/c) — compute expected from first principles instead:
    rows = [
        (1, base),
        (2, base),                         # re-post -> 0.0
        (3, "one two three"),              # < 8 toks -> no grams
        (4, "k l m n o p q r s"),          # disjoint -> 1.0
        (5, quilt),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_grams, r.n_novel, r.novelty)
           for r in ngram_novelty(df, n=8).collect()}
    assert got[1] == (3, 3, 1.0)
    assert got[2] == (3, 0, 0.0)
    assert got[3] == (0, 0, None)
    assert got[4] == (2, 2, 1.0)
    # quilt's grams: "a b c d e f g h" (owned by doc 1? NO — doc 1's
    # grams are a..h, b..i, c..j; "a b c d e f g h" IS a..h -> owned
    # by doc 1) and "b c d e f g h x" (novel) -> 1 of 2 novel
    assert got[5] == (2, 1, 0.5)


def test_staged_r14_rows_oracle_parity(spark, sf_dir):
    """The two staged r14 registry rows vs their DuckDB oracles over
    the REAL documents table — proven BEFORE any driver debut (the
    kmeans_clusters / semantic_decontaminate convention):
    fingerprints (the minhash_sigs + simhash fold) and ngram_novelty
    (the NEW r14 operator)."""
    import os as _os

    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS FROM "
            f"'{_os.path.join(sf_dir, 'documents.parquet')}'")

    srows = sorted(
        (r.method, int(r.doc_id), r.fp)
        for r in entrymod.q_fingerprints(spark, sf_dir).collect()
    )
    drows = sorted(
        (a, int(b), c)
        for a, b, c in con.sql(entrymod._oracle_fingerprints()).fetchall()
    )
    assert len(srows) > 0 and srows == drows

    srows = sorted(
        (int(r.doc_id), int(r.n_grams), int(r.n_novel),
         None if r.novelty is None else float(r.novelty))
        for r in entrymod.q_ngram_novelty(spark, sf_dir).collect()
    )
    drows = sorted(
        (int(a), int(b), int(c), None if d is None else float(d))
        for a, b, c, d in con.sql(
            entrymod._oracle_ngram_novelty()).fetchall()
    )
    assert len(srows) > 0 and srows == drows


def test_chunk_documents_semantics(spark):
    """Window arithmetic: coverage, overlap sharing, final-runt size,
    single-chunk pass-through, empty-doc drop, whitespace
    normalization."""
    from greenmask_spark.functions.sampling import chunk_documents

    rows = [
        (1, "a b c d e f g h i j"),                    # 10 toks
        (2, "one  two\tthree"),                        # messy whitespace
        (3, "   "),                                    # -> no rows
        (4, "solo"),
        (5, " ".join(f"t{i}" for i in range(25))),     # 25 toks
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_documents(df, max_tokens=8, overlap=3)
    r = {(x.doc_id, x.chunk_id): (x.chunk_text, x.n_tokens)
         for x in out.collect()}
    # n=10, stride=5: 2 chunks — [0..8) and the end-anchored [5..10)
    assert r[(1, 0)] == ("a b c d e f g h", 8)
    assert r[(1, 1)] == ("f g h i j", 5)
    # whitespace runs normalize to single spaces
    assert r[(2, 0)] == ("one two three", 3)
    # whitespace-only docs emit nothing
    assert not any(k[0] == 3 for k in r)
    assert r[(4, 0)] == ("solo", 1)
    # n=25, stride=5: 5 chunks; every token covered; consecutive
    # chunks share exactly `overlap` tokens while both are full
    five = [r[(5, i)][0].split() for i in range(5)]
    assert len([k for k in r if k[0] == 5]) == 5
    assert five[0][-3:] == five[1][:3]
    covered = []
    for i, c in enumerate(five):
        covered[i * 5:] = c
    assert covered == [f"t{i}" for i in range(25)]
    assert r[(5, 4)][1] == 5  # final runt: tokens [20, 25)


def test_chunk_documents_no_contained_runt(spark):
    """A document whose tail would land fully inside the previous
    window emits no extra chunk: n=12, mt=8, overlap=4 (stride 4) ->
    ceil((12-8)/4)+1 = 2 chunks, the second ending exactly at n."""
    from greenmask_spark.functions.sampling import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(12)))], ["doc_id", "text"])
    out = chunk_documents(df, max_tokens=8, overlap=4).collect()
    assert len(out) == 2
    assert out[1].chunk_text.split() == [f"w{i}" for i in range(4, 12)]


def test_chunk_documents_validation(spark):
    from greenmask_spark.functions.sampling import chunk_documents

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(df, max_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_tokens=8, overlap=8)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_tokens=8, overlap=-1)


def test_chunk_documents_keeps_passthrough_columns(spark):
    from greenmask_spark.functions.sampling import chunk_documents

    df = spark.createDataFrame(
        [(1, "en", "a b c")], ["doc_id", "lang", "text"])
    out = chunk_documents(df, max_tokens=2, overlap=0)
    assert out.columns == ["doc_id", "lang", "chunk_id",
                           "chunk_text", "n_tokens"]
    assert [tuple(r) for r in out.orderBy("chunk_id").collect()] == [
        (1, "en", 0, "a b", 2), (1, "en", 1, "c", 1)]


def test_staged_r15_rows_oracle_parity(spark, sf_dir):
    """The two staged r15 registry rows vs their DuckDB oracles over
    the REAL documents table — proven BEFORE any driver debut (the
    kmeans_clusters / semantic_decontaminate / staged-r14
    convention): bm25_variants (the bm25 + bm25_indexed fold) and
    chunk_documents (the NEW r15 operator)."""
    import os as _os

    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS FROM "
            f"'{_os.path.join(sf_dir, 'documents.parquet')}'")

    srows = sorted(
        (r.query_id, int(r.doc_id), float(r.score))
        for r in entrymod.q_bm25_variants(spark, sf_dir).collect()
    )
    drows = sorted(
        (a, int(b), float(c))
        for a, b, c in con.sql(entrymod._oracle_bm25_variants()).fetchall()
    )
    assert len(srows) > 0 and srows == drows

    srows = sorted(
        (int(r.doc_id), int(r.chunk_id), r.chunk_text, int(r.n_tokens))
        for r in entrymod.q_chunk_documents(spark, sf_dir).collect()
    )
    drows = sorted(
        (int(a), int(b), c, int(d))
        for a, b, c, d in con.sql(
            entrymod._oracle_chunk_documents()).fetchall()
    )
    assert len(srows) > 0 and srows == drows


def test_entropy_profile_semantics(spark):
    """Closed-form contract for entropy_profile: a uniform alphabet of
    2^k distinct chars scores exactly k bits, a single-char flood
    scores 0.0 with top_char_frac 1.0, empty/NULL text returns the
    NULL-metrics row (unscorable, not low-quality), and a 3:1 binary
    mix scores the hand-computed H(3/4, 1/4)."""
    import math

    from greenmask_spark.functions.text_analysis import entropy_profile

    rows = [
        (1, "abcdabcd"),      # 4 distinct, uniform -> exactly 2 bits
        (2, "aaaaaa"),        # flood -> 0 bits, top frac 1.0
        (3, ""),              # empty -> NULL metrics
        (4, None),            # NULL -> NULL metrics
        (5, "aaab"),          # H(3/4, 1/4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_chars, r.distinct_chars, r.char_entropy,
                      r.top_char_frac)
           for r in entropy_profile(df).collect()}
    assert got[1] == (8, 4, 2.0, 0.25)
    assert got[2] == (6, 1, 0.0, 1.0)
    assert got[3] == (None, None, None, None)
    assert got[4] == (None, None, None, None)
    h = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert got[5] == (4, 2, round(h, 4), 0.75)


def test_entropy_profile_split_explode_parity(spark):
    """The char stream now comes from explode(split(t, '')) — one O(n)
    pass — instead of sequence(1, length) + substr(t, i, 1) (an O(i)
    codepoint seek per position). Pin the equivalence on the string
    classes that could diverge: multibyte BMP, non-BMP surrogate
    pairs, whitespace/control chars, regex metachars (split's pattern
    is the EMPTY regex), and single chars (no trailing empty element)."""
    from pyspark.sql import functions as F

    rows = [(i, s) for i, s in enumerate([
        "a", "héllo wörld", "日本語テキスト", "tab\tnl\n mix",
        "a.b*c[d]e", "ЀӿͰͽ", "emoji 😀 pair", "𝕏𝕐", "x" * 64,
    ])]
    df = spark.createDataFrame(rows, "id long, t string")
    old = df.select(
        "id",
        F.explode(F.sequence(F.lit(1), F.length("t"))).alias("i"),
        F.col("t"),
    ).select("id", F.expr("substr(t, i, 1)").alias("c"))
    new = df.select("id", F.explode(F.split("t", "")).alias("c"))
    assert sorted(map(tuple, old.collect())) == \
        sorted(map(tuple, new.collect()))


def test_entropy_profile_row_conservation(spark, sf_dir):
    """One output row per input row, id-aligned, over the real
    documents table; every non-empty doc gets non-NULL metrics with
    entropy in [0, log2(distinct_chars)]."""
    import math

    from greenmask_spark.functions.text_analysis import entropy_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = entropy_profile(docs).collect()
    assert len(out) == docs.count()
    for r in out:
        if r.n_chars is None:
            continue
        assert 0.0 <= r.char_entropy <= math.log2(r.distinct_chars) + 1e-9
        assert 0.0 < r.top_char_frac <= 1.0


def test_entropy_corpus_step(spark):
    """The `entropy` corpus step attaches the signal columns and the
    min_char_entropy / max_top_char_frac gates drop floods while
    KEEPING unscorable empty docs (the NULL contract)."""
    from greenmask_spark.pipeline.corpus import build_corpus_pipeline

    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
            (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = build_corpus_pipeline(df, [
        {"op": "entropy", "min_char_entropy": 1.0,
         "max_top_char_frac": 0.9},
    ]).collect()
    kept = {r.doc_id for r in out}
    assert kept == {1, 3}            # flood dropped, empty kept
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].char_entropy > 3.0
    assert by_id[3].char_entropy is None


def test_staged_r16_rows_oracle_parity(spark, sf_dir):
    """The two staged r16 registry rows vs their DuckDB oracles over
    the REAL tables — proven BEFORE any driver debut (the staged-r14/
    r15 convention): ann_methods (the ann_variants + ann_topk_pq fold
    under the lossless score rename) and entropy_profile (the NEW r16
    operator)."""
    import os as _os

    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS FROM "
                f"'{_os.path.join(sf_dir, t + '.parquet')}'")

    srows = sorted(
        (r.variant, int(r.query_id), int(r.neighbor_id),
         float(r.score), int(r.rank))
        for r in entrymod.q_ann_methods(spark, sf_dir).collect()
    )
    drows = sorted(
        (a, int(b), int(c), float(d), int(e))
        for a, b, c, d, e in con.sql(
            entrymod._oracle_ann_methods()).fetchall()
    )
    assert len(srows) > 0 and srows == drows

    srows = sorted(
        (int(r.doc_id),) + tuple(
            None if v is None else round(float(v), 4)
            for v in (r.n_chars, r.distinct_chars,
                      r.char_entropy, r.top_char_frac))
        for r in entrymod.q_entropy_profile(spark, sf_dir).collect()
    )
    drows = sorted(
        (int(a),) + tuple(
            None if v is None else round(float(v), 4)
            for v in (b, c, d, e))
        for a, b, c, d, e in con.sql(
            entrymod._oracle_entropy_profile()).fetchall()
    )
    assert len(srows) > 0 and srows == drows


def test_staged_r17_rows_oracle_parity(spark, sf_dir):
    """The two staged r17 registry rows vs their DuckDB oracles —
    proven BEFORE any driver debut: linkrank_scores (the pagerank +
    hits fold under the lossless method melt) and webdataset_roundtrip
    (the NEW r17 operator: a REAL tar write→read loop whose oracle is
    plain SQL over documents)."""
    import os as _os

    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in ("documents", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS FROM "
                f"'{_os.path.join(sf_dir, t + '.parquet')}'")

    srows = sorted(
        (r.method, int(r.node), int(r.score_fp))
        for r in entrymod.q_linkrank_scores(spark, sf_dir).collect()
    )
    drows = sorted(
        (a, int(b), int(c))
        for a, b, c in con.sql(
            entrymod._oracle_linkrank_scores()).fetchall()
    )
    assert len(srows) > 0 and srows == drows

    srows = sorted(
        (int(r.doc_id), r.ext, int(r.n_bytes))
        for r in entrymod.q_webdataset_roundtrip(spark, sf_dir).collect()
    )
    drows = sorted(
        (int(a), b, int(c))
        for a, b, c in con.sql(
            entrymod._oracle_webdataset_roundtrip()).fetchall()
    )
    assert len(srows) > 0 and srows == drows


def test_script_profile_semantics(spark):
    """One crafted doc per frozen script class resolves to that
    main_script with the hand-computed fractions; ASCII punctuation
    scores 'und'; empty/NULL text returns the NULL-metrics row; kana
    beats cjk on a mixed Japanese doc only when it has more chars."""
    from greenmask_spark.functions.text_analysis import script_profile

    rows = [
        (1, "Hello world 123"),
        (2, "Привет мир"),
        (3, "日本語のテキストです"),   # 3 kanji + 7 kana
        (4, "안녕하세요"),
        (5, "ελληνικά"),
        (6, ""),
        (7, None),
        (8, "!!! ???"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in script_profile(df).collect()}
    assert got[1].main_script == "latin"
    assert got[1].latin_frac == 0.6667          # 10/15
    assert got[1].digit_frac == 0.2             # 3/15
    assert got[1].space_frac == 0.1333          # 2/15
    assert got[2].main_script == "cyrillic"
    assert got[2].cyrillic_frac == 0.9          # 9/10
    assert got[3].main_script == "kana"
    assert got[3].cjk_frac == 0.3 and got[3].kana_frac == 0.7
    assert got[4].main_script == "hangul"
    assert got[4].hangul_frac == 1.0
    assert got[5].main_script == "greek"
    assert got[6].main_script is None and got[6].n_chars is None
    assert got[7].main_script is None
    assert got[8].main_script == "und"


def test_script_profile_tie_break_order(spark):
    """Equal counts resolve to the earliest SCRIPT_ORDER entry — the
    frozen deterministic-argmax contract (lang_id's idiom)."""
    from greenmask_spark.functions.text_analysis import script_profile

    df = spark.createDataFrame(
        [(1, "abПр")], "doc_id long, text string"
    )  # 2 latin, 2 cyrillic
    r = script_profile(df).collect()[0]
    assert r.latin_frac == r.cyrillic_frac == 0.5
    assert r.main_script == "latin"


def test_script_corpus_step(spark):
    """The `script` corpus step attaches main_script and the keep
    allowlist drops wrong-script docs while KEEPING unscorable empty
    docs (the NULL contract)."""
    from greenmask_spark.pipeline.corpus import build_corpus_pipeline

    rows = [(1, "plain english text"), (2, "Привет мир"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = build_corpus_pipeline(df, [
        {"op": "script", "keep": ["latin"]},
    ]).collect()
    assert {r.doc_id for r in out} == {1, 3}
    by_id = {r.doc_id: r.main_script for r in out}
    assert by_id[1] == "latin" and by_id[3] is None


def test_staged_r18_rows_oracle_parity(spark, sf_dir):
    """The two staged r18 registry rows vs their DuckDB oracles over
    the REAL tables — proven BEFORE any driver debut:
    near_pair_scores (the embedding_near_dup + ngram_jaccard fold
    under the lossless score rename) and script_profile (the NEW r18
    operator, oracle GENERATED from the same frozen class dicts)."""
    import os as _os

    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS FROM "
                f"'{_os.path.join(sf_dir, t + '.parquet')}'")

    srows = sorted(
        (r.method, int(r.id_a), int(r.id_b), float(r.score))
        for r in entrymod.q_near_pair_scores(spark, sf_dir).collect()
    )
    drows = sorted(
        (a, int(b), int(c), float(d))
        for a, b, c, d in con.sql(
            entrymod._oracle_near_pair_scores()).fetchall()
    )
    assert len(srows) > 0 and srows == drows

    def norm(row):
        return tuple(
            None if v is None else
            (round(float(v), 4) if isinstance(v, float) else v)
            for v in row
        )

    sdf = entrymod.q_script_profile(spark, sf_dir)
    srows = sorted(norm(tuple(r)) for r in sdf.collect())
    res = con.sql(entrymod._oracle_script_profile())
    assert sorted(c for c in sdf.columns) == sorted(res.columns)
    # align duck columns to spark order before comparing
    duck = res.df()[sdf.columns]
    drows = sorted(
        norm(tuple(None if pd_isna(v) else v for v in row))
        for row in duck.itertuples(index=False, name=None)
    )
    assert len(srows) > 0 and srows == drows


def pd_isna(v):
    import pandas as pd

    try:
        return pd.isna(v)
    except (TypeError, ValueError):
        return False


def test_staged_r19_rows_oracle_parity(spark, sf_dir):
    """The two staged r19 registry rows vs their DuckDB oracles over
    the REAL tables — proven BEFORE any driver debut:
    media_fingerprints (the image_dhash + audio_fingerprint fold
    under the lossless fp rename) and assemble_conversations (the
    NEW r19 operator: SFT chat assembly over the events table)."""
    import os as _os

    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in ("documents", "events"):
        con.sql(f"CREATE VIEW {t} AS FROM "
                f"'{_os.path.join(sf_dir, t + '.parquet')}'")

    srows = sorted(
        (r.method, int(r.media_id), int(r.fp))
        for r in entrymod.q_media_fingerprints(spark, sf_dir).collect()
    )
    drows = sorted(
        (a, int(b), int(c))
        for a, b, c in con.sql(
            entrymod._oracle_media_fingerprints()).fetchall()
    )
    assert len(srows) > 0 and srows == drows

    sdf = entrymod.q_assemble_conversations(spark, sf_dir)
    assert sdf.columns == ["user_id", "n_turns", "n_chars", "text"]
    srows = sorted(tuple(r) for r in sdf.collect())
    drows = sorted(
        tuple(row)
        for row in con.sql(
            entrymod._oracle_assemble_conversations()).fetchall()
    )
    assert len(srows) > 0 and srows == drows
    # every sample respects the 8-turn budget and renders chatml
    assert all(1 <= r[1] <= 8 for r in srows)
    assert all(r[3].startswith("<|im_start|>") for r in srows)


def test_domain_profile_aggregates_and_gates(spark):
    from greenmask_spark.functions.web import domain_profile

    rows = [
        ("https://a.example.org/p/1", 100, 0.9),
        ("https://a.example.org/p/2", 300, 0.5),
        ("https://b.example.org/x", 50, None),   # NULL signal kept for others
        ("not a url", 10, 0.1),                   # unparseable -> NULL domain
        (None, 20, 0.2),
    ]
    df = spark.createDataFrame(rows, "url string, n_chars int, q double")
    out = domain_profile(
        df, "url", ("n_chars", "q"),
        gates={"q": (0.6, None)},
    ).collect()
    got = {r["domain"]: r for r in out}
    a = got["a.example.org"]
    assert a["n_docs"] == 2 and a["n_chars_n"] == 2 and a["q_n"] == 2
    assert float(a["n_chars_sum"]) == 400.0
    assert a["n_chars_mean"] == 200.0 and a["q_mean"] == 0.7
    assert a["kept"] is True
    b = got["b.example.org"]
    # NULL q: q_n=0, q_mean NULL -> gate fails closed
    assert b["q_n"] == 0 and b["q_mean"] is None and b["kept"] is False
    # unparseable + NULL urls pool under the NULL domain
    assert got[None]["n_docs"] == 2


def test_domain_profile_registered_only_and_validation(spark):
    import pytest as _pytest

    from greenmask_spark.functions.web import domain_profile

    df = spark.createDataFrame(
        [("https://x.news.example.com/a", 1),
         ("https://y.news.example.com/b", 3)],
        "url string, s int",
    )
    out = domain_profile(df, "url", ("s",), registered_only=True).collect()
    assert len(out) == 1 and out[0]["domain"] == "example.com"
    assert out[0]["n_docs"] == 2 and out[0]["s_mean"] == 2.0
    with _pytest.raises(ValueError, match="non-signal"):
        domain_profile(df, "url", ("s",), gates={"nope": (0, 1)})


def test_domain_profile_partitioning_invariant_plan_shape(spark):
    from greenmask_spark.functions.web import domain_profile

    rows = [(f"https://d{i % 3}.example.org/{i}", i, i / 7.0)
            for i in range(200)]
    df = spark.createDataFrame(rows, "url string, n int, q double")
    a = sorted(map(tuple, domain_profile(
        df.coalesce(1), "url", ("n", "q")).collect()))
    b = sorted(map(tuple, domain_profile(
        df.repartition(13, "q"), "url", ("n", "q")).collect()))
    assert a == b  # decimal sums: order-independent, partition-invariant
    out = domain_profile(df, "url", ("n", "q"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    assert "Python" not in plan


def test_staged_r20_rows_oracle_parity(spark, sf_dir):
    """The two staged r20 registry rows vs their DuckDB oracles over
    the REAL tables — proven BEFORE any driver debut: t_numeric_draws
    (the t_random_float + t_random_numeric lossless melt) and
    domain_profile (the NEW r20 operator: FineWeb-style per-domain
    quality rollup)."""
    import os as _os

    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in ("documents", "customer", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS FROM "
                f"'{_os.path.join(sf_dir, t + '.parquet')}'")

    sdf = entrymod.q_t_numeric_draws(spark, sf_dir)
    assert sdf.columns == ["family", "k1", "k2", "col_name", "value"]
    srows = sorted(tuple(r) for r in sdf.collect())
    drows = sorted(
        tuple(row)
        for row in con.sql(entrymod._oracle_t_numeric_draws()).fetchall()
    )
    assert len(srows) > 0 and srows == drows

    sdf = entrymod.q_domain_profile(spark, sf_dir)
    srows = sorted(
        tuple(r) for r in sdf.collect()
        
    )
    res = con.sql(entrymod._oracle_domain_profile())
    assert sorted(sdf.columns) == sorted(res.columns)
    duck = res.df()[sdf.columns]
    drows = sorted(
        tuple(None if pd_isna(v) else v for v in row)
        for row in duck.itertuples(index=False, name=None)
    )
    assert len(srows) > 0
    # decimal sums come back as Decimal from Spark and object from
    # pandas — compare via float for sums, exact for the rest
    def norm(row):
        return tuple(
            float(v) if hasattr(v, "as_tuple") else v for v in row
        )
    assert [norm(r) for r in srows] == [norm(r) for r in drows]
    # gate sanity: at least one domain on each side of the verdict
    kept = {r[-1] for r in srows}
    assert True in kept or False in kept


def test_repeated_spans_verify_paths_identical(spark):
    """The skew-safe groupBy+semi verify (taken above the size gate at
    corpus scale) and the local count-over-g window verify produce the
    SAME spans — the gate is placement/plan-shape only."""
    from greenmask_spark.functions.dedup import repeated_substring_spans

    boiler = _pseudo_text("boiler", 60)
    a = _pseudo_text("a", 40) + boiler + _pseudo_text("a2", 40)
    b = _pseudo_text("b", 25) + boiler + _pseudo_text("b2", 55)
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, _pseudo_text("d", 120)), (4, None)],
        "doc_id long, text string",
    )
    small = {(r.id, r.pos) for r in
             repeated_substring_spans(docs, length=30, stride=1).collect()}
    # force the at-scale path via the load_tables-style size hint
    docs_big = docs.filter(F.lit(True))
    docs_big._graft_scan_bytes = 1 << 40
    big = {(r.id, r.pos) for r in
           repeated_substring_spans(
               docs_big, length=30, stride=1).collect()}
    assert small == big and small
