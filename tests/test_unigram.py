"""Unigram-LM (SentencePiece-style) tokenizer: seed counting, EM
training, Viterbi encode — functions/unigram.py."""

import math

import pytest
from pyspark.sql import functions as F

from greenmask_spark.functions.unigram import (
    pieces_from_df,
    pieces_to_df,
    seed_vocab,
    train_unigram,
    unigram_encode,
    unigram_seed_counts,
    unigram_token_count,
)


def _toy_corpus(spark):
    # canonical toy: {low:5, lower:2, newest:6, widest:3} — the same
    # corpus the BPE test uses, so piece/merge behavior is comparable
    rows = []
    rid = 0
    for word, freq in (("low", 5), ("lower", 2), ("newest", 6),
                       ("widest", 3)):
        for _ in range(freq):
            rows.append((rid, word))
            rid += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_seed_counts_exact(spark):
    """Substring frequencies are exact weighted occurrence counts:
    cnt(piece) = Σ word_cnt × occurrences(piece in word)."""
    corpus = spark.createDataFrame(
        [(1, "aba aba"), (2, "aba")], "doc_id long, text string"
    )
    got = {
        r["piece"]: r["cnt"]
        for r in unigram_seed_counts(
            corpus, max_piece_len=2, min_word_freq=1
        ).collect()
    }
    # "aba" appears 3 times; per word: a×2, b×1, ab×1, ba×1, (aba
    # excluded: len 3 > max_piece_len 2)
    assert got == {"a": 6, "b": 3, "ab": 3, "ba": 3}


def test_unigram_toy_train_encode_roundtrip(spark):
    """Train on the canonical corpus; Viterbi encoding is lossless
    (pieces concatenate back to the word), compresses seen words below
    character count, passes unknown characters through, and the piece
    table round-trips through its DataFrame form."""
    corpus = _toy_corpus(spark)
    pieces = train_unigram(
        corpus, vocab_size=40, max_piece_len=4, min_word_freq=1,
        min_piece_freq=2, em_iters=2, prune_rounds=2,
    )
    vocab = {p for p, _ in pieces}
    # high-frequency substrings of the corpus survive training
    assert "est" in vocab or "es" in vocab
    assert len(pieces) <= 40
    # all single characters of the corpus are kept (coverage)
    for ch in set("lowernwidest"):
        assert ch in vocab, ch

    df = spark.createDataFrame(
        [(1, "newest widest"), (2, "low lower"), (3, "zzq"), (4, None)],
        "doc_id long, text string",
    )
    enc = {r.doc_id: r.toks for r in df.select(
        "doc_id", unigram_encode(F.col("text"), pieces).alias("toks")
    ).collect()}
    assert "".join(enc[1]) == "newestwidest"
    assert "".join(enc[2]) == "lowlower"
    assert len(enc[1]) < len("newestwidest")  # compression on seen words
    assert enc[3] == ["z", "z", "q"]          # OOV chars pass through
    assert enc[4] is None

    counts = {r.doc_id: r.n for r in df.select(
        "doc_id", unigram_token_count(F.col("text"), pieces).alias("n")
    ).collect()}
    assert counts[1] == len(enc[1]) and counts[4] is None

    rt = pieces_from_df(pieces_to_df(spark, pieces))
    assert rt == [(p, float(lp)) for p, lp in pieces]


def test_unigram_em_improves_likelihood(spark):
    """EM refinement does not hurt training-corpus likelihood: total
    Viterbi log-probability under the EM model >= under the seed-only
    model (same vocabulary budget), and the model normalizes to a
    proper distribution."""
    corpus = _toy_corpus(spark)
    kw = dict(vocab_size=30, max_piece_len=4, min_word_freq=1,
              min_piece_freq=2, prune_rounds=1)
    seed = train_unigram(corpus, em_iters=0, **kw)
    em = train_unigram(corpus, em_iters=3, **kw)

    def total_viterbi(pieces):
        lp = dict(pieces)
        from greenmask_spark.functions.unigram import _viterbi
        tot = 0.0
        for word, freq in (("low", 5), ("lower", 2), ("newest", 6),
                           ("widest", 3)):
            segs = _viterbi(word, lp, 4, min(lp.values()) - 10.0)
            tot += freq * sum(lp[s] for s in segs)
        return tot

    assert total_viterbi(em) >= total_viterbi(seed) - 1e-9
    # EM model is normalized: Σ exp(logp) ≈ 1
    z = sum(math.exp(lp) for _, lp in em)
    assert abs(z - 1.0) < 0.05


def test_unigram_deterministic_across_partitioning(spark):
    """Same corpus → same model at any partitioning (exact-integer
    corpus counts + deterministically ordered driver-side EM)."""
    corpus = _toy_corpus(spark)
    kw = dict(vocab_size=30, max_piece_len=4, min_word_freq=1,
              em_iters=2, prune_rounds=2)
    a = train_unigram(corpus, **kw)
    b = train_unigram(corpus.repartition(7), **kw)
    assert [(p, round(lp, 12)) for p, lp in a] == \
           [(p, round(lp, 12)) for p, lp in b]


def test_unigram_vocab_rail(spark):
    """The max_vocab rail counts the floored word table BEFORE
    collecting it (the train_bpe medicine)."""
    rows = [(i, f"word{i:02d} word{i:02d}") for i in range(30)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="max_vocab"):
        train_unigram(corpus, vocab_size=16, max_vocab=10)
    with pytest.raises(ValueError, match="max_piece_len"):
        unigram_seed_counts(corpus, max_piece_len=0)
    with pytest.raises(ValueError, match="vocab_size"):
        seed_vocab(unigram_seed_counts(corpus), vocab_size=0)


def test_unigram_seed_duckdb_parity(spark):
    """The corpus-scale seed stage (word count → substring grid →
    top-K + all chars → ln normalization) replayed in SQL — the
    transcription source for the driver correctness row."""
    import duckdb

    corpus = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat"),
         (3, "a mat the cat sat on"), (4, "on and on and on")],
        "doc_id long, text string",
    )
    vocab, g, mwf, mpf = 24, 3, 1, 2
    got = sorted(
        (r["piece"], int(r["cnt"]), float(r["logp"]))
        for r in seed_vocab(
            unigram_seed_counts(corpus, max_piece_len=g,
                                min_word_freq=mwf),
            vocab_size=vocab, min_piece_freq=mpf,
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(
            f"({i}, '{t}')"
            for i, t in [(1, "the cat sat on the mat"), (2, "the cat"),
                         (3, "a mat the cat sat on"),
                         (4, "on and on and on")]
        )
        + ") x(doc_id, text)"
    )
    want = con.sql(f"""
      WITH words AS (
        SELECT word, count(*) AS cnt FROM (
          SELECT unnest(str_split_regex(trim(lower(text)), '\\s+')) AS word
          FROM documents
        ) WHERE word <> '' GROUP BY 1 HAVING count(*) >= {mwf}
      ),
      starts AS (
        SELECT word, cnt,
               unnest(generate_series(1, length(word))) AS i
        FROM words
      ),
      subs AS (
        SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece, cnt
        FROM (
          SELECT word, cnt, i,
                 unnest(generate_series(1,
                   least({g}, length(word) - CAST(i AS INT) + 1))) AS l
          FROM starts)
      ),
      pc AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt
             FROM subs GROUP BY 1),
      chars AS (SELECT piece, cnt FROM pc WHERE length(piece) = 1),
      multi AS (
        SELECT piece, cnt,
               row_number() OVER (ORDER BY cnt DESC, piece) AS rk
        FROM pc WHERE length(piece) > 1 AND cnt >= {mpf}
      ),
      kept AS (
        SELECT piece, cnt FROM chars
        UNION ALL
        SELECT piece, cnt FROM multi
        WHERE rk <= {vocab} - (SELECT count(*) FROM chars)
      ),
      tot AS (SELECT sum(cnt) AS t FROM kept)
      SELECT piece, cnt, round(ln(cnt / CAST(t AS DOUBLE)), 6) AS logp
      FROM kept CROSS JOIN tot
    """).fetchall()
    assert got == sorted((p, int(c), float(lp)) for p, c, lp in want)


def test_unigram_pack_sequences_budget(spark):
    """unigram_token_count feeds pack_sequences as a real token
    budget, the same integration contract as bpe_token_count."""
    from greenmask_spark.functions.sampling import pack_sequences

    corpus = _toy_corpus(spark)
    pieces = train_unigram(corpus, vocab_size=30, min_word_freq=1,
                           em_iters=1, prune_rounds=1)
    df = spark.createDataFrame(
        [(1, "newest widest"), (2, "low lower"), (3, "low")],
        "doc_id long, text string",
    ).withColumn("n_tokens", unigram_token_count(F.col("text"), pieces))
    packed = pack_sequences(df, max_tokens=8, n_packers=2).collect()
    fill, docs_in = {}, {}
    for r in packed:
        fill[r.seq_id] = fill.get(r.seq_id, 0) + r.n_tokens
        docs_in[r.seq_id] = docs_in.get(r.seq_id, 0) + 1
    assert all(fill[b] <= 8 for b in fill if docs_in[b] > 1)


def test_memo_put_bounds_cache(monkeypatch):
    """The per-worker Viterbi memo is BOUNDED: at _MEMO_CAP entries the
    dict clears and rebuilds instead of growing for the life of a
    reused Python worker (guide §5 — distinct-token cardinality on a
    multilingual corpus is unbounded, the memo must not be)."""
    from greenmask_spark.functions import unigram as ug

    monkeypatch.setattr(ug, "_MEMO_CAP", 3)
    cache = {}
    for i in range(10):
        got = ug._memo_put(cache, f"w{i}", [f"p{i}"])
        assert got == [f"p{i}"]          # insert returns the value
        assert len(cache) <= 3           # never exceeds the cap
    assert cache[f"w9"] == ["p9"]        # latest entry always present


def test_unigram_encode_values_unchanged_by_memo_cap(spark):
    """Eviction is value-neutral: encode output is a pure function of
    (text, pieces) regardless of memo hits/misses — same corpus twice
    through fresh encode closures yields identical segmentations."""
    corpus = _toy_corpus(spark)
    pieces = train_unigram(corpus, vocab_size=30, min_word_freq=1,
                           em_iters=0, prune_rounds=1)
    df = spark.createDataFrame(
        [(1, "newest widest low"), (2, "lower low newest")],
        "doc_id long, text string",
    )
    a = {r.doc_id: r.toks for r in df.select(
        "doc_id", unigram_encode(F.col("text"), pieces).alias("toks")
    ).collect()}
    b = {r.doc_id: r.toks for r in df.select(
        "doc_id", unigram_encode(F.col("text"), pieces).alias("toks")
    ).collect()}
    assert a == b and a[1] and a[2]
