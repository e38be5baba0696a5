"""Byte-pair-encoding tokenization: trainable merges + distributed encode.

The packing/budget operators (``pack_sequences``, ``token_count``)
need token counts; whitespace and BPE-ish regex proxies are fine for
filtering, but training-data budgets are set in REAL tokenizer tokens.
This module implements classic BPE (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — the scheme
GPT-2-family tokenizers build on):

- ``train_bpe``: learn a merge table from a corpus. The corpus-scale
  work is ONE distributed word-count aggregation; merge learning then
  runs driver-side over the distinct-word frequency table — the
  standard shape (HuggingFace tokenizers / subword-nmt train the same
  way), memory-bounded by VOCABULARY size, not corpus size. At web
  scale pass ``min_word_freq`` to floor the table before collect (rare
  words contribute negligible pair mass).
- ``bpe_encode`` / ``bpe_token_count``: apply a merge table to a text
  column — Arrow-batched pandas UDF with the rank dict in the closure
  (merge tables are a few 10k entries → broadcast-by-closure); greedy
  lowest-rank-first merging per word, the standard encode loop.

Reference parity note: greenmask has no tokenizer — this serves the
LLM-training-data pipeline (SURVEY §2.10), giving ``pack_sequences``
a real token budget instead of a whitespace proxy.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: end-of-word marker, attached to a word's final symbol so merges
#: distinguish word-final units ("est</w>") from word-internal ("est")
EOW = "</w>"

#: GPT-2-style pre-tokenization pattern (contractions, letter runs,
#: digit runs, punctuation runs) applied WITHIN whitespace tokens when
#: ``pretokenize="gpt2"``. Deliberately ASCII classes only: ASCII
#: character classes behave identically in Java regex (the training
#: side runs ``regexp_extract_all`` JVM-side) and Python ``re`` (the
#: encode side runs in an Arrow UDF), so train/encode can never split
#: differently. The one non-literal class, ``\s`` inside the negated
#: run, is ASCII-only under Java but Unicode under Python — the encode
#: side therefore compiles with ``re.ASCII`` so a U+00A0/U+2009 inside
#: a word lands in the punctuation run on BOTH engines. Non-ASCII
#: letters fall into the punctuation class — consistently on both
#: sides. The real GPT-2 pattern additionally uses Unicode categories
#: and leading-space attachment; this is the "style" (class-run
#: splitting) without the engine-divergence risk.
GPT2_PRETOK = r"'s|'t|'re|'ve|'m|'ll|'d|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"

_PRETOK_MODES = ("whitespace", "gpt2")


def _check_pretok(pretokenize: str) -> str:
    if pretokenize not in _PRETOK_MODES:
        raise ValueError(
            f"pretokenize {pretokenize!r}: expected one of {_PRETOK_MODES}"
        )
    return pretokenize


def _word_counts(
    corpus: DataFrame,
    text_col: str,
    lowercase: bool,
    min_word_freq: int,
    pretokenize: str = "whitespace",
) -> DataFrame:
    """(word, cnt) over whitespace tokens — the ONE corpus-scale pass
    of BPE training; map-side combined, and the frequency floor prunes
    the long tail before anything reaches the driver. With
    ``pretokenize="gpt2"`` each whitespace token is further split into
    contraction/letter/digit/punctuation runs (JVM-side
    ``regexp_extract_all``) so merges never bridge a class boundary."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    toks = (
        corpus.select(F.explode(F.split(F.trim(t), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
    )
    if _check_pretok(pretokenize) == "gpt2":
        toks = toks.select(
            F.explode(
                F.regexp_extract_all("word", F.lit(GPT2_PRETOK), F.lit(0))
            ).alias("word")
        )
    wc = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    if min_word_freq > 1:
        wc = wc.filter(F.col("cnt") >= int(min_word_freq))
    return wc


def train_bpe(
    corpus: DataFrame,
    num_merges: int = 256,
    text_col: str = "text",
    lowercase: bool = True,
    min_pair_freq: int = 2,
    min_word_freq: int = 2,
    max_vocab: int = 5_000_000,
    pretokenize: str = "whitespace",
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges; returns them in rank order
    (rank 0 first). Deterministic: ties on pair frequency break
    lexicographically, so the same corpus always yields the same
    table at any partitioning.

    Scale shape: one distributed word-count; the merge loop runs on
    the driver over the collected (word, cnt) table — bounded by the
    distinct-word vocabulary. Two rails keep a default call on a
    production corpus from OOMing the driver (the same medicine as
    ``lsh_recall_eval``'s count-before-the-quadratic-stage check):
    ``min_word_freq`` defaults to 2 (hapax "words" — URLs, hashes,
    code tokens — dominate a noisy web corpus's distinct-word table
    while contributing negligible pair mass), and the floored
    vocabulary is COUNTED before collect; above ``max_vocab`` the call
    raises with sizing guidance instead of collecting. Stops early
    when no pair reaches ``min_pair_freq``.

    ``pretokenize="gpt2"`` splits whitespace tokens into contraction/
    letter/digit/punctuation runs before counting (and ``bpe_encode``
    must be called with the same mode — ``merges_to_df`` records it),
    so trained budgets approximate production tokenizers on
    punctuated text instead of treating "word." as one unit."""
    from pyspark import StorageLevel

    _check_pretok(pretokenize)
    # the (word, cnt) table feeds two actions (the rail count + the
    # collect); persist so the corpus-scale explode+agg runs once
    wc = _word_counts(
        corpus, text_col, lowercase, min_word_freq, pretokenize
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n_vocab = wc.count()
        if n_vocab > max_vocab:
            raise ValueError(
                f"train_bpe: {n_vocab} distinct words survive the "
                f"min_word_freq={min_word_freq} floor, exceeding "
                f"max_vocab={max_vocab}; the merge loop collects this "
                f"table to the driver. Raise min_word_freq (noisy web "
                f"corpora are dominated by near-hapax URLs/hashes/code "
                f"tokens that add negligible pair mass), or raise "
                f"max_vocab deliberately if the driver has the memory "
                f"(~100 bytes/word)."
            )
        if (
            n_vocab == 0
            and min_word_freq > 1
            # cheap probe (limit-1 scan, no shuffle): only warn about
            # the floor when the corpus itself was non-empty
            and corpus.select(text_col)
            .filter(F.trim(F.col(text_col)) != "")
            .limit(1)
            .count()
            > 0
        ):
            # a small/clean corpus can be ALL hapax words — the default
            # floor (min_word_freq=2, sized for noisy web corpora) then
            # yields zero merges and downstream bpe_count raises
            # "empty merges table" far from the cause. Warn at the
            # cause instead of failing later without one.
            import warnings

            warnings.warn(
                f"train_bpe: no word survives the "
                f"min_word_freq={min_word_freq} floor — every distinct "
                f"word in the corpus is rarer than the floor, so the "
                f"merge table will be EMPTY. On small or deduplicated "
                f"corpora pass min_word_freq=1.",
                stacklevel=2,
            )
        rows = wc.collect()
    finally:
        wc.unpersist()
    # word → symbol sequence; every word ends with its final char + EOW
    agg: dict[tuple[str, ...], int] = {}
    for r in rows:
        w = r["word"]
        seq = tuple(list(w[:-1]) + [w[-1] + EOW])
        agg[seq] = agg.get(seq, 0) + int(r["cnt"])
    seqs: list[list[str]] = [list(s) for s in agg]
    freqs: list[int] = list(agg.values())

    # incremental index (the subword-nmt shape): pair → total count and
    # pair → words containing it. Each merge touches ONLY the words
    # holding the chosen pair — O(merges × vocab) full recounts would
    # burn driver minutes at web-scale vocabularies. Membership sets
    # may go stale (a word rewritten away from a pair stays listed);
    # stale entries are harmless — rewriting a pair-free word is a
    # no-op and counts stay exact because every rewrite adjusts them
    # by the word's actual pair multiset.
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (seq, f) in enumerate(zip(seqs, freqs)):
        for p in zip(seq, seq[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        if not pair_counts:
            break
        best, cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < int(min_pair_freq):
            break
        a, b = best
        merges.append(best)
        merged = a + b
        for wi in pair_words.pop(best, set()):
            seq, f = seqs[wi], freqs[wi]
            if len(seq) < 2:
                continue
            for p in zip(seq, seq[1:]):
                left = pair_counts.get(p, 0) - f
                if left > 0:
                    pair_counts[p] = left
                else:
                    pair_counts.pop(p, None)
            i, new = 0, []
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    new.append(merged)
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            seqs[wi] = new
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(wi)
    return merges


def merges_to_df(
    spark,
    merges: list[tuple[str, str]],
    lowercase: bool = True,
    pretokenize: str = "whitespace",
) -> DataFrame:
    """(rank, left, right, lowercase, pretokenize) frame — the
    storable/shippable form of a merge table (write to parquet next to
    the corpus manifest). ``lowercase`` and ``pretokenize`` record the
    TRAINING-time preprocessing so encode-side consumers (the
    ``bpe_count`` step) apply the same — encoding case-sensitive text
    through a lowercased table (or punctuated text through a table
    trained with a different splitter) silently backs words off toward
    characters and inflates token counts several-fold."""
    return spark.createDataFrame(
        [
            (i, a, b, bool(lowercase), _check_pretok(pretokenize))
            for i, (a, b) in enumerate(merges)
        ],
        "rank int, left string, right string, lowercase boolean, "
        "pretokenize string",
    )


def merges_from_df(merges_df: DataFrame) -> list[tuple[str, str]]:
    """Inverse of ``merges_to_df`` (rank order restored); only the
    merge TABLE is collected — a few 10k rows."""
    return [
        (r["left"], r["right"])
        for r in merges_df.orderBy("rank").collect()
    ]


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge loop over one word — the
    standard BPE encode (identical to the subword-nmt/GPT-2 scheme)."""
    if not word:
        return []
    syms = list(word[:-1]) + [word[-1] + EOW]
    while len(syms) > 1:
        best_i, best_rank = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    text: Column,
    merges: list[tuple[str, str]],
    lowercase: bool = True,
    pretokenize: str = "whitespace",
) -> Column:
    """array<string> of BPE tokens for a text column — Arrow-batched
    pandas UDF; the rank dict rides the task closure (merge tables are
    small by construction). NULL text stays NULL. ``lowercase`` and
    ``pretokenize`` MUST match training (read them back from the
    stored table via ``merges_to_df``'s columns)."""
    import re

    from pyspark.sql.functions import pandas_udf

    _check_pretok(pretokenize)
    ranks = {pair: i for i, pair in enumerate(merges)}
    # the SAME whitespace class training used: Spark's Java regex \s
    # is ASCII-only ([ \t\n\x0B\f\r]) while Python str.split()/re \s
    # are Unicode — a U+00A0 non-breaking space in web text would split into
    # words the trained table never saw
    ws = re.compile("[ \t\n\x0b\f\r]+")
    # re.ASCII pins Python \s to the Java-regex ASCII class so
    # re.findall here and regexp_extract_all in training split
    # identically — without it a word-internal U+00A0/U+2009 (common in
    # scraped web text, survives the ASCII whitespace split above) is
    # "whitespace" to Python only, and encode would silently DROP the
    # characters training turned into tokens
    pretok = (
        re.compile(GPT2_PRETOK, re.ASCII) if pretokenize == "gpt2" else None
    )

    @pandas_udf("array<string>")
    def _enc(s: pd.Series) -> pd.Series:
        def one(x):
            if x is None:
                return None
            t = x.lower() if lowercase else x
            out: list[str] = []
            for w in ws.split(t.strip(" \t\n\x0b\f\r")):
                if not w:
                    continue
                if pretok is None:
                    out.extend(_encode_word(w, ranks))
                else:
                    for sub in pretok.findall(w):
                        out.extend(_encode_word(sub, ranks))
            return out

        return s.map(one)

    return _enc(text)


def bpe_token_count(
    text: Column,
    merges: list[tuple[str, str]],
    lowercase: bool = True,
    pretokenize: str = "whitespace",
) -> Column:
    """int token count under a trained merge table — the column to
    hand ``pack_sequences`` as its ``token_col`` for REAL token
    budgets."""
    return F.when(text.isNull(), F.lit(None).cast("int")).otherwise(
        F.size(bpe_encode(text, merges, lowercase, pretokenize))
    )
