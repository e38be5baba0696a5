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


def _word_counts(
    corpus: DataFrame,
    text_col: str,
    lowercase: bool,
    min_word_freq: int,
) -> DataFrame:
    """(word, cnt) over whitespace tokens — the ONE corpus-scale pass
    of BPE training; map-side combined, and the frequency floor prunes
    the long tail before anything reaches the driver."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    toks = (
        corpus.select(F.explode(F.split(F.trim(t), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
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
    min_word_freq: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges; returns them in rank order
    (rank 0 first). Deterministic: ties on pair frequency break
    lexicographically, so the same corpus always yields the same
    table at any partitioning.

    Scale shape: one distributed word-count; the merge loop runs on
    the driver over the collected (word, cnt) table — bounded by the
    distinct-word vocabulary (floor it with ``min_word_freq`` on
    web-scale corpora). Stops early when no pair reaches
    ``min_pair_freq``."""
    rows = _word_counts(
        corpus, text_col, lowercase, min_word_freq
    ).collect()
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
    spark, merges: list[tuple[str, str]], lowercase: bool = True
) -> DataFrame:
    """(rank, left, right, lowercase) frame — the storable/shippable
    form of a merge table (write to parquet next to the corpus
    manifest). ``lowercase`` records the TRAINING-time case folding so
    encode-side consumers (the ``bpe_count`` step) apply the same
    folding — encoding case-sensitive text through a lowercased table
    (or vice versa) silently backs every word off toward characters
    and inflates token counts several-fold."""
    return spark.createDataFrame(
        [(i, a, b, bool(lowercase)) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string, lowercase boolean",
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
) -> Column:
    """array<string> of BPE tokens for a text column — Arrow-batched
    pandas UDF; the rank dict rides the task closure (merge tables are
    small by construction). NULL text stays NULL."""
    import re

    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}
    # the SAME whitespace class training used: Spark's Java regex \s
    # is ASCII-only ([ \t\n\x0B\f\r]) while Python str.split()/re \s
    # are Unicode — a U+00A0 non-breaking space in web text would split into
    # words the trained table never saw
    ws = re.compile("[ \t\n\x0b\f\r]+")

    @pandas_udf("array<string>")
    def _enc(s: pd.Series) -> pd.Series:
        def one(x):
            if x is None:
                return None
            t = x.lower() if lowercase else x
            out: list[str] = []
            for w in ws.split(t.strip(" \t\n\x0b\f\r")):
                if w:
                    out.extend(_encode_word(w, ranks))
            return out

        return s.map(one)

    return _enc(text)


def bpe_token_count(
    text: Column,
    merges: list[tuple[str, str]],
    lowercase: bool = True,
) -> Column:
    """int token count under a trained merge table — the column to
    hand ``pack_sequences`` as its ``token_col`` for REAL token
    budgets."""
    return F.when(text.isNull(), F.lit(None).cast("int")).otherwise(
        F.size(bpe_encode(text, merges, lowercase))
    )
