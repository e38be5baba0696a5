"""Unigram-LM (SentencePiece-style) tokenization: trainable pieces +
distributed Viterbi encode.

The standard alternative to BPE for multilingual corpora (Kudo 2018,
"Subword Regularization", arXiv:1804.10959 — the scheme SentencePiece's
``--model_type=unigram`` implements): a vocabulary of subword pieces
with unigram probabilities, trained by EM over the corpus and applied
by Viterbi (max-likelihood) segmentation.

Spark-first decomposition (mirrors ``bpe.train_bpe``'s shape):

- ``unigram_seed_counts``: the ONE corpus-scale stage — a distributed
  word-count (map-side combined, ``min_word_freq``-floored) followed by
  a substring explode over the DISTINCT-WORD table (vocabulary-bounded,
  not corpus-bounded) aggregating weighted piece frequencies. Exact
  integer counts → the stage replays bit-for-bit in SQL.
- ``seed_vocab``: top-K piece selection + closed-form normalization
  (all single characters are always kept so every word stays
  segmentable). Still exact integers until one final ln().
- ``train_unigram``: EM refinement + pruning over the collected
  (word, cnt) table — driver-side like BPE's merge loop, memory-bounded
  by VOCABULARY size with the same ``max_vocab`` rail, never by corpus
  size. ``em_iters=0`` returns the pure seed model (the deterministic
  cross-engine-replayable form the driver correctness row uses).
- ``unigram_encode`` / ``unigram_token_count``: Viterbi segmentation of
  a text column — Arrow-batched pandas UDF with the piece log-prob dict
  in the closure (piece tables are a few 10k entries). Characters
  outside the vocabulary are emitted as single-character pieces so the
  segmentation is LOSSLESS (concatenating the pieces of a word restores
  the word exactly).

EM follows Kudo 2018 §3.2: E-step = forward-backward expected piece
counts over each word's segmentation lattice, M-step = renormalize.
Pruning keeps the highest-expected-count pieces (the common
re-implementation simplification of the paper's likelihood-loss
criterion) and never drops single characters.

Reference parity note: greenmask has no tokenizer — this serves the
LLM-training-data pipeline (SURVEY §2.10) beside ``bpe.py``, giving
``pack_sequences``/``select_to_budget`` a multilingual-friendly real
token budget.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from greenmask_spark.functions.bpe import _check_pretok, _word_counts

#: cap on the per-worker Viterbi memo dicts in unigram_encode /
#: unigram_token_count. ~1e6 entries ≈ tens of MB of Python strings —
#: big enough that Zipfian text hits it essentially never, small enough
#: that a 100 TB multilingual corpus (unbounded distinct tokens) cannot
#: ramp a reused worker into the executor's overhead budget (guide §5).
_MEMO_CAP = 1_000_000


def _memo_put(cache: dict, key, value):
    """Insert into a per-worker memo dict, clearing it first when it
    has reached ``_MEMO_CAP`` entries. Eviction is value-neutral (the
    memo only ever stores deterministic Viterbi results), so the cap
    trades recompute for bounded worker memory."""
    if len(cache) >= _MEMO_CAP:
        cache.clear()
    cache[key] = value
    return value


def unigram_seed_counts(
    corpus: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    max_piece_len: int = 4,
    min_word_freq: int = 2,
    pretokenize: str = "whitespace",
) -> DataFrame:
    """(piece, cnt) — weighted frequency of every substring of length
    1..``max_piece_len`` across the corpus's words: cnt(piece) =
    Σ_word word_cnt × occurrences(piece, word).

    Scale shape: the corpus is touched ONCE by the word-count
    aggregation (map-side combined); the substring explode then runs
    over the distinct-word frame — its size is the vocabulary, not the
    corpus, and each word of length L yields ≤ L·max_piece_len rows
    before the second map-side-combined agg. Exact integer counts, so
    the whole stage is SQL-replayable (the driver row's oracle does)."""
    if max_piece_len < 1:
        raise ValueError("max_piece_len must be >= 1")
    wc = _word_counts(corpus, text_col, lowercase, min_word_freq,
                      pretokenize)
    return _seed_counts_from_wc(wc, max_piece_len)


def _seed_counts_from_wc(wc: DataFrame, max_piece_len: int) -> DataFrame:
    # enumerate (start, len) substring grid JVM-side; HOFs are fine
    # here — the input is the distinct-word table, not the corpus
    pieces = wc.select(
        "cnt",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, char_length(word)), i -> "
                f"transform(sequence(1, least({int(max_piece_len)}, "
                f"char_length(word) - i + 1)), l -> "
                f"substring(word, i, l))))"
            )
        ).alias("piece"),
    )
    return pieces.groupBy("piece").agg(F.sum("cnt").alias("cnt"))


def seed_vocab(
    seed_counts: DataFrame,
    vocab_size: int = 512,
    min_piece_freq: int = 2,
) -> DataFrame:
    """(piece, cnt, logp) — the seed unigram model: ALL single
    characters (coverage: every word must stay segmentable) plus the
    top multi-character pieces by (cnt DESC, piece ASC) up to
    ``vocab_size`` total, normalized over the KEPT pieces' counts
    (logp = ln(cnt / Σ cnt), the only float op, rounded to 6 so the
    value is cross-engine stable).

    Scale shape: the top-K is ``orderBy(...).limit(k)`` — Catalyst
    compiles it to TakeOrderedAndProject (per-partition partial top-k,
    k rows per task to the final merge), never a single-partition
    global sort, so selection stays cheap however many candidate
    pieces the substring grid produced."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    chars = seed_counts.filter(F.length("piece") == 1)
    multi = seed_counts.filter(
        (F.length("piece") > 1) & (F.col("cnt") >= int(min_piece_freq))
    )
    n_chars = chars.count()
    k = max(0, int(vocab_size) - n_chars)
    top_multi = multi.orderBy(F.col("cnt").desc(), F.col("piece")).limit(k)
    # kept feeds TWO reads of one plan (the normalizer total and the
    # final projection) — pin the ≤ vocab_size rows eagerly so the
    # corpus-scale substring agg underneath runs exactly once
    kept = chars.unionByName(top_multi).localCheckpoint(eager=True)
    total = kept.agg(F.sum("cnt").alias("__t"))
    return (
        kept.crossJoin(F.broadcast(total))
        .select(
            "piece",
            "cnt",
            F.round(
                F.log(F.col("cnt").cast("double") / F.col("__t")), 6
            ).alias("logp"),
        )
    )


def train_unigram(
    corpus: DataFrame,
    vocab_size: int = 512,
    text_col: str = "text",
    lowercase: bool = True,
    max_piece_len: int = 4,
    min_word_freq: int = 2,
    min_piece_freq: int = 2,
    max_vocab: int = 5_000_000,
    seed_mult: int = 4,
    em_iters: int = 2,
    prune_rounds: int = 4,
    pretokenize: str = "whitespace",
) -> list[tuple[str, float]]:
    """Learn a unigram-LM piece vocabulary; returns [(piece, logp)]
    sorted by (-logp, piece) — deterministic: every corpus-scale count
    is an exact integer and the driver-side EM iterates over a
    deterministically-ordered word table, so the same corpus yields
    the same model at any partitioning.

    Shape: seed with ``seed_mult × vocab_size`` candidates from
    ``unigram_seed_counts`` (one corpus pass), then ``prune_rounds``
    rounds of (EM × ``em_iters``, prune lowest-expected-count
    multi-char pieces) shrinking geometrically to ``vocab_size``.
    ``em_iters=0`` skips EM entirely and returns the seed model
    truncated to ``vocab_size`` (exact replayable form).

    Rails (same medicine as ``train_bpe``): the floored distinct-word
    table is COUNTED before collect; above ``max_vocab`` the call
    raises with sizing guidance instead of collecting."""
    from pyspark import StorageLevel

    _check_pretok(pretokenize)
    wc = _word_counts(
        corpus, text_col, lowercase, min_word_freq, pretokenize
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n_vocab = wc.count()
        if n_vocab > max_vocab:
            raise ValueError(
                f"train_unigram: {n_vocab} distinct words survive the "
                f"min_word_freq={min_word_freq} floor, exceeding "
                f"max_vocab={max_vocab}; EM collects this table to the "
                f"driver. Raise min_word_freq, or raise max_vocab "
                f"deliberately if the driver has the memory "
                f"(~100 bytes/word)."
            )
        seed = seed_vocab(
            _seed_counts_from_wc(wc, max_piece_len),
            vocab_size=int(seed_mult) * int(vocab_size),
            min_piece_freq=min_piece_freq,
        )
        pieces = {
            r["piece"]: float(r["logp"]) for r in seed.collect()
        }
        words = sorted(
            (r["word"], int(r["cnt"])) for r in wc.collect()
        )
    finally:
        wc.unpersist()

    if em_iters <= 0 or not pieces:
        return _finalize(pieces, vocab_size)

    for _ in range(int(prune_rounds)):
        for _ in range(int(em_iters)):
            pieces = _em_step(words, pieces, max_piece_len)
        n_multi = sum(1 for p in pieces if len(p) > 1)
        n_chars = len(pieces) - n_multi
        target_multi = max(0, int(vocab_size) - n_chars)
        if n_multi <= target_multi:
            break
        # geometric shrink: keep 75% of multi-char pieces per round,
        # never below the final target
        keep = max(target_multi, int(n_multi * 0.75))
        ranked = sorted(
            ((p, lp) for p, lp in pieces.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        kept = {p for p, _ in ranked[:keep]}
        pieces = {
            p: lp for p, lp in pieces.items()
            if len(p) == 1 or p in kept
        }
        # renormalize after pruning
        logz = _logsumexp(list(pieces.values()))
        pieces = {p: lp - logz for p, lp in pieces.items()}
    return _finalize(pieces, vocab_size)


def _finalize(
    pieces: dict[str, float], vocab_size: int
) -> list[tuple[str, float]]:
    """Truncate to vocab_size (all chars + best multi-char) and sort
    deterministically by (-logp, piece)."""
    chars = [(p, lp) for p, lp in pieces.items() if len(p) == 1]
    multi = sorted(
        ((p, lp) for p, lp in pieces.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    k = max(0, int(vocab_size) - len(chars))
    out = chars + multi[:k]
    return sorted(out, key=lambda kv: (-kv[1], kv[0]))


def _logsumexp(vals: list[float]) -> float:
    m = max(vals)
    return m + math.log(sum(math.exp(v - m) for v in vals))


def _em_step(
    words: list[tuple[str, int]],
    pieces: dict[str, float],
    max_piece_len: int,
) -> dict[str, float]:
    """One EM iteration (Kudo 2018 §3.2): forward-backward expected
    piece counts over each word's segmentation lattice, then
    renormalize. Lattice edges are vocabulary pieces only — characters
    are always present, so every word has at least one path."""
    NEG = float("-inf")
    exp_counts: dict[str, float] = {}
    for word, cnt in words:
        L = len(word)
        # forward: alpha[i] = log P(prefix word[:i])
        alpha = [NEG] * (L + 1)
        alpha[0] = 0.0
        edges: list[list[tuple[int, str, float]]] = [
            [] for _ in range(L + 1)
        ]  # edges[j] = [(i, piece, logp)] ending at j
        for i in range(L):
            if alpha[i] == NEG:
                continue
            for l in range(1, min(max_piece_len, L - i) + 1):
                sub = word[i:i + l]
                lp = pieces.get(sub)
                if lp is None:
                    continue
                j = i + l
                edges[j].append((i, sub, lp))
                cand = alpha[i] + lp
                alpha[j] = (
                    cand if alpha[j] == NEG
                    else _logadd(alpha[j], cand)
                )
        if alpha[L] == NEG:
            continue  # unsegmentable (chars pruned? cannot happen)
        # backward: beta[i] = log P(suffix word[i:])
        beta = [NEG] * (L + 1)
        beta[L] = 0.0
        for j in range(L, 0, -1):
            if beta[j] == NEG:
                continue
            for i, sub, lp in edges[j]:
                cand = lp + beta[j]
                beta[i] = (
                    cand if beta[i] == NEG
                    else _logadd(beta[i], cand)
                )
        z = alpha[L]
        for j in range(1, L + 1):
            for i, sub, lp in edges[j]:
                if alpha[i] == NEG or beta[j] == NEG:
                    continue
                gamma = math.exp(alpha[i] + lp + beta[j] - z)
                exp_counts[sub] = exp_counts.get(sub, 0.0) + gamma * cnt
    if not exp_counts:
        return pieces
    # M-step over pieces that received mass; unseen pieces keep a
    # floor far below any seen piece so they prune first but coverage
    # characters survive
    total = sum(exp_counts.values())
    floor = math.log(1e-10 / total) if total > 0 else -30.0
    out: dict[str, float] = {}
    for p in pieces:
        c = exp_counts.get(p)
        out[p] = math.log(c / total) if c and c > 0 else floor
    return out


def _logadd(a: float, b: float) -> float:
    if a < b:
        a, b = b, a
    return a + math.log1p(math.exp(b - a))


def pieces_to_df(
    spark,
    pieces: list[tuple[str, float]],
    lowercase: bool = True,
    pretokenize: str = "whitespace",
) -> DataFrame:
    """(piece, logp, lowercase, pretokenize) frame — the storable/
    shippable form of a unigram model (write to parquet next to the
    corpus manifest). Training-time preprocessing is recorded so
    encode-side consumers apply the same (same contract as
    ``bpe.merges_to_df``)."""
    return spark.createDataFrame(
        [
            (p, float(lp), bool(lowercase), _check_pretok(pretokenize))
            for p, lp in pieces
        ],
        "piece string, logp double, lowercase boolean, pretokenize string",
    )


def pieces_from_df(pieces_df: DataFrame) -> list[tuple[str, float]]:
    """Inverse of ``pieces_to_df`` (deterministic order restored);
    only the piece TABLE is collected — a few 10k rows."""
    rows = pieces_df.select("piece", "logp").collect()
    return sorted(
        ((r["piece"], float(r["logp"])) for r in rows),
        key=lambda kv: (-kv[1], kv[0]),
    )


def _viterbi(
    word: str,
    logp: dict[str, float],
    max_piece_len: int,
    unk_logp: float,
) -> list[str]:
    """Max-likelihood segmentation of one word. Deterministic
    tie-break: on equal score prefer the LONGER final piece (fewer
    tokens), the SentencePiece behavior for exact ties. Characters
    outside the vocabulary are emitted as themselves at ``unk_logp``
    so segmentation is lossless."""
    L = len(word)
    if L == 0:
        return []
    NEG = float("-inf")
    best = [NEG] * (L + 1)
    back: list[tuple[int, str]] = [(-1, "")] * (L + 1)
    best[0] = 0.0
    for j in range(1, L + 1):
        for l in range(1, min(max_piece_len, j) + 1):
            i = j - l
            if best[i] == NEG:
                continue
            sub = word[i:j]
            lp = logp.get(sub)
            if lp is None:
                if l != 1:
                    continue
                lp = unk_logp
            cand = best[i] + lp
            # >= plus ascending l means the LAST accepted candidate
            # among ties wins, i.e. the longest piece ("fixing" this
            # to strict > would silently flip the tie-break to the
            # shortest piece)
            if cand >= best[j]:
                best[j] = cand
                back[j] = (i, sub)
    out: list[str] = []
    j = L
    while j > 0:
        i, sub = back[j]
        out.append(sub)
        j = i
    out.reverse()
    return out


def unigram_encode(
    text: Column,
    pieces: list[tuple[str, float]],
    lowercase: bool = True,
    max_piece_len: int | None = None,
    pretokenize: str = "whitespace",
) -> Column:
    """array<string> of unigram-LM pieces for a text column — Viterbi
    segmentation in an Arrow-batched pandas UDF, the log-prob dict in
    the task closure. NULL text stays NULL; out-of-vocabulary
    characters pass through as single-character pieces (lossless).
    ``lowercase``/``pretokenize`` MUST match training (read them back
    from the stored table's columns)."""
    import re

    from pyspark.sql.functions import pandas_udf

    from greenmask_spark.functions.bpe import GPT2_PRETOK

    _check_pretok(pretokenize)
    logp = {p: float(lp) for p, lp in pieces}
    mpl = max_piece_len or max((len(p) for p in logp), default=1)
    unk = (min(logp.values()) if logp else 0.0) - 10.0
    ws = re.compile("[ \t\n\x0b\f\r]+")  # ASCII \s, same as bpe_encode
    pretok = (
        re.compile(GPT2_PRETOK, re.ASCII) if pretokenize == "gpt2" else None
    )

    # per-worker word→pieces memo: _viterbi is deterministic per word
    # and natural text repeats words heavily (Zipf), so one Python
    # worker segments each distinct word ONCE and every later
    # occurrence is a dict hit (guide §4.5: amortize heavy per-call
    # work across the task). The dict pickles empty with the closure;
    # each worker grows its own copy across batches. BOUNDED at
    # _MEMO_CAP entries (guide §5): distinct-token cardinality on a
    # multilingual 100 TB corpus is effectively unbounded and the
    # worker process outlives tasks (spark.python.worker.reuse), so an
    # uncapped dict is an executor-OOM ramp — on overflow the memo
    # clears and rebuilds (Zipf means the hot head repopulates in one
    # batch; values never change, so eviction is value-neutral).
    cache: dict[str, list[str]] = {}

    @pandas_udf("array<string>")
    def _enc(s: pd.Series) -> pd.Series:
        def seg(w):
            r = cache.get(w)
            if r is None:
                r = _memo_put(cache, w, _viterbi(w, logp, mpl, unk))
            return r

        def one(x):
            if x is None:
                return None
            t = x.lower() if lowercase else x
            out: list[str] = []
            for w in ws.split(t.strip(" \t\n\x0b\f\r")):
                if not w:
                    continue
                if pretok is None:
                    out.extend(seg(w))
                else:
                    for sub in pretok.findall(w):
                        out.extend(seg(sub))
            return out

        return s.map(one)

    return _enc(text)


def unigram_token_count(
    text: Column,
    pieces: list[tuple[str, float]],
    lowercase: bool = True,
    max_piece_len: int | None = None,
    pretokenize: str = "whitespace",
) -> Column:
    """int token count under a trained unigram model — the column to
    hand ``pack_sequences``/``select_to_budget`` for REAL multilingual
    token budgets.

    Counts directly in the Arrow kernel instead of wrapping
    ``unigram_encode`` in ``size()``: the piece ARRAYS never cross the
    Python→JVM boundary (guide §4.1: control how many bytes cross —
    an int per row instead of hundreds of strings), and the per-word
    memo caches COUNTS, which for a count query is all Viterbi needs
    to hand back. Same segmentation, same NULL contract."""
    import re

    from pyspark.sql.functions import pandas_udf

    from greenmask_spark.functions.bpe import GPT2_PRETOK

    _check_pretok(pretokenize)
    logp = {p: float(lp) for p, lp in pieces}
    mpl = max_piece_len or max((len(p) for p in logp), default=1)
    unk = (min(logp.values()) if logp else 0.0) - 10.0
    ws = re.compile("[ \t\n\x0b\f\r]+")  # ASCII \s, same as bpe_encode
    pretok = (
        re.compile(GPT2_PRETOK, re.ASCII) if pretokenize == "gpt2" else None
    )
    cache: dict[str, int] = {}  # bounded at _MEMO_CAP, see unigram_encode

    @pandas_udf("int")
    def _cnt(s: pd.Series) -> pd.Series:
        def seg(w):
            r = cache.get(w)
            if r is None:
                r = _memo_put(
                    cache, w, len(_viterbi(w, logp, mpl, unk)))
            return r

        def one(x):
            if x is None:
                return None
            t = x.lower() if lowercase else x
            n = 0
            for w in ws.split(t.strip(" \t\n\x0b\f\r")):
                if not w:
                    continue
                if pretok is None:
                    n += seg(w)
                else:
                    for sub in pretok.findall(w):
                        n += seg(sub)
            return n

        return s.map(one)

    return _cnt(text)
