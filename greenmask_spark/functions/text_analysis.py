"""Text analysis operators for training-data pipelines.

All pure Column expressions (JVM-side, codegen'd): token counting,
quality scoring, n-gram-heuristic language ID, document fingerprinting.
Each has a deliberate SQL-portable formulation so the DuckDB oracle can
replay it exactly (see __spark_entry__.oracle_sql).

At 100 TB these run as a single scan+project over the documents table —
no shuffle, no Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Stopword lists for the language-ID heuristic. Deliberately small and
#: frozen — they are part of the operator contract (oracle replays them).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "nicht", "zu"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"],
    "es": ["el", "la", "los", "de", "y", "que", "un", "una", "es", "por"],
}

LANG_ORDER = ("en", "de", "fr", "es")


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed, lowercased text."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


#: GPT-2-style pre-tokenizer pattern, restricted to syntax Java regex and
#: RE2 match identically (no lookahead, ASCII classes): contractions,
#: space-prefixed letter runs, digit runs, punctuation runs, whitespace.
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token estimate: the number of pre-tokenizer matches (the
    unit actual BPE merges subdivide — a stable proxy for LLM token cost
    without a vocab). Pure JVM regex, one pass; regexp_count counts
    without materializing the matched-substring array."""
    return F.regexp_count(text, F.lit(BPE_PRETOKEN_PATTERN))


def stopword_hits(text: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(arr, t)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    n = token_count(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        stopword_hits(text, lang) / n.cast("double")
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not [a-z0-9 ] after lowering."""
    n = F.length(text)
    alnum = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9 ]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise((n - alnum) / n.cast("double"))


def mean_word_length(text: Column) -> Column:
    n = token_count(text)
    total = F.length(F.regexp_replace(F.trim(text), r"\s+", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(total / n.cast("double"))


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: rewards stopword presence and sane word
    lengths, penalizes punctuation soup. Formula is part of the contract:

    score = 0.4*min(1, sw_ratio/0.4) + 0.3*(1 - punct_ratio)
          + 0.3*indicator(3 <= mean_word_len <= 10)
    """
    sw = stopword_ratio(text, "en")
    pr = punct_ratio(text)
    mwl = mean_word_length(text)
    return F.round(
        F.lit(0.4) * F.least(F.lit(1.0), sw / F.lit(0.4))
        + F.lit(0.3) * (F.lit(1.0) - pr)
        + F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(0.3)).otherwise(F.lit(0.0)),
        4,
    )


#: the Gopher rule-6 stop set (Rae et al. 2021, appendix A1.1): a doc
#: must contain at least two of these to look like running English prose
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _gopher_token_expr(text: Column) -> Column:
    """The token array the Gopher rules walk (empty-token-free)."""
    return F.filter(tokens(text), lambda t: t != "")


def _gopher_line_expr(text: Column) -> Column:
    """The non-blank line array the Gopher line rules walk."""
    return F.filter(F.split(text, "\n"), lambda ln: F.trim(ln) != "")


def _gopher_metrics(toks: Column, lines: Column) -> dict[str, Column]:
    """The per-document scalar metrics the Gopher rules compare — one
    named Column each, meant to land in their OWN projection so the
    rule comparisons downstream reference tiny column refs instead of
    copies of these aggregate subtrees (the flag struct repeats every
    rule inside the ``passed`` conjunction, and struct-field
    extraction duplicates the struct per extracted field — with the
    aggregates inlined that tree grows combinatorially and Catalyst
    analysis time, not row throughput, dominates the operator)."""
    # symbol OCCURRENCES (not symbol-containing tokens — 5 tokens of
    # '########' in a 100-word doc are 40 symbols, ratio 0.4, a fail):
    # '#' per char delta; '...' runs count by non-overlapping replace
    return {
        "n": F.size(toks),
        "len_sum": F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
        ),
        "sym": F.aggregate(
            toks, F.lit(0).cast("bigint"),
            lambda a, t: a
            + (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit(""))))
            + (F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit(""))))
            + ((F.length(t)
                - F.length(F.replace(t, F.lit("..."), F.lit(""))))
               / F.lit(3)).cast("bigint"),
        ),
        "alpha": F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))),
        "n_lines": F.size(lines),
        "bullet": F.size(F.filter(
            lines,
            lambda ln: (F.trim(ln).startswith("•")
                        | F.trim(ln).startswith("-")
                        | F.trim(ln).startswith("*")),
        )),
        "ellipsis": F.size(F.filter(
            lines,
            lambda ln: F.trim(ln).endswith("...") | F.trim(ln).endswith("…"),
        )),
        "stops": F.size(F.array_intersect(
            toks, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
        )),
    }


def _gopher_metric_exprs(toks: str, lines: str) -> dict[str, Column]:
    """``_gopher_metrics`` twin over column NAMES, built from SQL
    expression strings: one parser call each instead of dozens of
    py4j Column-node round-trips — the DataFrame-construction time of
    the lambda form measurably exceeds its execution time on small
    inputs. Semantics are identical (the parser produces the same
    ArrayAggregate/ArrayFilter trees); the crafted-violator unit test
    runs both forms over the same documents."""
    stops_arr = "array(" + ", ".join(
        f"'{s}'" for s in GOPHER_STOPWORDS) + ")"
    return {
        "n": F.expr(f"size({toks})"),
        "len_sum": F.expr(
            f"aggregate({toks}, 0L, (a, t) -> a + length(t))"),
        "sym": F.expr(
            f"aggregate({toks}, 0L, (a, t) -> a"
            " + (length(t) - length(replace(t, '#', '')))"
            " + (length(t) - length(replace(t, '…', '')))"
            " + cast((length(t) - length(replace(t, '...', ''))) / 3"
            "        as bigint))"),
        "alpha": F.expr(
            f"size(filter({toks}, t -> t rlike '[a-zA-Z]'))"),
        "n_lines": F.expr(f"size({lines})"),
        "bullet": F.expr(
            f"size(filter({lines}, ln -> startswith(trim(ln), '•')"
            " or startswith(trim(ln), '-')"
            " or startswith(trim(ln), '*')))"),
        "ellipsis": F.expr(
            f"size(filter({lines}, ln -> endswith(trim(ln), '...')"
            " or endswith(trim(ln), '…')))"),
        "stops": F.expr(
            f"size(array_intersect({toks}, {stops_arr}))"),
    }


def _gopher_flags_from_metrics(
    text: Column, m: dict[str, Column]
) -> Column:
    """Gopher flag struct from already-computed scalar metrics — every
    rule is a constant-size comparison, so duplicating rules into the
    ``passed`` conjunction and the NULL-text branch stays cheap."""
    nn = F.greatest(m["n"], F.lit(1))
    n_lines = F.greatest(m["n_lines"], F.lit(1))
    mwl = m["len_sum"] / nn
    rules = [
        ("word_count_ok", (m["n"] >= 50) & (m["n"] <= 100_000)),
        ("mean_word_len_ok", (mwl >= 3.0) & (mwl <= 10.0)),
        ("symbol_ratio_ok", m["sym"] / nn <= 0.1),
        ("bullet_lines_ok", m["bullet"] / n_lines <= 0.9),
        ("ellipsis_lines_ok", m["ellipsis"] / n_lines <= 0.3),
        ("alpha_words_ok", m["alpha"] / nn >= 0.8),
        ("stopwords_ok", m["stops"] >= 2),
    ]
    passed = rules[0][1]
    for _, c in rules[1:]:
        passed = passed & c
    flags = F.struct(
        *[c.alias(name) for name, c in rules],
        F.coalesce(passed, F.lit(False)).alias("passed"),
    )
    return F.when(text.isNotNull(), flags).otherwise(
        F.struct(*[F.lit(False).alias(name) for name, _ in rules],
                 F.lit(False).alias("passed"))
    )


def _gopher_flags(text: Column, toks: Column, lines: Column) -> Column:
    """Single-Column form: metrics inlined into the flag struct (use
    the projection-staged ``gopher_filter`` when a DataFrame is in
    hand — this form's tree duplicates each aggregate per rule use)."""
    return _gopher_flags_from_metrics(text, _gopher_metrics(toks, lines))


def gopher_quality_flags(text: Column) -> Column:
    """The published Gopher document-quality rules (Rae et al. 2021,
    arXiv:2112.11446 appendix A1.1) as ONE struct of per-rule booleans
    plus the conjunction — pure expressions, zero shuffle, so the
    filter runs at scan bandwidth and each rule's hit rate is one
    aggregate away (``df.agg(avg(flags.word_count_ok.cast('int')))``).

    Rules (true = keep): word count in [50, 100k]; mean word length in
    [3, 10]; symbol-to-word ratio (# and ellipsis) ≤ 0.1; ≤ 90% of
    lines bullet-started; ≤ 30% of lines ellipsis-ended; ≥ 80% of
    words contain an alphabetic character; ≥ 2 of the 8 Gopher stop
    words present. NULL text fails all rules.

    Pure-Column form: the token array appears as a subexpression in
    three places (size / aggregate / array_intersect). When the input
    is a DataFrame prefer ``gopher_filter``, which materializes the
    arrays in their own projection so the split runs once per row."""
    return _gopher_flags(text, _gopher_token_expr(text),
                         _gopher_line_expr(text))


def gopher_filter(
    df: DataFrame, text_col: str = "text", flags_col: str | None = None
) -> DataFrame:
    """Keep documents passing ALL Gopher rules — unless ``flags_col``
    is given: AUDIT MODE attaches the per-rule struct to EVERY row and
    does not filter, so rule hit rates can be measured before
    committing to drops (filtering first would make every surviving
    flag trivially true); follow with
    ``.filter(F.col(flags_col)['passed'])`` to apply the drop.

    Staged as three projections — (1) token/line arrays, (2) scalar
    metrics, (3) rule comparisons — so the tokenization split runs
    ONCE per row (HOFs are codegen-fallback: no whole-stage
    subexpression elimination) and, more importantly, the flag
    struct's expression tree stays CONSTANT-size: built from inlined
    metrics it duplicates every aggregate per rule reference and per
    struct-field extraction, and Catalyst analysis of that
    combinatorial tree (driver time, once per query) costs more than
    scanning the data. CollapseProject leaves non-cheap expressions
    that are referenced more than once in their own projection, so
    the stages survive optimization."""
    from greenmask_spark.session import spread_input

    text = F.col(text_col)
    staged = spread_input(df).withColumns({
        "_gq_toks": _gopher_token_expr(text),
        "_gq_lines": _gopher_line_expr(text),
    })
    metrics = _gopher_metric_exprs("_gq_toks", "_gq_lines")
    staged = staged.withColumns(
        {f"_gq_{k}": v for k, v in metrics.items()})
    flags = _gopher_flags_from_metrics(
        text, {k: F.col(f"_gq_{k}") for k in metrics})
    temp = ["_gq_toks", "_gq_lines"] + [f"_gq_{k}" for k in metrics]
    if flags_col:
        return staged.withColumn(flags_col, flags).drop(*temp)
    return staged.filter(flags["passed"]).drop(*temp)


#: C4's terminal punctuation set (Raffel et al. 2020 §2.2): a line must
#: end in one of these to be retained as prose
C4_TERMINAL = (".", "!", "?", '"', "”")


def c4_clean_text(
    text: Column,
    min_words: int = 3,
    require_terminal_punct: bool = True,
) -> Column:
    """The LINE-level C4 rules (Raffel et al. 2020, arXiv:1910.10683
    §2.2 — the Colossal Clean Crawled Corpus cleaning pass) as one
    expression: keep only lines that end in terminal punctuation,
    contain at least ``min_words`` words, and do not contain the word
    'javascript' (case-insensitive); return the retained lines
    re-joined with newlines. Pure expressions — runs at scan
    bandwidth, composes with ``c4_page_flags`` for the page-level
    drops.

    ``require_terminal_punct=False`` drops the punctuation gate —
    FineWeb (Penedo et al. 2024, arXiv:2406.17557 §3.2) adopts the C4
    rules but found that one too aggressive on modern crawl text; the
    other line rules still apply. Note the page-level sentence count
    (``c4_page_flags``) then runs over lines that need not end in
    ``. ! ?`` — its "each retained line contributes a sentence"
    property no longer holds."""
    lines = F.filter(F.split(text, "\n"), lambda ln: F.trim(ln) != "")
    term = F.array(*[F.lit(c) for c in C4_TERMINAL])

    def keep(ln):
        t = F.trim(ln)
        n_words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
        ok = (n_words >= min_words) & ~F.lower(t).contains("javascript")
        if require_terminal_punct:
            ok = F.exists(term, lambda c: t.endswith(c)) & ok
        return ok

    return F.array_join(F.filter(lines, keep), "\n")


def c4_page_flags(
    cleaned: Column,
    min_sentences: int = 5,
) -> Column:
    """The PAGE-level C4 rules over the line-cleaned text: at least
    ``min_sentences`` sentences, no 'lorem ipsum' placeholder text, no
    curly brace (the code-page tell). Returns a struct of per-rule
    booleans plus the conjunction, like ``gopher_quality_flags``.

    Sentence counting: the paper used a sentence tokenizer; here
    sentences are approximated as occurrences of ``. ! ?`` in the
    cleaned text — a pure expression (each retained line ends in
    terminal punctuation, and mid-line sentence breaks count too).
    NULL text fails all rules."""
    n_sent = (
        F.length(cleaned)
        - F.length(F.translate(cleaned, ".!?", ""))
    )
    low = F.lower(cleaned)
    rules = [
        ("min_sentences_ok", n_sent >= min_sentences),
        ("no_lorem_ipsum", ~low.contains("lorem ipsum")),
        ("no_curly_brace", ~cleaned.contains("{")),
    ]
    passed = rules[0][1]
    for _, c in rules[1:]:
        passed = passed & c
    flags = F.struct(
        *[c.alias(name) for name, c in rules],
        F.coalesce(passed, F.lit(False)).alias("passed"),
    )
    return F.when(cleaned.isNotNull(), flags).otherwise(
        F.struct(*[F.lit(False).alias(name) for name, _ in rules],
                 F.lit(False).alias("passed"))
    )


def c4_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    min_sentences: int = 5,
    flags_col: str | None = None,
    require_terminal_punct: bool = True,
) -> DataFrame:
    """The full C4 cleaning pass (line rules + page rules): the text
    column is REPLACED by its retained lines, and pages failing any
    page rule drop — unless ``flags_col`` is given: AUDIT MODE keeps
    every page with its per-rule struct attached (filter afterwards
    with ``.filter(F.col(flags_col)['passed'])``), matching
    ``gopher_filter``'s audit contract. Zero shuffle either way.
    ``require_terminal_punct=False`` is the FineWeb variant of the
    line rules (see ``c4_clean_text``)."""
    from greenmask_spark.session import spread_input

    cleaned = c4_clean_text(
        F.col(text_col), min_words=min_words,
        require_terminal_punct=require_terminal_punct,
    )
    out = spread_input(df).withColumn(text_col, cleaned)
    flags = c4_page_flags(F.col(text_col), min_sentences=min_sentences)
    if flags_col:
        return out.withColumn(flags_col, flags)
    return out.filter(flags["passed"])


def _lang_id_from_hits(hits: dict[str, Column]) -> Column:
    """``lang_id`` over already-computed per-language hit counts —
    callers that land the hit counts in their own projection (so each
    tokenize+filter runs ONCE per row, see ``analyze``) share the exact
    argmax/tie-break tree with the plain-text form."""
    best = F.lit("und")
    best_n = F.lit(0)
    for lg in reversed(LANG_ORDER):
        # iterate reversed so earlier languages win ties (>= keeps later
        # best only when strictly greater than every earlier one)
        cond = hits[lg] > F.lit(0)
        better = hits[lg] >= best_n
        best = F.when(cond & better, F.lit(lg)).otherwise(best)
        best_n = F.greatest(best_n, hits[lg])
    return best


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword hits; ties break in LANG_ORDER;
    all-zero → 'und' (undetermined)."""
    return _lang_id_from_hits(
        {lg: stopword_hits(text, lg) for lg in LANG_ORDER})


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: sha256 of case/whitespace
    normalized text (reference analog: hash engine §2.6 applied to docs)."""
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.sha2(norm, 256)


def winnow_fingerprints(text: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing rolling-hash fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS local document fingerprint): hash every
    positional k-gram, take the minimum of each w-hash window, return the
    sorted distinct selection. Robust to insertions/edits in a way the
    whole-document ``fingerprint`` is not: an edit perturbs only the
    windows overlapping it, so near-duplicate documents share most of
    their fingerprint sets.

    Pure expression (transform + slice + array_min over the positional
    hash array) — scan+project, no shuffle, no Python. Uses the same
    portable sha256-slice-mod-prime shingle hash as the dedup operators
    so a SQL oracle can replay it exactly."""
    from functools import reduce

    from greenmask_spark.functions.dedup import _shingle_hash

    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    # positional (NOT distinct) hashes — window selection needs positions
    hs = F.transform(idx, lambda i: _shingle_hash(norm.substr(i, F.lit(k))))
    # window minima as an element-wise least over w shifted slices.
    # CRITICAL for cost: referencing ``hs`` inside a transform() lambda
    # re-evaluates the whole hash array per element — O(n²) sha256 calls
    # per document. Slices are ordinary child expressions (evaluated once),
    # so this stays O(n·w). zip_with pads the shorter side with null and
    # least() skips nulls, which makes short-text windows clamp correctly.
    m = F.size(hs)
    span = F.greatest(m - w + 1, F.lit(1))
    shifted = [F.slice(hs, j + 1, span) for j in range(w)]
    wins = reduce(
        lambda a, b: F.zip_with(a, b, lambda x, y: F.least(x, y)), shifted
    )
    return F.array_sort(F.array_distinct(wins))


def _digest_of_set(fps: Column) -> Column:
    """Order-canonical sha256 of a sorted int array (comma-joined) — the
    one definition both winnow_digest and analyze() share; the
    text_profile oracle replays this exact format."""
    return F.sha2(
        F.concat_ws(",", F.transform(fps, lambda x: x.cast("string"))), 256
    )


def winnow_digest(text: Column, k: int = 5, w: int = 4) -> Column:
    """Order-canonical sha256 of the winnow fingerprint set — a scalar
    that equality-checks the whole set (cross-engine verifiable)."""
    return _digest_of_set(winnow_fingerprints(text, k, w))


def winnow_fingerprints_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """(id, wfp array<bigint>) — value-identical to the
    ``winnow_fingerprints`` expression, in the shape that is fast and
    parallel: the expression form's shifted-slice least-chain evaluates
    the whole hash pipeline interpreted per document (~25 ms/doc
    measured); here positional k-grams explode to (id, pos, h) rows —
    one sha256 per gram, codegen'd — window minima come from a
    rows-frame min over pos, and the sorted distinct set reassembles
    with one groupBy(id). Input repartitions so a single-row-group
    parquet file still uses every core."""
    from pyspark.sql import Window

    from greenmask_spark.functions.dedup import _shingle_hash

    from greenmask_spark.session import spread_input

    t = F.col(text_col)
    norm = F.regexp_replace(F.trim(F.lower(t)), r"\s+", " ")
    # flat codegen'd sequence-explode + substr — a transform() HOF here
    # would build the gram array interpreted (same lesson as
    # minhash_signatures_df)
    ex = (
        spread_input(df)
        .select(F.col(id_col).alias("id"), norm.alias("t"))
        .select(
            "id", "t",
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.length("t") - k + 1, F.lit(1))
                )
            ).alias("i"),
        )
        .select(
            "id",
            (F.col("i") - 1).alias("pos"),
            # the per-doc gram count is KNOWN from the text length (it
            # is exactly the sequence length exploded above) — carrying
            # it beats re-deriving it downstream with a second
            # count-over-partition window pass (one less per-row window
            # aggregate at any scale; value-identical by construction)
            F.greatest(F.length("t") - k + 1, F.lit(1)).alias("m"),
            _shingle_hash(F.expr(f"substr(t, i, {k})")).alias("h"),
        )
    )
    wframe = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    sel = (
        ex.select(
            "id", "pos", "m",
            F.min("h").over(wframe).alias("wmin"),
        )
        # window positions 0..m-w (the full-width windows); a doc shorter
        # than one window keeps its single clamped window at pos 0
        .filter(F.col("pos") <= F.greatest(F.col("m") - w, F.lit(0)))
    )
    return sel.groupBy("id").agg(
        F.sort_array(F.collect_set("wmin")).alias("wfp")
    )


def winnow_pairs(
    df: DataFrame,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Near-duplicate candidate pairs: documents sharing ≥ ``min_shared``
    winnow fingerprints. Scale shape mirrors MinHash-LSH candidates: the
    fingerprint arrays explode to (id, fp) rows so the self-join shuffles
    only int pairs, never document bodies; the groupBy counts shared
    fingerprints per pair."""
    ex = winnow_fingerprints_df(df, text_col, id_col, k, w).select(
        "id", F.explode("wfp").alias("h")
    )
    a = ex.select(F.col("id").alias("id_a"), "h")
    b = ex.select(F.col("id").alias("id_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


#: PII patterns for free-text scrubbing — the training-corpus analog of
#: the reference's column transformers (emails → RandomEmail, phones →
#: RandomPhoneNumber, …, but for PII embedded INSIDE document text).
#: Restricted to regex syntax Java and RE2 interpret identically (no
#: lookarounds, no backrefs) so a SQL oracle can replay the scrub.
#: Ordered: more-specific patterns run first (cards before generic
#: digit runs, emails before bare domains).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("credit_card", r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b",
     "[CARD]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("phone", r"\(?\b[0-9]{3}\)?[- .][0-9]{3}[- .][0-9]{4}\b", "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
]


def scrub_pii(text: Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Redact PII inside free text: each pattern rewrites to its typed
    placeholder, in PII_PATTERNS order. Pure chained regexp_replace —
    codegen'd, shuffle-free, and replayable in any RE2-compatible SQL
    engine."""
    out = text
    for name, pat, repl in PII_PATTERNS:
        if kinds is None or name in kinds:
            out = F.regexp_replace(out, pat, repl)
    return out


def pii_hits(text: Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Total count of PII redactions (corpus QA signal: rank documents by
    leakage before filtering/scrubbing). Counts each pattern against the
    text AFTER earlier patterns have been scrubbed — mirroring
    ``scrub_pii``'s sequential rewrites — so overlapping matches (an IP
    inside an email address) count once, exactly like they redact once."""
    total = F.lit(0)
    cur = text
    for name, pat, repl in PII_PATTERNS:
        if kinds is None or name in kinds:
            total = total + F.regexp_count(cur, F.lit(pat))
            cur = F.regexp_replace(cur, pat, repl)
    return total


def term_frequencies(
    df: DataFrame, text_col: str = "text", top_k: int | None = None
) -> DataFrame:
    """Corpus-wide term and document frequencies: (term, tf, df_docs).

    The wordcount shape done right at scale: explode(tokens) shuffles
    (term, 1) rows with map-side partial aggregation, so even stopword
    skew (the/and/of dominating) arrives at reducers pre-combined.
    df_docs counts each term once per document (distinct within doc
    BEFORE the shuffle — dedup happens map-side in the token array).
    ``top_k`` orders by (tf desc, term) and limits — a final
    single-partition top-k, fine for the head of a vocabulary."""
    t = F.col(text_col)
    # one scan: per-document term counts (doc identity via a per-row id),
    # then per-term sum→tf / count→df_docs — no second tokenize, no join.
    # The row id stages BEFORE the explode (its own projection): inlined
    # next to the generator it would be evaluated per generated row,
    # giving every token a distinct "document".
    ex = (
        df.withColumn("__rid", F.monotonically_increasing_id())
        .select("__rid", F.explode(tokens(t)).alias("term"))
        .filter(F.col("term") != "")
    )
    per_doc = ex.groupBy("__rid", "term").agg(F.count(F.lit(1)).alias("c"))
    out = per_doc.groupBy("term").agg(
        F.sum("c").alias("tf"),
        F.count(F.lit(1)).alias("df_docs"),
    )
    if top_k is not None:
        out = out.orderBy(F.desc("tf"), F.asc("term")).limit(top_k)
    return out


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition-based quality signals (the Gopher/C4-style filters):

    - ``dup_line_frac``: fraction of non-empty lines that are duplicates
      of an earlier line — boilerplate/navigation detector. Pure
      expression (array vs array_distinct sizes), no shuffle.
    - ``top_bigram_frac``: occurrences of the document's most frequent
      word bigram over total bigrams — loops/keyword-stuffing detector.
      Per-document mode needs a count per (doc, bigram): explode +
      two-level aggregation, so the shuffle carries (doc_id, bigram)
      rows with map-side combine — never O(doc²) in-document work.

    Output: (id, n_lines, dup_line_frac, n_bigrams, top_bigram_frac).
    """
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    dup_frac = F.when(n_lines > 0,
                      F.round((n_lines - F.size(F.array_distinct(lines)))
                              / n_lines.cast("double"), 4)
                      ).otherwise(F.lit(0.0))
    base = df.select(
        F.col(id_col).alias("id"),
        n_lines.alias("n_lines"),
        dup_frac.alias("dup_line_frac"),
        tokens(t).alias("__toks"),
    )
    toks = F.col("__toks")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(1))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(1))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = base.select("id", F.explode_outer(bigrams).alias("bg"))
    per_bg = ex.groupBy("id", "bg").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_bg.groupBy("id").agg(
        F.max(F.when(F.col("bg").isNotNull(), F.col("c")).otherwise(0))
        .alias("top_c"),
        F.sum(F.when(F.col("bg").isNotNull(), F.col("c")).otherwise(0))
        .alias("n_bigrams"),
    )
    return (
        base.drop("__toks")
        .join(per_doc, "id")
        .select(
            "id", "n_lines", "dup_line_frac", "n_bigrams",
            F.when(F.col("n_bigrams") > 0,
                   F.round(F.col("top_c") / F.col("n_bigrams").cast("double"),
                           4)).otherwise(F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


def analyze(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Text profile of a documents table: one scan+project for the
    scalar stats, plus the distributed winnow pipeline (see
    ``winnow_fingerprints_df`` — the pure-expression winnow runs
    interpreted at ~25 ms/document) joined back on the document id
    (a staged row id when ``id_col`` is absent)."""
    from greenmask_spark.session import spread_input

    t = F.col(text_col)
    has_id = id_col in df.columns
    base = df if has_id else df.withColumn(
        "__aid", F.monotonically_increasing_id())
    key = id_col if has_id else "__aid"
    # spread the regex-heavy stats across cores — a small documents
    # parquet is one row group → one task otherwise; at real scale the
    # input already yields >= parallelism splits and this is a no-op
    base = spread_input(base)
    wf = winnow_fingerprints_df(base, text_col, key).withColumnsRenamed(
        {"id": key})
    # STAGED projections, not one: every helper below re-derives the
    # token array from raw text, and higher-order filter() lambdas get
    # distinct variable ids, so a single flat projection evaluates
    # split(trim(lower(text))) ~25x per row (measured in the plan) and
    # codegen subexpression elimination cannot unify them. Landing the
    # array and the per-language hit counts in their OWN projections
    # (the _gopher_metrics convention) pins one tokenize + one filter
    # pass per language; CollapseProject keeps non-cheap multiply-
    # referenced aliases staged. Every derived expression below is the
    # exact tree the plain helpers build — values are bit-identical.
    pre = base.select(
        "*",
        tokens(t).alias("__toks"),
        F.length(F.trim(t)).alias("__trimlen"),
        F.length(t).alias("__len"),
        F.length(F.regexp_replace(F.lower(t), "[^a-z0-9 ]", ""))
        .alias("__alnum"),
        F.length(F.regexp_replace(F.trim(t), r"\s+", "")).alias("__nows"),
    )
    toks = F.col("__toks")

    def _hits_col(lg: str) -> Column:
        arr = F.array(*[F.lit(wd) for wd in STOPWORDS[lg]])
        return F.size(F.filter(toks, lambda tok: F.array_contains(arr, tok)))

    hit = pre.select(
        "*",
        F.size(toks).alias("__ntokraw"),
        *[_hits_col(lg).alias(f"__hits_{lg}") for lg in LANG_ORDER],
    )
    n_tok = F.when(F.col("__trimlen") == 0, F.lit(0)).otherwise(
        F.col("__ntokraw"))
    hits = {lg: F.col(f"__hits_{lg}") for lg in LANG_ORDER}
    sw = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        hits["en"] / n_tok.cast("double"))
    pr = F.when(F.col("__len") == 0, F.lit(0.0)).otherwise(
        (F.col("__len") - F.col("__alnum")) / F.col("__len").cast("double"))
    mwl = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.col("__nows") / n_tok.cast("double"))
    quality = F.round(
        F.lit(0.4) * F.least(F.lit(1.0), sw / F.lit(0.4))
        + F.lit(0.3) * (F.lit(1.0) - pr)
        + F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(0.3))
        .otherwise(F.lit(0.0)),
        4,
    )
    stats = hit.select(
        *df.columns, *([] if has_id else ["__aid"]),
        n_tok.alias("n_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        F.round(sw, 4).alias("sw_ratio"),
        F.round(pr, 4).alias("p_ratio"),
        quality.alias("quality"),
        _lang_id_from_hits(hits).alias("lang_pred"),
        fingerprint(t).alias("fp"),
    )
    # NULL-text docs never survive winnow_fingerprints_df's inner explode,
    # so the left join leaves wfp NULL; guard both derived columns to stay
    # NULL (Spark's concat_ws treats a NULL array as empty, which would
    # digest to sha256('') while a SQL oracle yields NULL)
    has_wfp = F.col("wfp").isNotNull()
    return (
        stats.join(wf, key, "left")
        .select(
            "*",
            F.when(has_wfp, F.size("wfp")).alias("n_wfp"),
            F.when(has_wfp, _digest_of_set(F.col("wfp"))).alias("wfp_digest"),
        )
        .drop("wfp", *([] if has_id else ["__aid"]))
    )


def corpus_summary(
    df: DataFrame,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Per-group corpus report (the Dolma-style curation summary):
    document count, token totals/percentiles, mean quality, and the
    dominant language with its share. One scan + one map-side-combined
    aggregation; exact percentiles use Spark's native percentile
    aggregate (switch to percentile_approx when a single group's token
    multiset would dominate reducer memory at extreme scale).
    """
    t = F.col(text_col)
    per_doc = df.select(
        *group_cols,
        token_count(t).alias("__nt"),
        quality_score(t).alias("__q"),
        lang_id(t).alias("__lang"),
    )
    base = per_doc.groupBy(*group_cols).agg(
        F.count("*").alias("n_docs"),
        F.sum("__nt").alias("total_tokens"),
        F.round(F.avg("__nt"), 2).alias("avg_tokens"),
        F.expr("CAST(percentile(__nt, 0.5) AS BIGINT)").alias("p50_tokens"),
        F.expr("CAST(percentile(__nt, 0.95) AS BIGINT)").alias("p95_tokens"),
        F.round(F.avg("__q"), 4).alias("avg_quality"),
    )
    from pyspark.sql import Window

    lang = (
        per_doc.groupBy(*group_cols, "__lang").count()
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(*group_cols)
                .orderBy(F.desc("count"), F.asc("__lang"))
            ),
        )
        .filter(F.col("__rk") == 1)
        .select(
            *group_cols,
            F.col("__lang").alias("top_lang"),
            F.col("count").alias("top_lang_docs"),
        )
    )
    # eqNullSafe join keys: a NULL group (missing source) must not
    # vanish from the report — an equi-join never matches NULL = NULL
    cond = None
    lang_r = lang
    for g in group_cols:
        lang_r = lang_r.withColumnsRenamed({g: f"__r_{g}"})
        term = base[g].eqNullSafe(lang_r[f"__r_{g}"])
        cond = term if cond is None else (cond & term)
    return (
        base.join(lang_r, cond)
        .drop(*[f"__r_{g}" for g in group_cols])
        .withColumn(
            "top_lang_share",
            F.round(F.col("top_lang_docs") / F.col("n_docs"), 4),
        )
        .drop("top_lang_docs")
    )


def linear_text_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bias: float = 0.0,
    normalize: bool = True,
) -> DataFrame:
    """fastText-style linear classifier score per document: sum of
    per-token weights (looked up in a ``(term, weight)`` table) plus a
    bias, squashed through a sigmoid — the standard
    quality/domain-classifier filter stage (CCNet-style "looks like
    wiki-referenced text" scoring) with user-supplied weights.

    Scale shape: explode(tokens) ⋈ broadcast(weights) → groupBy(doc)
    sum with map-side combine. The weights table is vocabulary-sized
    (≤ a few hundred thousand rows) → broadcast; unknown tokens score 0.
    ``normalize`` divides by the token count (mean weight) so long
    documents don't dominate by length alone.

    Output: (id, score in (0,1)).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    # duplicate term rows (incl. case-collisions after lowering) would
    # fan each matching token out across the join; sum them first — the
    # linear-model-correct combine for repeated features
    w = weights.select(
        F.lower(F.col("term")).alias("term"),
        F.col("weight").cast("double").alias("weight"),
    ).groupBy("term").agg(F.sum("weight").alias("weight"))
    scored = toks.join(F.broadcast(w), "term", "left")
    agg = scored.groupBy("id").agg(
        F.sum(F.coalesce("weight", F.lit(0.0))).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    z = (F.col("s") / F.col("n") if normalize else F.col("s")) + F.lit(bias)
    out = agg.select(
        "id", (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("score")
    )
    # token-less documents never survive the explode — restore them with
    # the prior score sigmoid(bias) so the id universe is preserved and a
    # downstream min_score filter makes an explicit decision about them
    import math

    ids = df.select(F.col(id_col).alias("id"))
    prior = 1.0 / (1.0 + math.exp(-bias))
    return ids.join(out, "id", "left").select(
        "id", F.coalesce("score", F.lit(prior)).alias("score")
    )


#: (entity, replacement) — the named entities that actually occur at
#: volume in web text; numeric forms are handled by pattern.
#: '&amp;' is NOT in this list: it must decode LAST (after the numeric
#: pass) or '&amp;lt;' double-unescapes to '<' instead of the literal
#: '&lt;' the HTML displays — the standard unescape ordering.
_HTML_ENTITIES = (
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&ndash;", "–"),
    ("&mdash;", "—"), ("&hellip;", "…"), ("&copy;", "©"), ("&reg;", "®"),
)


def strip_html(text: Column, collapse_ws: bool = True) -> Column:
    """Markup removal for crawled documents — the cleaning stage that
    runs before any text analysis on raw HTML:

    - ``<script>``/``<style>``/``<noscript>`` blocks drop WITH their
      content (their text is never prose);
    - HTML comments and all remaining tags drop; block-level closers
      (``</p>``, ``</div>``, ``<br>``, ``</li>``, headers, ``</tr>``)
      become newlines so paragraph structure survives for line-level
      dedup;
    - common named entities and numeric character references decode.

    Pure chained ``regexp_replace`` — whole-stage codegen, one pass per
    pattern, no Python. This is tag REMOVAL, not content extraction: a
    readability/trafilatura-grade main-content extractor (DOM scoring)
    is out of scope and would be a mapInPandas kernel behind the same
    column contract."""
    t = text
    # script/style/noscript with content (DOTALL via (?s); case-insensitive)
    t = F.regexp_replace(
        t, r"(?is)<(script|style|noscript)\b[^>]*>.*?</\1\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    # block-level boundaries → newline (before the generic tag strip)
    t = F.regexp_replace(
        t, r"(?i)</(p|div|li|tr|h[1-6]|blockquote|section|article)\s*>"
           r"|<br\s*/?\s*>", "\n")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    # named entities decode (per-match chr() of numeric refs is not
    # expressible in regexp_replace; the common named set covers the
    # bulk of web text and the numeric leftovers blank to a space)
    for ent, rep in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"&#[xX]?[0-9a-fA-F]{1,8};", " ")
    # ampersand decodes LAST so '&amp;lt;' yields the literal '&lt;'
    # (and '&amp;#65;' survives the numeric blanking) — double-unescape
    # would otherwise corrupt escaped markup shown as text
    t = F.replace(t, F.lit("&amp;"), F.lit("&"))
    if collapse_ws:
        t = F.regexp_replace(t, r"[ \t\r\f]+", " ")
        t = F.regexp_replace(t, r" ?\n ?", "\n")
        t = F.regexp_replace(t, r"\n{3,}", "\n\n")
        # trim() strips spaces only — newlines at the edges need regex
        t = F.regexp_replace(t, r"^\s+|\s+$", "")
    return t


def normalize_text(
    text: Column,
    form: str = "NFKC",
    lowercase: bool = True,
    strip_punct: bool = False,
    collapse_ws: bool = True,
) -> Column:
    """Unicode-normalize text for dedup robustness: NFKC folds width
    variants, ligatures and compatibility forms (ﬁ→fi, ４２→42, Ａ→A) so
    visually-identical documents hash identically. The Unicode pass is a
    pandas UDF (Spark has no normalizer expression); casing,
    punctuation stripping and whitespace collapsing stay JVM-side
    expressions around it. Run this BEFORE minhash/simhash/exact dedup
    when the corpus mixes sources with different normalization habits.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    out = _norm(text)
    if lowercase:
        out = F.lower(out)
    if strip_punct:
        out = F.regexp_replace(out, r"[^\w\s]", " ")
    if collapse_ws:
        out = F.regexp_replace(F.trim(out), r"\s+", " ")
    return out


def bm25_scores(
    df: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    include_misses: bool = True,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a query string
    (Robertson & Spärck Jones; the standard probabilistic-IDF form
    with the +1 floor Lucene uses is NOT applied — negative-IDF terms
    appearing in >half the corpus contribute negatively, the classic
    behavior). The lexical twin of the embedding ANN operators: corpus
    exploration ("which training docs look like this benchmark
    prompt") without an embedding column.

        idf(t)   = ln((N - df_t + 0.5) / (df_t + 0.5))
        score(d) = Σ_t idf(t) · tf_td·(k1+1) / (tf_td + k1·(1−b+b·|d|/avgdl))

    Scale shape: the query's distinct terms broadcast (a query is a
    few tokens); documents explode ONLY matching terms (the explode is
    semi-joined by the broadcast before any shuffle), per-(doc, term)
    tf aggregates map-side, and the two corpus scalars (N, avgdl)
    ride a broadcast 1-row frame. Documents with no query term score
    0.0 and never shuffle. Output: (id, score) for every document —
    unless ``include_misses=False``, which emits ONLY documents
    matching ≥1 query term and skips the full-corpus ids left-join
    entirely (at 100 TB that join shuffles every document id just to
    emit 0.0 rows; the top-k path never needs them).
    """
    q_terms = [
        t for t in query.strip().lower().split() if t
    ]
    from greenmask_spark.session import share_subtree

    if not q_terms:
        raise ValueError("bm25_scores: empty query")
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(t,) for t in sorted(set(q_terms))], "term string"
    )
    base = df.select(
        F.col(id_col).alias("id"),
        tokens(F.col(text_col)).alias("__toks"),
    ).select(
        "id",
        F.filter(F.col("__toks"), lambda t: t != "").alias("__toks"),
    )
    # corpus stats: one agg → a 1-row broadcast (N, avgdl)
    stats = base.agg(
        F.count(F.lit(1)).alias("N"),
        F.avg(F.size("__toks")).alias("avgdl"),
    )
    ex = (
        base.select("id", F.size("__toks").alias("dl"),
                    F.explode("__toks").alias("term"))
        .join(F.broadcast(qdf), "term")  # only query terms survive
    )
    tf = ex.groupBy("id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # tf feeds BOTH the per-term document-frequency aggregate and the
    # scoring join -- unmaterialized, the whole corpus explode + terms
    # semi-join + groupBy subtree executes twice (once inside the dfreq
    # broadcast build, once for the scores): a full extra corpus pass
    # at any scale. share_subtree persists the (matching postings
    # only) frame so it computes exactly once, inside the broadcast
    # job; the r13 lazy localCheckpoint bought the same single
    # execution but paid FULL physical planning at plan-build time
    # (profiled at >1 s per call locally — the one touched query the
    # r13 driver bench measured slower), which persist() does not.
    tf = share_subtree(tf, "bm25.tf")
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_t")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("N") - F.col("df_t") + 0.5)
                  / (F.col("df_t") + 0.5)),
        )
        .withColumn(
            "__s",
            F.col("idf") * F.col("tf") * (k1 + 1.0)
            / (F.col("tf")
               + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("id").agg(F.sum("__s").alias("score"))
    )
    if not include_misses:
        return scored
    ids = base.select("id")
    return ids.join(scored, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def _bm25_qterms(spark, queries, query_id_col: str, query_col: str):
    """Normalize a dict / (query_id, query) frame into the DISTINCT
    (query_id, term) frame every multi-query BM25 path broadcasts —
    tokenized IN Spark, so the term set never hits the driver."""
    if isinstance(queries, dict):
        queries = spark.createDataFrame(
            [(k, v) for k, v in sorted(queries.items())],
            f"{query_id_col} string, {query_col} string",
        )
    return (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(
                F.filter(tokens(F.col(query_col)), lambda t: t != "")
            ).alias("term"),
        )
        .distinct()
    )


def _bm25_score_hits(hits, dfreq, stats, qterms, k1: float, b: float):
    """Shared BM25 scoring tail over (id, dl, term, tf) posting rows:
    Robertson idf from the broadcast per-term df_t, tf normalization
    against the 1-row (N, avgdl) stats, the ONLY per-query fan-out
    (matching rows × the queries containing that term), and the
    map-side-combined per-(query, doc) sum. One definition — the
    corpus-scan and prebuilt-index paths must stay score-identical."""
    return (
        hits.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("N") - F.col("df_t") + 0.5)
                  / (F.col("df_t") + 0.5)),
        )
        .withColumn(
            "__s",
            F.col("idf") * F.col("tf") * (k1 + 1.0)
            / (F.col("tf")
               + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .join(F.broadcast(qterms), "term")
        .groupBy("query_id", "id").agg(F.sum("__s").alias("score"))
    )


def _bm25_with_misses(ids, qterms, scored):
    """0.0 rows for every (query, non-matching doc): ids × queries,
    left-joined against the scored hits. N×Q rows — scale callers
    keep the default include_misses=False."""
    pairs = ids.crossJoin(
        F.broadcast(qterms.select("query_id").distinct())
    )
    return pairs.join(scored, ["query_id", "id"], "left").select(
        "query_id", "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def bm25_scores_multi(
    df: DataFrame,
    queries,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    include_misses: bool = False,
) -> DataFrame:
    """Okapi BM25 of every document against MANY queries in ONE pass
    over the corpus → (query_id, id, score). Real decontamination and
    retrieval runs score thousands of benchmark prompts; looping
    ``bm25_scores`` would scan the corpus once per prompt — this
    shares everything that is query-independent and fans out only the
    final per-(doc, term) rows.

    ``queries``: a DataFrame with (``query_id_col``, ``query_col``)
    columns, or a plain dict {query_id: query string}. Queries
    tokenize IN Spark (explode over the queries frame — the term set
    never hits the driver), so a prompt set of any size works; the
    (query_id, term) frame broadcasts, so it should stay
    broadcast-sized (tens of MB ≈ millions of prompt terms — far past
    any benchmark suite).

    Shared across queries (the single-pass structure):
      - corpus stats (N, avgdl): one aggregate, 1-row broadcast;
      - the matching-terms explode: semi-joined by the DISTINCT term
        union over ALL queries before any shuffle — each document row
        explodes once, not once per query;
      - per-(doc, term) tf and per-term df_t: computed once (both are
        query-independent).
    Only the final broadcast join against (query_id, term) fans rows
    out per query, and the per-(query, doc) sum is map-side combined.

    Per-query results are IDENTICAL to ``bm25_scores(df, q)`` (same
    idf, same tf normalization; the same df_t — document frequency is
    a corpus property, not a query property). A query with no
    nonempty terms yields no rows (with misses, 0.0 rows — the
    single-query path raises instead, but a frame-driven batch run
    must not die on one malformed prompt). ``include_misses=True``
    emits 0.0 for every (query, non-matching doc): that is N×Q rows —
    at scale keep the default False (the top-k path never needs
    misses)."""
    from greenmask_spark.session import share_subtree

    qterms = _bm25_qterms(df.sparkSession, queries,
                          query_id_col, query_col)
    terms = qterms.select("term").distinct()
    base = df.select(
        F.col(id_col).alias("id"),
        F.filter(tokens(F.col(text_col)), lambda t: t != "").alias("__toks"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("N"),
        F.avg(F.size("__toks")).alias("avgdl"),
    )
    ex = (
        base.select("id", F.size("__toks").alias("dl"),
                    F.explode("__toks").alias("term"))
        .join(F.broadcast(terms), "term")  # union of ALL query terms
    )
    tf = ex.groupBy("id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # tf feeds BOTH the per-term document-frequency aggregate and the
    # scoring join -- unmaterialized, the whole corpus explode + terms
    # semi-join + groupBy subtree executes twice (once inside the dfreq
    # broadcast build, once for the scores): a full extra corpus pass
    # at any scale. share_subtree persists the (matching postings
    # only) frame so it computes exactly once, inside the broadcast
    # job; the r13 lazy localCheckpoint bought the same single
    # execution but paid FULL physical planning at plan-build time
    # (profiled at >1 s per call locally — the one touched query the
    # r13 driver bench measured slower), which persist() does not.
    tf = share_subtree(tf, "bm25_multi.tf")
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_t")
    )
    scored = _bm25_score_hits(tf, dfreq, stats, qterms, k1, b)
    if not include_misses:
        return scored
    return _bm25_with_misses(base.select("id"), qterms, scored)


def bm25_topk_multi(
    df: DataFrame,
    queries,
    n: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-n documents per query over the one-pass multi-query scores
    → (query_id, id, score, rank). One window rank partitioned by
    query_id (ties to the smallest id) — the per-query analog of
    ``bm25_topk``'s TakeOrderedAndProject, still a single exchange for
    all queries together."""
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("id"))
    return (
        bm25_scores_multi(df, queries, text_col, id_col,
                          query_id_col, query_col, k1, b)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(n))
    )


def bm25_build_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Build the persistable BM25 inverted index → (term, id, tf, dl):
    every distinct (document, term) with its term frequency and the
    document length. ONE corpus scan; after this, document text never
    needs to be re-tokenized — ``bm25_scores_indexed`` answers any
    number of query batches from the postings alone, and
    ``bm25_save_index`` buckets them by term so repeated retrieval
    runs read a sorted, pre-partitioned table (the lexical analog of
    ``pq_encode``'s codes-are-the-index contract).

    Documents with zero nonempty tokens have no postings, so the
    default corpus stats derived from an index exclude them — pass
    explicit ``stats`` to ``bm25_scores_indexed`` for exact parity
    with ``bm25_scores`` over corpora containing empty documents."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.filter(tokens(F.col(text_col)), lambda t: t != "").alias("__toks"),
    )
    return (
        base.select("id", F.size("__toks").alias("dl"),
                    F.explode("__toks").alias("term"))
        .groupBy("term", "id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("term", "id", "tf", "dl")
    )


def bm25_index_stats(index: DataFrame) -> DataFrame:
    """(N, avgdl) of the corpus an index was built from — derived from
    the distinct (id, dl) pairs, so it covers every document with at
    least one token. 1-row frame, broadcast into the scorer."""
    return (
        index.select("id", "dl").distinct()
        .agg(F.count(F.lit(1)).alias("N"), F.avg("dl").alias("avgdl"))
    )


def bm25_save_index(index: DataFrame, table: str,
                    num_buckets: int = 32) -> None:
    """Persist a ``bm25_build_index`` frame bucketed AND sorted by
    ``term`` (same shape as ``save_ngram_lm``): the postings shuffle
    exactly once — at save time — and every later retrieval batch
    reads only a broadcast-filtered scan of the sorted buckets, no
    matter how many query batches run against it."""
    from greenmask_spark.sources.io import write_bucketed

    write_bucketed(index, table, ["term"], num_buckets,
                   sort_cols=["term"])


def bm25_load_index(spark, table: str) -> DataFrame:
    """Read back a ``bm25_save_index`` table (named symmetrically)."""
    return spark.table(table)


def bm25_scores_indexed(
    index: DataFrame,
    queries,
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    stats: DataFrame | None = None,
    include_misses: bool = False,
) -> DataFrame:
    """BM25 over a prebuilt inverted index → (query_id, id, score) —
    identical scores to ``bm25_scores_multi`` over the source corpus
    (same idf/df_t/tf math; df_t counts postings per term, which IS
    document frequency), but the corpus is never re-read or
    re-tokenized: the only scan is the postings, semi-joined by the
    broadcast union of query terms before any shuffle.

    ``queries``: dict or (query_id, query) DataFrame, as in
    ``bm25_scores_multi``. ``stats``: optional 1-row (N, avgdl) frame
    (e.g. persisted at index-build time); defaults to
    ``bm25_index_stats(index)`` — exact unless the source corpus had
    zero-token documents, which have no postings to derive from. With
    derived stats, pass a MATERIALIZED index (loaded table /
    persisted / checkpointed): an unpersisted build plan would
    re-execute once for the stats pass and once for the scorer.
    ``include_misses=True`` emits 0.0 rows for non-matching documents
    by ranging over the index's distinct ids (an extra distinct over
    the postings — the top-k path never needs it)."""
    qterms = _bm25_qterms(index.sparkSession, queries,
                          query_id_col, query_col)
    st = stats if stats is not None else bm25_index_stats(index)
    hits = index.join(F.broadcast(qterms.select("term").distinct()), "term")
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    scored = _bm25_score_hits(hits, dfreq, st, qterms, k1, b)
    if not include_misses:
        return scored
    return _bm25_with_misses(index.select("id").distinct(),
                             qterms, scored)


def bm25_topk(
    df: DataFrame,
    query: str,
    n: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    include_misses: bool = False,
) -> DataFrame:
    """Top-n documents by BM25 relevance (ties broken by id for
    determinism). The ordering limit compiles to TakeOrderedAndProject
    — no global sort exchange.

    ``include_misses=False`` (default) ranks only documents matching
    ≥1 query term, skipping ``bm25_scores``'s full-corpus ids
    left-join — the scale path. The one semantic difference: if fewer
    than ``n`` documents match, the result has fewer than ``n`` rows
    instead of padding with arbitrary 0.0-score misses (every-term-
    negative-IDF corpora, where misses can outrank matches, are the
    other degenerate case — pass ``include_misses=True`` if you need
    exact parity with the dense scoring)."""
    return (
        bm25_scores(df, query, text_col, id_col, k1, b,
                    include_misses=include_misses)
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(int(n))
    )


def entropy_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    decimals: int = 4,
) -> DataFrame:
    """Per-document character-distribution quality signals (the
    Dolma/RedPajama tagger family): Shannon entropy of the character
    histogram, distinct-character count, and the modal character's
    frequency fraction.

    Low ``char_entropy`` flags degenerate pages — padding runs,
    ASCII-art, repeated-character spam — that length/stopword gates
    (gopher_filter) and repetition gates (repetition_profile, which
    measure LINE and BIGRAM structure) both miss; ``top_char_frac``
    is the same signal in ratio form and catches single-character
    floods even when the tail of the histogram keeps entropy nonzero.

    Output: (id, n_chars, distinct_chars, char_entropy, top_char_frac)
    with one row per INPUT row — empty/NULL text yields NULL metrics
    (unscorable, not low-quality: the lm_score/ngram_novelty NULL
    contract).

    Cross-engine float parity (the dsir_weights rule): the only float
    work is ln() on exact integer counts, ONE ordered fold, and two
    divisions. The per-doc fold Σ cnt·ln(cnt) runs SEQUENTIALLY over
    the histogram sorted by character (F.aggregate is a left fold;
    DuckDB replays it as list_sum(list(... ORDER BY c)) — the ordered
    list_sum primitive the DSIR/PQ oracles already rely on), then
    H = (ln(n) − Σ/n) / ln(2), rounded. ln parity between the JVM and
    DuckDB is already load-bearing for the BM25/classifier/DSIR rows.

    Scale shape: characters explode to (id, char) slivers — the
    term_frequencies shape, ONE map-side-combined count shuffle to
    (id, char, cnt) rows (≤ alphabet-size per doc), a second sliver
    agg to one histogram row per doc, and an id-keyed join back.
    Document bodies never cross an exchange; the fold runs over
    per-doc histograms bounded by the alphabet (≤ a few hundred
    entries), so the interpreted-HOF cost is per-DISTINCT-char, not
    per-char. Characters are codepoint-based on both engines
    (substr semantics match for BMP text).
    """
    from greenmask_spark.session import spread_input

    t = F.col(text_col)
    base = df.select(F.col(id_col).alias("id"))
    ex = (
        spread_input(df)
        .select(F.col(id_col).alias("id"), t.alias("t"))
        .filter(F.col("t").isNotNull() & (F.length("t") > 0))
        # split on the empty pattern yields the codepoint array in ONE
        # O(n) pass (no trailing empty element, codepoint-aware like
        # substr — probed incl. surrogate pairs); the previous
        # sequence(1, length) + substr(t, i, 1) form paid an O(i)
        # codepoint seek per position (O(n^2) per doc) and carried the
        # full body into every exploded row
        .select("id", F.explode(F.split("t", "")).alias("c"))
    )
    hist = ex.groupBy("id", "c").agg(F.count(F.lit(1)).alias("cnt"))
    ln2 = F.log(F.lit(2.0))
    prof = (
        hist.groupBy("id")
        .agg(
            F.sum("cnt").alias("n"),
            F.count(F.lit(1)).cast("int").alias("distinct_chars"),
            F.max("cnt").alias("top"),
            F.sort_array(F.collect_list(F.struct("c", "cnt"))).alias("h"),
        )
        .select(
            "id",
            F.col("n").alias("n_chars"),
            "distinct_chars",
            F.round(
                (
                    F.log(F.col("n").cast("double"))
                    - F.aggregate(
                        "h",
                        F.lit(0.0),
                        lambda acc, x: acc
                        + x["cnt"].cast("double")
                        * F.log(x["cnt"].cast("double")),
                    )
                    / F.col("n")
                )
                / ln2,
                decimals,
            ).alias("char_entropy"),
            F.round(
                F.col("top").cast("double") / F.col("n"), decimals
            ).alias("top_char_frac"),
        )
    )
    return base.join(prof, "id", "left").select(
        F.col("id").alias(id_col),
        "n_chars", "distinct_chars", "char_entropy", "top_char_frac",
    )


#: Frozen Unicode script classes for script_profile — part of the
#: operator contract (the oracle replays the same codepoint ranges).
#: Disjoint BMP ranges; literal chars (not escape syntax) so the Java
#: and RE2 regex engines receive identical patterns.
SCRIPT_CLASSES: dict[str, str] = {
    "latin": "A-Za-z",
    "cyrillic": "Ѐ-ӿ",
    "greek": "Ͱ-Ͽ",
    "arabic": "؀-ۿ",
    "cjk": "一-鿿",
    "kana": "぀-ヿ",
    "hangul": "가-힣",
}

#: Non-script character classes reported alongside (never argmax'd).
AUX_CLASSES: dict[str, str] = {
    "digit": "0-9",
    "space": " \t\n\r",
}

#: Deterministic argmax tie order (first wins ties) — frozen.
SCRIPT_ORDER = ("latin", "cyrillic", "greek", "arabic",
                "cjk", "kana", "hangul")


def _class_count(t: Column, char_class: str) -> Column:
    """Codepoints of ``t`` inside a regex character class, counted as
    the length drop after deleting them — one codegen'd
    regexp_replace, SQL-identical in DuckDB (length() is codepoints
    in both engines; all classes are BMP ranges)."""
    return F.length(t) - F.length(
        F.regexp_replace(t, f"[{char_class}]", "")
    )


def script_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    decimals: int = 4,
) -> DataFrame:
    """Per-document Unicode-script composition (the FineWeb/CC-Net
    script gate, orthogonal to the stopword ``lang_id``): the fraction
    of characters in each frozen script class (SCRIPT_CLASSES), digit
    and whitespace fractions (AUX_CLASSES), and ``main_script`` — the
    argmax script with ties broken in SCRIPT_ORDER, ``'und'`` when no
    script character occurs. A Latin-stopword language model scoring a
    Cyrillic page is garbage-in; this is the cheap gate that routes
    pages to the right per-script pipeline (and drops mixed-script
    spam, a documented crawl-quality signal).

    Empty/NULL text yields NULL metrics (the entropy_profile /
    lm_score unscorable-not-bad contract). Fractions round to
    ``decimals``.

    Scale shape: ONE scan of pure codegen'd expressions — a
    regexp_replace length-drop per class (9 passes over the string,
    all fused into the same whole-stage-codegen span), zero shuffle,
    zero Python: the gopher_filter cost floor. SQL parity: identical
    codepoint ranges, identical length()-drop counting, HALF_UP
    rounds on exact integer/length ratios."""
    from greenmask_spark.session import spread_input

    df = spread_input(df)
    t = F.col(text_col)
    n = F.length(t)
    scorable = t.isNotNull() & (n > 0)

    counts = {k: _class_count(t, c) for k, c in SCRIPT_CLASSES.items()}
    aux = {k: _class_count(t, c) for k, c in AUX_CLASSES.items()}

    best = F.lit("und")
    best_n = F.lit(0)
    for name in reversed(SCRIPT_ORDER):
        # reversed + >= keeps earlier SCRIPT_ORDER entries on ties
        # (the lang_id argmax idiom)
        cond = counts[name] > F.lit(0)
        better = counts[name] >= best_n
        best = F.when(cond & better, F.lit(name)).otherwise(best)
        best_n = F.greatest(best_n, counts[name])

    cols = [F.col(id_col), F.when(scorable, n).alias("n_chars")]
    for name in SCRIPT_ORDER:
        cols.append(
            F.when(
                scorable,
                F.round(counts[name].cast("double") / n, decimals),
            ).alias(f"{name}_frac")
        )
    for name in sorted(AUX_CLASSES):
        cols.append(
            F.when(
                scorable,
                F.round(aux[name].cast("double") / n, decimals),
            ).alias(f"{name}_frac")
        )
    cols.append(F.when(scorable, best).alias("main_script"))
    return df.select(*cols)
