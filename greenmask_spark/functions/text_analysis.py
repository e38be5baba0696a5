"""Text analysis operators for training-data pipelines.

All pure Column expressions (JVM-side, codegen'd): token counting,
quality scoring, n-gram-heuristic language ID, document fingerprinting.
Each has a deliberate SQL-portable formulation so the DuckDB oracle can
replay it exactly (see __spark_entry__.oracle_sql).

At 100 TB these run as a single scan+project over the documents table —
no shuffle, no Python.
"""

from __future__ import annotations

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


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword hits; ties break in LANG_ORDER;
    all-zero → 'und' (undetermined)."""
    hits = {lg: stopword_hits(text, lg) for lg in LANG_ORDER}
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


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: sha256 of case/whitespace
    normalized text (reference analog: hash engine §2.6 applied to docs)."""
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.sha2(norm, 256)


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text profile of a documents table."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        F.round(stopword_ratio(t), 4).alias("sw_ratio"),
        F.round(punct_ratio(t), 4).alias("p_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fp"),
    )
