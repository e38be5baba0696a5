"""Distributed n-gram language-model quality scoring (CCNet-style).

The classic web-corpus quality filter scores every document with a
language model trained on a trusted reference corpus (CCNet / RedPajama
use KenLM perplexity); documents whose perplexity is far from the
reference distribution are boilerplate, gibberish, or the wrong
language. This module is the Spark-native version of that stage:

- ``train_ngram_lm``: n-gram counts (orders 1..n + a total row) from a
  reference corpus — one groupBy per order, map-side combined; the
  model IS a DataFrame, so a 10B-gram model never touches the driver.
- ``ngram_lm_score``: per-document mean log10 probability + perplexity
  under **Stupid Backoff** (Brants et al. 2007, "Large Language Models
  in Machine Translation" — the standard scheme for DISTRIBUTED LMs
  precisely because it needs no normalization pass): score(w | ctx) =
  count(ctx·w)/count(ctx) when the full n-gram is present, else
  alpha · score(w | shorter ctx), down to alpha^(n-1) · count(w)/total,
  with an OOV floor of alpha^(n-1)/total.

Scale shape: documents explode to (id, gram) windows — codegen'd
split/element_at/concat, no HOFs — and each backoff order is one
equi-join against that order's count table (broadcast below the
threshold, shuffle otherwise; AQE decides). Shuffle payloads are
(id, short-gram-string, int) rows, never document bodies. The final
per-doc aggregate is a map-side-combined avg.

Reference parity note: greenmask has no LM operator — this serves the
LLM-training-data pipeline (SURVEY §2.10), same tier as quality_score /
linear_text_score.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from greenmask_spark.functions.text_analysis import tokens


def _gram_expr(toks, start, k):
    """k consecutive tokens of ``toks`` joined by ' ', starting at the
    1-based position Column ``start`` — pure codegen (element_at +
    concat_ws)."""
    return F.concat_ws(
        " ", *[F.element_at(toks, start + j) for j in range(k)]
    )


def doc_ngrams(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, gram) rows — every window of ``n`` consecutive whitespace
    tokens (lowercased). Documents shorter than ``n`` tokens emit
    nothing."""
    toks = tokens(F.col(text_col))
    # split("") yields [""]: a blank document must emit zero windows,
    # not one phantom empty-string token (__ne rides along because the
    # original text column is projected away below)
    nonempty = (F.length(F.trim(F.col(text_col))) > 0).alias("__ne")
    n_win = F.when(F.col("__ne"), F.size(F.col("__t")) - n + 1) \
             .otherwise(F.lit(0))
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("__t"), nonempty)
        .select(
            "id", "__t",
            F.explode(
                F.when(n_win >= 1, F.sequence(F.lit(1), n_win))
                .otherwise(F.array().cast("array<int>"))
            ).alias("i"),
        )
        .select("id", _gram_expr(F.col("__t"), F.col("i"), n).alias("gram"))
    )


def train_ngram_lm(
    corpus: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(order, gram, cnt) count tables for orders 1..n, plus the
    order-0 total row ('' → total token count). Entirely lazy; persist
    (``ngram_lm_score`` does this for you by default), write to
    parquet, or ``save_ngram_lm`` when the same model scores many
    shards.

    ONE corpus scan for all orders: each token position explodes its
    valid window lengths (k ≤ min(n, tokens_left)) and the gram is a
    codegen'd array_join(slice(...)) — the earlier per-order
    formulation scanned and re-tokenized the corpus once per order,
    which at a 100 TB training corpus is n-1 scans too many. The
    order-0 total is a second (cheap) aggregation branch over the same
    exploded stream."""
    toks = tokens(F.col(text_col))
    # split("") yields [""]: a blank document must emit zero windows
    nonempty = (F.length(F.trim(F.col(text_col))) > 0).alias("__ne")
    ln = F.size(F.col("__t"))
    ex = (
        corpus.select(toks.alias("__t"), nonempty)
        .select(
            "__t",
            F.explode(
                F.when(F.col("__ne"), F.sequence(F.lit(1), ln))
                .otherwise(F.array().cast("array<int>"))
            ).alias("i"),
        )
        .select(
            "__t", "i",
            # valid orders at position i: k = 1 .. min(n, L - i + 1)
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(n), F.size("__t") - F.col("i") + 1),
                )
            ).alias("order"),
        )
        .select(
            "order",
            F.array_join(
                F.slice(F.col("__t"), F.col("i"), F.col("order")), " "
            ).alias("gram"),
        )
    )
    counts = ex.groupBy("order", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = (
        ex.filter(F.col("order") == 1)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit(0).alias("order"), F.lit("").alias("gram"), "cnt")
    )
    return counts.unionByName(total)


def save_ngram_lm(model: DataFrame, table: str,
                  num_buckets: int = 32) -> None:
    """Persist a ``train_ngram_lm`` model bucketed by ``gram`` — the
    model-reuse shape for scoring many shards against one reference
    model. ``ngram_lm_score``'s per-order lookups are equi-joins on
    ``gram``; against a bucketed table scan Spark joins WITHOUT
    re-shuffling the model side (only the shard's much smaller gram
    stream exchanges onto the bucketing), so a 10B-gram model is
    shuffled exactly once — at save time — no matter how many shards
    score against it. Load with ``load_ngram_lm`` and pass to
    ``ngram_lm_score`` unchanged (keep ``broadcast_model=False`` so the
    bucketing, not a broadcast, carries the join).

    Sorted within buckets by gram: the sort-merge join reads each
    bucket pre-sorted, skipping the per-task sort."""
    from greenmask_spark.sources.io import write_bucketed

    write_bucketed(model, table, ["gram"], num_buckets,
                   sort_cols=["gram"])


def load_ngram_lm(spark, table: str) -> DataFrame:
    """The bucketed-model twin of ``spark.table`` — named so pipelines
    read symmetrically with ``save_ngram_lm``. The per-order filters
    inside ``ngram_lm_score`` preserve the table's bucketing."""
    return spark.table(table)


def ngram_lm_score(
    df: DataFrame,
    model: DataFrame,
    n: int = 2,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = False,
    reuse: str = "auto",
    _persisted: list | None = None,
) -> DataFrame:
    """(id, lm_logprob, ppl, n_scored) — mean log10 Stupid-Backoff
    score over every full-context window (targets at positions n..len;
    documents with fewer than ``n`` tokens get NULLs, n_scored = 0).

    ``model`` is a ``train_ngram_lm`` frame of order >= ``n``. One join
    per backoff order (numerators) + one per context order
    (denominators); ``broadcast_model=True`` forces broadcast joins for
    models known to fit (else AQE decides from sizes).

    The model feeds 2n lookups and Spark does not share the subtree
    across joins — an unpersisted computed model would re-scan and
    re-aggregate its TRAINING CORPUS once per lookup (measured: 6
    corpus scans at n=2). ``reuse`` controls this: ``"persist"`` caches
    the model counts (vocab-bounded — a sliver of the corpus) before
    fan-out, ``"recompute"`` leaves the plan untouched (right when the
    model is already a materialized parquet/bucketed table: caching
    would trade pruned bucketed scans for an InMemoryTableScan), and
    the default ``"auto"`` persists exactly when the model plan
    contains an aggregation (i.e. it is computed, not stored). As with
    ``ngram_jaccard``, pass a ``_persisted`` list to receive the cache
    handle for explicit ``unpersist()`` after your action."""
    if reuse == "auto":
        plan = model._jdf.queryExecution().optimizedPlan().toString()
        reuse = "persist" if "Aggregate" in plan else "recompute"
    if reuse == "persist":
        from pyspark import StorageLevel

        model = model.persist(StorageLevel.MEMORY_AND_DISK)
        if _persisted is not None:
            _persisted.append(model)
    elif reuse != "recompute":
        raise ValueError(f"unknown reuse {reuse!r}: auto|persist|recompute")
    toks = tokens(F.col(text_col))
    # split("") yields [""]: a blank document must emit zero windows,
    # not one phantom empty-string token (__ne rides along because the
    # original text column is projected away below)
    nonempty = (F.length(F.trim(F.col(text_col))) > 0).alias("__ne")
    n_win = F.when(F.col("__ne"), F.size(F.col("__t")) - n + 1) \
             .otherwise(F.lit(0))
    base = (
        df.select(F.col(id_col).alias("id"), toks.alias("__t"), nonempty)
        .select(
            "id", "__t",
            F.explode(
                F.when(n_win >= 1, F.sequence(F.lit(1), n_win))
                .otherwise(F.array().cast("array<int>"))
            ).alias("i"),
        )
    )
    # window [i, i+n-1]: numerator gram of order k = last k tokens,
    # its context = the k-1 tokens before the target
    sel = ["id"]
    for k in range(1, n + 1):
        sel.append(
            _gram_expr(F.col("__t"), F.col("i") + (n - k), k).alias(f"g{k}")
        )
        if k >= 2:
            sel.append(
                _gram_expr(F.col("__t"), F.col("i") + (n - k), k - 1)
                .alias(f"c{k}")
            )
    grams = base.select(*sel)

    def tbl(order, cnt_name):
        t = model.filter(F.col("order") == order).select(
            F.col("gram"), F.col("cnt").alias(cnt_name))
        return F.broadcast(t) if broadcast_model else t

    j = grams
    for k in range(1, n + 1):
        j = j.join(tbl(k, f"n{k}"), j[f"g{k}"] == F.col("gram"), "left") \
             .drop("gram")
        if k >= 2:
            j = j.join(tbl(k - 1, f"d{k}"), j[f"c{k}"] == F.col("gram"),
                       "left").drop("gram")
    total = model.filter(F.col("order") == 0).select(
        F.col("cnt").alias("__total"))
    j = j.crossJoin(F.broadcast(total))  # one row — a literal in effect

    # Stupid Backoff: highest order whose numerator exists wins; the
    # unigram level always resolves (OOV floor 1/total)
    branches = []
    for k in range(n, 1, -1):
        branches.append((
            F.col(f"n{k}").isNotNull(),
            F.lit(alpha ** (n - k))
            * F.col(f"n{k}") / F.col(f"d{k}").cast("double"),
        ))
    uni = F.lit(alpha ** (n - 1)) * (
        F.coalesce(F.col("n1"), F.lit(1)) / F.col("__total").cast("double")
    )
    score = uni
    for cond, val in reversed(branches):
        score = F.when(cond, val).otherwise(score)

    per_doc = (
        j.select("id", F.log10(score).alias("__lp"))
        .groupBy("id")
        .agg(
            F.round(F.avg("__lp"), 6).alias("lm_logprob"),
            F.count(F.lit(1)).alias("n_scored"),
        )
        .withColumn(
            "ppl", F.round(F.pow(F.lit(10.0), -F.col("lm_logprob")), 4)
        )
    )
    ids = df.select(F.col(id_col).alias("id"))
    return (
        ids.join(per_doc, "id", "left")
        .na.fill({"n_scored": 0})
        .select("id", "lm_logprob", "ppl", "n_scored")
    )


def lm_quality_filter(
    df: DataFrame,
    model: DataFrame,
    max_ppl: float,
    n: int = 2,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_unscored: bool = False,
    broadcast_model: bool = False,
    reuse: str = "auto",
    _persisted: list | None = None,
) -> DataFrame:
    """Drop documents whose Stupid-Backoff perplexity under the
    reference model exceeds ``max_ppl`` (the CCNet head/middle/tail
    split reduced to one threshold). Documents too short to score
    (fewer than n tokens) drop unless ``keep_unscored``."""
    scored = ngram_lm_score(
        df, model, n, alpha, text_col, id_col, broadcast_model,
        reuse=reuse, _persisted=_persisted,
    )
    cond = F.col("ppl") <= float(max_ppl)
    if keep_unscored:
        cond = cond | F.col("ppl").isNull()
    keep = scored.filter(cond).select(F.col("id").alias(id_col))
    return df.join(keep, id_col, "left_semi")


def _py_stupid_backoff_logprob(text_tokens, counts, n, alpha, total):
    """Reference implementation for tests: mean log10 score of the full
    n-gram windows of ``text_tokens`` given dict ``counts`` {gram: cnt}."""
    lps = []
    for i in range(len(text_tokens) - n + 1):
        win = text_tokens[i:i + n]
        s = None
        for k in range(n, 0, -1):
            gram = " ".join(win[n - k:])
            ctx = " ".join(win[n - k:-1])
            if k >= 2:
                if gram in counts and ctx in counts:
                    s = (alpha ** (n - k)) * counts[gram] / counts[ctx]
                    break
            else:
                s = (alpha ** (n - 1)) * counts.get(gram, 1) / total
        lps.append(math.log10(s))
    return sum(lps) / len(lps) if lps else None
