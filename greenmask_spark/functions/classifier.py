"""Quality-classifier TRAINING — closes the loop on
``linear_text_score`` (text_analysis.py), which scores documents with a
user-supplied (term, weight) table: this module learns that table from
labeled examples, the GPT-3/CCNet "looks like reference text"
classifier stage (positive = trusted corpus, negative = raw crawl).

Spark-first: tokenization is the same ``tokens()`` expression the
scorer uses (so train/score features agree exactly), counts come from
MLlib ``CountVectorizer`` (vocabulary-bounded), the model is MLlib
``LogisticRegression``. Only the vocab_size coefficient vector ever
reaches the driver — same budget class as the k×dim IVF centroids.
Scoring then runs through ``linear_text_score(normalize=False,
bias=intercept)``: z = Σ coef(term)·count(term) + intercept, exactly
the LR decision function, so the broadcast-join scorer reproduces
``model.transform`` probabilities bit-for-bit minus float noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from greenmask_spark.functions.text_analysis import tokens


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    vocab_size: int = 4096,
    min_df: float = 1.0,
    reg: float = 0.0,
    max_iter: int = 25,
) -> tuple[DataFrame, float]:
    """Learn a (term, weight) table + bias from a frame with a binary
    ``label`` column (1 = high quality). Returns ``(weights_df, bias)``
    ready for ``linear_text_score(df, weights_df, normalize=False,
    bias=bias)``.

    ``vocab_size`` bounds both model size and the driver-side
    coefficient materialization; raise it for large-vocabulary domains,
    or raise ``min_df`` to drop hapax terms.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import CountVectorizer

    toks = labeled.select(
        F.col(label_col).cast("double").alias("label"),
        tokens(F.col(text_col)).alias("toks"),
    )
    cv = CountVectorizer(
        inputCol="toks", outputCol="features",
        vocabSize=int(vocab_size), minDF=float(min_df),
    )
    cv_model = cv.fit(toks)
    feats = cv_model.transform(toks)
    lr = LogisticRegression(
        featuresCol="features", labelCol="label",
        regParam=float(reg), maxIter=int(max_iter),
    )
    lr_model = lr.fit(feats)
    coefs = lr_model.coefficients.toArray()
    spark = labeled.sparkSession
    weights = spark.createDataFrame(
        [(t, float(w)) for t, w in zip(cv_model.vocabulary, coefs)],
        "term string, weight double",
    )
    return weights, float(lr_model.intercept)


def train_nb_weights(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    alpha: float = 1.0,
    min_df: int = 1,
    vocab_size: int = 4096,
    id_col: str | None = None,
) -> tuple[DataFrame, float]:
    """Closed-form Bernoulli-Naive-Bayes log-odds training — the
    deterministic, oracle-checkable twin of ``train_quality_classifier``
    (LR's iterative float aggregation is reproducible only to float
    noise; these weights are exact ratios of document counts, so the
    same corpus yields bit-identical weights on any engine):

        weight(t) = ln((df_pos(t)+α)/(n_pos+2α))
                  − ln((df_neg(t)+α)/(n_neg+2α))
        bias      = ln((n_pos+α)/(n_neg+α))

    with df_pos/df_neg = positive/negative documents CONTAINING the
    term (Bernoulli presence, not counts) and Laplace smoothing α.
    The returned ``(weights_df, bias)`` feeds ``linear_text_score``
    exactly like the LR table. Vocabulary is bounded by ``vocab_size``
    (top total document frequency, ties broken by term) and floored at
    ``min_df`` — the same driver-materialization budget class as the
    LR path (and here not even the weights reach the driver; only the
    two class-count scalars do).

    Scale shape: one explode → per-(doc,term) distinct → per-term agg;
    document bodies never shuffle (the distinct carries (id, label,
    term) rows). Weights stay a DataFrame end-to-end."""
    from greenmask_spark.functions.text_analysis import tokens

    doc = (
        F.col(id_col) if id_col is not None
        # assigned in its own projection BEFORE the explode so every
        # exploded term of a document shares one id (inside the same
        # select as a generator, each OUTPUT row would get its own)
        else F.monotonically_increasing_id()
    )
    base = labeled.select(
        doc.alias("__doc"),
        F.col(label_col).cast("int").alias("label"),
        F.col(text_col).alias("__text"),
    )
    counts = base.agg(
        F.sum("label").alias("n_pos"),
        F.sum(1 - F.col("label")).alias("n_neg"),
    ).head()
    n_pos, n_neg = int(counts["n_pos"] or 0), int(counts["n_neg"] or 0)
    ex = (
        base.select(
            "__doc", "label",
            F.explode(tokens(F.col("__text"))).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    per_term = ex.groupBy("term").agg(
        F.sum("label").alias("df_pos"),
        F.sum(1 - F.col("label")).alias("df_neg"),
        F.count(F.lit(1)).alias("df"),
    )
    if min_df > 1:
        per_term = per_term.filter(F.col("df") >= int(min_df))
    vocab = per_term.orderBy(F.desc("df"), F.asc("term")).limit(
        int(vocab_size)
    )
    a = float(alpha)
    weights = vocab.select(
        "term",
        F.col("df_pos").cast("bigint").alias("df_pos"),
        F.col("df_neg").cast("bigint").alias("df_neg"),
        (
            F.log((F.col("df_pos") + a) / F.lit(n_pos + 2 * a))
            - F.log((F.col("df_neg") + a) / F.lit(n_neg + 2 * a))
        ).alias("weight"),
    )
    import math

    bias = math.log((n_pos + a) / (n_neg + a))
    return weights, float(bias)
