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
