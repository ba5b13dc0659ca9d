"""Model-based quality filtering — the learned rung above the
rule-based quality_score (functions/text.py:66).

Production LLM-data pipelines (CCNet, GPT-3's quality classifier,
FineWeb-Edu) filter web text with a LEARNED quality model: label a
small set (human ratings, or "reference corpus vs crawl"), train a
lightweight linear classifier over cheap text features, score the full
corpus, keep the top band. This module is that loop on Spark ML
primitives:

- features: the engine's own codegen'd text statistics (token count,
  alpha ratio, stopword ratio, mean word length, repetition proxy) —
  no tokenizer model needed, identical featurization at train and
  score time because it IS the same Column expressions;
- trainer: pyspark.ml LogisticRegression (distributed L-BFGS — fit
  scales with executors; a quality model is tiny, the DATA pass is the
  cost);
- scorer: Pipeline.transform — whole-stage codegen'd feature exprs
  into an MLlib model; one scan, no shuffle, keep/drop is a filter on
  the calibrated probability.

The reference has no counterpart (corpus curation is host-side); this
extends the north-star training-pipeline operator set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from columnar_spark.functions import text as CT

FEATURE_COLS = [
    "f_tokens",
    "f_chars_per_token",
    "f_alpha",
    "f_stopword",
    "f_mean_wl",
    "f_uniq_ratio",
]


def featurize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the quality feature columns — pure codegen expressions."""
    t = F.col(text_col)
    toks = CT.tokens(t)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    return (
        df.withColumn("f_tokens", F.size(toks).cast("double"))
        .withColumn("f_chars_per_token", CT.char_count(t) / n_tok)
        .withColumn("f_alpha", CT.alpha_ratio(t))
        .withColumn("f_stopword", CT.stopword_ratio(t))
        .withColumn("f_mean_wl", CT.mean_word_length(t))
        .withColumn("f_uniq_ratio", F.size(F.array_distinct(toks)) / n_tok)
    )


def train_quality_model(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    seed: int = 42,
):
    """Fit the quality classifier on a labeled frame (label 1 = keep).
    Returns a fitted pyspark.ml PipelineModel whose transform() adds
    `quality_prob` to any frame with `text_col`."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = featurize(labeled, text_col)
    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="__features")
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        predictionCol="__pred",
        probabilityCol="__prob",
        rawPredictionCol="__raw",
        maxIter=50,
        regParam=0.01,
    )
    model = Pipeline(stages=[assembler, lr]).fit(feats)
    return model


def score_quality(model, df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append `quality_prob` (P[keep]) to every row; drops the model's
    intermediate columns. One scan, no shuffle."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(featurize(df, text_col))
    return scored.withColumn(
        "quality_prob", vector_to_array(F.col("__prob")).getItem(1)
    ).drop("__features", "__pred", "__prob", "__raw", *FEATURE_COLS)


def model_quality_filter(
    model, df: DataFrame, threshold: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """Keep rows the model scores above `threshold`."""
    return score_quality(model, df, text_col).filter(
        F.col("quality_prob") >= threshold
    )
