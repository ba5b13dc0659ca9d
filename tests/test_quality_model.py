"""Learned quality filter: trains on heuristic labels, separates
good/bad text on a held-out split, and the scorer is a single-scan
transform."""

import random

from pyspark.sql import functions as F

from columnar_spark.operators.quality_model import (
    model_quality_filter,
    score_quality,
    train_quality_model,
)

_STOP = "the of and to in a is it for on".split()
_WORDS = "market system value report signal research window analysis growth model".split()


def _good(rnd):
    words = []
    for _ in range(rnd.randint(30, 60)):
        words.append(rnd.choice(_STOP) if rnd.random() < 0.4 else rnd.choice(_WORDS))
    return " ".join(words)


def _bad(rnd):
    # repetitive, stopword-free, symbol-heavy junk
    w = rnd.choice(["zzzz", "@@##", "xx11", "????"])
    return " ".join([w] * rnd.randint(20, 50))


def _corpus(spark, n=300, seed=1):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        good = i % 2 == 0
        rows.append((i, _good(rnd) if good else _bad(rnd), 1.0 if good else 0.0))
    return spark.createDataFrame(rows, "doc_id: long, text: string, label: double")


def test_trained_filter_separates_heldout(spark):
    train = _corpus(spark, n=300, seed=1)
    test = _corpus(spark, n=200, seed=2)

    model = train_quality_model(train)
    scored = score_quality(model, test)
    assert "quality_prob" in scored.columns
    # held-out separation: mean prob of good >> bad
    agg = scored.groupBy("label").agg(F.avg("quality_prob").alias("p")).collect()
    p = {r["label"]: r["p"] for r in agg}
    assert p[1.0] > 0.8 and p[0.0] < 0.2, p

    kept = model_quality_filter(model, test, threshold=0.5)
    labels = [r["label"] for r in kept.collect()]
    assert labels and sum(labels) / len(labels) > 0.95  # almost all kept are good
    # and it keeps most of the good rows
    assert len(labels) >= 80


def test_scorer_plan_has_no_shuffle(spark):
    df = _corpus(spark, n=100, seed=3)
    model = train_quality_model(df)
    scored = score_quality(model, df)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
