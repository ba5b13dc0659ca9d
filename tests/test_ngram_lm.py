"""Bigram LM quality scoring vs a python reference, plus hypothesis fuzz."""

import math

import pytest
from hypothesis import given, settings, strategies as st

from columnar_spark.operators.ngram_lm import (
    bigram_lm_reference,
    fit_bigram_lm,
    score_bigram_lm,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox"),
    (3, "zzz yyy xxx unrelated gibberish tokens qqq"),
    (4, "the the the the"),
    (5, "single"),
    (6, ""),
]


def _spark_scores(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    c2, c1, v = fit_bigram_lm(df)
    return {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
        for r in score_bigram_lm(df, c2, c1, v).collect()
    }


def test_matches_python_reference(spark):
    got = _spark_scores(spark, DOCS)
    want = bigram_lm_reference(DOCS)
    assert set(got) == set(want)  # docs 5, 6 have no bigrams on both sides
    for i, (n, avg) in want.items():
        assert got[i][0] == n
        assert math.isclose(got[i][1], avg, rel_tol=1e-12), (i, got[i], avg)


def test_fluent_beats_gibberish(spark):
    got = _spark_scores(spark, DOCS)
    # repeated in-corpus phrasing scores higher than one-off gibberish
    assert got[2][1] > got[3][1]


@settings(max_examples=10, deadline=None)
@given(
    corpus=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "eee"]), min_size=0, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_fuzz_vs_reference(spark, corpus):
    docs = list(enumerate(corpus))
    got = _spark_scores(spark, docs)
    want = bigram_lm_reference(docs)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert math.isclose(got[i][1], want[i][1], rel_tol=1e-12)
