"""Phrase matching over positional postings; MMR diversification."""

import re

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators import fulltext as FT

DOCS = [
    (1, "fast scan fast scan merge"),
    (2, "scan fast nothing here"),
    (3, "fast fast scan end"),
    (4, "the fast scan the fast scan the fast scan"),
    (5, "entirely unrelated words"),
    (6, "fast"),
]


def _py_phrase(docs, phrase):
    words = [t for t in re.split(FT.TOKEN_SPLIT_RE, phrase.lower()) if t]
    out = {}
    for i, s in docs:
        t = [x for x in re.split(FT.TOKEN_SPLIT_RE, s.lower()) if x]
        n = sum(
            1
            for j in range(len(t) - len(words) + 1)
            if t[j : j + len(words)] == words
        )
        if n:
            out[i] = n
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_phrase_two_words(docs_df):
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in FT.phrase_match(docs_df, "fast scan").collect()
    }
    assert got == _py_phrase(DOCS, "fast scan") == {1: 2, 3: 1, 4: 3}


def test_phrase_three_words_and_duplicate_terms(docs_df):
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in FT.phrase_match(docs_df, "fast scan fast").collect()
    }
    assert got == _py_phrase(DOCS, "fast scan fast") == {1: 1}

    # duplicate-term phrase: "fast fast"
    got2 = {
        r["doc_id"]: r["n_occurrences"]
        for r in FT.phrase_match(docs_df, "fast fast").collect()
    }
    assert got2 == _py_phrase(DOCS, "fast fast") == {3: 1}


def test_phrase_absent(docs_df):
    assert FT.phrase_match(docs_df, "merge nothing").count() == 0
    with pytest.raises(ValueError):
        FT.phrase_match(docs_df, "  ...  ")


def test_phrase_single_word_equals_tf(docs_df):
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in FT.phrase_match(docs_df, "fast").collect()
    }
    assert got == _py_phrase(DOCS, "fast")


def test_mmr_prefers_diversity():
    # Three near-identical high-relevance vectors and one orthogonal
    # lower-relevance vector: MMR at lam=0.5 must pick the orthogonal
    # one second.
    cands = [
        (1, 0.99, [1.0, 0.0]),
        (2, 0.98, [0.999, 0.01]),
        (3, 0.97, [0.998, 0.02]),
        (4, 0.60, [0.0, 1.0]),
    ]
    sel = FT.mmr_rerank(cands, k=3, lam=0.5)
    assert [s[0] for s in sel][:2] == [1, 4]


def test_mmr_lambda_one_is_pure_relevance():
    cands = [(i, 1.0 - i * 0.1, [float(i), 1.0]) for i in range(5)]
    sel = FT.mmr_rerank(cands, k=3, lam=1.0)
    assert [s[0] for s in sel] == [0, 1, 2]


def test_mmr_deterministic_ties():
    cands = [(2, 0.5, [1.0, 0.0]), (1, 0.5, [0.0, 1.0]), (3, 0.5, [0.5, 0.5])]
    sel = FT.mmr_rerank(cands, k=2, lam=1.0)
    assert [s[0] for s in sel] == [1, 2]


def test_near_match(docs_df):
    # DOCS[0] = "fast scan fast scan merge": fast/merge min gap 2
    got = {
        r["doc_id"]: r["min_gap"]
        for r in FT.near_match(docs_df, "fast", "merge", slop=2).collect()
    }
    assert got[1] == 2
    # doc 4 = "the fast scan the fast scan the fast scan" has no merge
    assert 4 not in got


def test_near_match_slop_boundary(spark):
    df = spark.createDataFrame(
        [(1, "a x x x b"), (2, "a b"), (3, "b x a")], "doc_id long, text string"
    )
    within4 = {r["doc_id"]: r["min_gap"] for r in FT.near_match(df, "a", "b", 4).collect()}
    assert within4 == {1: 4, 2: 1, 3: 2}
    within1 = {r["doc_id"] for r in FT.near_match(df, "a", "b", 1).collect()}
    assert within1 == {2}
