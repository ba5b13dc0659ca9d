"""Boolean match DSL: parser edge cases, Spark-vs-python differential,
hypothesis fuzz over random corpora and expressions."""

import pytest
from hypothesis import given, settings, strategies as st

from columnar_spark.operators import fulltext as FT

DOCS = [
    (1, "spark scan merge join fast fast table"),
    (2, "vector scan slow merge merge merge row"),
    (3, "the quick brown fox jumps over a lazy dog"),
    (4, "scan scan scan scan scan"),
    (5, "vector vector join table row column"),
    (6, "fox dog table column row"),
    (7, ""),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _spark_ids(docs_df, q):
    return {r["doc_id"] for r in FT.match_boolean(docs_df, q).collect()}


@pytest.mark.parametrize(
    "q",
    [
        "scan AND vector",
        "scan vector",  # implicit AND
        "scan OR fox",
        "NOT scan",
        "(scan AND vector) OR (fox AND NOT dog)",
        "NOT (scan OR fox)",
        "scan AND NOT (vector OR fox)",
        "table AND row AND column",
        "fox and not dog",  # lowercase keywords
    ],
)
def test_matches_python_reference(docs_df, q):
    assert _spark_ids(docs_df, q) == FT.match_boolean_reference(DOCS, q)


def test_empty_doc_matches_pure_not(docs_df):
    assert 7 in _spark_ids(docs_df, "NOT scan")


def test_parser_errors(docs_df):
    for bad in ["", "AND", "scan AND", "(scan", "scan)", "NOT"]:
        with pytest.raises(ValueError):
            FT.parse_bool_query(bad)


_VOCAB = ["scan", "vector", "fox", "dog", "table", "row"]


@st.composite
def bool_exprs(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        return draw(st.sampled_from(_VOCAB))
    op = draw(st.sampled_from(["AND", "OR", "NOT", "GROUP"]))
    if op == "NOT":
        return f"NOT {draw(bool_exprs(depth=depth + 1))}"
    if op == "GROUP":
        return f"({draw(bool_exprs(depth=depth + 1))})"
    return f"{draw(bool_exprs(depth=depth + 1))} {op} {draw(bool_exprs(depth=depth + 1))}"


@settings(max_examples=15, deadline=None)
@given(
    expr=bool_exprs(),
    corpus=st.lists(
        st.lists(st.sampled_from(_VOCAB), max_size=6).map(" ".join),
        min_size=1,
        max_size=8,
    ),
)
def test_fuzz_bool_match(spark, expr, corpus):
    docs = list(enumerate(corpus))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"] for r in FT.match_boolean(df, expr).collect()}
    assert got == FT.match_boolean_reference(docs, expr)
