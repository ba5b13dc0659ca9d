"""Percolate (stored queries match documents): batch semantics vs a
python reference, duplicate-term queries, streaming parity."""

import re

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators import fulltext as FT
from columnar_spark.streaming.percolate import stream_percolate

DOCS = [
    (1, "spark scan merge join fast fast table"),
    (2, "vector scan slow merge merge merge row"),
    (3, "the quick brown fox jumps over a lazy dog"),
    (4, "scan scan scan scan scan"),
    (5, "vector vector join table row column"),
    (6, ""),
]
STORED = [
    ("alert_scan_vector", "scan vector"),
    ("alert_fox", "fox"),
    ("alert_table_row", "table row"),
    ("alert_dup_terms", "scan scan"),  # dedupes to {scan}
]


def _py_percolate(docs, stored):
    out = set()
    for qid, qtext in stored:
        need = {t for t in re.split(FT.TOKEN_SPLIT_RE, qtext.lower()) if t}
        for i, s in docs:
            toks = {t for t in re.split(FT.TOKEN_SPLIT_RE, s.lower()) if t}
            if need and need <= toks:
                out.add((qid, i))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_percolate_matches_reference(docs_df):
    got = {
        (r["query_id"], r["doc_id"]) for r in FT.percolate(docs_df, STORED).collect()
    }
    assert got == _py_percolate(DOCS, STORED)
    # spot checks: AND semantics, duplicate-term query == single term
    assert ("alert_scan_vector", 2) in got and ("alert_scan_vector", 4) not in got
    assert ("alert_dup_terms", 4) in got


def test_percolate_validates_input(docs_df):
    with pytest.raises(ValueError):
        FT.percolate(docs_df, [])
    with pytest.raises(ValueError):
        FT.percolate(docs_df, [("q", "...")])


def test_stream_percolate_equals_batch(spark, tmp_path):
    import shutil

    stage = tmp_path / "stage"
    flat = tmp_path / "docs"
    flat.mkdir()
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def add(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
            str(stage / name)
        )
        for j, f in enumerate(sorted((stage / name).glob("*.parquet"))):
            shutil.copy(f, flat / f"{name}_{j}.parquet")

    add("b1", DOCS[:3])
    q = stream_percolate(spark, str(flat), STORED, out_path, ckpt)
    q.awaitTermination(120)
    add("b2", DOCS[3:])
    q = stream_percolate(spark, str(flat), STORED, out_path, ckpt)
    q.awaitTermination(120)

    streamed = {
        (r["query_id"], r["doc_id"]) for r in spark.read.parquet(out_path).collect()
    }
    assert streamed == _py_percolate(DOCS, STORED)


BOOL_STORED = [
    ("b_and", "scan AND vector"),
    ("b_not", "table AND NOT fox"),
    ("b_mixed", "(fox AND dog) OR (merge AND NOT join)"),
    ("b_pure_not", "NOT scan"),
]


def _py_percolate_bool(docs, stored):
    out = set()
    for qid, q in stored:
        for i, _ in docs:
            if i in {d for d in FT.match_boolean_reference(docs, q)}:
                out.add((qid, i))
    return out


def test_percolate_boolean_matches_reference(docs_df):
    got = {
        (r["query_id"], r["doc_id"])
        for r in FT.percolate_boolean(docs_df, BOOL_STORED).collect()
    }
    assert got == _py_percolate_bool(DOCS, BOOL_STORED)
    # pure NOT matches the empty doc too
    assert ("b_pure_not", 6) in got


@pytest.mark.parametrize("bad", [[], [("q", "scan AND")]])
def test_percolate_boolean_validates(docs_df, bad):
    with pytest.raises(ValueError):
        FT.percolate_boolean(docs_df, bad)
