"""Hypothesis fuzz: BM25 and phrase matching vs python references over
random corpora — the same differential discipline as the filter and
percentile fuzzers."""

import math

import pytest
from hypothesis import given, settings, strategies as st

from columnar_spark.operators import fulltext as FT

_VOCAB = ["a", "bb", "ccc", "scan", "vector", "x1"]


@settings(max_examples=10, deadline=None)
@given(
    corpus=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=10).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    qterms=st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=3, unique=True),
)
def test_fuzz_bm25_vs_reference(spark, corpus, qterms):
    docs = list(enumerate(corpus))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    query = " ".join(qterms)
    got = {
        r["doc_id"]: r["score"]
        for r in FT.bm25_scores(df, FT.tokenize_query(query)).collect()
    }
    want = FT.bm25_reference(docs, query)
    assert set(got) == set(want)
    for d, s in want.items():
        assert math.isclose(got[d], s, rel_tol=1e-12), (d, got[d], s)


@settings(max_examples=10, deadline=None)
@given(
    corpus=st.lists(
        st.lists(st.sampled_from(_VOCAB[:4]), min_size=0, max_size=8).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    phrase=st.lists(st.sampled_from(_VOCAB[:4]), min_size=1, max_size=3).map(" ".join),
)
def test_fuzz_phrase_vs_reference(spark, corpus, phrase):
    import re

    docs = list(enumerate(corpus))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    words = [t for t in re.split(FT.TOKEN_SPLIT_RE, phrase.lower()) if t]
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in FT.phrase_match(df, phrase).collect()
    }
    want = {}
    for i, s in docs:
        t = [x for x in re.split(FT.TOKEN_SPLIT_RE, s.lower()) if x]
        n = sum(
            1
            for j in range(len(t) - len(words) + 1)
            if t[j : j + len(words)] == words
        )
        if n:
            want[i] = n
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcdeiosu", min_size=1, max_size=8),
        min_size=1,
        max_size=12,
    )
)
def test_fuzz_stemmer_vs_python(spark, words):
    from pyspark.sql import functions as F

    from columnar_spark.operators.fulltext import stem_s, stem_s_py

    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)], "i long, w string")
    got = {r["i"]: r["s"] for r in df.select("i", stem_s(F.col("w")).alias("s")).collect()}
    for i, w in enumerate(words):
        assert got[i] == stem_s_py(w), (w, got[i], stem_s_py(w))


def test_analyzer_chain(spark):
    from pyspark.sql import functions as F

    from columnar_spark.operators.fulltext import tokenize_analyzed

    df = spark.createDataFrame(
        [(1, "The Queries and Tables pass batches of rows")], "i long, t string"
    )
    out = df.select(
        tokenize_analyzed(
            F.col("t"), stem=True, stopwords=("the", "and", "of")
        ).alias("toks")
    ).first()["toks"]
    assert out == ["query", "table", "pass", "batche", "row"]


def test_analyzed_index_roundtrip(spark, tmp_path):
    """An index built with an analyzer (stopwords + stemmer) applies the
    SAME analyzer to queries, appends, and the integrity audit."""
    from columnar_spark.operators import fulltext as FT

    docs = [
        (1, "the tables and rows"),
        (2, "table row"),
        (3, "the unrelated words here"),
    ]
    p = str(tmp_path / "an.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(p)
    analyzer = {"stem": True, "stopwords": ["the", "and"]}
    FT.write_text_index(spark, p, analyzer=analyzer)

    # "tables" stems to "table": both docs 1 and 2 match the query
    hits = {r["doc_id"] for r in FT.bm25_search_indexed(spark, p, "tables").collect()}
    assert hits == {1, 2}
    # stopword-only query is empty after analysis
    import pytest as _pytest

    with _pytest.raises(ValueError):
        FT.bm25_search_indexed(spark, p, "the and")

    # audit is analyzer-aware (stored tf excludes stopwords)
    assert FT.check_text_index(spark, p) == []

    # append maintains the analyzer
    batch = spark.createDataFrame([(4, "more tables arriving")], "doc_id long, text string")
    batch.write.mode("append").parquet(p)
    FT.append_to_text_index(spark, p, batch)
    assert FT.check_text_index(spark, p) == []
    hits = {r["doc_id"] for r in FT.bm25_search_indexed(spark, p, "table").collect()}
    assert hits == {1, 2, 4}


def test_stream_ingest_maintains_text_index(spark, tmp_path):
    """Streaming ingest of document batches keeps the .ftidx sidecar in
    lockstep — the same per-batch merge contract as the stats/vector/
    value sidecars; the audit passes after every restart-resume."""
    import shutil

    from columnar_spark.operators import fulltext as FT
    from columnar_spark.streaming.ingest import stream_ingest

    dst = str(tmp_path / "docs.parquet")
    src = tmp_path / "src"
    src.mkdir()
    stage = tmp_path / "stage"
    ckpt = str(tmp_path / "ckpt")

    b1 = [(1, "spark scan merge"), (2, "vector scan slow")]
    b2 = [(3, "table row column"), (4, "scan scan scan")]

    def add(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
            str(stage / name)
        )
        for j, f in enumerate(sorted((stage / name).glob("*.parquet"))):
            shutil.copy(f, src / f"{name}_{j}.parquet")

    add("b1", b1)
    q = stream_ingest(spark, str(src), dst, ckpt, "doc_id long, text string")
    q.awaitTermination(120)
    FT.write_text_index(spark, dst)  # index starts after first batch
    assert FT.check_text_index(spark, dst) == []

    add("b2", b2)
    q = stream_ingest(spark, str(src), dst, ckpt, "doc_id long, text string")
    q.awaitTermination(120)
    # the sink folded batch 2 into the index: audit green, search sees it
    assert FT.check_text_index(spark, dst) == []
    hits = {r["doc_id"] for r in FT.bm25_search_indexed(spark, dst, "scan", k=10).collect()}
    assert hits == {1, 2, 4}
