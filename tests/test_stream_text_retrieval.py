"""Batch BM25 (multi-query single pass) and its streaming wrapper."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators import fulltext as FT
from columnar_spark.streaming.text_retrieval import stream_text_retrieval

DOCS = [
    (1, "spark scan merge join fast fast table"),
    (2, "vector scan slow merge merge merge row"),
    (3, "the quick brown fox jumps over a lazy dog"),
    (4, "scan scan scan scan scan"),
    (5, "vector vector join table row column"),
    (6, "fox dog table column row"),
]
QUERIES = [("qa", "vector scan"), ("qb", "fox dog"), ("qc", "table row column")]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_batch_equals_single_query(docs_df):
    """Per-(query, doc) batch scores must be identical to running each
    query through the single-query operator."""
    batch = FT.bm25_batch_search(docs_df, QUERIES, k=10).collect()
    got = {(r["query_id"], r["doc_id"]): (r["score"], r["rank"]) for r in batch}
    for qid, qtext in QUERIES:
        singles = FT.bm25_search(docs_df, qtext, k=10).collect()
        for rank, r in enumerate(singles, 1):
            assert got[(qid, r["doc_id"])] == (r["score"], rank), (qid, r)
    # no extra rows
    assert len(got) == sum(len(FT.bm25_search(docs_df, q, k=10).collect()) for _, q in QUERIES)


def test_batch_respects_k(docs_df):
    out = FT.bm25_batch_search(docs_df, QUERIES, k=1)
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert all(len(v) == 1 for v in per_q.values())
    assert all(r["rank"] == 1 for r in rows)


def test_batch_empty_queries_raise(docs_df):
    with pytest.raises(ValueError):
        FT.bm25_batch_search(docs_df, [])
    with pytest.raises(ValueError):
        FT.bm25_batch_search(docs_df, [("q", "...")])


def test_stream_equals_batch(spark, tmp_path):
    """Two availableNow runs over a growing query directory (restart
    resumes from the checkpoint, processing only NEW query files) must
    together equal one batch search over all queries — served from the
    persisted .ftidx sidecar."""
    import shutil

    corpus_path = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(DOCS, "doc_id long, text string").write.parquet(corpus_path)
    FT.write_text_index(spark, corpus_path)

    stage = tmp_path / "stage"
    flat = tmp_path / "qflat"
    flat.mkdir()
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def add_queries(name, qs):
        spark.createDataFrame(qs, "qid string, qtext string").coalesce(1).write.parquet(
            str(stage / name)
        )
        for j, f in enumerate(sorted((stage / name).glob("*.parquet"))):
            shutil.copy(f, flat / f"{name}_{j}.parquet")

    add_queries("b1", QUERIES[:2])
    q = stream_text_retrieval(spark, str(flat), corpus_path, out_path, ckpt, k=5)
    q.awaitTermination(120)

    add_queries("b2", QUERIES[2:])
    q = stream_text_retrieval(spark, str(flat), corpus_path, out_path, ckpt, k=5)
    q.awaitTermination(120)

    streamed = {
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in spark.read.parquet(out_path).collect()
    }
    batch = {
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in FT.bm25_batch_search(
            spark.read.parquet(corpus_path), QUERIES, k=5
        ).collect()
    }
    assert streamed == batch
