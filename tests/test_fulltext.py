"""Full-text retrieval: BM25 vs a python reference, persisted-index
parity, partition pruning of the term-bucketed sidecar, RRF fusion."""

import math

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators import fulltext as FT

DOCS = [
    (1, "spark scan merge join fast fast table"),
    (2, "vector scan slow merge merge merge row"),
    (3, "the quick brown fox jumps over a lazy dog"),
    (4, "scan scan scan scan scan"),
    (5, "vector vector join table row column"),
    (6, "empty of matches entirely unrelated words"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_python_reference(docs_df):
    query = "vector scan merge"
    got = {
        r["doc_id"]: r["score"]
        for r in FT.bm25_scores(docs_df, FT.tokenize_query(query)).collect()
    }
    want = FT.bm25_reference(DOCS, query)
    assert set(got) == set(want)
    for d, s in want.items():
        assert math.isclose(got[d], s, rel_tol=1e-12), (d, got[d], s)


def test_bm25_search_order_and_k(docs_df):
    rows = FT.bm25_search(docs_df, "vector scan merge", k=3).collect()
    assert len(rows) == 3
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # doc 4 is pure "scan" with max tf; doc 2 hits all three terms.
    assert rows[0]["doc_id"] in (2, 4)


def test_bm25_empty_query_raises(docs_df):
    with pytest.raises(ValueError):
        FT.bm25_scores(docs_df, [])


def test_bm25_unknown_terms_empty(docs_df):
    assert FT.bm25_scores(docs_df, ["zzz", "qqq"]).count() == 0


def test_persisted_index_parity_and_pruning(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(DOCS, "doc_id long, text string").write.parquet(p)
    FT.write_text_index(spark, p)

    live = FT.bm25_search(spark.read.parquet(p), "vector scan merge", k=5).collect()
    idx = FT.bm25_search_indexed(spark, p, "vector scan merge", k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in live] == [
        (r["doc_id"], r["score"]) for r in idx
    ]

    # partition pruning: the postings scan must carry a PartitionFilters
    # entry on tb (bucket of the query terms), not read all 64 buckets.
    loaded = FT.load_text_index(spark, p)
    postings = loaded[0].filter(F.col("tb").isin([0, 1])).filter(
        F.col("term").isin(["vector"])
    )
    plan = postings._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_incremental_like_rebuild_matches(spark, tmp_path):
    """write_text_index is a full rebuild; meta stats must agree with a
    direct computation."""
    p = str(tmp_path / "d2.parquet")
    spark.createDataFrame(DOCS, "doc_id long, text string").write.parquet(p)
    FT.write_text_index(spark, p)
    _, lengths, meta = FT.load_text_index(spark, p)
    n, total = lengths.agg(F.count(F.lit(1)), F.sum("dl")).first()
    assert meta["n_docs"] == n
    assert math.isclose(meta["avgdl"], total / n)


def test_rrf_fusion(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    b = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], "doc_id long, rank long")
    rows = FT.rrf_fuse(a, b, k=4).collect()
    got = {r["doc_id"]: r["rrf"] for r in rows}
    # doc 1: 1/61 + 1/62; doc 3: 1/63 + 1/61; doc 2: 1/62; doc 9: 1/63
    assert math.isclose(got[1], round(1 / 61 + 1 / 62, 6), abs_tol=1e-9)
    assert math.isclose(got[3], round(1 / 63 + 1 / 61, 6), abs_tol=1e-9)
    assert rows[0]["doc_id"] == 1  # highest fused score
    assert set(got) == {1, 2, 3, 9}


def test_facet_counts(docs_df):
    docs = docs_df.withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("fr")
    )
    rows = FT.facet_counts(docs, "vector scan", ["lang"]).collect()
    got = {(r["facet"], r["value"]): r["cnt"] for r in rows}
    # matching docs: 1,2,4 (scan), 2,5 (vector) -> {1,2,4,5}
    assert got[("lang", "en")] == 2  # docs 2, 4
    assert got[("lang", "fr")] == 2  # docs 1, 5
