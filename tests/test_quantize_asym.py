"""Asymmetric BIT1 (1-bit data, 4-bit query) — reference
knn/quantizer.cpp:222-641 parity: same storage as symmetric sign-bit
hamming, strictly more query precision, higher pre-rerank recall."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators.knn import knn_topk
from columnar_spark.operators.quantize import (
    asym_score_expr,
    binarize_py,
    binarize_vectors,
    knn_topk_b1,
    knn_topk_b1q4,
    query_bit_planes,
    train_binary_centroid,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(df.first()["embedding"])
    return binarize_vectors(df, "embedding", dim).cache(), dim


def _queries(df, n=8):
    return [
        (r["vec_id"], list(r["embedding"]))
        for r in df.orderBy("vec_id").limit(n).collect()
    ]


def test_asym_score_matches_python(emb, spark):
    """The plane-AND-popcount expression equals a direct python
    computation of sum_{set bits} q4 rescaled + popcount correction."""
    df, dim = emb
    rows = df.select("vec_id", "embedding", "embedding_b1").limit(20).collect()
    q = list(rows[3]["embedding"])
    planes, scale, qmin = query_bit_planes(q)

    got = {
        r["vec_id"]: r["s"]
        for r in df.limit(20)
        .select(
            "vec_id",
            asym_score_expr(F.col("embedding_b1"), planes, scale, qmin).alias("s"),
        )
        .collect()
    }
    for r in rows:
        words = list(r["embedding_b1"])
        # python twin: per dimension, q4 weight where the sign bit is set
        s_asym = 0
        pc = 0
        for d in range(dim):
            w, b = divmod(d, 64)
            if (words[w] >> b) & 1:
                pc += 1
                q4 = 0
                for p in range(4):
                    if (planes[p][w] >> b) & 1:
                        q4 |= 1 << p
                s_asym += q4
        want = 2.0 / scale * s_asym + 2.0 * qmin * pc
        assert abs(got[r["vec_id"]] - want) < 1e-9


def test_asym_beats_symmetric_prererank_recall(emb, spark):
    """Pre-rerank recall@10 of the asymmetric ranking must beat (or at
    worst tie) symmetric hamming on average — the point of spending 4
    bits on the query at equal data storage."""
    df, dim = emb
    k = 10
    r_sym = r_asym = 0.0
    queries = _queries(df.select("vec_id", "embedding"))
    for qid, q in queries:
        exact = {
            r["vec_id"]
            for r in knn_topk(df, "embedding", q, k, metric="ip").collect()
        }
        sym = {
            r["vec_id"]
            for r in knn_topk_b1(df, "embedding_b1", q, k).collect()
        }
        asym = {
            r["vec_id"]
            for r in knn_topk_b1q4(df, "embedding_b1", q, k).collect()
        }
        r_sym += len(exact & sym) / k
        r_asym += len(exact & asym) / k
    r_sym /= len(queries)
    r_asym /= len(queries)
    assert r_asym >= r_sym, (r_asym, r_sym)
    assert r_asym >= 0.3, r_asym  # sanity: the ranking is not noise


def test_asym_reranked_recall_gate(emb):
    """With exact re-rank on the float vectors (the production form),
    recall@10 against exact search passes the quality gate."""
    df, dim = emb
    k = 10
    total = 0.0
    queries = _queries(df.select("vec_id", "embedding"), n=6)
    for qid, q in queries:
        exact = {
            r["vec_id"]
            for r in knn_topk(df, "embedding", q, k, metric="cosine").collect()
        }
        got = {
            r["vec_id"]
            for r in knn_topk_b1q4(
                df, "embedding_b1", q, k, metric="cosine", vec_col="embedding"
            ).collect()
        }
        total += len(exact & got) / k
    assert total / len(queries) >= 0.6, total / len(queries)


def test_centroid_variant(emb):
    df, dim = emb
    cent = train_binary_centroid(df, "embedding")
    dfc = binarize_vectors(df, "embedding", dim, centroid=cent, out_col="b1c")
    qid, q = _queries(df.select("vec_id", "embedding"), n=1)[0]
    out = knn_topk_b1q4(
        dfc, "b1c", q, 5, vec_col="embedding", centroid=cent
    ).collect()
    assert len(out) == 5
    assert out[0]["vec_id"] == qid  # self is nearest
