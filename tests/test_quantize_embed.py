"""Quantization (reference F4) and embeddings registry (reference F7)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from columnar_spark.functions.embed import MODEL_REGISTRY, embed_text
from columnar_spark.operators.knn import knn_topk
from columnar_spark.operators.quantize import (
    dequantize_expr,
    knn_topk_q8,
    quantize_expr,
    quantize_vectors,
    train_quantizer,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_quantize_roundtrip_error_bound(emb):
    lo, hi = train_quantizer(emb, "embedding", clip=(0.0, 1.0))  # no clipping
    step = (hi - lo) / 255.0
    q = quantize_vectors(emb, "embedding", lo, hi)
    err = (
        q.select(
            F.expr(
                "aggregate(zip_with(embedding, "
                f"transform(embedding_q8, q -> (cast(q as double) + 128.0) * {step} + {lo}), "
                "(a, b) -> abs(cast(a as double) - b)), cast(0.0 as double), "
                "(acc, x) -> greatest(acc, x)) as e"
            )
        )
        .agg(F.max("e"))
        .first()[0]
    )
    assert err <= step * 0.5 + 1e-9


def test_quantized_knn_recall(emb):
    lo, hi = train_quantizer(emb, "embedding")
    q8 = quantize_vectors(emb, "embedding", lo, hi)
    qvec = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]

    exact = [r["vec_id"] for r in knn_topk(emb, "embedding", qvec, 10).collect()]
    quant = [r["vec_id"] for r in
             knn_topk_q8(q8, "embedding_q8", qvec, 10, lo, hi).collect()]
    assert len(set(exact) & set(quant)) >= 9  # recall >= 0.9 at 8 bits


def test_embed_stub_deterministic_dims(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    a = {r["doc_id"]: r["embedding"] for r in embed_text(docs, "text").collect()}
    b = {r["doc_id"]: r["embedding"] for r in embed_text(docs, "text").collect()}
    assert a == b
    assert all(len(v) == 64 for v in a.values())
    # unit-norm
    n = np.linalg.norm(list(a.values())[0])
    assert abs(n - 1.0) < 1e-5
    # distinct texts -> distinct vectors
    assert len({tuple(v) for v in a.values()}) == len(a)


def test_embed_api_models_raise(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(2)
    with pytest.raises(Exception):
        embed_text(docs, "text", model="openai/text-embedding-3-small").collect()
    assert MODEL_REGISTRY["openai/text-embedding-3-large"].dim == 3072


def test_embed_then_knn_composes(spark):
    """The F7 -> F1 pipeline: embed a corpus, search it."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    embedded = embed_text(docs, "text")
    qvec = embedded.filter(F.col("doc_id") == 0).first()["embedding"]
    out = knn_topk(embedded, "embedding", [float(v) for v in qvec], 3, id_col="doc_id")
    rows = out.collect()
    assert rows[0]["doc_id"] == 0 and abs(rows[0]["dist"]) < 1e-6
