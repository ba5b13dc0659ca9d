"""Optional-dependency ANN path: gated cleanly, exact under the lib."""

import importlib.util

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators.knn import knn_topk, knn_topk_partitioned_ann

SF = "/root/testdata/sf0.001"
HAS_HNSWLIB = importlib.util.find_spec("hnswlib") is not None


@pytest.mark.skipif(HAS_HNSWLIB, reason="hnswlib present: gate test n/a")
def test_ann_gate_raises_with_guidance(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ImportError, match="hnswlib"):
        knn_topk_partitioned_ann(emb, "embedding", [0.0] * 64, 5)


@pytest.mark.skipif(not HAS_HNSWLIB, reason="hnswlib not installed")
def test_ann_recall_vs_exact(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    exact = {r["vec_id"] for r in knn_topk(emb, "embedding", q, 10).collect()}
    ann = {r["vec_id"] for r in
           knn_topk_partitioned_ann(emb, "embedding", q, 10).collect()}
    assert len(exact & ann) >= 9
