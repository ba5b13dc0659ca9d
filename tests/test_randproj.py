"""Random projection: JL distance preservation, determinism across
runs/query-side projection, and KNN usefulness on the reduced column."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from columnar_spark.operators.randproj import (
    project_query,
    project_vectors,
    projection_matrix,
)


def _synth(spark, n=300, d=256, seed=3):
    rng = np.random.RandomState(seed)
    X = rng.standard_normal((n, d)).astype(np.float32)
    rows = [(i, X[i].tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vid: long, embedding: array<float>"), X


def test_pairwise_distance_distortion_bounded(spark):
    df, X = _synth(spark)
    out = project_vectors(df, "embedding", 64, seed=11)
    Y = np.array(
        [r["embedding_rp64"] for r in out.orderBy("vid").collect()], dtype=np.float32
    )
    assert Y.shape == (300, 64)

    rng = np.random.RandomState(0)
    worst = 0.0
    for _ in range(200):
        i, j = rng.randint(0, 300, size=2)
        if i == j:
            continue
        d_in = np.linalg.norm(X[i] - X[j])
        d_out = np.linalg.norm(Y[i] - Y[j])
        worst = max(worst, abs(d_out - d_in) / d_in)
    # JL at k=64: distortion concentrated around sqrt(ln n / k); 35% is
    # a loose, stable bound for these sizes
    assert worst < 0.35, worst


def test_deterministic_and_query_consistent(spark):
    df, X = _synth(spark, n=50)
    a = {r["vid"]: r["embedding_rp16"] for r in project_vectors(df, "embedding", 16).collect()}
    b = {r["vid"]: r["embedding_rp16"] for r in project_vectors(df, "embedding", 16).collect()}
    assert a == b  # same seed -> bit-identical across runs
    # query-side projection matches the column projection exactly
    q = project_query(X[7].tolist(), 256, 16)
    assert np.allclose(q, a[7], atol=1e-5)
    # different seed -> different space
    c = {r["vid"]: r["embedding_rp16"] for r in project_vectors(df, "embedding", 16, seed=99).collect()}
    assert c[7] != a[7]


def test_knn_recall_on_projected_column(spark):
    """Top-10 by L2 in the 64-dim projection recovers most of the true
    256-dim top-10 — the projected column is a usable search column.

    Data is CLUSTERED (centers + small noise), like real embeddings:
    under isotropic Gaussian data every pairwise distance concentrates
    to the same value and no projection (or quantizer) can preserve a
    ranking that has no margin to begin with."""
    from columnar_spark.operators.knn import knn_topk

    rng = np.random.RandomState(3)
    centers = rng.standard_normal((20, 256)).astype(np.float32) * 3.0
    X = np.stack([
        centers[i % 20] + rng.standard_normal(256).astype(np.float32) * 0.3
        for i in range(400)
    ])
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(400)], "vid: long, embedding: array<float>"
    )
    proj = project_vectors(df, "embedding", 64, seed=5)
    q = X[0]
    true_d = np.linalg.norm(X - q, axis=1)
    true_top = set(np.argsort(true_d)[1:11])

    qp = project_query(q.tolist(), 256, 64, seed=5)
    got = knn_topk(
        proj.select("vid", F.col("embedding_rp64").alias("embedding")),
        "embedding",
        qp,
        k=11,
        metric="l2",
        id_col="vid",
    )
    ids = {r["vid"] for r in got.collect()} - {0}
    recall = len(ids & true_top) / 10
    assert recall >= 0.6, recall
