"""Graph-ANN path: hnswlib backend when the wheel exists, pure-python
HNSW (operators.hnsw_py) everywhere — the graph search is executed and
recall-tested in every environment."""

import importlib.util

import numpy as np
import pytest
from pyspark.sql import functions as F

from columnar_spark.operators.knn import knn_topk, knn_topk_partitioned_ann

SF = "/root/testdata/sf0.001"
HAS_HNSWLIB = importlib.util.find_spec("hnswlib") is not None


@pytest.mark.skipif(HAS_HNSWLIB, reason="hnswlib present: gate test n/a")
def test_ann_hnswlib_backend_raises_with_guidance(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ImportError, match="hnswlib"):
        knn_topk_partitioned_ann(emb, "embedding", [0.0] * 64, 5, backend="hnswlib")


@pytest.mark.skipif(not HAS_HNSWLIB, reason="hnswlib not installed")
def test_ann_recall_vs_exact_hnswlib(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    exact = {r["vec_id"] for r in knn_topk(emb, "embedding", q, 10).collect()}
    ann = {r["vec_id"] for r in
           knn_topk_partitioned_ann(emb, "embedding", q, 10, backend="hnswlib").collect()}
    assert len(exact & ann) >= 9


def test_py_hnsw_index_recall_vs_bruteforce():
    """Always-run recall gate for the pure-python HNSW itself, on a
    deterministic synthetic corpus."""
    from columnar_spark.operators.hnsw_py import HnswIndex

    rng = np.random.RandomState(7)
    vecs = rng.randn(800, 32).astype(np.float32)
    index = HnswIndex(32, metric="l2", M=16, ef_construction=100, seed=1)
    for i in range(len(vecs)):
        index.add(vecs[i], i)

    hits = total = 0
    for qi in (3, 77, 501):
        q = vecs[qi] + rng.randn(32).astype(np.float32) * 0.05
        d2 = np.sum((vecs - q) ** 2, axis=1)
        exact = set(np.argsort(d2)[:10].tolist())
        got = {label for label, _ in index.search(q, 10, ef=80)}
        hits += len(exact & got)
        total += 10
    assert hits / total >= 0.9, f"py-HNSW recall@10 = {hits/total:.2f} < 0.9"


def test_py_hnsw_partition_guard():
    from columnar_spark.operators.hnsw_py import build_index

    with pytest.raises(ValueError, match="refuses partitions"):
        build_index(list(range(200_001)), np.zeros((200_001, 2), dtype=np.float32))


def test_ann_recall_vs_exact_python_backend(spark):
    """End-to-end per-partition graph search through mapInPandas with the
    python backend — the executed coverage for the reference's core
    search structure (knn/knn.cpp:411-540) in wheel-less environments."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    exact = {r["vec_id"] for r in knn_topk(emb, "embedding", q, 10).collect()}
    ann = {
        r["vec_id"]
        for r in knn_topk_partitioned_ann(
            emb, "embedding", q, 10, ef=128, backend="python"
        ).collect()
    }
    assert len(exact & ann) >= 8, f"python-HNSW e2e recall {len(exact & ann)}/10"


def test_py_hnsw_termination_policies():
    """F5 parity: budget caps distance computations hard; adaptive
    (stagnation) terminates earlier than the full beam at k>10 while
    keeping most of the recall; counter = pDistanceComputations."""
    from columnar_spark.operators.hnsw_py import HnswIndex

    rng = np.random.RandomState(3)
    vecs = rng.randn(1000, 24).astype(np.float32)
    index = HnswIndex(24, metric="l2", M=12, ef_construction=80, seed=5)
    for i in range(len(vecs)):
        index.add(vecs[i], i)

    q = vecs[11] + 0.01
    d2 = np.sum((vecs - q) ** 2, axis=1)
    exact = set(np.argsort(d2)[:20].tolist())

    index.n_dist_calcs = 0
    full = index.search(q, 20, ef=128)
    full_calcs = index.n_dist_calcs

    index.n_dist_calcs = 0
    adaptive = index.search(q, 20, ef=128, policy="adaptive")
    adaptive_calcs = index.n_dist_calcs
    assert adaptive_calcs <= full_calcs
    assert len(exact & {l for l, _ in adaptive}) >= 14  # most recall kept

    index.n_dist_calcs = 0
    index.search(q, 20, ef=128, policy="budget", budget=200)
    assert index.n_dist_calcs <= 200 + 1  # hard cap honored

    with pytest.raises(ValueError, match="policy"):
        index.search(q, 5, policy="bogus")


def test_p2_quantile_estimator_tracks_true_quantile():
    """The P-squared estimator (Jain & Chlamtac 1985) converges near the
    true stream quantile; the windowed variant adapts to drift."""
    from columnar_spark.operators.hnsw_py import MovingP2Quantile, P2Quantile

    rng = np.random.RandomState(7)
    xs = rng.exponential(2.0, 5000)
    est = P2Quantile(0.2)
    for x in xs:
        est.insert(float(x))
    true_q = np.quantile(xs, 0.2)
    assert est.ready()
    assert abs(est.get() - true_q) < 0.15 * (true_q + 1e-9), (est.get(), true_q)

    # drifting stream: the moving estimator follows the NEW regime, the
    # plain one stays anchored to the mixed history
    m = MovingP2Quantile(128, 0.5)
    p = P2Quantile(0.5)
    for x in rng.normal(0.0, 0.1, 2000):
        m.insert(float(x)); p.insert(float(x))
    for x in rng.normal(10.0, 0.1, 2000):
        m.insert(float(x)); p.insert(float(x))
    assert abs(m.get() - 10.0) < 0.5, m.get()
    assert p.get() < 9.5  # anchored in the old regime


def test_py_hnsw_quantile_termination_policy():
    """F5 full parity: the reference's discovery-rate moving-quantile
    policy (termination.cpp:41-79) terminates with fewer distance
    computations than the full beam at k>10 while keeping recall; it is
    a no-op at k<=10 (the reference's iResults > 10 gate)."""
    from columnar_spark.operators.hnsw_py import HnswIndex

    rng = np.random.RandomState(3)
    vecs = rng.randn(2000, 24).astype(np.float32)
    index = HnswIndex(24, metric="l2", M=12, ef_construction=80, seed=5)
    for i in range(len(vecs)):
        index.add(vecs[i], i)

    q = vecs[11] + 0.01
    d2 = np.sum((vecs - q) ** 2, axis=1)
    exact = set(np.argsort(d2)[:20].tolist())

    index.n_dist_calcs = 0
    full = index.search(q, 20, ef=256)
    full_calcs = index.n_dist_calcs

    index.n_dist_calcs = 0
    quant = index.search(q, 20, ef=256, policy="quantile")
    quant_calcs = index.n_dist_calcs
    assert quant_calcs <= full_calcs
    assert len(exact & {l for l, _ in quant}) >= 14, len(
        exact & {l for l, _ in quant}
    )

    # k<=10: gate disables the policy — identical to the full beam
    index.n_dist_calcs = 0
    a = index.search(q, 10, ef=256)
    na = index.n_dist_calcs
    index.n_dist_calcs = 0
    b = index.search(q, 10, ef=256, policy="quantile")
    nb = index.n_dist_calcs
    assert a == b and na == nb
