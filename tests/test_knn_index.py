"""Persisted vector index (A12 write-path parity): build-once artifact,
driver-side load, partition-pruned probe scan, recall floor, fallback
contract when no index exists."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators.knn import knn_topk
from columnar_spark.operators.knn_index import (
    build_vector_index,
    knn_index_path,
    load_vector_index,
    knn_query_indexed,
)

SRC = "/root/testdata/sf0.01/embeddings.parquet"


@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    emb = spark.read.parquet(SRC)
    table = str(tmp_path_factory.mktemp("vidx") / "embeddings.parquet")
    emb.write.parquet(table)
    build_vector_index(spark, emb, table, nlist=8, m=8, k=16)
    return table, emb


def test_artifact_shape_and_load(spark, indexed):
    table, emb = indexed
    idx = load_vector_index(table)
    assert idx is not None
    assert idx.nlist == 8 and len(idx.centroids) == 8
    assert len(idx.codebooks) == 8 and all(len(b) == 16 for b in idx.codebooks)
    assert idx.normalized and idx.metric == "cosine"
    # vectors dataset is hive-partitioned by cluster
    import glob, os

    parts = glob.glob(os.path.join(idx.vectors_path, "ivf_cluster=*"))
    assert len(parts) == 8


def test_probe_scan_is_partition_pruned(spark, indexed):
    table, emb = indexed
    idx = load_vector_index(table)
    q = [float(x) for x in emb.select("embedding").first()["embedding"]]
    out = knn_query_indexed(spark, idx, q, 10, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the probe filter must reach the scan as a partition filter — only
    # nprobe of nlist directories are read
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ivf_cluster" in m.group(1), plan[:1500]


def test_indexed_recall_vs_exact(spark, indexed):
    table, emb = indexed
    idx = load_vector_index(table)
    queries = [
        [float(x) for x in r["embedding"]]
        for r in emb.select("embedding").limit(5).collect()
    ]
    recalls = []
    for q in queries:
        exact = {
            r["vec_id"]
            for r in knn_topk(emb, "embedding", q, 10, metric="cosine").collect()
        }
        approx = {r["id"] for r in knn_query_indexed(spark, idx, q, 10, nprobe=4).collect()}
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_missing_index_returns_none(tmp_path_factory):
    assert load_vector_index(str(tmp_path_factory.mktemp("noidx") / "t.parquet")) is None

def test_incremental_append_equals_full_build(spark, tmp_path_factory):
    """E9 for vectors: half-build + append-half must produce the SAME
    code dataset as encoding everything with the half-trained index —
    same centroids/codebooks => identical cluster assignment and codes,
    so indexed query results are row-identical."""
    from columnar_spark.operators.knn_index import append_to_vector_index

    emb = spark.read.parquet(SRC)
    first = emb.where(F.col("vec_id") % 2 == 0)
    rest = emb.where(F.col("vec_id") % 2 == 1)

    root = tmp_path_factory.mktemp("vidx_inc")
    t_inc = str(root / "inc.parquet")
    first.write.parquet(t_inc)
    build_vector_index(spark, first, t_inc, nlist=4, m=8, k=16)
    idx_half = load_vector_index(t_inc)

    append_to_vector_index(spark, rest, t_inc)
    idx = load_vector_index(t_inc)
    # append never retrains: artifacts unchanged
    assert idx.centroids == idx_half.centroids
    assert idx.codebooks == idx_half.codebooks

    inc_rows = {
        r["id"]: (r["ivf_cluster"], tuple(r["pq_code"]))
        for r in spark.read.parquet(idx.vectors_path).collect()
    }
    assert len(inc_rows) == emb.count()

    # oracle: encode the full set in one shot with the SAME trained index
    from columnar_spark.operators.knn_index import _write_codes
    from columnar_spark.functions.vector import unit_vector

    oracle_path = str(root / "oracle_codes")
    base = emb.withColumn(
        "embedding", unit_vector(F.col("embedding")).cast("array<float>")
    )
    _write_codes(
        base, idx.centroids, idx.codebooks, "embedding", "vec_id",
        True, oracle_path, mode="overwrite",
    )
    oracle_rows = {
        r["id"]: (r["ivf_cluster"], tuple(r["pq_code"]))
        for r in spark.read.parquet(oracle_path).collect()
    }
    assert inc_rows == oracle_rows

    # and the appended rows are actually queryable through the index
    q = [float(x) for x in rest.select("embedding").first()["embedding"]]
    hits = {r["id"] for r in knn_query_indexed(spark, idx, q, 10, nprobe=4).collect()}
    assert hits & {r["vec_id"] for r in rest.collect()}


def test_check_vector_index_detects_drift(spark, tmp_path_factory):
    """A13 for the vector sidecar: clean on a fresh build, clean after
    an append, and flags id drift when the table gains rows the index
    never saw."""
    from columnar_spark.operators.knn_index import (
        append_to_vector_index,
        check_vector_index,
    )
    from columnar_spark.writer import check_table

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.where(F.col("vec_id") % 2 == 0)
    rest = emb.where(F.col("vec_id") % 2 == 1)

    root = tmp_path_factory.mktemp("vchk")
    t = str(root / "emb.parquet")
    first.write.parquet(t)
    build_vector_index(spark, first, t, nlist=4, m=8, k=16)
    assert check_vector_index(spark, t) == []
    assert check_table(spark, t) == ["stats manifest missing or unreadable"]

    # append rows to the TABLE without maintaining the index -> drift
    rest.write.mode("append").parquet(t)
    errs = check_vector_index(spark, t)
    assert any("missing" in e for e in errs), errs

    # maintaining the index clears it
    append_to_vector_index(spark, rest, t)
    assert check_vector_index(spark, t) == []


def test_compact_vector_index_preserves_codes(spark, tmp_path_factory):
    """Compacting the code dataset changes file layout only: same ids,
    clusters, and pq codes, fewer files."""
    import glob as g
    import os

    from columnar_spark.operators.knn_index import (
        append_to_vector_index,
        check_vector_index,
        load_vector_index,
    )
    from columnar_spark.writer import compact_vector_index

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    thirds = [emb.where(F.col("vec_id") % 3 == i) for i in range(3)]

    root = tmp_path_factory.mktemp("vcomp")
    t = str(root / "emb.parquet")
    thirds[0].write.parquet(t)
    build_vector_index(spark, thirds[0], t, nlist=4, m=8, k=16)
    for part in thirds[1:]:
        part.write.mode("append").parquet(t)
        append_to_vector_index(spark, part, t)

    idx = load_vector_index(t)
    pat = os.path.join(idx.vectors_path, "ivf_cluster=*", "*.parquet")
    before_files = len(g.glob(pat))
    assert before_files > idx.nlist  # 3 batches fragmented the dataset
    before = {
        r["id"]: (r["ivf_cluster"], tuple(r["pq_code"]))
        for r in spark.read.parquet(idx.vectors_path).collect()
    }

    assert compact_vector_index(spark, t) is True
    after_files = len(g.glob(pat))
    assert after_files < before_files
    after = {
        r["id"]: (r["ivf_cluster"], tuple(r["pq_code"]))
        for r in spark.read.parquet(idx.vectors_path).collect()
    }
    assert before == after
    assert check_vector_index(spark, t) == []
    # idempotent: already compact -> no-op
    assert compact_vector_index(spark, t) is False
