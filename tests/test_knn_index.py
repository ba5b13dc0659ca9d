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


def test_at_rest_quantized_codes_and_b1_serving(spark, indexed):
    """F4 at rest (quantizer.cpp parity): the build stores b1 sign-bit
    words and int8 q8 codes as columns of the code dataset with the
    trained quantizer params in the artifact; the BIT1 probe reads ONLY
    the b1 column (ReadSchema pruning = the 32x read cut) and the
    re-ranked result is IDENTICAL to the on-the-fly BIT1 path."""
    from columnar_spark.operators.knn_index import knn_query_indexed_b1
    from columnar_spark.operators.quantize import binarize_vectors, knn_topk_b1

    table, emb = indexed
    idx = load_vector_index(table)
    assert idx.has_b1 and idx.q8_bounds is not None
    lo, hi = idx.q8_bounds
    assert lo < hi

    codes = spark.read.parquet(idx.vectors_path)
    assert "b1" in codes.columns and "q8" in codes.columns
    dim = idx.dim
    assert codes.filter(F.size("b1") != (dim + 63) // 64).count() == 0
    assert codes.filter(F.size("q8") != dim).count() == 0

    q = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]

    # served from the at-rest codes, re-ranked on the BASE table floats
    # (driver_probe=False pins the DISTRIBUTED serving shape — the
    # driver-probe fast path is equality-tested below)
    got = knn_query_indexed_b1(
        spark, idx, q, 10, rerank_df=emb, rerank_factor=16, driver_probe=False
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the code scan reads b1 only — never pq_code/q8/vec from the sidecar
    import re

    schemas = re.findall(r"ReadSchema: (struct<[^>]*>)", plan)
    side_scan = [s for s in schemas if "b1" in s]
    assert side_scan and all("q8" not in s and "pq_code" not in s for s in side_scan), schemas

    # identical to the on-the-fly path: sign bits are scale-invariant,
    # so the sidecar's normalized-vector b1 == raw-vector b1, and the
    # exact re-rank runs on the same raw floats either way
    b1_fly = binarize_vectors(emb, "embedding", dim)
    want = knn_topk_b1(
        b1_fly, "embedding_b1", q, 10, id_col="vec_id", vec_col="embedding",
        rerank_factor=16,
    )
    got_rows = [(r["id"], round(r["dist"], 6)) for r in got.collect()]
    want_rows = [(r["vec_id"], round(r["dist"], 6)) for r in want.collect()]
    assert got_rows == want_rows

    # driver-probe fast path (small artifacts: cached pyarrow read +
    # numpy popcount shortlist, ONE Spark job) — identical rows, and the
    # plan carries no sidecar scan at all
    fast = knn_query_indexed_b1(
        spark, idx, q, 10, rerank_df=emb, rerank_factor=16
    )
    fast_rows = [(r["id"], round(r["dist"], 6)) for r in fast.collect()]
    assert fast_rows == got_rows
    fplan = fast._jdf.queryExecution().executedPlan().toString()
    assert ".knn" not in fplan, fplan  # shortlist came from the driver cache

    # asymmetric variant serves from the same at-rest codes
    got_asym = knn_query_indexed_b1(
        spark, idx, q, 10, rerank_df=emb, rerank_factor=16, asym=True
    ).collect()
    assert len(got_asym) == 10

    # IVF pruning composes with the b1 scan
    pruned = knn_query_indexed_b1(
        spark, idx, q, 10, rerank_df=emb, nprobe=2
    )
    pplan = pruned._jdf.queryExecution().executedPlan().toString()
    pfs = re.findall(r"PartitionFilters: \[([^\]]*)\]", pplan)
    # several scans exist (rerank pool has no partition filter); the
    # sidecar's b1 scan must carry the cluster pruning
    assert any("ivf_cluster" in pf for pf in pfs), pfs


def test_append_extends_quantized_codes(spark, tmp_path_factory):
    """Appends encode with the PERSISTED quantizer params — no retrain,
    byte-identical codes for the same vectors."""
    from columnar_spark.operators.knn_index import (
        append_to_vector_index,
        check_vector_index,
    )

    emb = spark.read.parquet(SRC)
    first = emb.where(F.col("vec_id") % 2 == 0)
    rest = emb.where(F.col("vec_id") % 2 == 1)
    root = tmp_path_factory.mktemp("vidx_q")
    t = str(root / "t.parquet")
    emb.write.parquet(t)  # table holds everything; index built on half
    build_vector_index(spark, first, t, nlist=4, m=8, k=16)
    idx0 = load_vector_index(t, check_fresh=False)
    append_to_vector_index(spark, rest, t)
    idx1 = load_vector_index(t, check_fresh=False)
    assert idx1.q8_bounds == idx0.q8_bounds  # params frozen at train time
    codes = spark.read.parquet(idx1.vectors_path)
    assert codes.count() == emb.count()
    assert codes.filter(F.size("b1") != (idx1.dim + 63) // 64).count() == 0
    assert check_vector_index(spark, t) == []


def test_stale_vector_index_refused(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("vidx_stale")
    t = str(root / "t.parquet")
    emb = spark.read.parquet(SRC).limit(100)
    emb.write.parquet(t)
    build_vector_index(spark, emb, t, nlist=4, m=8, k=16)
    assert load_vector_index(t) is not None
    # out-of-band rewrite
    spark.read.parquet(SRC).limit(10).write.mode("overwrite").parquet(t)
    assert load_vector_index(t) is None
    assert load_vector_index(t, check_fresh=False) is not None


def test_asym_b1q4_serving_identical_all_paths(spark, indexed):
    """The asymmetric (1-bit data, 4-bit query) route serves from the
    at-rest codes too: driver-probe, distributed, and on-the-fly paths
    all return identical rows — the 4-bit query bins are affine-
    invariant and scoring uses the raw query's own doubles."""
    from columnar_spark.operators.knn_index import knn_query_indexed_b1
    from columnar_spark.operators.quantize import binarize_vectors, knn_topk_b1q4

    table, emb = indexed
    idx = load_vector_index(table)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]

    def rows(df):
        return [
            (r["id"] if "id" in df.columns else r["vec_id"], round(r["dist"], 9))
            for r in df.orderBy("dist", "id" if "id" in df.columns else "vec_id").collect()
        ]

    probe = knn_query_indexed_b1(
        spark, idx, q, 10, rerank_df=emb, rerank_factor=16, asym=True
    )
    dist = knn_query_indexed_b1(
        spark, idx, q, 10, rerank_df=emb, rerank_factor=16, asym=True,
        driver_probe=False,
    )
    fly = knn_topk_b1q4(
        binarize_vectors(emb, "embedding", idx.dim), "embedding_b1", q, 10,
        id_col="vec_id", vec_col="embedding", rerank_factor=16,
    ).withColumnRenamed("vec_id", "id")
    assert rows(probe) == rows(dist) == rows(fly)
