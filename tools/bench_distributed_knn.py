"""Time the KNN serving paths BOTH ways at a given layout: the
driver-side probe (sub-cap artifacts, the published bench path) vs the
distributed applyInPandas/scan path (driver_probe=False — the shape a
1000-executor cluster runs at 100 TB, where artifacts exceed the probe
caps). Appends/updates a `distributed_path` block in BENCH_SCALE.json
when --write is passed.

Usage: python tools/bench_distributed_knn.py [layout_dir] [--write]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.cache/layout_sf1.0"
WRITE = "--write" in sys.argv

from pyspark.sql import functions as F

from columnar_spark.session import get_spark

spark = get_spark()
import glob as _glob
import os

import pyarrow.parquet as _pq

import __spark_entry__ as E
from columnar_spark.operators.hnsw_index import knn_query_graph, load_graph_index_meta
from columnar_spark.operators.knn_index import knn_query_indexed_b1, load_vector_index

emb = E._t(spark, SF, "embeddings")
qvec = E._qvec(spark, SF, E._KNN_QID)
K = E._KNN_K
table = f"{SF}/embeddings.parquet"
idx = load_vector_index(table)
allowed = [r["vec_id"] for r in emb.filter(F.col("label") == 3).collect()]


def _rows_in(d):
    return sum(
        _pq.read_metadata(f).num_rows
        for f in _glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
    )


CASES = {}
if idx is not None and idx.has_b1:
    CASES["knn_b1_cosine"] = lambda dp: knn_query_indexed_b1(
        spark, idx, qvec, K, rerank_df=emb, rerank_factor=16, driver_probe=dp
    )
    CASES["knn_b1q4_cosine"] = lambda dp: knn_query_indexed_b1(
        spark, idx, qvec, K, rerank_df=emb, rerank_factor=16, asym=True,
        driver_probe=dp,
    )
shadow = E._graph_sidecar_for(spark, SF)
CASES["knn_graph_cosine"] = lambda dp: knn_query_graph(
    spark, table, qvec, K, exact=True, index_path=shadow, rerank_factor=16,
    rerank_df=emb, driver_probe=dp,
)
CASES["knn_graph_ann"] = lambda dp: knn_query_graph(
    spark, table, qvec, K, ef=96, index_path=shadow, rerank_df=emb,
    driver_probe=dp,
)
CASES["knn_graph_filtered"] = lambda dp: knn_query_graph(
    spark, table, qvec, K, exact=True, index_path=shadow, allowed=allowed,
    rerank_factor=16, rerank_df=emb, driver_probe=dp,
)
shadow_q8 = E._graph_l2_sidecar_for(spark, SF)
CASES["knn_graph_l2_q8"] = lambda dp: knn_query_graph(
    spark, table, qvec, K, exact=True, index_path=shadow_q8, rerank_factor=16,
    rerank_df=emb, driver_probe=dp,
)

block = {
    "layout": SF,
    "artifact_rows": {
        "b1_codes": _rows_in(os.path.join(idx.path, "vectors")) if idx else None,
        "graph_nodes": _rows_in(os.path.join(shadow or f"{table}.knn-graph", "graph")),
    },
    "queries": {},
}
for name, fn in CASES.items():
    rec = {}
    for label, dp in (("probe", None), ("distributed", False)):
        fn(dp).collect()  # warm (build caches, JIT)
        best = 1e9
        for _ in range(4):
            t0 = time.time()
            rows = fn(dp).collect()
            best = min(best, time.time() - t0)
        rec[label] = round(best, 3)
        rec["rows"] = len(rows)
    a = [tuple(r) for r in fn(None).orderBy("dist").collect()]
    b = [tuple(r) for r in fn(False).orderBy("dist").collect()]
    rec["identical"] = a == b
    block["queries"][name] = rec
    print(name, rec, flush=True)

print(json.dumps(block))
if WRITE:
    p = "/root/repo/BENCH_SCALE.json"
    d = json.load(open(p))
    d["distributed_path"] = block
    with open(p, "w") as f:
        json.dump(d, f, indent=1)
    print("wrote BENCH_SCALE.json distributed_path")
