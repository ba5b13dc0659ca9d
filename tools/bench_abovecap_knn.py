"""Above-cap KNN serving experiment (r8 verdict item 3): the
distributed_path block timed both serving shapes only BELOW the probe
caps (20k artifact rows vs the 2M b1 / 250k graph caps), so "past the
cap the distributed path wins" was an extrapolation. This builds
artifacts genuinely PAST both caps from replicated embeddings, then
measures:

- the auto path (probe refused by the cap -> distributed), cold + warm;
- the FORCED probe (cap raised for the experiment), cold + warm, plus
  the probe state's resident bytes — the quantity the cap actually
  bounds.

The honest result this records: the warm in-driver probe stays faster
per query at any size that fits (it is an in-process numpy scan / graph
walk), but its COLD load and resident state grow linearly with the
artifact while the distributed path's driver cost stays flat — the cap
is a MEMORY bound, and the measured bytes/row re-derive it. Appends an
`abovecap_path` block to BENCH_SCALE.json with --write.

Usage: python tools/bench_abovecap_knn.py [--write] [--b1-rows N] [--graph-rows N]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

WRITE = "--write" in sys.argv


def _arg(name, default):
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


B1_ROWS = _arg("--b1-rows", 3_200_000)      # > 2M cap
GRAPH_ROWS = _arg("--graph-rows", 320_000)  # > 250k cap

from pyspark.sql import functions as F

import __spark_entry__ as E
from columnar_spark.operators import hnsw_index as H
from columnar_spark.operators import knn_index as KI
from columnar_spark.session import get_spark

spark = get_spark("abovecap", cpus=16)
SRC = "/root/testdata/sf0.1"
WORK = "/root/repo/.cache/abovecap"
os.makedirs(WORK, exist_ok=True)

emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
n_src = emb.count()
qvec = E._qvec(spark, SRC, E._KNN_QID)
K = E._KNN_K


def replicate(n_target: int, path: str) -> str:
    """Key-shifted replication (the make_scale_corpus convention): copy
    i gets vec_id + i*n_src and a deterministic sign-flip pattern so
    copies are not byte-identical neighbors."""
    if os.path.isdir(path) and os.path.isfile(os.path.join(path, "_OK")):
        return path
    copies = (n_target + n_src - 1) // n_src
    out = (
        emb.crossJoin(spark.range(copies).withColumnRenamed("id", "__copy"))
        .select(
            (F.col("vec_id") + F.col("__copy") * n_src).alias("vec_id"),
            F.col("label"),
            F.transform(
                "embedding",
                lambda x, idx: F.when(
                    (idx + F.col("__copy")) % 7 == 3, -x
                ).otherwise(x),
            ).alias("embedding"),
        )
    )
    out.limit(n_target).repartition(16).write.mode("overwrite").parquet(path)
    open(os.path.join(path, "_OK"), "w").write("ok")
    return path


def timed(fn, warm_runs=3):
    t0 = time.time()
    fn()  # cold (caches cleared by caller)
    cold = time.time() - t0
    best = 1e9
    for _ in range(warm_runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(cold, 3), round(best, 3)


block = {"b1": {}, "graph": {}, "caps": {
    "b1_rows": KI._B1_DRIVER_PROBE_MAX_ROWS,
    "graph_rows": H._GRAPH_PROBE_MAX_ROWS,
}}

# ---------------------------------------------------------------- b1
t_b1 = replicate(B1_ROWS, os.path.join(WORK, f"emb_b1_{B1_ROWS}.parquet"))
big = spark.read.parquet(t_b1)
if not os.path.isdir(KI.knn_index_path(t_b1)):
    KI.build_vector_index(spark, big, t_b1, nlist=64)
idx = KI.load_vector_index(t_b1)
n_b1 = big.count()
block["b1"]["artifact_rows"] = n_b1


def run_b1(dp):
    return KI.knn_query_indexed_b1(
        spark, idx, qvec, K, rerank_df=big, rerank_factor=16, driver_probe=dp
    ).collect()


# auto path above the cap: probe refused -> distributed
KI._B1_PROBE_CACHE.clear()
cold, warm = timed(lambda: run_b1(None))
block["b1"]["auto_above_cap"] = {"cold": cold, "warm": warm,
                                 "path": "distributed (probe refused by cap)"}
cold, warm = timed(lambda: run_b1(False))
block["b1"]["distributed"] = {"cold": cold, "warm": warm}
# forced probe: raise the cap for the experiment
KI._B1_DRIVER_PROBE_MAX_ROWS = 1 << 40
KI._B1_PROBE_CACHE.clear()
cold, warm = timed(lambda: run_b1(None))
ids, codes = next(iter(KI._B1_PROBE_CACHE.values()))
block["b1"]["forced_probe"] = {
    "cold": cold, "warm": warm,
    "resident_mb": round((ids.nbytes + codes.nbytes) / 1e6, 1),
}
KI._B1_DRIVER_PROBE_MAX_ROWS = block["caps"]["b1_rows"]
a = [tuple(r) for r in run_b1(False)]
KI._B1_PROBE_CACHE.clear()
b = [tuple(r) for r in run_b1(None)]
block["b1"]["identical"] = sorted(a) == sorted(b)
print("b1:", json.dumps(block["b1"]), flush=True)

# ------------------------------------------------------------- graph
t_g = replicate(GRAPH_ROWS, os.path.join(WORK, f"emb_graph_{GRAPH_ROWS}.parquet"))
gbig = spark.read.parquet(t_g)
gdir = H.graph_index_path(t_g)
if not os.path.isdir(os.path.join(gdir, "graph")):
    t0 = time.time()
    H.build_graph_index(
        spark, gbig, t_g, num_parts=8, M=8, ef_construction=40, quantize="b1"
    )
    print(f"# graph build over {GRAPH_ROWS} rows: {time.time()-t0:.0f}s", flush=True)
block["graph"]["artifact_rows"] = gbig.count()


def run_graph(dp):
    return H.knn_query_graph(
        spark, t_g, qvec, K, exact=True, rerank_factor=16, rerank_df=gbig,
        driver_probe=dp,
    ).collect()


H._GRAPH_CACHE.clear() if hasattr(H, "_GRAPH_CACHE") else None
cold, warm = timed(lambda: run_graph(None))
block["graph"]["auto_above_cap"] = {"cold": cold, "warm": warm,
                                    "path": "distributed (probe refused by cap)"}
cold, warm = timed(lambda: run_graph(False))
block["graph"]["distributed"] = {"cold": cold, "warm": warm}
H._GRAPH_PROBE_MAX_ROWS = 1 << 40
cold, warm = timed(lambda: run_graph(None))
block["graph"]["forced_probe"] = {"cold": cold, "warm": warm}
H._GRAPH_PROBE_MAX_ROWS = block["caps"]["graph_rows"]
a = [tuple(r) for r in run_graph(False)]
b = [tuple(r) for r in run_graph(None)]
block["graph"]["identical"] = sorted(a) == sorted(b)
print("graph:", json.dumps(block["graph"]), flush=True)

print(json.dumps(block))
if WRITE:
    p = "/root/repo/BENCH_SCALE.json"
    d = json.load(open(p))
    d["abovecap_path"] = block
    with open(p, "w") as f:
        json.dump(d, f, indent=1)
    print("wrote BENCH_SCALE.json abovecap_path")
