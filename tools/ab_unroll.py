"""Same-session A/B: dim-unrolled vs fold distance expressions at sf0.1.

Reproduces the bench's timed region (noop-sink re-execution of a built
DataFrame) for the KNN serving family, interleaving the two expression
forms so box drift cancels. Usage: python tools/ab_unroll.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from columnar_spark.session import get_spark
from columnar_spark.functions.vector import cosine_dist, vec_lit, py_norm
from columnar_spark.operators import knn as KNN

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.cache/layout_sf0.1"
spark = get_spark("ab-unroll", cpus=32)
spark.conf.set("spark.sql.shuffle.partitions", "16")
spark.conf.set("spark.sql.adaptive.enabled", "false")
spark.range(1000).selectExpr("sum(id)").collect()

emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
qvec = [float(x) for x in emb.filter(F.col("vec_id") == 7).select("embedding").first()[0]]
d = len(qvec)
print(f"# embeddings rows={emb.count()} dim={d}")


def topk_df(dim):
    dist = cosine_dist(
        F.col("embedding").cast("array<double>"), vec_lit(qvec),
        b_norm=py_norm(qvec), dim=dim,
    )
    out = emb.withColumn("dist", dist)
    return (
        out.orderBy(F.col("dist").asc(), F.col("vec_id").asc()).limit(10)
        .select("vec_id", "label", (F.round(F.col("dist"), 6) + F.lit(0.0)).alias("dist"))
    )


def b1_like_df(dim):
    # the rerank shape: tiny isin-filtered candidate set + distance expr
    ids = [r[0] for r in emb.select("vec_id").limit(160).collect()]
    cand = emb.filter(F.col("vec_id").isin(ids))
    dist = cosine_dist(
        F.col("embedding").cast("array<double>"), vec_lit(qvec),
        b_norm=py_norm(qvec), dim=dim,
    )
    out = cand.withColumn("dist", dist)
    return out.orderBy(F.col("dist").asc(), F.col("vec_id").asc()).limit(10)


def bench(df, n=7):
    df.write.format("noop").mode("overwrite").save()  # warm
    best = None
    times = []
    for _ in range(n):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        times.append(dt)
        best = dt if best is None else min(best, dt)
    return best, times


cases = {
    "topk_unroll": topk_df(d),
    "topk_fold": topk_df(None),
    "b1_unroll": b1_like_df(d),
    "b1_fold": b1_like_df(None),
}
# interleave 3 rounds
results = {k: [] for k in cases}
for rnd in range(3):
    for k, df in cases.items():
        b, ts = bench(df, n=5)
        results[k].append(b)
for k, v in results.items():
    print(f"{k}: best={min(v):.3f} rounds={[round(x,3) for x in v]}")
spark.stop()
