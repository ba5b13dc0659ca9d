"""A/B: verify-join exchange reuse + intersect-only jaccard for
minhash_dedup at the 10x corpus. Same-session, interleaved."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from columnar_spark.session import get_spark
from columnar_spark.operators.dedup import band_hashes, ngram_jaccard

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.cache/layout_sf1.0"
spark = get_spark("ab-minhash2", cpus=32)
spark.conf.set("spark.sql.shuffle.partitions", "16")
spark.conf.set("spark.sql.adaptive.enabled", "false")
spark.range(1000).selectExpr("sum(id)").collect()

import __spark_entry__ as E

sigs = E._dedupsigs(spark, sf_dir, num_hashes=64, shingle_k=1)
num_hashes, bands = 64, 4
rows_per_band = num_hashes // bands
id_col = "doc_id"

sig = sigs.select(F.col(id_col).alias("__id"), F.col("minhash").alias("__sig"))
banded = sig.select(
    "__id",
    F.posexplode(band_hashes(F.col("__sig"), bands, rows_per_band)).alias("__band", "__bh"),
)
wb = Window.partitionBy("__band", "__bh")
cand = (
    banded.withColumn("__rep", F.min("__id").over(wb))
    .filter(F.col("__id") > F.col("__rep"))
    .select("__id", "__rep")
    .distinct()
)
vsrc = sigs.select(F.col(id_col).alias("__id"), F.col("shingle_hashes").alias("__sh"))


def jacc_current(a, b):
    return F.size(F.array_intersect(a, b)).cast("double") / F.greatest(
        F.size(F.array_union(a, b)), F.lit(1)
    ).cast("double")


def jacc_distinct(a, b):
    i = F.size(F.array_intersect(a, b))
    u = F.size(a) + F.size(b) - i
    return i.cast("double") / F.greatest(u, F.lit(1)).cast("double")


def finish(verified):
    return (
        verified.filter(F.col("jaccard") >= 0.9)
        .groupBy("__id")
        .agg(F.min("__rep").alias("keep_id"), F.max("jaccard").alias("jaccard"))
        .select(F.col("__id").alias("id"), "keep_id", "jaccard")
    )


def v_current(jacc):
    verified = (
        cand.join(vsrc.select(F.col("__id"), F.col("__sh")).alias("sa"), "__id")
        .join(
            vsrc.select(F.col("__id").alias("__rep"), F.col("__sh").alias("__shr")).alias("sb"),
            "__rep",
        )
        .select("__id", "__rep", F.round(jacc(F.col("__sh"), F.col("__shr")), 6).alias("jaccard"))
    )
    return finish(verified)


def v_reuse(jacc):
    sa = vsrc.alias("sa")
    sb = vsrc.alias("sb")
    c = cand.alias("c")
    verified = (
        c.join(sa, F.col("c.__id") == F.col("sa.__id"))
        .select(F.col("c.__id").alias("__mid"), F.col("c.__rep").alias("__rep"), F.col("sa.__sh").alias("__sha"))
        .join(sb, F.col("__rep") == F.col("sb.__id"))
        .select(
            F.col("__mid").alias("__id"), "__rep",
            F.round(jacc(F.col("__sha"), F.col("sb.__sh")), 6).alias("jaccard"),
        )
    )
    return finish(verified)


cases = {
    "current": v_current(jacc_current),
    "reuse": v_reuse(jacc_current),
    "jacc": v_current(jacc_distinct),
    "reuse+jacc": v_reuse(jacc_distinct),
}


def bench(df, n=4):
    df.write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(n):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


results = {k: [] for k in cases}
for rnd in range(3):
    for k, df in cases.items():
        results[k].append(bench(df, n=3))
for k, v in results.items():
    print(f"{k}: best={min(v):.3f} rounds={[round(x,3) for x in v]}")

# row parity
a = sorted(map(tuple, cases["current"].collect()))
for k in ("reuse", "jacc", "reuse+jacc"):
    b = sorted(map(tuple, cases[k].collect()))
    print(f"# rows {k} == current: {a == b} ({len(b)} rows)")

# exchange count in the reuse plan
for k in ("current", "reuse+jacc"):
    p = cases[k]._jdf.queryExecution().executedPlan().toString()
    print(f"# {k}: exchanges={p.count('Exchange')} reused={p.count('ReusedExchange')}")
spark.stop()
