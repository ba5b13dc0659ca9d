"""Stage-level cost decomposition of minhash_dedup_assign at the 10x
corpus + A/B of candidate verify-join shapes. Same-session, interleaved.

Usage: python tools/ab_minhash.py [layout_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from columnar_spark.session import get_spark
from columnar_spark.operators import dedup as DD
from columnar_spark.operators.dedup import band_hashes, ngram_jaccard

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.cache/layout_sf1.0"
spark = get_spark("ab-minhash", cpus=32)
spark.conf.set("spark.sql.shuffle.partitions", "16")
spark.conf.set("spark.sql.adaptive.enabled", "false")
spark.range(1000).selectExpr("sum(id)").collect()

import __spark_entry__ as E

sigs = E._dedupsigs(spark, sf_dir, num_hashes=64, shingle_k=1)
docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
print("# sigs cols:", sigs.columns)

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


def full(cand_df, vsrc_df):
    verified = (
        cand_df.join(vsrc_df.select(F.col("__id"), F.col("__sh")).alias("sa"), "__id")
        .join(
            vsrc_df.select(F.col("__id").alias("__rep"), F.col("__sh").alias("__shr")).alias("sb"),
            "__rep",
        )
        .select(
            "__id", "__rep",
            F.round(ngram_jaccard(F.col("__sh"), F.col("__shr")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.9)
    )
    return (
        verified.groupBy("__id")
        .agg(F.min("__rep").alias("keep_id"), F.max("jaccard").alias("jaccard"))
        .select(F.col("__id").alias("id"), "keep_id", "jaccard")
    )


cases = {
    "full_current": full(cand, vsrc),
    "stage_banded_only": banded.select(F.count(F.col("__bh")).alias("s")),
    "stage_cand_only": cand,
    "full_bcast_cand": full(F.broadcast(cand), vsrc),
}


def bench(df, n=5):
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

n_cand = cand.count()
n_docs = docs.count()
print(f"# cand pairs={n_cand} docs={n_docs}")
spark.stop()
