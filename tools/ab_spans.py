"""A/B for repeated_spans at the 10x corpus: text keys (current) vs
hash keys vs dropping the unused first-occurrence bookkeeping."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from columnar_spark.session import get_spark
from columnar_spark.operators.dedup import repeated_span_grams, _merged_spans

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.cache/layout_sf1.0"
spark = get_spark("ab-spans", cpus=32)
spark.conf.set("spark.sql.shuffle.partitions", "16")
spark.conf.set("spark.sql.adaptive.enabled", "false")
spark.range(1000).selectExpr("sum(id)").collect()

from columnar_spark.functions.layout import ensure_parallelism

docs = ensure_parallelism(spark.read.parquet(os.path.join(sf_dir, "documents.parquet")))
n = 8


def occurrences(hash_grams, with_first):
    g = repeated_span_grams(docs, "text", "doc_id", n, hash_grams)
    wk = Window.partitionBy("__key")
    out = g.withColumn("__cnt", F.count(F.lit(1)).over(wk))
    if with_first:
        first = F.min(F.struct(F.col("__id"), F.col("__s"))).over(wk)
        out = out.withColumn(
            "__is_first",
            (F.col("__id") == first["__id"]) & (F.col("__s") == first["__s"]),
        )
    cols = ["__id", "__s"] + (["__is_first"] if with_first else [])
    return out.filter(F.col("__cnt") > 1).select(*cols)


from columnar_spark.operators.dedup import repeated_spans

cases = {
    "text_first(current)": _merged_spans(occurrences(False, True), n, "doc_id"),
    "kernel": repeated_spans(docs, "text", "doc_id", n=n, hash_grams="kernel"),
}


def bench(df, nit=4):
    df.write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(nit):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


results = {k: [] for k in cases}
for rnd in range(3):
    for k, df in cases.items():
        results[k].append(bench(df, nit=3))
for k, v in results.items():
    print(f"{k}: best={min(v):.3f} rounds={[round(x,3) for x in v]}")

a = sorted(map(tuple, cases["text_first(current)"].collect()))
for k in ("kernel",):
    b = sorted(map(tuple, cases[k].collect()))
    print(f"# rows {k} == current: {a == b} ({len(b)} rows)")
spark.stop()
