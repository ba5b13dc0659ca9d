"""A/B harness for retention_cohorts plan variants at the 10x corpus.

Usage: python tools/ab_retention.py [sf_dir] [reps]
Prints per-variant best-of-N wall-clock; verifies every variant returns
the identical result multiset first.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.cache/layout_sf1.0"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from columnar_spark.session import get_spark

spark = get_spark()
import __spark_entry__ as E

ev = E._events(spark, SF).select(
    "user_id", F.expr("ts_us div 86400000000").alias("day")
)
ev.cache().count()  # isolate plan cost from IO variance? NO — we want IO.
ev.unpersist()


def current(ev):
    per_user = ev.groupBy("user_id").agg(
        F.min("day").alias("day0"), F.collect_set("day").alias("days")
    )
    return (
        per_user.select(
            F.col("day0").alias("cohort_day"), F.explode("days").alias("day")
        )
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).cast("long").alias("offset_days"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


def window_dedup(ev):
    w = Window.partitionBy("user_id").orderBy("day")
    wa = Window.partitionBy("user_id")
    dd = (
        ev.withColumn("prev", F.lag("day").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("day")))
        .withColumn("day0", F.min("day").over(wa))
    )
    return dd.groupBy(
        F.col("day0").alias("cohort_day"),
        (F.col("day") - F.col("day0")).cast("long").alias("offset_days"),
    ).agg(F.count(F.lit(1)).alias("active_users"))


OUT = T.StructType(
    [
        T.StructField("cohort_day", T.LongType()),
        T.StructField("offset_days", T.LongType()),
        T.StructField("active_users", T.LongType()),
    ]
)


def sorted_mip(ev, n_parts=32):
    """Sorted-stream mapInPandas with batch-boundary carry (pack.py
    pattern): per-partition local (cohort, offset)->count aggregation,
    final tiny global sum."""

    def gen(batches):
        import pandas as pd

        counts = {}
        cur_user = None
        cur_day0 = None
        cur_days = None

        def flush():
            if cur_user is None:
                return
            for d in cur_days:
                key = (cur_day0, d - cur_day0)
                counts[key] = counts.get(key, 0) + 1

        for pdf in batches:
            users = pdf["user_id"].to_numpy()
            days = pdf["day"].to_numpy()
            i = 0
            n = len(users)
            while i < n:
                u = users[i]
                j = i
                while j < n and users[j] == u:
                    j += 1
                chunk = days[i:j]
                if u == cur_user:
                    cur_days.update(chunk.tolist())
                    cur_day0 = min(cur_day0, int(chunk.min()))
                else:
                    flush()
                    cur_user = u
                    cur_days = set(chunk.tolist())
                    cur_day0 = int(chunk.min())
                i = j
        flush()
        if counts:
            ks = list(counts)
            yield pd.DataFrame(
                {
                    "cohort_day": [k[0] for k in ks],
                    "offset_days": [k[1] for k in ks],
                    "active_users": [counts[k] for k in ks],
                }
            )

    part = ev.repartition(n_parts, "user_id").sortWithinPartitions("user_id")
    partial = part.mapInPandas(gen, OUT)
    return partial.groupBy("cohort_day", "offset_days").agg(
        F.sum("active_users").alias("active_users")
    )


VARIANTS = {
    "current_collect_set": current,
    "window_dedup": window_dedup,
    "sorted_mapInPandas": sorted_mip,
}

base = sorted(map(tuple, current(ev).collect()))
for name, fn in VARIANTS.items():
    got = sorted(map(tuple, fn(ev).collect()))
    print(name, "MATCH" if got == base else "MISMATCH", flush=True)
    assert got == base, name

for name, fn in VARIANTS.items():
    best = 1e9
    for _ in range(REPS):
        t0 = time.time()
        fn(ev).collect()
        best = min(best, time.time() - t0)
    print(f"{name}: best={best:.3f}s", flush=True)
