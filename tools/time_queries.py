"""Ad-hoc per-query timer against an ingested layout.

Usage: python tools/time_queries.py <layout_dir> q13_order_distribution [...]
Noop-sink write, best of 3, same methodology as bench.py (AQE off,
16 shuffle partitions at toy SF — pass SPARK_GRAFT_AQE=1 to keep AQE).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from columnar_spark.session import get_spark


def main() -> None:
    layout = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("time-queries")
    if not os.environ.get("SPARK_GRAFT_AQE"):
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(1).write.format("noop").mode("overwrite").save()
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, layout)
        best = None
        for _ in range(3):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best:.3f}s")


if __name__ == "__main__":
    main()
