"""Empirical scaling evidence: run representative operators at 1x and
Nx the sf0.1 corpus and report the time ratio.

The 100 TB claim in this repo is an argument about plan shapes (bounded
per-task memory, no single-partition data paths, linear shuffles). This
tool adds the measurement: replicate lineitem/orders N times WITH
SHIFTED KEYS (so join fan-out and group counts scale like real data
growth, not duplicated keys), and time an aggregation, a join, a
grouped window, the global-rank operator, and the medium-tier exact
percentile at both scales. A scale-safe plan should grow ~linearly
(ratio ~N on fixed cores, minus amortized fixed costs); a quadratic or
single-partition plan blows past it.

Usage: python tools/bench_scaling.py [N] [sf_dir]   (default N=10)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from columnar_spark.session import get_spark


def _replicate(df: DataFrame, n: int, key_cols: list[str]) -> DataFrame:
    """n copies; every key column shifted per copy so keys stay unique
    across copies (joins/groups scale like real growth)."""
    offsets = {c: df.agg(F.max(c)).first()[0] + 1 for c in key_cols}
    rep = df.crossJoin(df.sparkSession.range(n).toDF("__copy"))
    for c, off in offsets.items():
        rep = rep.withColumn(c, F.col(c) + F.col("__copy") * F.lit(off))
    return rep.drop("__copy")


def _time(mk, runs: int = 2) -> float:
    mk().write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(runs):
        t0 = time.time()
        mk().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.cache/layout_sf0.1"

    spark = get_spark("bench-scaling")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    cache = os.path.join(os.path.dirname(sf_dir.rstrip("/")), f"scale{n}")
    li_p, od_p = os.path.join(cache, "lineitem.parquet"), os.path.join(cache, "orders.parquet")
    if not os.path.exists(li_p):
        os.makedirs(cache, exist_ok=True)
        li0 = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        od0 = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        _replicate(li0, n, ["l_orderkey"]).repartition(32).write.mode("overwrite").parquet(li_p)
        _replicate(od0, n, ["o_orderkey", "o_custkey"]).repartition(32).write.mode(
            "overwrite"
        ).parquet(od_p)
    # settle/warm both scales, untimed
    for p in (os.path.join(sf_dir, "lineitem.parquet"), os.path.join(sf_dir, "orders.parquet"), li_p, od_p):
        spark.read.parquet(p).write.format("noop").mode("overwrite").save()

    def suite(li: DataFrame, od: DataFrame) -> dict[str, float]:
        from columnar_spark.operators.percentiles import percentile_cont_bracket
        from columnar_spark.operators.rank import global_row_number

        dec = lambda c: F.col(c).cast("decimal(18,2)")
        out = {}
        out["agg_q1_shape"] = _time(
            lambda: li.groupBy("l_returnflag", "l_linestatus").agg(
                F.sum(dec("l_quantity")),
                F.sum(dec("l_extendedprice")),
                F.avg("l_discount"),
                F.count(F.lit(1)),
            )
        )
        out["join_q3_shape"] = _time(
            lambda: li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderdate")
            .agg(F.sum(dec("l_extendedprice")))
        )
        out["window_grouped"] = _time(
            lambda: od.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
                ),
            ).filter(F.col("rn") <= 3)
        )
        out["global_rank"] = _time(
            lambda: global_row_number(
                od.select("o_orderkey", "o_orderdate"),
                ["o_orderdate", "o_orderkey"],
                name="rn",
            )
        )
        out["exact_percentile_ndv"] = _time(
            lambda: percentile_cont_bracket(li, "l_extendedprice", [0.5], ["p50"])
        )

        from columnar_spark.operators.heavyhitters import heavy_hitters
        from columnar_spark.operators.rangejoin import interval_overlap_join
        from columnar_spark.streaming.rollup import (
            finalize_rollup,
            merge_rollup,
            rollup_partials,
        )

        out["heavy_hitters"] = _time(
            lambda: heavy_hitters(od.select("o_custkey"), "o_custkey", 100)
        )

        def mk_overlap():
            TEN_D = 10 * 86_400_000_000
            lo = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            w = od.select(
                F.col("o_custkey"), F.col("o_orderkey"),
                lo.alias("lo"), (lo + TEN_D).alias("hi"),
            )
            a = w.select(
                F.col("o_custkey").alias("c1"), F.col("o_orderkey").alias("k1"),
                F.col("lo").alias("lo1"), F.col("hi").alias("hi1"),
            )
            b = w.select(
                F.col("o_custkey").alias("c2"), F.col("o_orderkey").alias("k2"),
                F.col("lo").alias("lo2"), F.col("hi").alias("hi2"),
            )
            return interval_overlap_join(
                a, b, "lo1", "hi1", "lo2", "hi2", TEN_D, keys=("c1", "c2")
            ).filter(F.col("k1") < F.col("k2"))

        out["interval_overlap_join"] = _time(mk_overlap)

        def mk_rollup():
            ev = od.select(
                F.col("o_orderdate").cast("timestamp").alias("ts"),
                F.col("o_orderstatus").alias("event_type"),
                F.col("o_totalprice").alias("value"),
                F.col("o_orderkey"),
            )
            parts = None
            for i in range(4):
                p = rollup_partials(ev.filter(F.col("o_orderkey") % 4 == i))
                parts = p if parts is None else parts.unionByName(p)
            return finalize_rollup(merge_rollup(parts))

        out["rollup_merge"] = _time(mk_rollup)
        return out

    li1 = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    od1 = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t1 = suite(li1, od1)
    tn = suite(spark.read.parquet(li_p), spark.read.parquet(od_p))

    # full-text: batch BM25 over an N-times-larger corpus (docs get new
    # ids per copy; the postings build and the score aggregation are the
    # scaling surfaces — query-term count is constant)
    from columnar_spark.operators.fulltext import bm25_batch_search

    dc_p = os.path.join(cache, "documents.parquet")
    dc1 = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if not os.path.exists(dc_p):
        _replicate(dc1, n, ["doc_id"]).repartition(32).write.mode("overwrite").parquet(dc_p)
    dcn = spark.read.parquet(dc_p)
    for d in (dc1, dcn):
        d.write.format("noop").mode("overwrite").save()
    BM25_QS = [("qa", "vector scan merge"), ("qb", "customer order line"), ("qc", "window batch")]
    t1["bm25_batch"] = _time(lambda: bm25_batch_search(dc1, BM25_QS, k=5))
    tn["bm25_batch"] = _time(lambda: bm25_batch_search(dcn, BM25_QS, k=5))

    ratios = {k: round(tn[k] / t1[k], 2) if t1[k] else None for k in t1}
    print(
        json.dumps(
            {"replication": n, "t_1x": t1, "t_Nx": tn, "ratio": ratios}
        )
    )


if __name__ == "__main__":
    main()
