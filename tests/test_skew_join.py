"""AQE skew-join handling — the engine's answer to hot keys at 100 TB.

A shuffle join where one key holds most of the rows would pin a single
task (the classic straggler). With spark.sql.adaptive.skewJoin (on in
session.tune()), AQE detects the oversized partition at runtime and
splits it into multiple tasks, each joining a replicated slice of the
other side. The test builds a deliberately skewed corpus (90% of rows
share one key), lowers the skew thresholds to toy scale, and asserts
(a) the finalized adaptive plan marks the sort-merge join skew=true,
(b) results are identical to the non-adaptive run.

Two AQE subtleties the test encodes: the skew split only appears in a
DataFrame's own finalized plan (collect() on it — a count() runs a
separate query execution), and an aggregation directly on the join
output suppresses OptimizeSkewedJoin (splitting would violate the
agg's required distribution), so the assertion targets the bare join —
the same reason production pipelines land skewed joins before wide
aggs or set forceOptimizeSkewedJoin.
"""

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # force a sort-merge join (broadcast would dodge the skew entirely)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        n = 200_000
        # 90% of fact rows share key 0; dims are uniform
        fact = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            (F.col("id") * 7).alias("payload"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") + 100).alias("attr")
        )
        # keep payload in the output: column pruning would otherwise
        # shrink the skewed partition to one repeated (highly
        # compressible) key column below the detection threshold
        j = fact.join(dim, "k").select("k", "payload", "attr")
        rows = j.collect()  # finalizes THIS DataFrame's adaptive plan

        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]

        spark.conf.set("spark.sql.adaptive.enabled", "false")
        ref = fact.join(dim, "k").select("k", "payload", "attr").collect()

        def agg(rs):
            out = {}
            for r in rs:
                nn, ss = out.get(r["k"], (0, 0))
                out[r["k"]] = (nn + 1, ss + r["attr"] + r["payload"])
            return out

        assert agg(rows) == agg(ref)
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
