"""Exchange reuse: when the same aggregated subplan feeds a self-join,
Spark shuffles it ONCE and the second consumer reads a ReusedExchange —
the engine-level guarantee that diamond-shaped pipelines (dedup
verify-joins, funnel stages over the same scan) don't pay twice. This is
free Catalyst behavior, pinned here so a future plan change that breaks
reuse (e.g. a nondeterministic expression sneaking into the subplan)
shows up as a test failure, not a 2x shuffle at scale."""

from pyspark.sql import functions as F


def test_self_join_reuses_exchange(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    j = agg.alias("a").join(agg.alias("b"), "l_orderkey").filter(F.col("a.q") > 0)
    rows = j.collect()
    assert rows
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
