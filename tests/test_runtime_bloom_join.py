"""Runtime Bloom-filter join pruning (Catalyst InjectRuntimeFilter): a
selective dimension filter is turned into a bloom_filter_agg on the
build side and a might_contain probe pushed into the fact scan — rows
that can't join are dropped BEFORE the shuffle. This is the engine's
answer to 'semi-join reduction' at 100 TB: the feature is ON by default
and self-arms when the application side exceeds 10GB; the test lowers
the size thresholds because the test corpus is toy-sized."""

from pyspark.sql import functions as F


def test_bloom_filter_injected_and_correct(spark):
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_app = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "10KB",  # sf0.01 lineitem is ~1MB
    )
    try:
        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan.lower()

        # pruning must not change the result
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        ref = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
        )
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        assert j.count() == ref
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prev_app,
        )
