"""Bucketed tables: a join keyed on the bucket columns between two
co-bucketed tables runs with ZERO exchanges — the scan satisfies the
hash distribution. The shuffle this removes is the dominant cost of
big fact-fact joins at scale."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.writer import write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cobucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    write_bucketed(orders, "b_orders", str(tmp_path / "bo"), ["o_orderkey"], 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        str(tmp_path / "bl"),
        ["o_orderkey"],
        8,
    )
    try:
        j = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan

        # and the answer matches the plain shuffled join
        want = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
        assert j.count() == want

        # bucketed aggregation on the key also skips the exchange
        agg = spark.table("b_lineitem").groupBy("o_orderkey").count()
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_vs_unbucketed_join_shuffles(spark, tmp_path, no_broadcast):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    # control: same join over bare parquet DOES shuffle both sides
    j = orders.join(li, "o_orderkey")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") >= 2
