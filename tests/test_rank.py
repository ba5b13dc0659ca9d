"""Distributed global row_number / rank vs the builtin unpartitioned
window (the single-partition plan we refuse to ship) on small data,
plus a plan-shape assertion that the distributed form never moves the
dataset through one partition."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from columnar_spark.operators.rank import global_rank, global_row_number


@pytest.fixture(scope="module")
def df(spark):
    # Unique total key (id), plus a low-cardinality key with ties.
    return (
        spark.range(0, 10_000)
        .withColumn("v", (F.col("id") * 2654435761) % 1000003)
        .withColumn("g", F.col("id") % 7)
        .repartition(16)
    )


def test_global_row_number_matches_builtin(df):
    # v has hash collisions by construction; id is the tiebreaker making
    # the order total (row_number on a non-total order is arbitrary in
    # ANY engine).
    got = global_row_number(df, ["v", "id"], name="rn", num_partitions=8)
    ref = df.withColumn("rn", F.row_number().over(Window.orderBy("v", "id")))
    assert (
        got.select("id", "rn").exceptAll(ref.select("id", "rn")).count() == 0
        and got.count() == ref.count()
    )


def test_global_row_number_desc(df):
    got = global_row_number(
        df, [F.col("v").desc(), F.col("id").desc()], name="rn", num_partitions=8
    )
    ref = df.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.col("v").desc(), F.col("id").desc())),
    )
    assert got.select("id", "rn").exceptAll(ref.select("id", "rn")).count() == 0


def test_global_rank_ties(df):
    # g has 7 distinct values -> massive tie groups; RANK must match.
    got = global_rank(df, ["g"], name="r", num_partitions=4)
    ref = df.withColumn("r", F.rank().over(Window.orderBy("g")))
    assert got.select("id", "r").exceptAll(ref.select("id", "r")).count() == 0


def test_no_single_partition_exchange(df):
    """The builtin global window plans Exchange SinglePartition; the
    distributed form must not (its only ordered window runs over the
    #partitions-row offsets table, which Spark still plans as a
    SinglePartition exchange of THAT side — so assert the base data
    path is range-partitioned, by checking the final plan contains a
    rangepartitioning exchange and the window over the data is keyed
    by __pid)."""
    got = global_row_number(df, ["v"], name="rn", num_partitions=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # the data-side window must be partitioned (partitionBy __pid)
    assert "partitionBy [__pid" in plan.replace("Seq(", "[") or "__pid" in plan
