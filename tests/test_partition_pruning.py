"""Hive-partitioned layout: a filter on the partition column must prune
whole directories at plan time (PartitionFilters in the scan, partition
count in the executed plan lower than the total)."""

from pyspark.sql import functions as F

from columnar_spark.writer import WriteSpec, write_table


def test_partition_filter_prunes_directories(spark, tmp_path):
    path = str(tmp_path / "orders_by_year.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    write_table(orders, path, WriteSpec(partition_by=("o_year",)))

    df = spark.read.parquet(path)
    n_years = df.select("o_year").distinct().count()
    assert n_years >= 3

    q = df.filter(F.col("o_year") == 1996)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the predicate lands in PartitionFilters (directory pruning), not in
    # the data filters — no file under another year is even opened
    assert "PartitionFilters" in plan
    assert "o_year" in plan.split("PartitionFilters")[1][:200]
    ref = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(F.year("o_orderdate") == 1996)
        .count()
    )
    assert q.count() == ref


def test_partition_values_roundtrip(spark, tmp_path):
    path = str(tmp_path / "p.parquet")
    df = spark.range(100).withColumn("b", (F.col("id") % 4).cast("int"))
    write_table(df, path, WriteSpec(partition_by=("b",)))
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert back.filter(F.col("b") == 2).count() == 25


def test_dynamic_partition_pruning_fires_on_dim_filter(spark, tmp_path):
    """The 100 TB join pattern: fact hive-partitioned on the join key's
    function, dim carries the selective filter. Catalyst must inject a
    runtime subquery into the fact scan's PartitionFilters (DPP) so only
    the dim-selected partitions are read — without the filter ever being
    written against the fact table."""
    path = str(tmp_path / "fact_by_year.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    write_table(orders, path, WriteSpec(partition_by=("o_year",)))

    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(1996, "pick"), (1997, "drop"), (1998, "drop")], "y: int, tag: string"
    )
    j = fact.join(dim.filter(F.col("tag") == "pick"), fact["o_year"] == dim["y"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:1500]

    want = orders.filter(F.year("o_orderdate") == 1996).count()
    assert j.count() == want
