"""Distributed global row numbering / ranking.

The idiomatic-but-wrong way to number rows by a global order in Spark is
`row_number().over(Window.orderBy(...))` — an unpartitioned window that
shuffles the ENTIRE dataset into one partition: the canonical 100 TB
scale-killer (the same hazard the round-1 audit flagged on
rowid_pseudo_shards). The reference never hits this because its row ids
are physical storage order (columnar.h docid iteration order); an
engine-side global ordinal needs the distributed form:

    repartitionByRange(order keys)     # range partitioner: partition i
                                       #   holds keys < partition i+1's
    -> per-partition counts            # #partitions rows
    -> exclusive prefix sum of counts  # window over THAT tiny table
    -> broadcast offsets back
    -> row_number within partition + offset

Every stage is bounded per task; the only single-partition window runs
over #partitions rows, not the data. Same decomposition as the
percentile CDF (operators/percentiles.py) — compute global order
statistics from range-partitioned local order plus offsets.

Ties: row_number assigns an arbitrary winner among equal keys (both here
and in the builtin window), so results are only deterministic when the
order key is unique — pass a tiebreaker column to make it total, as you
would for any engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_by: Sequence[str | Column],
    name: str = "row_num",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append 1-based `name` numbering rows by the total order of
    `order_by` (ascending for string column names; pass Column
    expressions e.g. F.col(c).desc() for other orders) — without ever
    moving the dataset through a single partition.
    """
    sess = df.sparkSession
    nparts = num_partitions or int(sess.conf.get("spark.sql.shuffle.partitions"))
    keys = [F.col(c) if isinstance(c, str) else c for c in order_by]

    ranged = df.repartitionByRange(nparts, *keys).withColumn(
        "__pid", F.spark_partition_id()
    )
    psums = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    # partitionBy(lit(0)): same single partition (input is #partitions
    # rows, bounded), but an explicit one — avoids the misleading
    # "No Partition Defined" scale warning in executed plans/logs.
    w_off = (
        Window.partitionBy(F.lit(0))
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = psums.select(
        "__pid", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )

    w_local = Window.partitionBy("__pid").orderBy(*keys)
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(name, F.row_number().over(w_local) + F.col("__off"))
        .drop("__pid", "__off")
    )


def global_rank(
    df: DataFrame,
    order_by: Sequence[str | Column],
    name: str = "rnk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append SQL RANK() semantics over a global order (ties share the
    smallest row number of the group; gaps after ties), distributed the
    same way. Rank of a row = 1 + count of rows strictly before it, so
    per-partition rank + the partition's row offset is exact as long as
    equal keys land in the same range partition — which the range
    partitioner guarantees (partition assignment is a pure function of
    the key, so a key never splits). A single dominant key therefore
    lands in one partition: that is a skew concern, not a correctness
    one — for that regime prefer global_row_number with a tiebreaker.
    """
    sess = df.sparkSession
    nparts = num_partitions or int(sess.conf.get("spark.sql.shuffle.partitions"))
    keys = [F.col(c) if isinstance(c, str) else c for c in order_by]

    ranged = df.repartitionByRange(nparts, *keys).withColumn(
        "__pid", F.spark_partition_id()
    )
    psums = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    # partitionBy(lit(0)): same single partition (input is #partitions
    # rows, bounded), but an explicit one — avoids the misleading
    # "No Partition Defined" scale warning in executed plans/logs.
    w_off = (
        Window.partitionBy(F.lit(0))
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = psums.select(
        "__pid", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )

    w_local = Window.partitionBy("__pid").orderBy(*keys)
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(name, F.rank().over(w_local) + F.col("__off"))
        .drop("__pid", "__off")
    )
