"""As-of (point-in-time) join.

§2.G extra: the reference's host daemon has no as-of join, but the
training-data/north-star pipelines do (latest feature value at event
time). SURVEY §2.G notes "range/as-of via conditions or join + window" —
this is that operator, in the standard distributed form:

    union(left tagged, right tagged)
      -> window over (key) ordered by (time, right-before-left)
      -> last(right payload) carried forward onto left rows

One shuffle on the key, one within-partition sort — the same cost shape
as a sort-merge join, with no range-explosion. Equal timestamps match
(right row sorts before the left probe), mirroring ASOF JOIN's
`left.t >= right.t` semantics.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach `payload` from the right row with the
    greatest right_time <= left_time within the same key. Right rows must
    be unique per (key, time) for deterministic results — pre-dedupe with
    a row_number window if needed.

    how="inner" drops unmatched left rows; how="left" keeps them with
    null payload.
    """
    lcols = left.columns
    if dict(left.dtypes)[left_time] != dict(right.dtypes)[right_time]:
        raise TypeError("left_time and right_time must share a comparable type")
    # The whole payload rides in ONE struct per right row (never null for a
    # right row, even when every payload VALUE is null), so a single
    # last(ignorenulls=True) carries atomically: no stitching of payload
    # columns from different right rows, and match detection is the struct's
    # own nullness — a matched row whose payload values are all null still
    # counts as matched.
    l_tagged = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__isr"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None)
        .cast(
            T.StructType(
                [T.StructField(p, right.schema[p].dataType) for p in payload]
            )
        )
        .alias("__p"),
    )
    r_tagged = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__isr"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        F.struct(*[F.col(p) for p in payload]).alias("__p"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows first at equal time -> inclusive (left.t >= right.t)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__isr").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__isr",
        "__l",
        F.last(F.col("__p"), ignorenulls=True).over(w).alias("__c"),
    )
    out = carried.filter(F.col("__isr") == 0)
    if how == "inner":
        out = out.filter(F.col("__c").isNotNull())
    return out.select(
        *[F.col("__l")[c].alias(c) for c in lcols],
        *[F.col("__c")[p].alias(f"matched_{p}") for p in payload],
    )
