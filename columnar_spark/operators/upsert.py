"""Latest-state compaction (upsert materialization).

The reference's index maintenance (E9) rebuilds per-batch artifacts; the
analytics-side counterpart every CDC/event pipeline needs is "latest row
per key" — compacting an append-only log into current state. Expressed
as one window over (key) with a DETERMINISTIC total order (ties on the
timestamp must be broken by a unique column, or two engines/runs pick
different survivors).

Scale posture: one shuffle on the key; row_number + filter(=1) is
whole-stage-codegen'd and needs no per-key state beyond the sort run.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """One row per key: the last row under `order_by` (descending,
    left-to-right priority). `order_by` must be a total order within each
    key group — include a unique tie-breaker column."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
