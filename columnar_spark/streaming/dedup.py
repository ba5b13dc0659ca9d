"""Streaming deduplication — exact dedup's streaming twin.

Training-data ingest pipelines dedupe on arrival; Structured Streaming
gives this natively with watermark-bounded state:

- `stream_dedup`: drop exact duplicates on key columns, holding state
  only within the watermark horizon (`dropDuplicatesWithinWatermark`,
  state is bounded — the 100 TB-safe form).
- On a static frame the same call degrades to a plain dropDuplicates,
  so batch backfills share the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first-seen row per key within the watermark horizon."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
