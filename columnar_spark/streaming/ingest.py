"""Streaming ingest + index maintenance — reference §2.G streaming row.

The reference itself is write-once-read-many; its host daemon handles
streaming by rebuilding MCL files from RT segments, and index updates
invalidate/rebuild secondary artifacts (secondary.cpp:391-434, E9).

Spark-first equivalent: Structured Streaming file source ->
`foreachBatch` that (a) appends the normalized batch to the table and
(b) transactionally refreshes the stats manifest — the same
"storage + sidecar indexes rebuilt together" contract. Watermarked
windowed aggregation covers the reference's host-side time-bucket
analytics over late data.

Scale posture: foreachBatch bodies are plain DataFrame jobs (no driver
loops); state for windowed aggs is bounded by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_spark.stats import build_stats_manifest
from columnar_spark.writer import WriteSpec, normalize, stats_path


def stream_ingest(
    spark: SparkSession,
    src_dir: str,
    dst_path: str,
    checkpoint_dir: str,
    schema,
    spec: WriteSpec | None = None,
    available_now: bool = True,
):
    """File-source streaming ingest with per-batch stats maintenance.

    Returns the started StreamingQuery; with available_now=True it drains
    the source and stops (batch-incremental mode — call repeatedly as new
    files land)."""
    spec = spec or WriteSpec()
    stream = spark.readStream.schema(schema).parquet(src_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = normalize(batch_df, spec)
        out.write.mode("append").option("compression", spec.compression).parquet(dst_path)
        # E9 analog: sidecar stats rebuilt in the same maintenance step.
        manifest = build_stats_manifest(batch_df.sparkSession.read.parquet(dst_path))
        manifest.write.mode("overwrite").parquet(stats_path(dst_path))

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 day",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window aggregation — works identically on a
    static DataFrame (tests/oracles) and a streaming one (production).
    `ts_col` must be a TimestampType column."""
    wm = events.withWatermark(ts_col, watermark)
    return wm.groupBy(
        F.window(F.col(ts_col), window).alias("win"), *[F.col(c) for c in group_cols]
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *group_cols,
        "n",
        "total_value",
    )
