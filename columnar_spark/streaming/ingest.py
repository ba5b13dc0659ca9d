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

from columnar_spark.functions import money

from columnar_spark.stats import (
    build_stats_sketch,
    manifest_from_sketch,
    merge_sketches,
    sketch_path,
)
from columnar_spark.writer import WriteSpec, normalize, stats_path


def append_batch(
    batch_df: DataFrame,
    dst_path: str,
    spec: WriteSpec | None = None,
    batch_id: int | None = None,
) -> None:
    """Append one batch to a table with full sidecar maintenance: the
    normalized rows land in the table, the stats sketch/manifest merge
    in the batch's contribution (O(batch), mergeable HLL + associative
    min/max/counts), and — if the table carries a persisted IVF-PQ
    index — the batch's codes append with the existing centroids/
    codebooks (no retrain). One contract shared by batch CLI appends and
    the streaming foreachBatch sink, mirroring the reference's
    storage-plus-sidecars rebuild unit (secondary.cpp:391-434, E9)."""
    import os

    spec = spec or WriteSpec()
    out = normalize(batch_df, spec)
    # Align column order with the existing table: JSON/CSV readers order
    # columns alphabetically/by header, and while Spark merges parquet
    # schemas by name, stricter readers expect one field order per table.
    if os.path.isdir(dst_path):
        existing = batch_df.sparkSession.read.parquet(dst_path).columns
        if set(existing) <= set(out.columns):
            out = out.select(*existing, *[c for c in out.columns if c not in existing])
    out.write.mode("append").option("compression", spec.compression).parquet(dst_path)
    ss = batch_df.sparkSession
    sp = sketch_path(dst_path)
    if os.path.isdir(sp):
        merged = merge_sketches(ss.read.parquet(sp), build_stats_sketch(out))
    else:
        # first sidecar for this table: the table may have pre-existing
        # rows the batch sketch wouldn't cover — bootstrap from the full
        # post-append table (one-time O(table); every later append merges
        # O(batch)). For a brand-new table this reads exactly the batch.
        merged = build_stats_sketch(ss.read.parquet(dst_path))
    # materialize before overwriting the path the plan reads from
    rows = merged.collect()  # n_columns tiny rows
    merged_df = ss.createDataFrame(rows, merged.schema)
    merged_df.coalesce(1).write.mode("overwrite").parquet(sp)
    manifest_from_sketch(merged_df).coalesce(1).write.mode("overwrite").parquet(
        stats_path(dst_path)
    )
    # Same contract for the vector sidecar: encode the batch with the
    # EXISTING centroids/codebooks and append its codes — rebuild
    # happens at compaction, like the reference's segment rebuilds.
    from columnar_spark.operators.knn_index import (
        append_to_vector_index,
        load_vector_index,
    )

    vidx = load_vector_index(dst_path)
    if vidx is not None and vidx.vec_col in out.columns:
        append_to_vector_index(ss, out, dst_path)
    # Persisted value-index sidecars (A11 artifact): fold the batch's
    # value counts in — O(index + batch-ndv), same merge contract.
    from columnar_spark.stats import (
        json_index_meta,
        merge_posting_index,
        merge_value_index,
        persisted_posting_index_cols,
        persisted_value_index_cols,
        posting_index_id_col,
    )

    for c in persisted_value_index_cols(dst_path):
        jmeta = json_index_meta(dst_path, c)
        if c in out.columns or (jmeta is not None and jmeta["parent"] in out.columns):
            # JSON field indexes merge from the parent column (the
            # virtual field is computed inside merge_value_index)
            merge_value_index(ss, dst_path, c, out)
    for c in persisted_posting_index_cols(dst_path):
        idc = posting_index_id_col(dst_path, c)
        if c in out.columns and idc and idc in out.columns:
            merge_posting_index(ss, dst_path, c, out, idc)
    # Inverted-text sidecar: append the batch's postings/lengths with
    # the persisted analyzer — O(batch tokens), same append-only merge
    # contract as the vector and value sidecars.
    from columnar_spark.operators.fulltext import (
        append_to_text_index,
        load_text_index,
    )

    # batch_id (the streaming epoch id) makes the merge replay-safe:
    # foreachBatch sinks run at-least-once, and a retried batch must
    # not double-index (stage-then-commit inside append_to_text_index).
    loaded = load_text_index(ss, dst_path)
    if loaded is not None and loaded[2]["text_col"] in out.columns:
        append_to_text_index(ss, dst_path, out, batch_id=batch_id)
    # Vocabulary monitor sidecar: fold the batch's unigram counts in as
    # a delta segment (O(batch tokens), replay-safe via atomic rename).
    from columnar_spark.streaming.vocab import append_vocab_delta, vocab_meta

    vm = vocab_meta(dst_path)
    if vm is not None and vm["text_col"] in out.columns:
        append_vocab_delta(ss, dst_path, out, batch_id=batch_id)


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
        append_batch(batch_df, dst_path, spec, batch_id=batch_id)

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
        money.unscale(F.sum(money.scaled(F.col("value"))), 2).alias("total_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *group_cols,
        "n",
        "total_value",
    )
