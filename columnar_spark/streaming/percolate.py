"""Streaming percolate: documents arrive as a stream and match against
a STORED query set — the alerting/routing mode of Manticore's percolate
tables (queries are the index; each incoming doc batch probes them).

Each micro-batch runs one pass of operators/fulltext.percolate (stored
queries broadcast, batch postings built batch-locally — O(batch
tokens)); matches append keyed by (query_id, doc_id). Batch-split
invariance holds because a document's matches depend only on the stored
queries (parity pinned in test_stream_percolate)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from columnar_spark.operators.fulltext import percolate


def stream_percolate(
    spark: SparkSession,
    docs_src: str,
    stored: list[tuple[str, str]],
    out_path: str,
    checkpoint_dir: str,
    doc_schema="doc_id long, text string",
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Serve a file-source stream of document batches against the stored
    queries; (query_id, doc_id) matches append to `out_path`."""
    stream = spark.readStream.schema(doc_schema).parquet(docs_src)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from columnar_spark.streaming.ingest import idempotent_append

        idempotent_append(  # replay-safe append
            percolate(batch_df, stored, id_col=id_col, text_col=text_col),
            out_path,
            batch_id,
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
