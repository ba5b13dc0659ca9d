"""Streaming benchmark decontamination — the batch n-gram hygiene pass
(operators/decontaminate.py) applied continuously as corpus documents
arrive.

The benchmark/eval set is static and tiny relative to the corpus, so
its DISTINCT n-gram set is computed ONCE, persisted, and broadcast into
every micro-batch join; each batch then pays only its own gram explode.
Per batch: clean rows append to the clean corpus sink, and the per-doc
overlap report appends to an audit sink (dropping silently would hide
exactly the rows a dataset audit needs to see).

Batch boundaries are invisible by construction — contamination is a
per-document property (doc grams vs static benchmark grams), so
streaming N batches equals the batch operator on their union; the
parity test pins that.

Scale posture: identical to the batch operator (the corpus side never
shuffles its exploded grams; the one shuffle is the per-doc hit count,
bounded by contaminated pairs) — per micro-batch. State: none beyond
the persisted benchmark gram set; the stream itself is stateless
row-wise filtering, so no watermark is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_spark.operators.decontaminate import _gram_col, contamination_report


def benchmark_gram_set(benchmark: DataFrame, text_col: str = "text", n: int = 8) -> DataFrame:
    """The static side, computed once: distinct benchmark n-grams."""
    return (
        benchmark.select(F.explode(_gram_col(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def stream_decontaminate(
    spark: SparkSession,
    src_dir: str,
    benchmark: DataFrame,
    clean_path: str,
    report_path: str,
    checkpoint_dir: str,
    schema,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    available_now: bool = True,
):
    """Continuously split an incoming corpus stream into a clean sink
    and a contamination audit report, against a fixed benchmark set.
    Returns the started StreamingQuery."""
    bench_grams = benchmark_gram_set(benchmark, text_col, n)
    # Materialize the static side once — every micro-batch reuses the
    # persisted gram set instead of re-exploding the benchmark corpus.
    bench_grams.persist().count()

    stream = spark.readStream.schema(schema).parquet(src_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        report = contamination_report(
            batch_df, None, id_col, text_col, n, benchmark_grams=bench_grams
        )
        from columnar_spark.streaming.ingest import idempotent_append

        flagged = report.persist()
        try:
            # replay-safe appends: both outputs land exactly once per epoch
            idempotent_append(flagged, report_path, batch_id)
            clean = batch_df.join(flagged.select(id_col), [id_col], "left_anti")
            idempotent_append(clean, clean_path, batch_id)
        finally:
            flagged.unpersist()

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
