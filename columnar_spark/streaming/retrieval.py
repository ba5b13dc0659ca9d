"""Continuous retrieval: a stream of query vectors served against a
static corpus — the online half of the similarity-search surface
(batch half: operators/knn.knn_batch_topk; index-accelerated half:
operators/knn_index).

Each micro-batch of queries runs ONE data pass over the corpus via
knn_batch_topk (broadcast queries, two-phase top-k), and the per-query
results append to a sink keyed by (qid, rank). The corpus DataFrame is
analyzed once and persisted by the caller if it fits memory; otherwise
every batch re-scans it — which is the correct cost model when the
corpus is 100 TB and the query stream is thin (you cannot cache the
corpus; you CAN keep the scan columnar and pruned).

Batch boundaries are invisible: a query's result depends only on the
corpus, so streaming N query batches equals batch-searching their
union (parity test pins it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from columnar_spark.operators.knn import knn_batch_topk


def stream_retrieval(
    spark: SparkSession,
    query_src: str,
    corpus: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    query_schema,
    k: int = 10,
    metric: str = "cosine",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "qid",
    q_vec_col: str = "qvec",
    available_now: bool = True,
):
    """Serve a file-source stream of (qid, qvec) batches; top-k rows per
    query append to `out_path`. Returns the StreamingQuery."""
    stream = spark.readStream.schema(query_schema).parquet(query_src)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = knn_batch_topk(
            corpus,
            vec_col,
            batch_df.select(q_id_col, q_vec_col),
            k,
            metric=metric,
            id_col=id_col,
            q_id_col=q_id_col,
            q_vec_col=q_vec_col,
        )
        from columnar_spark.streaming.ingest import idempotent_append

        idempotent_append(out, out_path, batch_id)  # replay-safe append

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
