"""Continuous keyword retrieval: a stream of text queries served
against a static corpus via batch BM25 — the full-text sibling of
streaming/retrieval.py (vector queries).

Each micro-batch of (qid, qtext) rows runs ONE corpus pass through
fulltext.bm25_batch_search; when the corpus carries a persisted
`.ftidx` sidecar the pass reads postings (term-pruned) instead of
re-tokenizing text. Results append keyed by (query_id, rank).

Batch-split invariance: a query's top-k depends only on the corpus,
so streaming N query batches equals batch-searching their union
(parity pinned in test_stream_text_retrieval)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from columnar_spark.operators.fulltext import bm25_batch_search, load_text_index


def stream_text_retrieval(
    spark: SparkSession,
    query_src: str,
    corpus_path: str,
    out_path: str,
    checkpoint_dir: str,
    query_schema="qid string, qtext string",
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Serve a file-source stream of (qid, qtext) batches; top-k BM25
    rows per query append to `out_path`. Returns the StreamingQuery."""
    stream = spark.readStream.schema(query_schema).parquet(query_src)
    loaded = load_text_index(spark, corpus_path)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.collect()  # a micro-batch of QUERIES is small
        queries = [(r["qid"], r["qtext"]) for r in rows if r["qtext"]]
        if not queries:
            return
        if loaded is not None:
            postings, lengths, _ = loaded
            out = bm25_batch_search(
                None,
                queries,
                k,
                postings=postings.select("term", "doc_id", "tf"),
                lengths=lengths,
            )
        else:
            corpus = spark.read.parquet(corpus_path)
            out = bm25_batch_search(
                corpus, queries, k, id_col=id_col, text_col=text_col
            )
        from columnar_spark.streaming.ingest import idempotent_append

        idempotent_append(out, out_path, batch_id)  # replay-safe append

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
