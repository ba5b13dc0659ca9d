"""Streaming retrieval: query batches streamed through foreachBatch
produce exactly the batch knn_batch_topk results on their union."""

from pyspark.sql import functions as F

from columnar_spark.operators.knn import knn_batch_topk
from columnar_spark.streaming.retrieval import stream_retrieval


def test_streamed_queries_match_batch(spark, tmp_path):
    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qvec"),
    )

    src = str(tmp_path / "qsrc")
    for i in range(3):
        queries.filter(F.col("qid") % 3 == i).write.mode("append").parquet(src)

    out = str(tmp_path / "hits")
    q = stream_retrieval(
        spark,
        src,
        corpus,
        out,
        str(tmp_path / "ckpt"),
        query_schema=queries.schema,
        k=5,
        metric="l2",
    )
    q.awaitTermination(120)

    got = {
        (r["qid"], r["vec_id"]): round(r["dist"], 9)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["qid"], r["vec_id"]): round(r["dist"], 9)
        for r in knn_batch_topk(
            corpus, "embedding", queries, 5, metric="l2", id_col="vec_id"
        ).collect()
    }
    assert got == want and len(got) == 6 * 5
