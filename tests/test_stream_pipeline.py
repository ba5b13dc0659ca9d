"""Streaming parity for the composed training-data pipeline: the same
quality-score -> language-ID -> dedup stages that back the
training_pipeline_docs driver query, run as a Structured Streaming job
(readStream -> stateful dropDuplicates -> memory sink, availableNow).

Batch picks the min-id survivor per dedup key (deterministic);
streaming keeps the first arrival (arrival-order dependent), so parity
is asserted on the surviving KEY SET and per-key attributes, not on
winner doc_ids — the honest invariant a micro-batch pipeline provides.
"""

from pyspark.sql import functions as F

from columnar_spark.functions import text as CT

SRC = "/root/testdata/sf0.001/documents.parquet"


def _scored(df):
    t = F.col("text")
    toks = CT.tokens(t)
    return df.select(
        "doc_id",
        CT.quality_score(t).alias("quality"),
        CT.lang_id(t).alias("lang"),
        F.concat_ws(" ", F.slice(toks, 1, 2)).alias("prefix2"),
    ).filter(F.col("quality") >= 0.6)


def test_streaming_training_pipeline_parity(spark, tmp_path_factory):
    docs = spark.read.parquet(SRC)
    src_dir = str(tmp_path_factory.mktemp("docstream"))
    # several files -> several micro-batches through the same plan
    docs.repartition(4).write.mode("overwrite").parquet(src_dir)

    stream = spark.readStream.schema(docs.schema).parquet(src_dir)
    surv = _scored(stream).dropDuplicates(["prefix2"])
    q = (
        surv.writeStream.format("memory")
        .queryName("pipe_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["prefix2"]: (r["lang"],)
        for r in spark.sql("SELECT * FROM pipe_stream").collect()
    }

    batch_keys = {
        r["prefix2"]: (r["lang"],)
        for r in _scored(docs).dropDuplicates(["prefix2"]).collect()
    }
    assert set(got) == set(batch_keys)
    # lang is a function of the surviving doc's text; keys where every
    # member agrees must match exactly (spot-check on singleton groups)
    sizes = {
        r["prefix2"]: r["n"]
        for r in _scored(docs).groupBy("prefix2").agg(F.count("*").alias("n")).collect()
    }
    for k, v in got.items():
        if sizes[k] == 1:
            assert v == batch_keys[k]
