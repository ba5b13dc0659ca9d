"""Streaming dedup: watermark-bounded exact dedup on a file stream."""

from pyspark.sql import functions as F

from columnar_spark.streaming.dedup import stream_dedup


def test_stream_dedup_drops_duplicates(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sdedup")
    src = str(base / "src")
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:00:10"),   # dup key within watermark
        (2, "2024-01-01 00:01:00"),
        (2, "2024-01-01 00:01:30"),   # dup
        (3, "2024-01-01 00:02:00"),
    ]
    df = spark.createDataFrame(rows, "k: long, ts_s: string").withColumn(
        "ts", F.to_timestamp("ts_s")
    ).drop("ts_s")
    df.coalesce(1).write.parquet(src)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = stream_dedup(stream, ["k"], ts_col="ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("sdedup_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    spark.conf.set("spark.sql.shuffle.partitions", prev)
    got = sorted(r["k"] for r in spark.sql("SELECT k FROM sdedup_out").collect())
    assert got == [1, 2, 3]

    # batch path shares the operator
    assert stream_dedup(df, ["k"]).count() == 3
