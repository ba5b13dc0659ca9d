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


def test_stream_static_broadcast_join(spark, tmp_path_factory):
    """Stream-static join: each micro-batch joins against a broadcast
    dimension — the streaming-enrichment shape (no state, no watermark
    needed on the static side)."""
    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("sjoin")
    src = str(base / "src")
    events = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (2, 5.0), (3, 7.0), (9, 1.0)], "uid: long, v: double"
    )
    events.coalesce(1).write.parquet(src)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (3, "bronze")], "uid: long, tier: string"
    )

    stream = spark.readStream.schema(events.schema).parquet(src)
    joined = stream.join(F.broadcast(dim), "uid")  # uid=9 has no dim row
    q = (
        joined.writeStream.format("memory").queryName("sjoin_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["uid"], r["tier"], r["v"])
        for r in spark.sql("SELECT uid, tier, v FROM sjoin_out").collect()
    }
    want = {(1, "gold", 10.0), (2, "silver", 20.0), (2, "silver", 5.0), (3, "bronze", 7.0)}
    assert got == want


def test_stream_stream_interval_join(spark, tmp_path_factory):
    """Watermarked stream-stream join with an event-time interval
    condition — Spark buffers both sides in state bounded by the
    watermark; results must equal the batch join."""
    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("ssjoin")
    imps_rows = [
        (1, "2024-01-01 00:00:00"),
        (2, "2024-01-01 00:05:00"),
        (3, "2024-01-01 00:30:00"),
    ]
    clicks_rows = [
        (1, "2024-01-01 00:02:00"),   # within 10 min of imp 1 -> joins
        (2, "2024-01-01 00:20:00"),   # 15 min after imp 2 -> outside window
        (3, "2024-01-01 00:31:00"),   # joins
    ]
    imps = spark.createDataFrame(imps_rows, "ad: long, ts_s: string").withColumn(
        "imp_ts", F.to_timestamp("ts_s")
    ).drop("ts_s")
    clicks = spark.createDataFrame(clicks_rows, "ad: long, ts_s: string").withColumn(
        "click_ts", F.to_timestamp("ts_s")
    ).drop("ts_s")
    imps.coalesce(1).write.parquet(str(base / "imps"))
    clicks.coalesce(1).write.parquet(str(base / "clicks"))

    s_imps = spark.readStream.schema(imps.schema).parquet(str(base / "imps")).withWatermark(
        "imp_ts", "1 hour"
    )
    s_clicks = spark.readStream.schema(clicks.schema).parquet(str(base / "clicks")).withWatermark(
        "click_ts", "1 hour"
    )
    cond = (
        (s_imps["ad"] == s_clicks["ad"])
        & (s_clicks["click_ts"] >= s_imps["imp_ts"])
        & (s_clicks["click_ts"] <= s_imps["imp_ts"] + F.expr("INTERVAL 10 MINUTES"))
    )
    q = (
        s_imps.join(s_clicks, cond)
        .select(s_imps["ad"], "imp_ts", "click_ts")
        .writeStream.format("memory").queryName("ssjoin_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(r["ad"] for r in spark.sql("SELECT ad FROM ssjoin_out").collect())
    assert got == [1, 3]
