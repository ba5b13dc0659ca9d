"""Hopping-window aggregation runs identically on a stream and a static
frame — the parity claim behind the hopping_window_events driver query."""

from pyspark.sql import functions as F


def _hop(df):
    return (
        df.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day", "6 hours").alias("win"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros(F.col("win.start")).alias("start_us"), "k", "n"
        )
    )


def test_stream_hopping_matches_batch(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("hop")
    src = str(base / "src")
    rows = [
        ("a", "2024-01-01 03:00:00"),
        ("a", "2024-01-01 09:00:00"),
        ("b", "2024-01-01 15:00:00"),
        ("a", "2024-01-02 02:00:00"),
        ("b", "2024-01-02 21:00:00"),
    ]
    df = (
        spark.createDataFrame(rows, "k: string, ts_s: string")
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
    )
    df.coalesce(1).write.parquet(src)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        _hop(stream)
        .writeStream.format("memory")
        .queryName("hop_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    spark.conf.set("spark.sql.shuffle.partitions", prev)

    got = {
        (r["start_us"], r["k"]): r["n"]
        for r in spark.sql("SELECT * FROM hop_out").collect()
    }
    ref = {(r["start_us"], r["k"]): r["n"] for r in _hop(df).collect()}
    # append-mode emits only windows closed by the final watermark; every
    # emitted row must match the batch result, and each event lands in
    # length/slide = 4 windows in both modes
    assert got
    for key, n in got.items():
        assert ref[key] == n
    assert sum(ref.values()) == 5 * 4
