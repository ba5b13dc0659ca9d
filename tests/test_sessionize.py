"""Sessionization: batch semantics + streaming stateful operator."""

import time

import pytest
from pyspark.sql import functions as F

from columnar_spark.streaming.sessionize import sessionize_batch, sessionize_stream


def test_batch_sessionize_semantics(spark):
    gap = 1_000_000  # 1s in us
    rows = [
        # user 1: two sessions (gap between 3rd and 4th event)
        (1, 0, 0), (1, 1, 500_000), (1, 2, 900_000),
        (1, 3, 5_000_000), (1, 4, 5_300_000),
        # user 2: one session
        (2, 5, 0), (2, 6, 100_000),
    ]
    df = spark.createDataFrame(rows, "user_id: long, event_id: long, ts_us: long")
    out = {
        (r["user_id"], r["session_id"]): r
        for r in sessionize_batch(df, gap_us=gap).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    assert out[(1, 1)]["n_events"] == 3 and out[(1, 1)]["session_end_us"] == 900_000
    assert out[(1, 2)]["session_start_us"] == 5_000_000
    assert out[(2, 1)]["n_events"] == 2


def test_stream_sessionize_emits_closed_sessions(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sess")
    src = str(base / "src")
    gap = 1_000_000
    rows = [
        (1, 0), (1, 500_000), (1, 900_000),      # session A (closed by next)
        (1, 5_000_000), (1, 5_200_000),          # session B (stays open)
        (2, 0), (2, 3_000_000),                  # user2: one closed, one open
    ]
    df = spark.createDataFrame(rows, "user_id: long, ts_us: long")
    df.coalesce(1).write.parquet(src)

    # fewer state-store partitions -> much faster stateful-query startup
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = sessionize_stream(stream, gap_us=gap)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    spark.conf.set("spark.sql.shuffle.partitions", prev)
    got = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    # closed sessions emitted within the batch; open tails stay in state
    assert got[(1, 0)] == 3
    assert got[(2, 0)] == 1
