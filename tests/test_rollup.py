"""Continuous aggregate rollup: streamed per-batch partials merge-on-read
to exactly the one-shot batch aggregate; compaction preserves reads."""

import datetime

from pyspark.sql import functions as F

from columnar_spark.snapshots import history
from columnar_spark.streaming.rollup import (
    compact_rollup,
    finalize_rollup,
    merge_rollup,
    read_rollup,
    rollup_partials,
    stream_rollup,
)


def _events_df(spark, n=3000):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + datetime.timedelta(minutes=i * 7),
            ["click", "view", "buy"][i % 3],
            float(i % 100) / 4.0,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "event_id: long, ts: timestamp, event_type: string, value: double")


def _collect_view(df):
    return {
        (r["bucket_start"], r["event_type"]): (
            r["cnt"],
            r["sum_value"],
            r["min_value"],
            r["max_value"],
        )
        for r in df.collect()
    }


def test_streamed_rollup_equals_batch_aggregate(spark, tmp_path):
    ev = _events_df(spark)
    src = str(tmp_path / "src")
    # three separate ingest files = three micro-batches worth of data
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).write.mode("append").parquet(src)

    rollup = str(tmp_path / "rollup.parquet")
    q = stream_rollup(
        spark,
        src,
        rollup,
        str(tmp_path / "ckpt"),
        schema=ev.schema,
        bucket="1 day",
    )
    q.awaitTermination(120)

    got = _collect_view(read_rollup(spark, rollup))
    want = _collect_view(finalize_rollup(merge_rollup(rollup_partials(ev))))
    assert got == want and len(got) > 10


def test_batch_split_invariance_and_compaction(spark, tmp_path):
    ev = _events_df(spark, n=2000)
    rollup = str(tmp_path / "r2.parquet")
    # append partials in 4 arbitrary uneven splits
    for i in range(4):
        part = ev.filter((F.col("event_id") % 10 >= i * 2) & (F.col("event_id") % 10 < (i + 1) * 2 + (6 if i == 3 else 0)))
        rollup_partials(part).write.mode("append").parquet(rollup)

    before = _collect_view(read_rollup(spark, rollup))
    nb, na = compact_rollup(spark, rollup)
    assert na <= nb
    # one row per (bucket, key) after compaction
    merged = spark.read.parquet(rollup)
    assert merged.count() == merged.select("bucket_start", "event_type").distinct().count()
    assert _collect_view(read_rollup(spark, rollup)) == before
    assert [e.op for e in history(rollup)] == ["compact-rollup"]
