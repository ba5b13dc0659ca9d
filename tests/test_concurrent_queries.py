"""Concurrent reads during an in-flight ledgered append: every result a
parallel reader observes must equal some SERIAL prefix state of the
table — the freshness gates guarantee a sidecar route either serves an
answer identical to the base scan or falls back to it, and single-file
batches make each append's visibility atomic. Two concurrent holders of
the writer lock are separately pinned impossible in test_ingest_replay.
"""

import os
import threading

import pytest
from pyspark.sql import functions as F

from columnar_spark.streaming.ingest import append_batch
from columnar_spark.table import Engine


@pytest.mark.parametrize("n_batches", [4])
def test_parallel_reads_see_only_serial_prefix_states(
    spark, tmp_path, n_batches
):
    sf = str(tmp_path)
    base = spark.createDataFrame(
        [(i, i % 7) for i in range(500)], "id: long, k: int"
    ).coalesce(1)
    base.write.parquet(f"{sf}/t.parquet")
    eng = Engine(spark, sf)
    eng.register_views(["t"])
    eng.build_value_index("t", "k")

    batches = [
        spark.createDataFrame(
            [(1000 * (b + 1) + i, i % 7) for i in range(100)],
            "id: long, k: int",
        ).coalesce(1)
        for b in range(n_batches)
    ]
    # valid answers: k <> 3 count for every prefix (500 base rows with
    # ids 0..499: k==3 for 72 of them; each batch adds 100 rows, 14 k==3)
    def count_ne3(nrows_base, nb):
        total = [i % 7 for i in range(500)] + nb * [i % 7 for i in range(100)]
        return sum(1 for k in total if k != 3)

    valid = {count_ne3(500, nb) for nb in range(n_batches + 1)}

    sql = "SELECT COUNT(*) AS n FROM t WHERE k <> 3"
    observed = []
    obs_lock = threading.Lock()
    stop = threading.Event()
    errors = []

    def reader():
        # each thread gets its own Engine: per-session caches must not
        # leak a stale file listing across the append boundary
        e = Engine(spark, sf)
        e.register_views(["t"])
        while not stop.is_set():
            try:
                n = e.sql(sql).first()["n"]
            except Exception as ex:  # noqa: BLE001 — any error is a failure
                errors.append(repr(ex))
                return
            with obs_lock:
                observed.append(n)

    threads = [threading.Thread(target=reader) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        for b, batch in enumerate(batches, start=1):
            assert append_batch(batch, f"{sf}/t.parquet", batch_id=b)
    finally:
        stop.set()
        for t in threads:
            t.join()

    assert not errors, errors
    assert observed, "readers never completed a query"
    bad = [n for n in observed if n not in valid]
    assert not bad, f"answers outside serial prefix states: {sorted(set(bad))} vs {sorted(valid)}"

    # post-append: the index-served route and the base scan agree exactly
    eng2 = Engine(spark, sf)
    eng2.register_views(["t"])
    assert eng2.sql(sql).first()["n"] == spark.sql(
        f"SELECT COUNT(*) AS n FROM parquet.`{sf}/t.parquet` WHERE k <> 3"
    ).first()["n"]
    assert max(observed) <= max(valid) and min(observed) >= min(valid)
