"""Replay safety of the ingest unit (foreachBatch runs AT LEAST once):
the per-table ledger must make a retried batch a complete no-op across
the table parquet AND every sidecar — not just the text index — and a
retry of a batch whose previous attempt crashed mid-application must
converge to exactly-once state via the sidecar rebuild path."""

import json
import os

from pyspark.sql import functions as F

from columnar_spark.stats import (
    load_value_index,
    write_value_index,
)
from columnar_spark.streaming.ingest import (
    append_batch,
    ingest_ledger_path,
)
from columnar_spark.writer import WriteSpec, write_table


def _mk_table(spark, tmp_path, n=40):
    p = f"{tmp_path}/t.parquet"
    df = spark.range(n).select(
        F.col("id").alias("i"),
        (F.col("id") % 4).cast("string").alias("c"),
        F.concat(F.lit("doc text word"), F.col("id")).alias("text"),
    )
    write_table(df, p, WriteSpec())
    write_value_index(spark, p, "c")
    return p


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("i"),
        (F.col("id") % 4).cast("string").alias("c"),
        F.concat(F.lit("doc text word"), F.col("id")).alias("text"),
    )


def _state(spark, p):
    rows = spark.read.parquet(p).count()
    man = {
        r["column"]: r["row_count"]
        for r in spark.read.parquet(p + ".stats").collect()
    }
    vidx = {
        (r["value"], r["cnt"]) for r in load_value_index(spark, p, "c").collect()
    }
    return rows, man, vidx


def test_retry_of_committed_batch_is_a_full_noop(spark, tmp_path):
    p = _mk_table(spark, tmp_path)
    b = _batch(spark, 40, 55)
    assert append_batch(b, p, batch_id=7) is True
    state1 = _state(spark, p)
    assert state1[0] == 55
    # the at-least-once retry: sink re-invoked with the same epoch id
    assert append_batch(b, p, batch_id=7) is False
    assert _state(spark, p) == state1
    # a DIFFERENT batch still applies
    assert append_batch(_batch(spark, 55, 60), p, batch_id=8) is True
    assert _state(spark, p)[0] == 60


def test_crashed_attempt_retry_converges_exactly_once(spark, tmp_path):
    """Simulate a crash mid-application: the previous attempt appended
    the table files and merged the value index, then died before the
    ledger commit. The retry must (a) not double the table rows —
    batch-derived file names are swept — and (b) rebuild the sidecars so
    counts match a one-shot application exactly."""
    p = _mk_table(spark, tmp_path)

    # ---- crashed first attempt, reproduced by hand: table files land
    # under the batch prefix and the vidx double-merges, no ledger commit
    b = _batch(spark, 40, 50)
    stage = f"{tmp_path}/stage"
    b.write.parquet(stage)
    moved = 0
    for name in sorted(os.listdir(stage)):
        if name.startswith(("_", ".")):
            continue
        os.replace(
            os.path.join(stage, name), os.path.join(p, f"part-ingest-b9-{name}")
        )
        moved += 1
    assert moved >= 1
    from columnar_spark.stats import merge_value_index

    merge_value_index(spark, p, "c", b)  # sidecar absorbed the batch once
    root = ingest_ledger_path(p)
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "meta.json"), "w") as f:
        json.dump({"applied_batches": {}, "inflight": "9"}, f)

    # ---- the retry
    assert append_batch(b, p, batch_id=9) is True
    rows, man, vidx = _state(spark, p)
    assert rows == 50  # no duplicate table rows
    assert all(v == 50 for v in man.values())  # manifest rebuilt, not re-merged
    # value index equals a from-scratch build (no double counts)
    assert vidx == {
        (str(k), 50 // 4 + (1 if k < 50 % 4 else 0)) for k in range(4)
    }
    led = json.load(open(os.path.join(root, "meta.json")))
    assert led["inflight"] is None and "9" in led["applied_batches"]

    # and a second retry after the successful recovery is a no-op
    assert append_batch(b, p, batch_id=9) is False
    assert _state(spark, p)[0] == 50


def test_ledger_survives_distinct_batches_and_orders(spark, tmp_path):
    p = _mk_table(spark, tmp_path, n=10)
    for bid, (lo, hi) in enumerate([(10, 14), (14, 20), (20, 21)]):
        assert append_batch(_batch(spark, lo, hi), p, batch_id=bid) is True
    # replay the WHOLE epoch sequence (checkpoint lost, source replayed)
    for bid, (lo, hi) in enumerate([(10, 14), (14, 20), (20, 21)]):
        assert append_batch(_batch(spark, lo, hi), p, batch_id=bid) is False
    rows, man, _ = _state(spark, p)
    assert rows == 21 and all(v == 21 for v in man.values())


def test_idempotent_append_retry_and_crash_convergence(spark, tmp_path):
    """The ledger-free exactly-once append every auxiliary sink uses
    (rollup partials, retrieval/percolate/decontamination outputs): a
    retry of the same epoch — including after a crash that left partial
    files — converges on one final file set."""
    from columnar_spark.streaming.ingest import idempotent_append

    out = f"{tmp_path}/out.parquet"
    b = spark.range(10).selectExpr("id AS x")
    idempotent_append(b, out, batch_id=3)
    assert spark.read.parquet(out).count() == 10
    # the at-least-once retry of the SAME epoch
    idempotent_append(b, out, batch_id=3)
    assert spark.read.parquet(out).count() == 10
    # a different epoch appends
    idempotent_append(spark.range(10, 15).selectExpr("id AS x"), out, batch_id=4)
    assert spark.read.parquet(out).count() == 15
    # crash simulation: a leftover file under epoch 5's prefix
    import shutil

    src = next(f for f in os.listdir(out) if f.startswith("part-b3-"))
    shutil.copy(os.path.join(out, src), os.path.join(out, "part-b5-junk.parquet"))
    assert spark.read.parquet(out).count() > 15  # corrupted state visible
    idempotent_append(spark.range(20, 22).selectExpr("id AS x"), out, batch_id=5)
    assert spark.read.parquet(out).count() == 17  # junk swept, epoch applied once


def test_rollup_batch_retry_does_not_double_count(spark, tmp_path):
    from pyspark.sql import functions as F2

    from columnar_spark.streaming.rollup import (
        append_rollup_batch,
        read_rollup,
    )

    ev = spark.range(40).select(
        F.timestamp_micros(F.col("id") * 3_600_000_000).alias("ts"),
        (F.col("id") % 2).cast("string").alias("event_type"),
        (F.col("id") * 1.5).alias("value"),
    )
    rp = f"{tmp_path}/roll.parquet"
    append_rollup_batch(ev, rp, batch_id=0)
    once = {
        tuple(r)[:2]: tuple(r)[2:]
        for r in read_rollup(spark, rp).select(
            "bucket_start", "event_type", "cnt", "sum_value"
        ).collect()
    }
    append_rollup_batch(ev, rp, batch_id=0)  # the retry
    twice = {
        tuple(r)[:2]: tuple(r)[2:]
        for r in read_rollup(spark, rp).select(
            "bucket_start", "event_type", "cnt", "sum_value"
        ).collect()
    }
    assert once == twice
    _ = F2  # silence unused-import style noise if F2 is never needed


def test_idempotent_append_rename_before_sweep(spark, tmp_path):
    """Read consistency under retry: target names are canonical per
    staged-file rank, so a retry atomically REPLACES the previous
    attempt's files before any sweep — a reader of the destination
    never observes the batch missing mid-retry."""
    from columnar_spark.streaming.ingest import idempotent_append

    out = f"{tmp_path}/rns.parquet"
    moved1 = idempotent_append(
        spark.range(8).selectExpr("id AS x"), out, batch_id=7
    )
    assert moved1 and all("part-b7-" in p for p in moved1)
    # retry lands on the SAME canonical names (os.replace overwrite, not
    # delete-then-create): nothing to sweep, file set identical
    moved2 = idempotent_append(
        spark.range(8).selectExpr("id AS x"), out, batch_id=7
    )
    assert sorted(moved1) == sorted(moved2)
    assert spark.read.parquet(out).count() == 8
    # a leftover with a higher rank (previous attempt produced more
    # files) is swept only AFTER the new files are in place
    import shutil

    shutil.copy(moved2[0], os.path.join(out, "part-b7-99999.parquet"))
    moved3 = idempotent_append(
        spark.range(8).selectExpr("id AS x"), out, batch_id=7
    )
    assert sorted(moved3) == sorted(moved1)
    names = set(os.listdir(out))
    assert "part-b7-99999.parquet" not in names
    assert spark.read.parquet(out).count() == 8


def test_ledgered_writer_lock_enforced(spark, tmp_path):
    """Single-writer-per-table is a CONTRACT with teeth: a second
    ledgered writer fails fast instead of corrupting the ledger; a
    crashed holder's lock self-expires; the lock is always released on
    success and on error."""
    import pytest

    from columnar_spark.streaming.ingest import (
        LOCK_STALE_SEC,
        TableWriterLockHeld,
        _acquire_writer_lock,
        append_batch,
        ingest_ledger_path,
    )

    dst = f"{tmp_path}/locked.parquet"
    b = spark.range(5).selectExpr("id AS x")
    append_batch(b, dst, batch_id=1)  # lock acquired + released
    lockfile = os.path.join(ingest_ledger_path(dst), "writer.lock")
    assert not os.path.exists(lockfile)

    # a concurrent holder blocks the ledgered path (fail fast, no write)
    held = _acquire_writer_lock(dst)
    with pytest.raises(TableWriterLockHeld, match="ONE ledgered writer"):
        append_batch(spark.range(5, 9).selectExpr("id AS x"), dst, batch_id=2)
    assert spark.read.parquet(dst).count() == 5  # nothing half-applied

    # a stale (crashed-holder) lock is broken and the append proceeds
    past = os.stat(held).st_mtime - LOCK_STALE_SEC - 10
    os.utime(held, (past, past))
    assert append_batch(spark.range(5, 9).selectExpr("id AS x"), dst, batch_id=2)
    assert spark.read.parquet(dst).count() == 9
    assert not os.path.exists(lockfile)

    # ledger intact: both batches recorded, replay is a no-op
    assert append_batch(b, dst, batch_id=1) is False


def test_object_store_paths_refused_for_ledgered_appends(tmp_path):
    """O_EXCL is not atomic on object stores: the ledgered path refuses
    such destinations up front with guidance instead of handing out a
    lock that does not lock."""
    import pytest

    from columnar_spark.streaming.ingest import (
        TableWriterLockHeld,
        _acquire_writer_lock,
    )

    for uri in ("s3://bucket/t.parquet", "gs://b/t.parquet", "abfss://c@a/t"):
        with pytest.raises(TableWriterLockHeld, match="object store"):
            _acquire_writer_lock(uri)
    # file: scheme and plain paths still acquire
    lock = _acquire_writer_lock(f"{tmp_path}/ok.parquet")
    assert os.path.exists(lock)


def test_stale_break_is_single_winner_under_contention(tmp_path):
    """N waiters that all observe the same expired lock: rename-based
    breaking admits EXACTLY ONE new holder — the losers either acquire
    later (after a release) or fail held; no interleaving ever leaves
    two concurrent holders (the remove-based breaker could delete a
    fresh lock and admit two)."""
    import threading
    import time

    from columnar_spark.streaming.ingest import (
        LOCK_STALE_SEC,
        TableWriterLockHeld,
        _acquire_writer_lock,
        _release_writer_lock,
        ingest_ledger_path,
    )

    dst = f"{tmp_path}/contend.parquet"
    stale = _acquire_writer_lock(dst)
    past = os.stat(stale).st_mtime - LOCK_STALE_SEC - 10
    os.utime(stale, (past, past))

    holders = []
    holders_lock = threading.Lock()
    concurrent_max = [0]

    def worker():
        try:
            lk = _acquire_writer_lock(dst)
        except TableWriterLockHeld:
            return
        with holders_lock:
            holders.append(lk)
            concurrent_max[0] = max(concurrent_max[0], len(holders))
        time.sleep(0.05)  # hold it long enough for overlap to show
        with holders_lock:
            holders.remove(lk)
        _release_writer_lock(lk)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert concurrent_max[0] == 1  # never two holders at once
    lockfile = os.path.join(ingest_ledger_path(dst), "writer.lock")
    assert not os.path.exists(lockfile)  # all released
    # no captive litter left behind
    litter = [
        f for f in os.listdir(ingest_ledger_path(dst)) if ".stale-" in f
    ]
    assert litter == []
