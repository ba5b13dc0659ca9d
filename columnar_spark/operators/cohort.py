"""Cohort-retention matrix sidecar — answer-from-the-index for the one
aggregate the rollup algebra cannot maintain: COUNT(DISTINCT user) per
(first-seen day, activity day).

The retention matrix is NOT a sum of per-batch partials: a late batch
containing an EARLIER day for a known user moves that user's entire
cohort row — every previously-counted (cohort, day) cell of theirs is
wrong. Two rounds of A/Bs (the r7/r8 numbers in the query docstring and
tools/ab_retention.py) pinned every events-READING plan to a ~0.26s
scan+fold floor against DuckDB's ~0.09s, so the only winning plan is
the one that reads no events at all: maintain the finished matrix as a
sidecar with CORRECTION partials (negative counts retract a moved
user's old cells), and serve the query as a scan of O(cohorts × days)
rows.

Artifact layout (`<events>.cohort/`):
- `pairs/`    — deduped (user_id, day) activity pairs, appended per
                batch after an anti-join against the existing set;
- `user_min/` — (user_id, day0) partials, merged on read by MIN — the
                cohort assignment;
- `matrix/`   — (cohort_day, day, cnt) partials where cnt may be
                NEGATIVE (a correction), merged on read by SUM and
                filtered > 0;
- `meta.json` + `_table_sig.json` — the standard freshness gate: any
  out-of-band rewrite of the events table makes the sidecar stale and
  the query falls back to the live plan, which is always correct.

Batch append algebra (exact, proven by test_cohort_sidecar fuzz):
  bp        = distinct (user, day) of the batch
  new_pairs = bp ⟕̸ pairs                      (anti-join: already-seen
                                               pairs contribute nothing)
  per user u in new_pairs with batch-min m, existing day0 d (null if new):
    d is null  ->  cohort m: +1 for each new pair          (new user)
    d <= m     ->  cohort d: +1 for each new pair          (unchanged)
    m < d      ->  cohort moved: -1 for each OLD pair at d,
                   +1 for each old AND new pair at m       (correction)
  user_min gets the batch mins appended (MIN-merge keeps the lower).

Scale posture: per batch one anti-join against pairs (bucketable on
user at real scale), one merge of user_min (O(users) — dim-sized), and
correction reads touch only the MOVED users' pairs. The query itself
never joins and never sees the event log. Reference analog: E6/E7's
answer-from-the-index COUNT regime (secondary/secondary.cpp:531-551)
for the one shape the associative rollup (streaming/rollup.py) cannot
express."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000

COHORT_SUFFIX = ".cohort"


def cohort_sidecar_path(table_path: str) -> str:
    return table_path.rstrip("/") + COHORT_SUFFIX


def pairs_from_events(events: DataFrame, ts_col: str = "ts", user_col: str = "user_id") -> DataFrame:
    """(user_id, day) pairs from an event frame, handling both testdata
    ts vintages (TIMESTAMP -> unix_micros; bigint nanos -> div 1000) —
    the same normalization convention as __spark_entry__._events."""
    dt = dict(events.dtypes)[ts_col]
    if dt in ("bigint", "long"):
        ts_us = F.expr(f"{ts_col} div 1000")
    else:
        ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return events.select(
        F.col(user_col).alias("user_id"),
        (ts_us / F.lit(US_PER_DAY)).cast("long").alias("day"),
    ).where(F.col("user_id").isNotNull())


def _write_sig(table_path: str) -> None:
    from columnar_spark.stats import _write_table_sig

    _write_table_sig(table_path, cohort_sidecar_path(table_path))


def write_cohort_sidecar(
    spark: SparkSession, table_path: str, ts_col: str = "ts", user_col: str = "user_id"
) -> str:
    """Full build from the current table state (ingest / crash recovery /
    DML refresh). Appends go through append_cohort_batch."""
    from columnar_spark.stats import require_posix_commit

    require_posix_commit(table_path, "cohort sidecar")
    root = cohort_sidecar_path(table_path)
    events = spark.read.parquet(table_path)
    pairs = pairs_from_events(events, ts_col, user_col).distinct()
    tmp = root + ".__build__"
    shutil.rmtree(tmp, ignore_errors=True)
    pairs.write.parquet(os.path.join(tmp, "pairs"))
    pairs = spark.read.parquet(os.path.join(tmp, "pairs"))
    user_min = pairs.groupBy("user_id").agg(F.min("day").alias("day0"))
    user_min.write.parquet(os.path.join(tmp, "user_min"))
    user_min = spark.read.parquet(os.path.join(tmp, "user_min"))
    matrix = (
        pairs.join(user_min, "user_id")
        .groupBy(F.col("day0").alias("cohort_day"), F.col("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    matrix.write.parquet(os.path.join(tmp, "matrix"))
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"ts_col": ts_col, "user_col": user_col}, f)
    if os.path.isdir(root):
        old = root + ".__old__"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(root, old)
        os.rename(tmp, root)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(tmp, root)
    _write_sig(table_path)
    return root


def cohort_meta(table_path: str) -> dict | None:
    mp = os.path.join(cohort_sidecar_path(table_path), "meta.json")
    if not os.path.isfile(mp):
        return None
    try:
        with open(mp) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def append_cohort_batch(spark: SparkSession, table_path: str, batch: DataFrame) -> None:
    """Fold one appended event batch in — the correction algebra from
    the module docstring. O(batch + moved-users' pairs) new rows; the
    anti-join and the user_min merge read the existing sidecar (the
    merge_value_index maintenance posture, E9)."""
    meta = cohort_meta(table_path)
    if meta is None:
        return
    root = cohort_sidecar_path(table_path)
    pairs_cur = spark.read.parquet(os.path.join(root, "pairs"))
    um = (
        spark.read.parquet(os.path.join(root, "user_min"))
        .groupBy("user_id")
        .agg(F.min("day0").alias("day0"))
    )
    bp = pairs_from_events(batch, meta["ts_col"], meta["user_col"]).distinct()
    new_pairs = bp.join(pairs_cur, ["user_id", "day"], "left_anti")
    # materialize the delta BEFORE any append rewrites the paths the
    # plans read (the collect-before-overwrite discipline of
    # merge_value_index); a batch whose novel pairs exceed the driver
    # budget takes the full-rebuild path instead (same recovery the
    # crash path uses — correctness first, incrementality when sized)
    if new_pairs.count() > 2_000_000:
        write_cohort_sidecar(spark, table_path, meta["ts_col"], meta["user_col"])
        return
    new_rows = new_pairs.collect()
    if not new_rows:
        _write_sig(table_path)
        return
    new_pairs = spark.createDataFrame(new_rows, new_pairs.schema)
    nu_min = new_pairs.groupBy("user_id").agg(F.min("day").alias("bmin"))
    cls = nu_min.join(um, "user_id", "left")
    moved = cls.filter(F.col("day0").isNotNull() & (F.col("bmin") < F.col("day0")))
    stable = cls.filter(F.col("day0").isNull() | (F.col("bmin") >= F.col("day0")))
    # cohort assignment for the non-moved users' new pairs
    plus_stable = (
        new_pairs.join(
            stable.select(
                "user_id", F.coalesce("day0", "bmin").alias("cohort_day")
            ),
            "user_id",
        )
        .groupBy("cohort_day", "day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # corrections for moved users: retract old cells, re-emit everything
    # (old + new pairs) under the new cohort
    moved_keys = moved.select("user_id", "day0", "bmin")
    old_moved = pairs_cur.join(moved_keys, "user_id")
    minus_old = (
        old_moved.groupBy(F.col("day0").alias("cohort_day"), "day")
        .agg((-F.count(F.lit(1))).alias("cnt"))
    )
    plus_old_new = (
        old_moved.select("bmin", "day", "user_id")
        .unionByName(new_pairs.join(moved_keys, "user_id").select("bmin", "day", "user_id"))
        .groupBy(F.col("bmin").alias("cohort_day"), "day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    delta = plus_stable.unionByName(minus_old).unionByName(plus_old_new)
    drows = delta.collect()
    if drows:
        spark.createDataFrame(drows, delta.schema).write.mode("append").parquet(
            os.path.join(root, "matrix")
        )
    new_pairs.write.mode("append").parquet(os.path.join(root, "pairs"))
    nu_min.select("user_id", F.col("bmin").alias("day0")).write.mode("append").parquet(
        os.path.join(root, "user_min")
    )
    _write_sig(table_path)


def load_cohort_matrix(
    spark: SparkSession, table_path: str, check_fresh: bool = True
) -> DataFrame | None:
    """The merged matrix (cohort_day, day, active_users), or None when
    absent/stale. O(cohorts × days) rows — no events read, no join."""
    from columnar_spark.stats import index_is_fresh

    root = cohort_sidecar_path(table_path)
    if not os.path.isdir(os.path.join(root, "matrix")):
        return None
    if check_fresh and not index_is_fresh(table_path, root):
        return None
    m = spark.read.parquet(os.path.join(root, "matrix"))
    return (
        m.groupBy("cohort_day", "day")
        .agg(F.sum("cnt").cast("long").alias("active_users"))
        .filter(F.col("active_users") > 0)
    )


def check_cohort_sidecar(spark: SparkSession, table_path: str) -> "list[str]":
    """Structural audit: the merged matrix must equal a live recompute
    from the events table, row for row."""
    meta = cohort_meta(table_path)
    if meta is None:
        return [f"cohort sidecar at {table_path}: missing meta.json"]
    got = load_cohort_matrix(spark, table_path, check_fresh=False)
    pairs = pairs_from_events(
        spark.read.parquet(table_path), meta["ts_col"], meta["user_col"]
    ).distinct()
    um = pairs.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    want = (
        pairs.join(um, "user_id")
        .groupBy("cohort_day", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
    )
    bad = (
        got.exceptAll(want).limit(1).count() + want.exceptAll(got).limit(1).count()
    )
    if bad:
        return ["cohort sidecar: matrix disagrees with live recompute"]
    return []
