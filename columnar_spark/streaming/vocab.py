"""Continuous vocabulary monitoring over streaming ingest.

Corpus-health statistics (operators/collocations.vocab_stats: token /
type / hapax counts, TTR, hapax share) maintained INCREMENTALLY as
document batches land: each batch contributes a unigram-count delta
segment — O(batch tokens) work, mergeable by construction (integer adds)
— and the report folds segments at read time (merge-on-read, the
`.rollup` sidecar's contract). A curation team watches TTR / hapax share
drift on the live ingest instead of re-scanning the corpus per dump.

Artifact layout beside the table (house sidecar convention):

    <table>.vocab/
        meta.json            # {"text_col": ..., "version": 1}
        delta_b<batch_id>/   # one unigram-count segment per applied batch
        base_<n>/            # compacted fold of earlier segments

Replay safety (foreachBatch sinks run at-least-once): a delta is staged
to a `_tmp_*` dir and atomically renamed to its final `delta_b<id>`
name; a retried batch finds the name taken and skips. Orphaned `_tmp_*`
stages from crashed attempts are swept by `compact_vocab`.

Scale posture: per-batch work is one explode + one token-keyed shuffle
over the BATCH (never the table); the report is a vocabulary-keyed
groupBy-sum over segment files; compaction bounds segment count. All
statistics are exact integers + pinned-order IEEE divisions, so the
streamed report is BIT-IDENTICAL to the batch `vocab_stats` over the
same rows (pinned by test), not merely approximately equal.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_spark.functions import text as CT


def _vocab_dir(dst_path: str) -> str:
    return dst_path + ".vocab"


def vocab_meta(dst_path: str) -> dict | None:
    """The monitor's meta, or None when the table has no vocab monitor
    (append_batch probes this the same way it probes the text index)."""
    mp = os.path.join(_vocab_dir(dst_path), "meta.json")
    if not os.path.exists(mp):
        return None
    with open(mp) as f:
        return json.load(f)


def _segments(dst_path: str) -> list[str]:
    vd = _vocab_dir(dst_path)
    if not os.path.isdir(vd):
        return []
    return sorted(
        os.path.join(vd, d)
        for d in os.listdir(vd)
        if (d.startswith("delta_") or d.startswith("base_"))
        and os.path.isdir(os.path.join(vd, d))
    )


def _write_counts(df: DataFrame, text_col: str, dest: str) -> None:
    (
        df.select(F.explode(CT.tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .write.mode("overwrite")
        .parquet(dest)
    )


def init_vocab_monitor(
    spark: SparkSession, dst_path: str, text_col: str = "text"
) -> None:
    """Create the monitor beside `dst_path`. If the table already has
    rows, fold them into an initial base segment (one-time O(table);
    every later batch is O(batch))."""
    vd = _vocab_dir(dst_path)
    os.makedirs(vd, exist_ok=True)
    if os.path.isdir(dst_path):
        _write_counts(spark.read.parquet(dst_path), text_col, os.path.join(vd, "base_0"))
    with open(os.path.join(vd, "meta.json"), "w") as f:
        json.dump({"text_col": text_col, "version": 1}, f)


def append_vocab_delta(
    spark: SparkSession,
    dst_path: str,
    batch_df: DataFrame,
    batch_id: int | None = None,
) -> bool:
    """Fold one batch's unigram counts in as a delta segment. Returns
    False when the batch was already applied (at-least-once replay) —
    the atomic-rename commit makes the check and the commit one step."""
    meta = vocab_meta(dst_path)
    if meta is None:
        return False
    vd = _vocab_dir(dst_path)
    final = os.path.join(
        vd, f"delta_b{batch_id}" if batch_id is not None else f"delta_u{uuid.uuid4().hex}"
    )
    if os.path.exists(final):
        return False
    stage = os.path.join(vd, f"_tmp_{uuid.uuid4().hex}")
    _write_counts(batch_df, meta["text_col"], stage)
    try:
        os.rename(stage, final)  # atomic commit; loser of a race skips
    except OSError:
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
        return False
    return True


def vocab_counts(spark: SparkSession, dst_path: str) -> DataFrame:
    """Merged (w, c) unigram counts across all committed segments."""
    segs = _segments(dst_path)
    if not segs:
        raise FileNotFoundError(f"no vocab monitor segments under {_vocab_dir(dst_path)}")
    return (
        spark.read.parquet(*segs)
        .groupBy("w")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def vocab_report(spark: SparkSession, dst_path: str) -> DataFrame:
    """One-row corpus-health report from the merged monitor state —
    bit-identical to batch `vocab_stats` over the table's rows (integer
    merges are exact; the two ratio divisions share the pinned order)."""
    from columnar_spark.operators.collocations import vocab_stats_from_counts

    return vocab_stats_from_counts(vocab_counts(spark, dst_path))


def snapshot_counts(spark: SparkSession, dst_path: str, dest: str) -> None:
    """Freeze the monitor's current merged unigram counts at `dest`
    (atomic rename, so a crashed snapshot is never half-visible) — the
    baseline side of drift-since alerting."""
    stage = dest + f"._tmp_{uuid.uuid4().hex}"
    vocab_counts(spark, dst_path).coalesce(1).write.mode("overwrite").parquet(stage)
    os.rename(stage, dest)


def drift_since(spark: SparkSession, dst_path: str, snapshot_dir: str) -> DataFrame:
    """Distribution drift of the live monitor vs a frozen snapshot:
    total-variation distance + type-set Jaccard (the one-row alerting
    signal — "did the corpus change since the last approved dump?").
    Bit-identical to batch vocab_drift over the corresponding rows;
    exact rationals per the collocations module's pinned-op contract."""
    from columnar_spark.operators.collocations import vocab_drift_from_counts

    snap = spark.read.parquet(snapshot_dir).select(
        "w", F.col("c").alias("c_a")
    )
    cur = vocab_counts(spark, dst_path).select("w", F.col("c").alias("c_b"))
    counts = snap.join(cur, "w", "full_outer").fillna(0, ["c_a", "c_b"])
    return vocab_drift_from_counts(counts)


def compact_vocab(spark: SparkSession, dst_path: str) -> int:
    """Fold all committed segments into one base segment, then sweep the
    old segments and any crashed-attempt `_tmp_*` stages. Returns the
    number of segments folded. Readers race-safe: the new base commits
    (atomic rename) before the olds are removed, and `vocab_counts`
    double-counts nothing because the fold REPLACES its inputs."""
    import shutil

    vd = _vocab_dir(dst_path)
    segs = _segments(dst_path)
    if not segs:
        return 0
    nxt = 1 + max(
        (int(os.path.basename(s)[5:]) for s in segs if os.path.basename(s).startswith("base_")),
        default=-1,
    )
    merged = (
        spark.read.parquet(*segs).groupBy("w").agg(F.sum("c").cast("long").alias("c"))
    )
    stage = os.path.join(vd, f"_tmp_{uuid.uuid4().hex}")
    merged.coalesce(1).write.mode("overwrite").parquet(stage)
    os.rename(stage, os.path.join(vd, f"base_{nxt}"))
    for s in segs:
        shutil.rmtree(s, ignore_errors=True)
    for d in os.listdir(vd):
        if d.startswith("_tmp_"):
            shutil.rmtree(os.path.join(vd, d), ignore_errors=True)
    return len(segs)
