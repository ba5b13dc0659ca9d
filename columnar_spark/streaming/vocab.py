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
        meta.json       # {"text_col", "segments": [...], "applied_batches": {}}
        seg_<uuid>/     # unigram-count segments (names opaque)

Commit protocol — the same stage-then-commit-meta shape as the `.ftidx`
appends (operators/fulltext.append_to_text_index): a segment is staged
under an opaque name, then meta.json is atomically REPLACED with the new
segment list; readers resolve segments exclusively through the committed
manifest. Consequences, each pinned by test:

- at-least-once foreachBatch retries are no-ops (`applied_batches`
  records the epoch id at commit time — the check and the commit are
  one atomic step);
- a crash between stage and commit leaves an orphan directory that is
  INVISIBLE to readers and swept at compaction;
- compaction replaces the segment list atomically, so a reader can
  never observe old and new segments together and double-count (the
  failure mode for a reader mid-scan across a compaction is a loud
  file-not-found retry, the compact_table/vacuum contract — never a
  silently wrong report);
- re-running init against an existing monitor is refused (it would
  rebuild the base from rows the deltas already cover) unless
  force=True explicitly rebuilds from scratch.

Maintenance ops (init/append/compact/snapshot) follow the repo's
single-writer contract — one maintainer at a time per table, the same
assumption every other sidecar merge makes; readers are concurrent.

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
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_spark.functions import text as CT


def _vocab_dir(dst_path: str) -> str:
    return dst_path + ".vocab"


def vocab_meta(dst_path: str) -> dict | None:
    """The monitor's committed meta, or None when the table has no vocab
    monitor (append_batch probes this like it probes the text index)."""
    mp = os.path.join(_vocab_dir(dst_path), "meta.json")
    if not os.path.exists(mp):
        return None
    with open(mp) as f:
        return json.load(f)


def _commit_meta(vd: str, meta: dict) -> None:
    """Atomic manifest replace — the single commit point of every
    mutation; a crash before this line leaves readers on the old view."""
    tmp = os.path.join(vd, f"_meta_{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(vd, "meta.json"))


def _stage_counts(df: DataFrame, text_col: str, vd: str) -> str:
    """Write one unigram-count segment under an opaque uncommitted name;
    returns the segment's basename."""
    from columnar_spark.operators.collocations import _unigram_counts

    name = f"seg_{uuid.uuid4().hex}"
    (
        _unigram_counts(df, CT.tokens(F.col(text_col)))
        .withColumn("c", F.col("c").cast("long"))
        .write.mode("overwrite")
        .parquet(os.path.join(vd, name))
    )
    return name


def init_vocab_monitor(
    spark: SparkSession,
    dst_path: str,
    text_col: str = "text",
    force: bool = False,
) -> None:
    """Create the monitor beside `dst_path`. If the table already has
    rows, fold them into an initial base segment (one-time O(table);
    every later batch is O(batch)). Refuses to re-init an existing
    monitor (the rebuilt base would double-count rows the committed
    deltas already cover) unless force=True wipes and starts over."""
    vd = _vocab_dir(dst_path)
    if vocab_meta(dst_path) is not None:
        if not force:
            raise FileExistsError(
                f"vocab monitor already exists at {vd}; pass force=True to rebuild"
            )
        shutil.rmtree(vd)
    os.makedirs(vd, exist_ok=True)
    segments: list[str] = []
    if os.path.isdir(dst_path):
        segments.append(_stage_counts(spark.read.parquet(dst_path), text_col, vd))
    _commit_meta(
        vd,
        {"text_col": text_col, "version": 2, "segments": segments, "applied_batches": {}},
    )


def append_vocab_delta(
    spark: SparkSession,
    dst_path: str,
    batch_df: DataFrame,
    batch_id: int | None = None,
) -> bool:
    """Fold one batch's unigram counts in as a delta segment. Returns
    False when the batch was already applied (at-least-once replay);
    any real failure raises — a lost batch must never be silent."""
    meta = vocab_meta(dst_path)
    if meta is None:
        return False
    if batch_id is not None and str(batch_id) in meta["applied_batches"]:
        return False
    vd = _vocab_dir(dst_path)
    name = _stage_counts(batch_df, meta["text_col"], vd)
    meta["segments"].append(name)
    if batch_id is not None:
        meta["applied_batches"][str(batch_id)] = name
    _commit_meta(vd, meta)
    return True


def vocab_counts(spark: SparkSession, dst_path: str) -> DataFrame:
    """Merged (w, c) unigram counts across the COMMITTED segments."""
    meta = vocab_meta(dst_path)
    if meta is None:
        raise FileNotFoundError(f"no vocab monitor at {_vocab_dir(dst_path)}")
    vd = _vocab_dir(dst_path)
    if not meta["segments"]:
        return spark.createDataFrame([], "w string, c bigint")
    paths = [os.path.join(vd, s) for s in meta["segments"]]
    return (
        spark.read.parquet(*paths)
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
    """Freeze the monitor's current merged unigram counts at `dest` —
    the baseline side of drift-since alerting. Re-snapshotting the same
    dest replaces it (stage, swap, sweep), so periodic re-baselining
    just works."""
    stage = dest + f"._tmp_{uuid.uuid4().hex}"
    vocab_counts(spark, dst_path).coalesce(1).write.mode("overwrite").parquet(stage)
    old = None
    if os.path.exists(dest):
        old = dest + f"._old_{uuid.uuid4().hex}"
        os.rename(dest, old)
    os.rename(stage, dest)
    if old is not None:
        shutil.rmtree(old, ignore_errors=True)


def drift_since(spark: SparkSession, dst_path: str, snapshot_dir: str) -> DataFrame:
    """Distribution drift of the live monitor vs a frozen snapshot:
    total-variation distance + type-set Jaccard (the one-row alerting
    signal — "did the corpus change since the last approved dump?").
    Bit-identical to batch vocab_drift over the corresponding rows;
    exact rationals per the collocations module's pinned-op contract."""
    from columnar_spark.operators.collocations import vocab_drift_from_counts

    snap = spark.read.parquet(snapshot_dir).select("w", F.col("c").alias("c_a"))
    cur = vocab_counts(spark, dst_path).select("w", F.col("c").alias("c_b"))
    counts = snap.join(cur, "w", "full_outer").fillna(0, ["c_a", "c_b"])
    return vocab_drift_from_counts(counts)


def compact_vocab(spark: SparkSession, dst_path: str) -> int:
    """Fold all committed segments into one, commit the new manifest
    atomically, then sweep every directory the manifest no longer
    references (old segments AND crashed-attempt orphans). Returns the
    number of segments folded."""
    meta = vocab_meta(dst_path)
    if meta is None or not meta["segments"]:
        return 0
    vd = _vocab_dir(dst_path)
    old_segs = list(meta["segments"])
    merged = vocab_counts(spark, dst_path)
    name = f"seg_{uuid.uuid4().hex}"
    merged.coalesce(1).write.mode("overwrite").parquet(os.path.join(vd, name))
    meta["segments"] = [name]
    _commit_meta(vd, meta)
    live = {name, "meta.json"}
    for d in os.listdir(vd):
        if d not in live and not d.endswith(".tmp"):
            shutil.rmtree(os.path.join(vd, d), ignore_errors=True)
        elif d.endswith(".tmp"):
            try:
                os.remove(os.path.join(vd, d))
            except OSError:
                pass
    return len(old_segs)
