"""Streaming vocabulary monitor: batch-parity (streamed report is
BIT-identical to batch vocab_stats over the same rows), the manifest
commit protocol (at-least-once replay, crash-invisibility, atomic
compaction, re-init refusal, snapshot re-baselining), and the
append_batch hookup."""

from __future__ import annotations

import os
import struct

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators.collocations import vocab_stats
from columnar_spark.streaming import vocab as SV
from columnar_spark.streaming.vocab import (
    append_vocab_delta,
    compact_vocab,
    drift_since,
    init_vocab_monitor,
    snapshot_counts,
    vocab_report,
)

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "a dog sat"),
    (3, "the quick brown fox jumps over a lazy dog"),
    (4, "scan scan scan scan"),
    (5, "vector vector join table row column"),
    (6, ""),
    (7, "solo"),
]


def _bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


def _rows_equal_bitwise(a, b):
    assert (a.n_tokens, a.n_types, a.n_hapax) == (b.n_tokens, b.n_types, b.n_hapax)
    assert _bits(a.type_token_ratio) == _bits(b.type_token_ratio)
    assert _bits(a.hapax_ratio) == _bits(b.hapax_ratio)


def _full(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_streamed_report_bit_identical_to_batch(spark, tmp_path):
    full = _full(spark)
    p = str(tmp_path / "docs.parquet")
    full.limit(0).write.parquet(p)
    init_vocab_monitor(spark, p, "text")
    for i, lo in enumerate(range(1, 8, 3)):
        chunk = full.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 3))
        assert append_vocab_delta(spark, p, chunk, batch_id=i) is True
    got = vocab_report(spark, p).collect()[0]
    want = vocab_stats(full, "text").collect()[0]
    _rows_equal_bitwise(got, want)


def test_replayed_batch_is_noop_even_after_compaction(spark, tmp_path):
    full = _full(spark)
    p = str(tmp_path / "docs.parquet")
    full.limit(0).write.parquet(p)
    init_vocab_monitor(spark, p, "text")
    chunk = full.filter(F.col("doc_id") <= 4)
    assert append_vocab_delta(spark, p, chunk, batch_id=11) is True
    before = vocab_report(spark, p).collect()[0]
    # foreachBatch retry: same epoch id, must not double-count
    assert append_vocab_delta(spark, p, chunk, batch_id=11) is False
    _rows_equal_bitwise(vocab_report(spark, p).collect()[0], before)
    # applied-batch memory survives compaction (segments are folded,
    # the dedup ledger is not)
    compact_vocab(spark, p)
    assert append_vocab_delta(spark, p, chunk, batch_id=11) is False
    _rows_equal_bitwise(vocab_report(spark, p).collect()[0], before)


def test_crash_before_commit_is_invisible_then_swept(spark, tmp_path, monkeypatch):
    full = _full(spark)
    p = str(tmp_path / "docs.parquet")
    full.limit(0).write.parquet(p)
    init_vocab_monitor(spark, p, "text")
    append_vocab_delta(spark, p, full.filter(F.col("doc_id") <= 3), batch_id=0)
    before = vocab_report(spark, p).collect()[0]

    real = SV._commit_meta

    def boom(vd, meta):
        raise OSError("injected crash between stage and commit")

    monkeypatch.setattr(SV, "_commit_meta", boom)
    with pytest.raises(OSError):
        append_vocab_delta(spark, p, full.filter(F.col("doc_id") > 3), batch_id=1)
    monkeypatch.setattr(SV, "_commit_meta", real)

    # the staged orphan is invisible to readers
    _rows_equal_bitwise(vocab_report(spark, p).collect()[0], before)
    vd = str(tmp_path / "docs.parquet.vocab")
    n_dirs = sum(1 for d in os.listdir(vd) if d.startswith("seg_"))
    assert n_dirs == 3  # bootstrap + committed delta + orphan
    # compaction sweeps everything the manifest doesn't reference
    compact_vocab(spark, p)
    assert sum(1 for d in os.listdir(vd) if d.startswith("seg_")) == 1
    _rows_equal_bitwise(vocab_report(spark, p).collect()[0], before)


def test_compaction_preserves_report(spark, tmp_path):
    full = _full(spark)
    p = str(tmp_path / "docs.parquet")
    full.limit(0).write.parquet(p)
    init_vocab_monitor(spark, p, "text")
    append_vocab_delta(spark, p, full.filter(F.col("doc_id") <= 3), batch_id=0)
    append_vocab_delta(spark, p, full.filter(F.col("doc_id") > 3), batch_id=1)
    before = vocab_report(spark, p).collect()[0]
    # bootstrap (empty table) + two deltas
    assert compact_vocab(spark, p) == 3
    _rows_equal_bitwise(vocab_report(spark, p).collect()[0], before)
    # post-compaction appends keep merging
    append_vocab_delta(spark, p, full.filter(F.col("doc_id") == 5), batch_id=2)
    r = vocab_report(spark, p).collect()[0]
    want = vocab_stats(
        full.union(full.filter(F.col("doc_id") == 5)), "text"
    ).collect()[0]
    _rows_equal_bitwise(r, want)


def test_reinit_refused_unless_forced(spark, tmp_path):
    full = _full(spark)
    p = str(tmp_path / "docs.parquet")
    full.filter(F.col("doc_id") <= 3).write.parquet(p)
    init_vocab_monitor(spark, p, "text")
    append_vocab_delta(spark, p, full.filter(F.col("doc_id") > 3), batch_id=0)
    # re-init would rebuild the base from rows the delta already covers
    with pytest.raises(FileExistsError, match="force=True"):
        init_vocab_monitor(spark, p, "text")
    # force rebuilds from the CURRENT table only (delta rows are not in
    # the table here, so the report now reflects just the 3 stored docs)
    init_vocab_monitor(spark, p, "text", force=True)
    got = vocab_report(spark, p).collect()[0]
    want = vocab_stats(full.filter(F.col("doc_id") <= 3), "text").collect()[0]
    _rows_equal_bitwise(got, want)


def test_drift_since_snapshot_matches_batch_and_rebaselines(spark, tmp_path):
    from columnar_spark.operators.collocations import vocab_drift

    full = _full(spark)
    old = full.filter(F.col("doc_id") <= 4)
    p = str(tmp_path / "docs.parquet")
    full.limit(0).write.parquet(p)
    init_vocab_monitor(spark, p, "text")
    append_vocab_delta(spark, p, old, batch_id=0)
    snap = str(tmp_path / "snap_counts")
    snapshot_counts(spark, p, snap)
    append_vocab_delta(spark, p, full.filter(F.col("doc_id") > 4), batch_id=1)

    got = drift_since(spark, p, snap).collect()[0]
    # batch equivalent: slice 'a' = the snapshot rows, slice 'b' = all
    both = old.withColumn("g", F.lit("a")).union(full.withColumn("g", F.lit("b")))
    want = vocab_drift(both, "g", "a", "b").collect()[0]
    assert (got.n_types_a, got.n_types_b, got.n_shared, got.n_union) == (
        want.n_types_a,
        want.n_types_b,
        want.n_shared,
        want.n_union,
    )
    assert _bits(got.jaccard_types) == _bits(want.jaccard_types)
    assert _bits(got.tv_distance) == _bits(want.tv_distance)

    # re-baselining the SAME dest replaces it; drift collapses to zero
    snapshot_counts(spark, p, snap)
    r = drift_since(spark, p, snap).collect()[0]
    assert r.tv_distance == 0.0 and r.jaccard_types == 1.0


def test_init_bootstraps_existing_rows_and_append_batch_maintains(spark, tmp_path):
    full = _full(spark)
    p = str(tmp_path / "docs.parquet")
    full.filter(F.col("doc_id") <= 3).write.parquet(p)
    init_vocab_monitor(spark, p, "text")  # bootstrap base from 3 rows
    from columnar_spark.streaming.ingest import append_batch

    append_batch(full.filter(F.col("doc_id") > 3), p, batch_id=0)
    got = vocab_report(spark, p).collect()[0]
    want = vocab_stats(spark.read.parquet(p), "text").collect()[0]
    _rows_equal_bitwise(got, want)
