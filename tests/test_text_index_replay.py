"""Replay-safety of the .ftidx append protocol: foreachBatch sinks run
at-least-once, so a retried batch must not double-index. The append
stages per-attempt delta dirs and commits via an atomic meta.json
rename; a crash before the commit leaves the index unchanged and a
committed batch_id makes retries no-ops."""

import math
import os

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators import fulltext as FT

DOCS = [
    (1, "spark scan merge join fast fast table"),
    (2, "vector scan slow merge merge merge row"),
    (3, "the quick brown fox jumps over a lazy dog"),
    (4, "scan scan scan scan scan"),
    (5, "vector vector join table row column"),
    (6, "empty of matches entirely unrelated words"),
]


def _build(spark, tmp_path, name):
    full = spark.createDataFrame(DOCS, "doc_id long, text string")
    half1 = full.filter(F.col("doc_id") <= 3)
    half2 = full.filter(F.col("doc_id") > 3)
    p = str(tmp_path / f"{name}.parquet")
    half1.write.parquet(p)
    FT.write_text_index(spark, p)
    half2.write.mode("append").parquet(p)
    return p, half2


def test_committed_batch_id_makes_retry_noop(spark, tmp_path):
    p, half2 = _build(spark, tmp_path, "retry")
    assert FT.append_to_text_index(spark, p, half2, batch_id=7) is True
    n_docs = FT.load_text_index(spark, p)[2]["n_docs"]
    # a foreachBatch retry re-invokes the sink with the SAME epoch id
    assert FT.append_to_text_index(spark, p, half2, batch_id=7) is False
    postings, lengths, meta = FT.load_text_index(spark, p)
    assert meta["n_docs"] == n_docs == 6
    assert lengths.count() == 6
    assert FT.check_text_index(spark, p) == []


def test_compaction_preserves_applied_batches(spark, tmp_path):
    """A retry arriving AFTER a compaction (stream restart whose
    checkpoint commit failed) must still be a no-op: the rebuilt
    meta.json carries the applied-batch ledger forward."""
    p, half2 = _build(spark, tmp_path, "compact_ledger")
    assert FT.append_to_text_index(spark, p, half2, batch_id=3) is True
    FT.compact_text_index(spark, p)
    meta = FT.load_text_index(spark, p)[2]
    assert "3" in meta.get("applied_batches", {})
    assert meta["deltas"] == [] if "deltas" in meta else True
    # the post-compaction retry of the already-applied epoch
    assert FT.append_to_text_index(spark, p, half2, batch_id=3) is False
    postings, lengths, meta2 = FT.load_text_index(spark, p)
    assert meta2["n_docs"] == 6 and lengths.count() == 6
    assert FT.check_text_index(spark, p) == []


def test_crash_before_commit_is_invisible_then_retry_applies_once(
    spark, tmp_path, monkeypatch
):
    p, half2 = _build(spark, tmp_path, "crash")
    before = FT.load_text_index(spark, p)[2].copy()

    real_commit = FT._commit_text_meta

    def boom(root, meta):
        raise OSError("injected crash between stage and commit")

    monkeypatch.setattr(FT, "_commit_text_meta", boom)
    with pytest.raises(OSError):
        FT.append_to_text_index(spark, p, half2, batch_id=3)
    monkeypatch.setattr(FT, "_commit_text_meta", real_commit)

    # the failed attempt staged delta dirs but committed nothing:
    # readers see the pre-append index exactly
    postings, lengths, meta = FT.load_text_index(spark, p)
    assert meta["n_docs"] == before["n_docs"] == 3
    assert lengths.count() == 3
    assert os.path.isdir(f"{FT.text_index_path(p)}/postings_delta")  # orphan staged

    # the retry (same batch_id) applies exactly once
    assert FT.append_to_text_index(spark, p, half2, batch_id=3) is True
    postings, lengths, meta = FT.load_text_index(spark, p)
    assert meta["n_docs"] == 6 and lengths.count() == 6
    assert FT.check_text_index(spark, p) == []


def test_compact_folds_deltas_and_sweeps_orphans(spark, tmp_path):
    p, half2 = _build(spark, tmp_path, "compact")
    FT.append_to_text_index(spark, p, half2, batch_id=1)
    root = FT.text_index_path(p)
    assert os.path.isdir(f"{root}/postings_delta")

    want = FT.bm25_search_indexed(spark, p, "vector scan merge", k=5).collect()
    removed = FT.compact_text_index(spark, p)
    assert removed >= 1
    assert not os.path.isdir(f"{root}/postings_delta")
    assert not os.path.isdir(f"{root}/lengths_delta")
    meta = FT.load_text_index(spark, p)[2]
    assert meta.get("deltas", []) == [] and meta["n_docs"] == 6
    got = FT.bm25_search_indexed(spark, p, "vector scan merge", k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert FT.check_text_index(spark, p) == []


def test_analyzer_threads_through_boolean_phrase_near(spark, tmp_path):
    """A stemmed/stopworded sidecar must not silently miss: query terms
    map into the index's term space (ADVICE r3)."""
    docs = [
        (1, "the dogs chase foxes daily"),
        (2, "a dog sleeps"),
        (3, "cats and dogs fight cats"),
        (4, "nothing relevant here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    p = str(tmp_path / "an.parquet")
    df.write.parquet(p)
    analyzer = {"stem": True, "stopwords": ["the", "a", "and"]}
    FT.write_text_index(spark, p, analyzer=analyzer)
    postings, _, meta = FT.load_text_index(spark, p)

    # boolean: "dogs AND cats" -> stemmed (dog, cat) -> doc 3
    got = {
        r["doc_id"]
        for r in FT.match_boolean(
            df, "dogs AND cats", postings=postings, analyzer=meta["analyzer"]
        ).collect()
    }
    assert got == {3}
    # without the analyzer the stemmed index misses every raw plural
    got_raw = FT.match_boolean(df, "dogs AND cats", postings=postings).count()
    assert got_raw == 0

    # phrase: "the dogs chase" -> stopword dropped, stemmed (dog, chase)
    # adjacent in the analyzed stream of doc 1
    got = {
        r["doc_id"]
        for r in FT.phrase_match(
            df, "the dogs chase", postings=postings, analyzer=meta["analyzer"]
        ).collect()
    }
    assert got == {1}

    # near: dogs NEAR/3 foxes -> (dog, fox) within 3 analyzed positions
    got = {
        r["doc_id"]
        for r in FT.near_match(
            df, "dogs", "foxes", 3, postings=postings, analyzer=meta["analyzer"]
        ).collect()
    }
    assert got == {1}
