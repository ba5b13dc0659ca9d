"""Benchmark decontamination: planted n-gram overlap is found with the
right counts, clean docs survive, and the join is broadcast (the corpus
side must never shuffle its exploded grams)."""

from pyspark.sql import functions as F

from columnar_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
)

BENCH_SENT = "the quick brown fox jumps over the lazy dog tonight"  # 10 words


def _dfs(spark):
    bench = spark.createDataFrame(
        [(0, BENCH_SENT)], "doc_id: long, text: string"
    )
    corpus = spark.createDataFrame(
        [
            # contains the full benchmark sentence -> 3 distinct 8-grams
            (1, "intro words " + BENCH_SENT + " trailing words"),
            # case difference only -> still contaminated (lowered)
            (2, BENCH_SENT.upper()),
            # clean
            (3, "completely unrelated text with many distinct words here"),
            # shares a 7-gram but not an 8-gram -> clean at n=8
            (4, "quick brown fox jumps over the lazy cat indeed"),
        ],
        "doc_id: long, text: string",
    )
    return corpus, bench


def test_contamination_report_counts(spark):
    corpus, bench = _dfs(spark)
    got = {r["doc_id"]: r["n_hits"] for r in contamination_report(corpus, bench).collect()}
    # 10-word benchmark sentence has 3 distinct 8-grams, all present in
    # doc 1 and (lowercased) doc 2
    assert got == {1: 3, 2: 3}


def test_decontaminate_drops_flagged(spark):
    corpus, bench = _dfs(spark)
    kept = {r["doc_id"] for r in decontaminate(corpus, bench).collect()}
    assert kept == {3, 4}


def test_join_is_broadcast(spark):
    corpus, bench = _dfs(spark)
    plan = contamination_report(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
