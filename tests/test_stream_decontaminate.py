"""Streaming decontamination: N micro-batches produce exactly the batch
operator's clean set and report on their union."""

from pyspark.sql import functions as F

from columnar_spark.operators.decontaminate import contamination_report, decontaminate
from columnar_spark.streaming.decontaminate import stream_decontaminate


def _docs(spark):
    # benchmark docs share 8-gram runs with some corpus docs
    words = lambda seed, n: " ".join(f"w{(seed * 7 + i) % 13}x{i % n}" for i in range(n))
    bench_rows = [(1000 + i, words(i, 12)) for i in range(5)]
    corpus_rows = (
        [(i, words(i % 5, 12) + " tail" + str(i)) for i in range(10)]  # contaminated
        + [(100 + i, words(i + 50, 12).upper() + f" uniq{i} " + words(i + 90, 9)) for i in range(20)]
    )
    mk = lambda rows: spark.createDataFrame(rows, "doc_id: long, text: string")
    return mk(bench_rows), mk(corpus_rows)


def test_stream_matches_batch(spark, tmp_path):
    bench, corpus = _docs(spark)
    src = str(tmp_path / "src")
    for i in range(3):
        corpus.filter(F.col("doc_id") % 3 == i).write.mode("append").parquet(src)

    clean_p = str(tmp_path / "clean")
    report_p = str(tmp_path / "report")
    q = stream_decontaminate(
        spark,
        src,
        bench,
        clean_p,
        report_p,
        str(tmp_path / "ckpt"),
        schema=corpus.schema,
    )
    q.awaitTermination(120)

    got_report = {
        (r["doc_id"], r["n_hits"])
        for r in spark.read.parquet(report_p).collect()
    }
    want_report = {
        (r["doc_id"], r["n_hits"])
        for r in contamination_report(corpus, bench).collect()
    }
    assert got_report == want_report and len(got_report) > 0

    got_clean = {r["doc_id"] for r in spark.read.parquet(clean_p).collect()}
    want_clean = {r["doc_id"] for r in decontaminate(corpus, bench).collect()}
    assert got_clean == want_clean
    # flagged + clean partition the corpus
    assert got_clean | {d for d, _ in got_report} == {
        r["doc_id"] for r in corpus.collect()
    }
    assert got_clean.isdisjoint({d for d, _ in got_report})
