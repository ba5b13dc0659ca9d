"""Heavy hitters: pigeonhole candidate superset + exact verify equals
the naive GROUP BY/HAVING answer, and the candidate pass stays small."""

from pyspark.sql import functions as F

from columnar_spark.operators.heavyhitters import (
    heavy_hitter_candidates,
    heavy_hitters,
)


def _naive(df, col, k):
    n = df.count()
    return {
        (r[col], r["cnt"])
        for r in df.groupBy(col)
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter(F.col("cnt") * k > n)
        .collect()
    }


def test_matches_naive_on_skewed_data(spark):
    # zipf-ish: value v repeated ~1000/v times, plus a long uniform tail
    rows = []
    for v in range(1, 40):
        rows += [(v,)] * (1000 // v)
    rows += [(1000 + i, ) for i in range(2000)]  # tail: each once
    df = spark.createDataFrame(rows, "v: long").repartition(7)

    for k in (5, 20, 100):
        got = {(r["v"], r["cnt"]) for r in heavy_hitters(df, "v", k).collect()}
        assert got == _naive(df, "v", k), k


def test_candidate_pass_is_superset_and_bounded(spark):
    rows = [(i % 50,) for i in range(5000)] + [(999,)] * 1000
    df = spark.createDataFrame(rows, "v: long").repartition(8)
    k = 10
    cand = heavy_hitter_candidates(df, "v", k).collect()
    markers = [r for r in cand if r["value"] is None]
    values = {r["value"] for r in cand if r["value"] is not None}
    # one marker per non-empty partition, sizes sum to n
    assert sum(r["partition_rows"] for r in markers) == 6000
    # <= k candidate rows per partition
    assert len(cand) - len(markers) <= k * 8
    # superset of the true heavy hitters (999 with 1000/6000 > 1/10 is one)
    true_hh = {v for v, _ in _naive(df, "v", k)}
    assert 999 in true_hh and true_hh <= values


def test_nulls_excluded_but_counted_in_n(spark):
    df = spark.createDataFrame(
        [("a",)] * 60 + [(None,)] * 40, "v: string"
    ).repartition(3)
    # n=100; 'a' has 60 > 100/2
    got = heavy_hitters(df, "v", 2).collect()
    assert [(r["v"], r["cnt"]) for r in got] == [("a", 60)]
    # with k high enough NULL still never appears
    got5 = {r["v"] for r in heavy_hitters(df, "v", 5).collect()}
    assert got5 == {"a"}


def test_empty_and_no_hitters(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "v: long").repartition(4)
    assert heavy_hitters(df, "v", 10).count() == 0
    empty = df.filter("v < 0")
    assert heavy_hitters(empty, "v", 10).count() == 0
