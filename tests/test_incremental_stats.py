"""Incremental (mergeable) stats maintenance — E9 at O(batch), not
O(table): sketching two halves and merging must agree with the one-shot
full-table manifest on exact fields (min/max/nulls/rows) and be close
on the HLL ndv estimate."""

from pyspark.sql import functions as F

from columnar_spark.stats import (
    build_stats_manifest,
    build_stats_sketch,
    manifest_from_sketch,
    merge_sketches,
)

SRC = "/root/testdata/sf0.01/lineitem.parquet"


def _as_map(df):
    return {r["column"]: r.asDict() for r in df.collect()}


def test_merged_sketch_matches_full_manifest(spark):
    li = spark.read.parquet(SRC)
    half_a = li.filter(F.col("l_orderkey") % 2 == 0)
    half_b = li.filter(F.col("l_orderkey") % 2 == 1)

    merged = merge_sketches(build_stats_sketch(half_a), build_stats_sketch(half_b))
    got = _as_map(manifest_from_sketch(merged))
    want = _as_map(build_stats_manifest(li))

    assert set(got) == set(want)
    for c, w in want.items():
        g = got[c]
        assert g["row_count"] == w["row_count"], c
        assert g["null_count"] == w["null_count"], c
        if w["min"] is not None:
            # numeric mins come back double-formatted after a merge
            # ('1' vs '1.0'); compare as floats when parseable
            try:
                assert float(g["min"]) == float(w["min"]), c
                assert float(g["max"]) == float(w["max"]), c
            except ValueError:
                assert g["min"] == w["min"] and g["max"] == w["max"], c
        if w["ndv"] is not None:
            # two different HLL estimators (approx_count_distinct vs
            # Datasketches): agree within 10%
            assert abs(g["ndv"] - w["ndv"]) <= max(0.1 * w["ndv"], 2), (
                c, g["ndv"], w["ndv"],
            )


def test_merge_is_order_insensitive_and_incremental(spark):
    li = spark.read.parquet(SRC).limit(30_000)
    parts = [
        li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)
    ]
    sks = [build_stats_sketch(p) for p in parts]
    ab_c = merge_sketches(merge_sketches(sks[0], sks[1]), sks[2])
    c_ba = merge_sketches(sks[2], merge_sketches(sks[1], sks[0]))
    a = _as_map(manifest_from_sketch(ab_c))
    b = _as_map(manifest_from_sketch(c_ba))
    for c in a:
        assert a[c] == b[c], c


def test_string_minmax_merge_is_exact(spark):
    df1 = spark.createDataFrame([("apple",), ("pear",)], "s: string")
    df2 = spark.createDataFrame([("banana",), ("zebra",)], "s: string")
    m = _as_map(
        manifest_from_sketch(
            merge_sketches(build_stats_sketch(df1), build_stats_sketch(df2))
        )
    )
    assert m["s"]["min"] == "apple" and m["s"]["max"] == "zebra"
    # and the numeric trap ('9' > '10' lexicographically) stays correct
    d1 = spark.createDataFrame([(9,)], "v: int")
    d2 = spark.createDataFrame([(10,)], "v: int")
    mv = _as_map(
        manifest_from_sketch(
            merge_sketches(build_stats_sketch(d1), build_stats_sketch(d2))
        )
    )
    assert float(mv["v"]["min"]) == 9.0 and float(mv["v"]["max"]) == 10.0
