"""Writer / stats-manifest / value-index (reference §2.A, §2.D/E parity)."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.filters import Filter, FilterType
from columnar_spark.stats import (
    build_stats_manifest,
    build_value_index,
    count_distinct_from_index,
    covered_count,
    estimate_selectivity,
    load_manifest,
)
from columnar_spark.writer import WriteSpec, check_table, stats_path, write_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def li(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


def test_write_cluster_and_check(spark, li, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("wt") / "lineitem")
    spec = WriteSpec(cluster_by=["l_shipdate"], sort_within=["l_shipdate", "l_orderkey"],
                     hash_cols=["l_returnflag"], num_partitions=4)
    write_table(li, path, spec)

    out = spark.read.parquet(path)
    assert out.count() == li.count()
    assert "l_returnflag__hash" in out.columns
    assert check_table(spark, path, spec) == []

    # clustering makes range predicates prune row groups: every file's
    # shipdate span should be narrow (disjoint-ish ranges)
    import os
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) >= 2


def test_write_mva_invariant(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("wt") / "mva")
    df = spark.createDataFrame([(1, [3, 1, 2]), (2, [9, 5])], "id: long, tags: array<long>")
    write_table(df, path, WriteSpec(mva_cols=["tags"]))
    got = {r["id"]: r["tags"] for r in spark.read.parquet(path).collect()}
    assert got == {1: [1, 2, 3], 2: [5, 9]}
    assert check_table(spark, path, WriteSpec(mva_cols=["tags"])) == []


def test_stats_manifest_values(spark, li, tmp_path_factory):
    m = {r["column"]: r.asDict() for r in build_stats_manifest(li).collect()}
    assert m["l_orderkey"]["row_count"] == li.count()
    assert int(m["l_linenumber"]["ndv"]) == 7
    assert float(m["l_quantity"]["min"]) == 1.0
    assert m["l_returnflag"]["null_count"] == 0

    path = str(tmp_path_factory.mktemp("st") / "t")
    write_table(li, path, WriteSpec())
    loaded = load_manifest(spark, stats_path(path))
    assert loaded["l_orderkey"]["row_count"] == li.count()

    # driver-side sidecar read (no Spark job) agrees with the manifest
    from columnar_spark.stats import ndv_from_sidecar

    ndv = ndv_from_sidecar(path)
    assert ndv is not None and ndv["l_linenumber"] == int(m["l_linenumber"]["ndv"])
    assert ndv_from_sidecar(str(tmp_path_factory.mktemp("none") / "missing")) is None


def test_estimate_selectivity(li):
    m = {r["column"]: r.asDict() for r in build_stats_manifest(li).collect()}
    f_half = Filter("l_quantity", FilterType.RANGE, min_value=1, max_value=25)
    f_all = Filter("l_quantity", FilterType.RANGE)
    sel = estimate_selectivity(m, f_half)
    assert 0.3 < sel < 0.7
    assert estimate_selectivity(m, f_all) == 1.0
    f_in = Filter("l_returnflag", FilterType.STRINGS, strings=("A",))
    assert 0.2 < estimate_selectivity(m, f_in) < 0.5


def test_value_index_covered_count(li):
    """E6 parity: COUNT from the index table == COUNT from a full scan."""
    idx = build_value_index(li, "l_linenumber")
    f = Filter("l_linenumber", FilterType.VALUES, values=(1, 3))
    want = li.filter(F.col("l_linenumber").isin(1, 3)).count()
    assert covered_count(idx, f) == want

    f_range = Filter("l_linenumber", FilterType.RANGE, min_value=2, max_value=4,
                     right_closed=False)
    want = li.filter((F.col("l_linenumber") >= 2) & (F.col("l_linenumber") < 4)).count()
    assert covered_count(idx, f_range) == want

    # E7 parity: count-distinct in O(index size)
    assert count_distinct_from_index(idx) == 7


def test_write_orc_roundtrip(spark, li, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("orc") / "t")
    spec = WriteSpec(format="orc", cluster_by=["l_shipdate"], num_partitions=2)
    write_table(li, path, spec)
    got = spark.read.orc(path)
    assert got.count() == li.count()
    assert check_table(spark, path, spec) == []


def test_posting_index_point_lookup(spark):
    """A11/E2: value -> sorted postings artifact answers point lookups
    with no base-table scan."""
    from columnar_spark.stats import build_posting_index, point_lookup

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    idx = build_posting_index(orders, "o_orderstatus", "o_orderkey")
    want = sorted(
        r["o_orderkey"] for r in orders.filter(F.col("o_orderstatus") == "F").collect()
    )
    got = [r["row_id"] for r in point_lookup(idx, "F").orderBy("row_id").collect()]
    assert got == want
    # postings arrive pre-sorted inside each list
    row = idx.filter(F.col("value") == "F").first()
    assert list(row["postings"]) == sorted(row["postings"])
    assert row["cnt"] == len(want)


def test_exact_percentiles_bit_equal_builtin(spark):
    """The cumsum percentile oracle (test-only since its relocation out
    of the package) is bit-identical to the builtin `percentile`
    aggregate on low- AND high-cardinality columns."""
    from percentile_cumsum_oracle import exact_percentiles_cumsum

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    probs = [0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    for col in ("l_quantity", "l_extendedprice"):
        mine = exact_percentiles_cumsum(li, col, probs).first()
        ref = li.agg(
            F.expr(f"percentile({col}, array({', '.join(map(str, probs))}))")
        ).first()[0]
        for i in range(len(probs)):
            assert mine[f"p{i}"] == ref[i], (col, probs[i], mine[f"p{i}"], ref[i])
