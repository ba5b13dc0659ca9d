"""Plan-shape assertions: pushdown, pruning, broadcast, top-k — the
`.explain()` discipline as tests (SURVEY §4)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from columnar_spark.filters import Filter, FilterType, compile_filter
from columnar_spark.plans.explain import access_path_report

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def li(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


def test_filter_pushdown_reaches_scan(li):
    f = Filter("l_quantity", FilterType.RANGE, min_value=10, max_value=20)
    df = li.filter(compile_filter(f, li.schema)).select("l_orderkey")
    rep = access_path_report(df)
    pushed = " ".join(rep.pushed_filters)
    assert "l_quantity" in pushed, rep.plan
    assert "GreaterThanOrEqual" in pushed and "LessThanOrEqual" in pushed


def test_projection_pruning(li):
    df = li.filter(F.col("l_linenumber") == 1).select("l_orderkey", "l_quantity")
    rep = access_path_report(df)
    cols = rep.read_columns()
    assert cols == {"l_orderkey", "l_quantity", "l_linenumber"}, cols


def test_in_list_pushdown(li):
    f = Filter("l_partkey", FilterType.VALUES, values=tuple(range(0, 50)))
    df = li.filter(compile_filter(f, li.schema)).select("l_partkey")
    rep = access_path_report(df)
    assert any("l_partkey" in p for p in rep.pushed_filters), rep.plan


def test_q5_broadcasts_dims(spark):
    # only fixed-size dims are hinted; AQE must still pick broadcast for
    # the small scaling tables at this SF (final plan, hence execute)
    df = E.queries()["q5_region_revenue"](spark, SF)
    rep = access_path_report(df, execute=True)
    assert rep.n_broadcasts >= 3, rep.plan


def test_topk_uses_take_ordered(spark):
    df = E.queries()["topk_latest_events"](spark, SF)
    rep = access_path_report(df)
    assert rep.has_take_ordered, rep.plan


def test_knn_is_take_ordered_not_full_sort(spark):
    df = E.queries()["knn_cosine_topk"](spark, SF)
    rep = access_path_report(df)
    assert rep.has_take_ordered, rep.plan


def test_q1_single_scan_single_shuffle(spark):
    df = E.queries()["q1_pricing_summary"](spark, SF)
    rep = access_path_report(df, execute=True)
    assert rep.n_scans == 1
    # partial agg + final agg -> exactly one exchange on the group key
    assert rep.n_exchanges <= 2, rep.plan
    assert rep.n_codegen_stages >= 1, rep.plan
