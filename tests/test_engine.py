"""Engine facade — the MCL host-contract sequence end-to-end."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.filters import Filter, FilterType
from columnar_spark.table import Engine

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, SF)


def test_scan_filter_project_limit(eng):
    fs = [Filter("l_quantity", FilterType.RANGE, min_value=10, max_value=20)]
    df = eng.scan("lineitem", fs, select=["l_orderkey", "l_quantity"], limit=5)
    rows = df.collect()
    assert len(rows) == 5
    assert set(df.columns) == {"l_orderkey", "l_quantity"}
    assert all(10 <= r["l_quantity"] <= 20 for r in rows)


def test_count_uses_value_index(eng, spark):
    f = Filter("l_linenumber", FilterType.VALUES, values=(1, 2))
    plain = eng.count("lineitem", [f])
    eng.build_value_index("lineitem", "l_linenumber")
    indexed = eng.count("lineitem", [f])
    assert plain == indexed
    want = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_linenumber").isin(1, 2))
        .count()
    )
    assert indexed == want


def test_estimate_and_early_reject(eng):
    f_none = Filter("l_quantity", FilterType.RANGE, min_value=1000, max_value=2000)
    assert eng.estimate("lineitem", f_none) == 0.0
    assert eng.early_reject("lineitem", [f_none])
    f_all = Filter("l_quantity", FilterType.RANGE)
    assert not eng.early_reject("lineitem", [f_all])


def test_engine_knn_filtered(eng):
    q = [0.1] * 64
    out = eng.knn(
        "embeddings", "embedding", q, k=5,
        filters=[Filter("label", FilterType.VALUES, values=(2,))],
    )
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["label"] == 2 for r in rows)


def test_engine_explain(eng):
    fs = [Filter("l_shipdate", FilterType.RANGE, min_value="1997-01-01")]
    rep = eng.explain(eng.scan("lineitem", fs, select=["l_orderkey"]))
    assert any("l_shipdate" in p for p in rep.pushed_filters)
