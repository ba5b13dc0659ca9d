"""The TPC-H aggregate-projection routes (q1/q3/q4/q5/q8/q10/q18):
on a layout carrying the declared artifacts each query must (a) READ
the .aggproj sidecar and never the base fact, and (b) return exactly
the fallback plan's rows — bit-identical, since every measure is the
same fixed-point integer algebra."""

import shutil

import pytest
from pyspark.sql import functions as F  # noqa: F401

import __spark_entry__ as E
from columnar_spark.aggprojections import (
    load_agg_projection,
    write_agg_projection,
)
from columnar_spark.writer import TPCH_AGG_PROJECTIONS

SF = "/root/testdata/sf0.001"
TABLES = ("lineitem", "orders", "customer", "nation", "region", "part",
          "supplier")

ROUTED = [
    ("q1_pricing_summary", "pricing_day"),
    ("q3_shipping_priority", "ship_seg_pairs"),
    ("q4_order_priority", "order_profile"),
    ("q5_region_revenue", "nation_day"),
    ("q7_nation_volume", "nation_day"),
    ("q8_market_share", "mkt_year"),
    ("q10_returned_items", "cust_returns_r"),
    ("q14_promo_revenue", "promo_day"),
    ("q18_large_orders", "order_profile"),
]


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("aggroutes")
    for t in TABLES:
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    li = str(d / "lineitem.parquet")
    for aname, aspec in TPCH_AGG_PROJECTIONS.items():
        write_agg_projection(spark, li, name=aname, **aspec)
    return str(d)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("qname,aname", ROUTED)
def test_route_reads_sidecar_and_matches_fallback(spark, layout, qname, aname):
    qs = E.queries()
    routed = qs[qname](spark, layout)
    files = routed.inputFiles()
    assert any(".aggproj/" in f for f in files), (qname, files)
    assert not any("/lineitem.parquet/" in f or f.endswith("lineitem.parquet")
                   for f in files), (qname, files)
    assert not any("/orders.parquet/" in f or f.endswith("orders.parquet")
                   for f in files), (qname, files)
    # fallback = the same query against the raw sf dir (no artifacts)
    fallback = qs[qname](spark, SF)
    assert routed.columns == fallback.columns
    assert _rows(routed) == _rows(fallback), qname


def test_stale_artifact_falls_back(spark, layout):
    # touch the fact out-of-band: every agg projection must go stale
    li = f"{layout}/lineitem.parquet"
    df = load_agg_projection(spark, li, "pricing_day")
    assert df is not None
    import pandas as pd

    spark.createDataFrame(
        spark.read.parquet(li).limit(1).toPandas()
    ).write.mode("append").parquet(li + ".extra")  # separate dir: no-op
    # real staleness: append into the table dir itself is impossible for
    # a single file, so simulate by bumping the meta sig out from under
    import json
    import os

    sigp = os.path.join(li + ".aggproj", "pricing_day", "_table_sig.json")
    rec = json.load(open(sigp))
    rec["source"]["bytes"] = -1
    json.dump(rec, open(sigp, "w"))
    assert load_agg_projection(spark, li, "pricing_day") is None
    out = E.queries()["q1_pricing_summary"](spark, layout)
    assert not any(".aggproj/" in f for f in out.inputFiles())
