"""Aggregate (GROUP-BY) projections: build / load / freshness / delta
maintenance / compaction / checker. The invariant under test everywhere:
the merged artifact equals the live recompute of the defining
aggregation after ANY sequence of source and enrichment appends — the
associative-partials contract streaming/rollup.py pins, generalized to
enriched multi-measure group-bys."""

import json
import os

import pytest
from pyspark.sql import functions as F

from columnar_spark.aggprojections import (
    agg_projection_meta,
    agg_projection_path,
    agg_projections_on,
    agg_projections_referencing,
    check_agg_projection,
    compact_agg_projection,
    load_agg_projection,
    live_agg_frame,
    merge_agg_enrich_delta,
    merge_agg_fact_delta,
    rebuild_agg_projection,
    write_agg_projection,
)

SF = "/root/testdata/sf0.001"

KEYS = {"l_orderkey": "l_orderkey", "o_orderdate": "o_orderdate",
        "o_orderpriority": "o_orderpriority"}
MEASURES = [
    {"name": "cnt", "agg": "count"},
    {"name": "sum_qty_fx", "agg": "sum",
     "expr": "CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)"},
    {"name": "min_ship", "agg": "min", "expr": "l_shipdate"},
    {"name": "ship_rev", "agg": "pairs", "expr": "l_shipdate",
     "expr2": "CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)"},
]
ENRICH = ({"table": "orders.parquet", "left_on": "l_orderkey",
           "right_on": "o_orderkey",
           "cols": {"o_orderdate": "o_orderdate",
                    "o_orderpriority": "o_orderpriority"}},)


@pytest.fixture()
def layout(spark, tmp_path):
    li = str(tmp_path / "lineitem.parquet")
    orders = str(tmp_path / "orders.parquet")
    src_li = spark.read.parquet(f"{SF}/lineitem.parquet")
    src_or = spark.read.parquet(f"{SF}/orders.parquet")
    # hold back slices so the test can append them as deltas
    src_li.filter(F.col("l_orderkey") % 10 != 0).write.parquet(li)
    src_or.filter(F.col("o_orderkey") % 7 != 0).write.parquet(orders)
    li_delta = src_li.filter(F.col("l_orderkey") % 10 == 0)
    or_delta = src_or.filter(F.col("o_orderkey") % 7 == 0)
    return li, orders, li_delta, or_delta


def _sorted_rows(df, meta):
    from columnar_spark.aggprojections import _canon

    return sorted(
        tuple(r) for r in _canon(df.select(*sorted(df.columns)), meta).collect()
    )


def _assert_matches_live(spark, li, name):
    meta = agg_projection_meta(li, name)
    got = load_agg_projection(spark, li, name)
    want = live_agg_frame(spark, li, name).select(*got.columns)
    assert _sorted_rows(got, meta) == _sorted_rows(want, meta)


def test_build_load_and_checker(spark, layout):
    li, orders, *_ = layout
    write_agg_projection(
        spark, li, name="order_profile", keys=KEYS, measures=MEASURES,
        enrich=ENRICH, cluster_by=("o_orderdate",),
    )
    assert agg_projections_on(li) == ["order_profile"]
    assert agg_projections_referencing(orders) == [(li, "order_profile")]
    df = load_agg_projection(spark, li, "order_profile")
    assert df is not None
    # compacted artifact: plain scan, no merge groupBy in the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan and "FileScan" in plan
    assert all(".aggproj/" in f for f in df.inputFiles())
    _assert_matches_live(spark, li, "order_profile")
    assert check_agg_projection(spark, li, "order_profile") == []


def test_fact_and_enrich_deltas_stay_exact(spark, layout):
    li, orders, li_delta, or_delta = layout
    write_agg_projection(
        spark, li, name="order_profile", keys=KEYS, measures=MEASURES,
        enrich=ENRICH,
    )
    # fact append: write delta to the table, fold partials
    li_delta.write.mode("append").parquet(li)
    merge_agg_fact_delta(spark, li, "order_profile", li_delta)
    assert agg_projection_meta(li, "order_profile")["compacted"] is False
    _assert_matches_live(spark, li, "order_profile")
    # enrichment append: previously-unmatched fact rows join in
    or_delta.write.mode("append").parquet(orders)
    merge_agg_enrich_delta(spark, li, "order_profile", "orders.parquet", or_delta)
    _assert_matches_live(spark, li, "order_profile")
    assert check_agg_projection(spark, li, "order_profile") == []
    # compaction collapses partials, result unchanged, plan back to scan
    compact_agg_projection(spark, li, "order_profile")
    assert agg_projection_meta(li, "order_profile")["compacted"] is True
    _assert_matches_live(spark, li, "order_profile")


def test_staleness_gates(spark, layout):
    li, orders, li_delta, _ = layout
    write_agg_projection(
        spark, li, name="order_profile", keys=KEYS, measures=MEASURES,
        enrich=ENRICH,
    )
    # out-of-band source append -> stale -> None
    li_delta.write.mode("append").parquet(li)
    assert load_agg_projection(spark, li, "order_profile") is None
    rebuild_agg_projection(spark, li, "order_profile")
    assert load_agg_projection(spark, li, "order_profile") is not None
    # out-of-band ENRICH table rewrite -> stale too
    ordf = spark.read.parquet(orders)
    ordf.limit(ordf.count() - 5).write.mode("overwrite").parquet(orders + ".tmp")
    import shutil

    shutil.rmtree(orders)
    os.rename(orders + ".tmp", orders)
    assert load_agg_projection(spark, li, "order_profile") is None


def test_checker_catches_corruption(spark, layout):
    li, *_ = layout
    write_agg_projection(
        spark, li, name="order_profile", keys=KEYS, measures=MEASURES,
        enrich=ENRICH,
    )
    p = agg_projection_path(li, "order_profile")
    df = load_agg_projection(spark, li, "order_profile")
    corrupted = df.withColumn(
        "sum_qty_fx",
        F.when(F.col("l_orderkey") == df.first()["l_orderkey"],
               F.col("sum_qty_fx") + 1).otherwise(F.col("sum_qty_fx")),
    )
    corrupted.write.mode("overwrite").parquet(p + ".bad")
    import shutil

    meta_txt = open(os.path.join(p, "_meta.json")).read()
    sig_txt = open(os.path.join(p, "_table_sig.json")).read()
    shutil.rmtree(p)
    os.rename(p + ".bad", p)
    open(os.path.join(p, "_meta.json"), "w").write(meta_txt)
    open(os.path.join(p, "_table_sig.json"), "w").write(sig_txt)
    errs = check_agg_projection(spark, li, "order_profile")
    assert errs and "disagree" in errs[0]


def test_posix_guard(spark, layout, monkeypatch):
    li, *_ = layout
    from columnar_spark import stats

    with pytest.raises(ValueError, match="object store"):
        write_agg_projection(
            spark, "s3a://bucket/lineitem.parquet", name="x", keys=KEYS,
            measures=MEASURES,
        )


def test_ddl_create_show_drop(spark, layout):
    """The DDL twin: CREATE AGGREGATE PROJECTION materializes the
    artifact (nested measure exprs parse; enrichment CARRY joins bake
    in), SHOW INDEXES lists it, a query over the merged frame matches a
    live groupBy, DROP removes it."""
    li, orders, *_ = layout
    import os

    from columnar_spark.table import Engine

    eng = Engine(spark, os.path.dirname(li))
    out = eng.sql(
        "CREATE AGGREGATE PROJECTION ddlp ON lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "CARRY (o_orderdate, o_orderpriority AS prio) "
        "KEYS (o_orderdate, prio) "
        "MEASURES (COUNT(*) AS cnt, "
        "SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS qty2, "
        "MIN(l_shipdate) AS first_ship, "
        "PAIRS(l_shipdate, l_orderkey) AS ship_keys) "
        "CLUSTER BY (o_orderdate)"
    ).collect()
    assert out[0]["kind"] == "aggregate_projection"
    shown = {(r["kind"], r["column"]) for r in eng.sql("SHOW INDEXES FROM lineitem").collect()}
    assert ("aggregate_projection", "ddlp") in shown

    got = load_agg_projection(spark, li, "ddlp")
    assert got is not None
    live = (
        spark.read.parquet(li)
        .join(
            spark.read.parquet(orders).select(
                F.col("o_orderkey"), F.col("o_orderdate"),
                F.col("o_orderpriority").alias("prio"),
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderdate", "prio")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.expr("CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)")).alias("qty2"),
            F.min("l_shipdate").alias("first_ship"),
        )
    )
    a = sorted(tuple(r) for r in got.select("o_orderdate", "prio", "cnt", "qty2", "first_ship").collect())
    b = sorted(tuple(r) for r in live.collect())
    assert a == b

    dropped = eng.sql("DROP AGGREGATE PROJECTION ddlp ON lineitem").collect()
    assert dropped[0]["column"] == "ddlp"
    assert load_agg_projection(spark, li, "ddlp") is None
