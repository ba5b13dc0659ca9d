"""Whole-table MIN/MAX/COUNT(*) answered from the stats manifest:
plan is a LocalTableScan (zero table reads), values bit-identical to the
real aggregation across every column type in the star schema."""

from columnar_spark.table import Engine

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_minmax_count_rewrite_matches_real_aggregate(spark):
    eng = Engine(spark, SF)
    eng.register_views(["orders", "events", "lineitem"])

    cases = [
        "SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx, COUNT(*) AS n FROM orders",
        "SELECT MIN(o_orderdate) AS mn, MAX(o_orderdate) AS mx FROM orders",
        "SELECT MAX(l_quantity) AS mx FROM lineitem",
        "SELECT MIN(event_type) AS mn, COUNT(*) AS n FROM events",
        "SELECT COUNT(*) FROM events",
    ]
    for q in cases:
        got = eng.sql(q)
        plan = _plan(got)
        assert "FileScan" not in plan and "parquet" not in plan.lower(), (q, plan[:800])
        want = spark.sql(q).collect()
        assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want], q
        # column names preserved too (driver-style schema check)
        assert got.columns == spark.sql(q).columns, q


def test_rewrite_falls_through_when_not_covered(spark):
    eng = Engine(spark, SF)
    eng.register_views(["orders"])
    # WHERE, GROUP BY, expressions, unknown columns: all must run the
    # plain plan and still be correct
    for q in [
        "SELECT MIN(o_totalprice) AS mn FROM orders WHERE o_custkey = 7",
        "SELECT o_orderstatus, MAX(o_totalprice) AS mx FROM orders GROUP BY o_orderstatus",
        "SELECT MIN(o_totalprice + 1) AS mn FROM orders",
    ]:
        got = eng.sql(q)
        want = spark.sql(q)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect())), q


def test_group_count_and_distinct_from_value_index(spark):
    eng = Engine(spark, SF)
    eng.register_views(["orders"])
    eng.build_value_index("orders", "o_orderstatus")

    cases = [
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus",
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders WHERE o_orderstatus <> 'F' GROUP BY o_orderstatus",
        "SELECT COUNT(DISTINCT o_orderstatus) AS nd FROM orders",
    ]
    for q in cases:
        got = eng.sql(q)
        plan = _plan(got)
        assert "FileScan" not in plan and "parquet" not in plan.lower(), (q, plan[:600])
        want = spark.sql(q)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect())), q
        assert got.columns == want.columns, q

    # no index on the column -> plain plan, still correct
    q = "SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority"
    got = eng.sql(q)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, spark.sql(q).collect())
    )


def test_describe_and_sidecar_autoload(spark, tmp_path):
    from columnar_spark.stats import write_value_index

    sf = str(tmp_path)
    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    src.write.parquet(f"{sf}/orders.parquet")
    write_value_index(spark, f"{sf}/orders.parquet", "o_orderstatus")

    eng = Engine(spark, sf)
    eng.register_views(["orders"])

    desc = eng.sql("DESCRIBE orders")
    d = {r["column"]: r for r in desc.collect()}
    assert d["o_orderkey"]["row_count"] == src.count()
    assert int(d["o_orderkey"]["min"]) >= 0 and d["o_orderstatus"]["ndv"] >= 2

    # no explicit load_persisted_value_indexes: the rewrite adopts the
    # sidecar lazily
    q = "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus"
    got = eng.sql(q)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "struct<value:string,cnt:bigint>" in plan
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, spark.sql(q).collect())
    )
