"""Property fuzz for the Engine.sql join-MV router: randomized
two- and three-table join queries — mixing carried and NON-carried
columns, filters, group-bys, table aliases, qualified keys, SELECT *,
orderings — must return exactly what plain spark.sql returns. The
router may route or fall back; it may never change an answer."""

import random

import pytest
from pyspark.sql import functions as F

from columnar_spark.projections import write_join_projection
from columnar_spark.table import Engine

SF = "/root/testdata/sf0.001"

CARRIED = ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
NOT_CARRIED = ["o_orderstatus", "o_totalprice"]
FACT_COLS = ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
             "l_returnflag", "l_shipdate"]
CUST_COLS = ["c_custkey", "c_mktsegment", "c_nationkey"]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("mvfuzz")
    li = str(d / "lineitem.parquet")
    orders = str(d / "orders.parquet")
    cust = str(d / "customer.parquet")
    spark.read.parquet(f"{SF}/lineitem.parquet").write.parquet(li)
    spark.read.parquet(f"{SF}/orders.parquet").write.parquet(orders)
    spark.read.parquet(f"{SF}/customer.parquet").write.parquet(cust)
    write_join_projection(
        spark, li, orders,
        name="lineorder", fact_key="l_orderkey", dim_key="o_orderkey",
        dim_cols=tuple(CARRIED), cluster_by=("o_orderdate",),
    )
    e = Engine(spark, str(d))
    e.register_views()
    return e


def _rows(df):
    return sorted([tuple(r) for r in df.collect()])


def _gen_query(rng: random.Random) -> str:
    three = rng.random() < 0.35
    aliased = rng.random() < 0.5
    la, oa, ca = ("l", "o", "c") if aliased else ("lineitem", "orders", "customer")

    def qual(c):
        if not rng.random() < 0.5:
            return c
        owner = la if c.startswith("l_") else oa if c.startswith("o_") else ca
        return f"{owner}.{c}"

    sel_pool = FACT_COLS + CARRIED + NOT_CARRIED + (CUST_COLS if three else [])
    n_sel = rng.randint(1, 3)
    star = rng.random() < 0.1
    group = not star and rng.random() < 0.5
    if star:
        sel = rng.choice(["*", f"{oa}.*"])
        tail = ""
    elif group:
        keys = rng.sample(sel_pool, n_sel)
        aggs = rng.choice(
            ["COUNT(*) AS n", "SUM(l_quantity) AS q",
             "COUNT(*) AS n, SUM(l_extendedprice) AS s"]
        )
        sel = ", ".join(qual(k) for k in keys) + ", " + aggs
        tail = " GROUP BY " + ", ".join(qual(k) for k in keys)
    else:
        keys = rng.sample(sel_pool, n_sel)
        sel = ", ".join(f"{qual(c)} AS c{i}" for i, c in enumerate(keys))
        tail = ""
    asw = (lambda t, a: f"{t} {a}" if aliased else t)
    lo_on = rng.choice(
        [f"{qual('l_orderkey')} = {qual('o_orderkey')}",
         f"{qual('o_orderkey')} = {qual('l_orderkey')}"]
    )
    if three:
        oc_on = f"{qual('o_custkey')} = {qual('c_custkey')}"
        join = rng.choice([
            f"{asw('lineitem', la)} JOIN {asw('orders', oa)} ON {lo_on}"
            f" JOIN {asw('customer', ca)} ON {oc_on}",
            f"{asw('customer', ca)} JOIN {asw('orders', oa)} ON {oc_on}"
            f" JOIN {asw('lineitem', la)} ON {lo_on}",
        ])
    else:
        join = rng.choice(
            [f"{asw('lineitem', la)} JOIN {asw('orders', oa)} ON {lo_on}",
             f"{asw('orders', oa)} JOIN {asw('lineitem', la)} ON {lo_on}",
             f"{asw('lineitem', la)} INNER JOIN {asw('orders', oa)} ON {lo_on}"]
        )
    where = rng.choice(
        ["", f" WHERE {qual('o_orderdate')} >= '1997-01-01'",
         f" WHERE {qual('l_returnflag')} = 'R'",
         f" WHERE {qual('o_orderstatus')} = 'F'",  # non-carried -> fall back
         f" WHERE {qual('l_quantity')} > 25 AND {qual('o_orderdate')} < '1998-01-01'"]
    )
    return f"SELECT {sel} FROM {join}{where}{tail}"


def _approx_eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        # double SUM order differs between the re-clustered projection
        # and the base layout — last-ulp drift is inherent to float
        # summation, not a routing defect (the engine's declared money
        # queries use exact fixed-point int64 for this reason)
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


def _check(eng, spark, q):
    got = _rows(eng.sql(q))
    want = _rows(spark.sql(q))
    assert len(got) == len(want), q
    for ra, rb in zip(got, want):
        assert len(ra) == len(rb) and all(
            _approx_eq(x, y) for x, y in zip(ra, rb)
        ), (q, ra, rb)


def test_router_fuzz_matches_plain_sql(spark, eng):
    rng = random.Random(420)
    for i in range(40):
        _check(eng, spark, _gen_query(rng))


def test_select_star_never_loses_columns(spark, eng):
    """The ADVICE regression: `SELECT *` over fact JOIN dim must keep
    the full joined column set (the projection carries a pruned,
    reordered subset and must not serve it)."""
    for q in [
        "SELECT * FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        " WHERE o_orderdate = '1996-01-02'",
        "SELECT o.* FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
        " WHERE o.o_orderdate = '1996-01-02'",
    ]:
        got, want = eng.sql(q), spark.sql(q)
        assert got.columns == want.columns, q
        assert _rows(got) == _rows(want), q


def test_aliased_and_chain_forms_route(spark, eng):
    """Plan assertion: aliased 2-table and 3-table-chain queries over
    carried columns must READ THE PROJECTION (single fact scan), not
    re-join the base tables."""
    for q in [
        "SELECT o.o_orderpriority, COUNT(*) AS n FROM orders o "
        "JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
        "GROUP BY o.o_orderpriority",
        "SELECT c.c_mktsegment, SUM(l.l_quantity) AS q FROM customer c "
        "JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
        "GROUP BY c.c_mktsegment",
        "SELECT c_mktsegment, COUNT(*) AS n FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_mktsegment",
    ]:
        df = eng.sql(q)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "lineitem.parquet.proj/" in plan, (q, plan)
        assert "lineitem.parquet/" not in plan, (q, plan)
        _check(eng, spark, q)


def test_multi_predicate_on_clause_bails(spark, eng):
    """ADVICE r8 (high): an ON clause that continues past its first
    equality (AND/OR conjuncts) must NOT be routed — the old parser
    consumed only the first equality and re-spliced the trailing
    disjunct verbatim after the rebuilt FROM, silently changing the
    collapsed join's OR semantics. The router must return the exact
    plain-SQL answer (routing is fine only if semantics survive; for
    these shapes it bails)."""
    qs = [
        # trailing OR on the collapsible join
        "SELECT l_quantity, o_orderpriority FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "OR l.l_returnflag = o.o_orderstatus",
        # trailing AND on the collapsible join
        "SELECT COUNT(*) AS n FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "AND o.o_orderpriority = '1-URGENT'",
        # chain where the LAST join carries the OR (the verified replay)
        "SELECT COUNT(*) AS n FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "OR o.o_orderpriority = c.c_mktsegment",
        # AND on a non-collapsible join in a chain
        "SELECT COUNT(*) AS n FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "AND c.c_mktsegment = 'BUILDING'",
    ]
    for q in qs:
        _check(eng, spark, q)
        # and the refusal is explicit: no projection in the plan
        plan = eng.sql(q)._jdf.queryExecution().executedPlan().toString()
        assert "lineitem.parquet.proj/" not in plan, q


def test_skip_telemetry_records_reasons(spark, eng):
    """r8 verdict item 7: a query that references both projection tables
    but cannot be served must leave a structured skip record (reason +
    projection name) instead of a silent miss."""
    eng.mv_router_skips.clear()
    cases = [
        ("SELECT l_quantity, o_orderpriority FROM lineitem l "
         "LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey",
         "non-inner join form"),
        ("SELECT COUNT(*) AS n FROM lineitem l "
         "JOIN orders o ON l.l_orderkey = o.o_orderkey "
         "OR l.l_returnflag = o.o_orderstatus",
         "multi-predicate ON clause"),
        ("SELECT * FROM lineitem JOIN orders ON l_orderkey = o_orderkey",
         "star select item"),
        ("SELECT o_orderstatus, COUNT(*) AS n FROM lineitem "
         "JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderstatus",
         "does not carry"),  # o_orderstatus is not a carried column
    ]
    for q, expect in cases:
        before = len(eng.mv_router_skips)
        eng.sql(q).collect()
        recs = eng.mv_router_skips[before:]
        assert recs and any(expect in r["reason"] for r in recs), (q, recs)
        assert all(r["projection"] == "lineorder" for r in recs)
    # unrelated queries never pollute the telemetry
    before = len(eng.mv_router_skips)
    eng.sql("SELECT COUNT(*) AS n FROM customer").collect()
    assert len(eng.mv_router_skips) == before
