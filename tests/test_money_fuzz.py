"""Differential fuzzing of the fixed-point money mirror: for random
2-dp value sets (mixed signs and magnitudes, duplicate keys, empty
groups), the Spark scaled-long aggregate and the DuckDB mirror SQL must
produce BIT-IDENTICAL doubles — the invariant every converted oracle in
__spark_entry__ relies on. A near-miss (1-ulp drift) would surface as a
sporadic hash mismatch in the driver's correctness gate, so equality is
checked at the bit level, not with a tolerance."""

import struct

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from columnar_spark.functions import money


def _bits(x):
    return struct.unpack("<q", struct.pack("<d", x))[0]


_cents = st.integers(min_value=-(10**10), max_value=10**10)
_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3), _cents),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_group_money_sum_bit_matches_duckdb(spark, rows):
    data = [(g, c / 100.0) for g, c in rows]
    df = spark.createDataFrame(data, "g int, v double")
    got = {
        r["g"]: (r["s"], r["a"])
        for r in df.groupBy("g")
        .agg(
            money.money_sum("v").alias("s"),
            (money.money_sum("v") / F.count(F.lit(1))).alias("a"),
        )
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?)", data)
    want = {
        g: (s, a)
        for g, s, a in con.execute(
            f"SELECT g, {money.money_sum_sql('v')} AS s,"
            f" {money.money_sum_sql('v')} / COUNT(*) AS a FROM t GROUP BY g"
        ).fetchall()
    }
    assert set(got) == set(want)
    for g in got:
        assert _bits(got[g][0]) == _bits(want[g][0]), (g, got[g], want[g])
        assert _bits(got[g][1]) == _bits(want[g][1]), (g, got[g], want[g])


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**7),  # price cents
            st.integers(min_value=0, max_value=10),  # discount cents
            st.integers(min_value=0, max_value=8),  # tax cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_revenue_product_bit_matches_duckdb(spark, rows):
    data = [(p / 100.0, d / 100.0, t / 100.0) for p, d, t in rows]
    df = spark.createDataFrame(data, "p double, d double, t double")
    ep, d, t = money.scaled("p"), money.scaled("d"), money.scaled("t")
    disc4 = ep * (F.lit(100).cast("long") - d)
    charge6 = disc4 * (F.lit(100).cast("long") + t)
    row = df.agg(
        money.unscale(F.sum(disc4), 4).alias("rev"),
        money.unscale(F.sum(charge6), 6).alias("chg"),
    ).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (p DOUBLE, d DOUBLE, t DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", data)
    ps, ds, ts = (
        money.scaled_sql("p"),
        money.scaled_sql("d"),
        money.scaled_sql("t"),
    )
    want = con.execute(
        f"SELECT CAST(SUM({ps} * (100 - {ds})) AS DOUBLE) / 10000.0,"
        f" CAST(SUM({ps} * (100 - {ds}) * (100 + {ts})) AS DOUBLE) / 1000000.0"
        " FROM t"
    ).fetchone()
    assert _bits(row["rev"]) == _bits(want[0])
    assert _bits(row["chg"]) == _bits(want[1])
