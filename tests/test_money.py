"""Fixed-point money aggregation: exactness, decimal-path parity, and
bit-identical cross-engine (DuckDB) determinism.

The money module replaces >18-precision decimal SUMs (Spark's
BigDecimal slow path) with int64 fixed-point sums; these tests pin the
two claims that make that safe: (1) the scaled-long result equals the
textbook decimal-cast computation value-for-value, and (2) the DuckDB
mirror op sequence produces bit-identical doubles, independent of
reduction order.
"""

from __future__ import annotations

import random
import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from columnar_spark.functions import money


def _bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


@pytest.fixture(scope="module")
def money_rows():
    rng = random.Random(20260814)
    # 2-dp money values incl. negatives, zeros, and large magnitudes
    rows = [
        (
            i % 7,
            round(rng.uniform(-1000, 110_000), 2),
            round(rng.uniform(0.0, 0.10), 2),
            round(rng.uniform(0.0, 0.08), 2),
        )
        for i in range(5_000)
    ]
    rows.append((3, 0.005, 0.0, 0.0))  # not 2-dp: documents the contract edge
    return rows


def test_money_sum_matches_decimal_path(spark, money_rows):
    df = spark.createDataFrame(money_rows, "g int, price double, disc double, tax double")
    got = (
        df.groupBy("g")
        .agg(money.money_sum("price").alias("s"))
        .orderBy("g")
        .collect()
    )
    want = (
        df.groupBy("g")
        .agg(
            F.sum(F.col("price").cast("decimal(18,2)")).cast("double").alias("s")
        )
        .orderBy("g")
        .collect()
    )
    for a, b in zip(got, want):
        # 0.005 is not a 2-dp value; FLOOR(x*100+0.5) and decimal
        # HALF_UP both round it to 0.01 — still equal. Everything else
        # is exact by construction.
        assert _bits(a["s"]) == _bits(b["s"]), (a, b)


def test_money_product_matches_decimal_path(spark, money_rows):
    """disc_price/charge composition: scaled-long products equal the
    decimal(18,4)-cast formulation TPC-H uses."""
    df = spark.createDataFrame(money_rows, "g int, price double, disc double, tax double")
    ep, d, t = money.scaled("price"), money.scaled("disc"), money.scaled("tax")
    disc4 = ep * (F.lit(100).cast("long") - d)
    charge6 = disc4 * (F.lit(100).cast("long") + t)
    got = (
        df.groupBy("g")
        .agg(
            money.unscale(F.sum(disc4), 4).alias("dp"),
            money.unscale(F.sum(charge6), 6).alias("ch"),
        )
        .orderBy("g")
        .collect()
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    dp_dec = (dec("price") * (F.lit(1).cast("decimal(18,2)") - dec("disc"))).cast(
        "decimal(18,4)"
    )
    ch_dec = dp_dec * (F.lit(1).cast("decimal(18,2)") + dec("tax"))
    want = (
        df.groupBy("g")
        .agg(
            F.sum(dp_dec).cast("double").alias("dp"),
            F.sum(ch_dec).cast("double").alias("ch"),
        )
        .orderBy("g")
        .collect()
    )
    for a, b in zip(got, want):
        assert _bits(a["dp"]) == _bits(b["dp"]), (a, b)
        assert _bits(a["ch"]) == _bits(b["ch"]), (a, b)


def test_money_sum_bit_identical_to_duckdb(spark, money_rows):
    df = spark.createDataFrame(money_rows, "g int, price double, disc double, tax double")
    got = {
        r["g"]: r["s"]
        for r in df.groupBy("g").agg(money.money_sum("price").alias("s")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (g INT, price DOUBLE, disc DOUBLE, tax DOUBLE)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", money_rows)
    sql = f"SELECT g, {money.money_sum_sql('price')} AS s FROM t GROUP BY g"
    want = dict(con.execute(sql).fetchall())
    assert set(got) == set(want)
    for g in got:
        assert _bits(got[g]) == _bits(want[g]), (g, got[g], want[g])


def test_wide_path_equals_fast_path(spark, money_rows):
    df = spark.createDataFrame(money_rows, "g int, price double, disc double, tax double")
    rows = (
        df.agg(
            money.money_sum("price").alias("fast"),
            money.money_sum("price", wide=True).alias("wide"),
        )
        .collect()[0]
    )
    assert _bits(rows["fast"]) == _bits(rows["wide"])


def test_scaled_is_exact_for_2dp_values(spark):
    # every representable 2-dp value in a wide range scales to exactly
    # its integer cent count
    vals = [(round(c / 100.0, 2),) for c in range(-10_000, 10_000, 37)]
    df = spark.createDataFrame(vals, "x double")
    bad = (
        df.withColumn("c", money.scaled("x"))
        .withColumn("back", F.col("c") / 100.0)
        .filter(F.abs(F.col("back") - F.col("x")) > 1e-12)
        .count()
    )
    assert bad == 0


def test_mirror_bit_identical_past_2pow53(spark):
    """The decimal-path and fixed-path doubles can differ by 1 ulp once
    the scaled sum exceeds 2^53 (double-rounding) — which is exactly why
    converted queries mirror the fixed op sequence in their oracle SQL.
    This pins that the DuckDB mirror stays bit-identical there: DuckDB
    sums BIGINT into exact HUGEINT, casts the same exact integer to
    double, then performs the same division."""
    rows = [(round(9.87654321e11 + i, 2),) for i in range(4000)]
    df = spark.createDataFrame(rows, "price double")
    got = df.agg(money.money_sum("price").alias("s")).collect()[0]["s"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (price DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = con.execute(
        f"SELECT {money.money_sum_sql('price')} AS s FROM t"
    ).fetchone()[0]
    assert got > 2**53 / 100.0  # the regime under test
    assert _bits(got) == _bits(want)


def _charge_fixture(rng_seed, lo, hi, n):
    rng = random.Random(rng_seed)
    return [
        (
            round(rng.uniform(lo, hi), 2),
            round(rng.uniform(0.0, 0.10), 2),
            round(rng.uniform(0.0, 0.08), 2),
        )
        for _ in range(n)
    ]


def _charge_duckdb(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (price DOUBLE, disc DOUBLE, tax DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    ep_s, d_s, t_s = (
        money.scaled_sql("price"),
        money.scaled_sql("disc"),
        money.scaled_sql("tax"),
    )
    return con.execute(
        f"SELECT CAST(SUM({ep_s} * (100 - {d_s}) * (100 + {t_s})) AS DOUBLE)"
        " / 1000000.0 AS s FROM t"
    ).fetchone()[0]


def _charge_spark(spark, rows, *, wide):
    df = spark.createDataFrame(rows, "price double, disc double, tax double")
    ep, d, t = money.scaled("price"), money.scaled("disc"), money.scaled("tax")
    charge6 = ep * (F.lit(100).cast("long") - d) * (F.lit(100).cast("long") + t)
    if wide:
        charge6 = charge6.cast("decimal(38,0)")
    return df.agg(money.unscale(F.sum(charge6), 6).alias("s")).collect()[0]["s"]


def test_product_chain_mirror_bit_identical_past_2pow53(spark):
    """The q1 charge form (ep_c * (100-d_c) * (100+t_c), 6-dp scaled):
    DuckDB mirror stays bit-identical when the scaled sum is past 2^53
    but inside the int64 envelope."""
    rows = _charge_fixture(7, 1e7, 9e7, 3000)  # sum ~1e17: >2^53, <9.2e18
    got = _charge_spark(spark, rows, wide=False)
    want = _charge_duckdb(rows)
    assert got > 2**53 / 1e6
    assert _bits(got) == _bits(want)


def test_product_chain_beyond_int64_needs_wide(spark):
    """Past the int64 envelope (~7.6e7 worst-case charge addends) the
    long sum overflows — LOUDLY under Spark 4's default ANSI mode
    (ARITHMETIC_OVERFLOW), never silently wrong — while DuckDB's
    hugeint sum is unbounded. The wide decimal(38,0) path (q1's
    sum_charge, corr's sxy) stays exact and bit-matches DuckDB. Pins
    both the failure mode and the fix."""
    rows = _charge_fixture(11, 1e9, 9e9, 3000)  # sum ~1.5e19 > 9.2e18
    want = _charge_duckdb(rows)
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        _charge_spark(spark, rows, wide=False)
    wide = _charge_spark(spark, rows, wide=True)
    assert _bits(wide) == _bits(want)  # decimal(38,0) stays exact
