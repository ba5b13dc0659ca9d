"""Distributed exact percentiles vs Spark's builtin `percentile`."""

import math
import random

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators.percentiles import percentile_cont, percentiles_multi

QS = [0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def _builtin(df, col, qs):
    arr = ", ".join(str(q) for q in qs)
    row = df.agg(F.expr(f"percentile({col}, array({arr}))").alias("p")).first()
    return [float(v) for v in row["p"]]


@pytest.mark.parametrize("col", ["l_quantity", "l_extendedprice", "l_discount"])
def test_matches_builtin_on_lineitem(spark, col):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    want = _builtin(li, col, QS)
    names = [f"q{i}" for i in range(len(QS))]
    got_row = percentile_cont(li, col, QS, names).first()
    got = [got_row[n] for n in names]
    assert all(math.isclose(a, b, rel_tol=1e-12) for a, b in zip(got, want)), (got, want)


def test_duplicates_and_odd_even(spark):
    rng = random.Random(7)
    vals = [float(rng.randint(0, 9)) for _ in range(101)] + [3.0] * 50
    for n in (len(vals), len(vals) - 1):  # odd and even counts
        df = spark.createDataFrame([(v,) for v in vals[:n]], "x: double")
        want = _builtin(df, "x", QS)
        names = [f"q{i}" for i in range(len(QS))]
        row = percentile_cont(df, "x", QS, names).first()
        got = [row[n_] for n_ in names]
        assert all(math.isclose(a, b, rel_tol=1e-12) for a, b in zip(got, want))


def test_nulls_excluded_and_multi(spark):
    df = spark.createDataFrame(
        [(1.0, None), (2.0, 10.0), (3.0, 20.0), (None, 30.0)],
        "a: double, b: double",
    )
    out = percentiles_multi(df, {"a": [(0.5, "a_med")], "b": [(0.5, "b_med")]}).first()
    assert out["a_med"] == 2.0
    assert out["b_med"] == 20.0


def test_cumulative_window_is_partitioned(spark):
    """The data-sized cumulative window must be keyed on the range
    partition id (bounded per-task state); a global unpartitioned window
    over the counts table would funnel every distinct value through one
    task at scale."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = percentile_cont(li, "l_extendedprice", [0.5], ["m"])
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(__pid" in plan.replace(" ", "").lower()
    assert df.count() == 1


def test_auto_path_flips_on_ndv(spark):
    """percentiles_auto picks builtin below the ndv threshold and the
    distributed CDF above it — and both produce identical values."""
    from columnar_spark.operators.percentiles import percentiles_auto

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    spec = {"l_extendedprice": [(0.5, "m")]}
    lo = percentiles_auto(li, spec, ndv={"l_extendedprice": 10}, ndv_threshold=100)
    hi = percentiles_auto(li, spec, ndv={"l_extendedprice": 10_000}, ndv_threshold=100)
    lo_plan = lo._jdf.queryExecution().optimizedPlan().toString()
    hi_plan = hi._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile_disc(" in lo_plan and "__pid" not in lo_plan
    assert "__pid" in hi_plan.replace(" ", "")
    assert math.isclose(lo.first()["m"], hi.first()["m"], rel_tol=1e-12)


def test_auto_medium_tier_bracket_path(spark):
    """Between small_ndv and ndv_threshold the sketch-bracketed exact
    path runs (no raw-map builtin, no __pid CDF pipeline — the plan
    carries the GK probe + bracket aggregate) and matches the builtin's
    value exactly."""
    from columnar_spark.operators.percentiles import percentiles_auto

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    spec = {"l_extendedprice": [(0.5, "m")]}
    mid = percentiles_auto(
        li, spec, ndv={"l_extendedprice": 500}, small_ndv=100, ndv_threshold=1000
    )
    plan = mid._jdf.queryExecution().optimizedPlan().toString()
    assert "__pid" not in plan.replace(" ", "")  # not the CDF pipeline
    assert "approx_percentile" in plan  # the GK probe is in-plan
    assert "__vals_0" in plan  # bracket aggregate
    ref = li.selectExpr("percentile(l_extendedprice, 0.5) AS m").first()["m"]
    assert mid.first()["m"] == ref


def test_auto_tiers_are_exclusive(spark):
    """A lowered ndv_threshold alone must not double-assign a column
    (regression: small+large both matched, duplicating output cols)."""
    from columnar_spark.operators.percentiles import percentiles_auto

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    spec = {"l_extendedprice": [(0.5, "m")]}
    out = percentiles_auto(li, spec, ndv={"l_extendedprice": 10_000}, ndv_threshold=100)
    assert out.columns == ["m"]


def test_percentile_disc_matches_builtin(spark):
    from columnar_spark.operators.percentiles import percentile_disc

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    got = percentile_disc(li, "l_extendedprice", [0.25, 0.5, 0.9], ["a", "b", "c"]).first()
    ref = spark.sql(
        "SELECT "
        "percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) a, "
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) b, "
        "percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice) c "
        "FROM {li}", li=li
    ).first()
    assert (got["a"], got["b"], got["c"]) == (float(ref["a"]), float(ref["b"]), float(ref["c"]))


def test_bracket_tier_matches_cont(spark):
    """Sketch-bracketed exact path == the CDF pipeline on a
    high-cardinality column, all quantile positions."""
    from columnar_spark.operators.percentiles import (
        percentile_cont,
        percentile_cont_bracket,
    )

    df = spark.range(50_000).selectExpr("CAST(xxhash64(id) % 1000000 AS DOUBLE) AS v")
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    a = percentile_cont(df, "v", qs).first()
    b = percentile_cont_bracket(df, "v", qs).first()
    assert [a[i] for i in range(len(qs))] == [b[i] for i in range(len(qs))]


def test_bracket_tier_heavy_ties(spark):
    """Adversarial: huge tie runs around the target rank must stay exact
    (the bracket collects every tied value; correctness never depends on
    the bracket being small)."""
    from pyspark.sql import functions as F

    from columnar_spark.operators.percentiles import (
        percentile_cont,
        percentile_cont_bracket,
    )

    df = spark.range(20_000).select(
        F.when(F.col("id") < 9_000, 5.0)
        .when(F.col("id") < 11_000, (F.col("id") % 97).cast("double"))
        .otherwise(42.0)
        .alias("v")
    )
    qs = [0.45, 0.5, 0.55]
    a = percentile_cont(df, "v", qs).first()
    b = percentile_cont_bracket(df, "v", qs).first()
    assert [a[i] for i in range(len(qs))] == [b[i] for i in range(len(qs))]


def test_bracket_tier_nulls_excluded(spark):
    from pyspark.sql import functions as F

    from columnar_spark.operators.percentiles import (
        percentile_cont,
        percentile_cont_bracket,
    )

    df = spark.range(1_000).select(
        F.when(F.col("id") % 3 == 0, None).otherwise(F.col("id").cast("double")).alias("v")
    )
    a = percentile_cont(df, "v", [0.5]).first()[0]
    b = percentile_cont_bracket(df, "v", [0.5]).first()[0]
    assert a == b


def test_fused_multi_medium_matches_per_column_bracket(spark):
    """r10 scan fusion: two medium columns + one small column resolved
    in one stats scan + one main scan must equal the per-column
    percentile_cont_bracket results and the small tier's own answers —
    including a NULL-bearing medium column (the NULL filter moved into
    the conditional aggregates)."""
    import random

    from columnar_spark.operators.percentiles import (
        percentile_cont_bracket,
        percentiles_auto,
    )

    rng = random.Random(3)
    rows = []
    for i in range(5000):
        rows.append(
            (
                float(rng.randint(1, 40)),                      # small ndv
                rng.uniform(0, 1e6),                            # medium a
                None if i % 7 == 0 else rng.uniform(-50, 50),   # medium b + NULLs
            )
        )
    df = spark.createDataFrame(rows, "s: double, ma: double, mb: double")
    spec = {
        "s": [(0.5, "s_p50")],
        "ma": [(0.25, "ma_p25"), (0.9, "ma_p90")],
        "mb": [(0.5, "mb_p50")],
    }
    got = percentiles_auto(
        df, spec, ndv={"s": 40, "ma": 1_000_000, "mb": 1_000_000},
        ndv_threshold=2_000_000, small_ndv=1000,
    ).collect()[0]

    ref_a = percentile_cont_bracket(df, "ma", [0.25, 0.9], ["ma_p25", "ma_p90"]).collect()[0]
    ref_b = percentile_cont_bracket(df, "mb", [0.5], ["mb_p50"]).collect()[0]
    assert got["ma_p25"] == ref_a["ma_p25"]
    assert got["ma_p90"] == ref_a["ma_p90"]
    assert got["mb_p50"] == ref_b["mb_p50"]
    # small tier vs Spark's exact percentile machinery (disc brackets)
    ref_s = percentiles_auto(df, {"s": [(0.5, "s_p50")]}, ndv={"s": 40}).collect()[0]
    assert got["s_p50"] == ref_s["s_p50"]
