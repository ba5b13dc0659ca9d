"""Bucketed range join vs a brute-force theta join oracle, and a plan
assertion that the bucketed form is an equi hash join (no
BroadcastNestedLoopJoin)."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators.rangejoin import range_join


@pytest.fixture(scope="module")
def data(spark):
    pts = (
        spark.range(0, 5_000)
        .select(
            F.col("id").alias("pid"),
            ((F.col("id") * 7919) % 100_000).alias("t"),
            (F.col("id") % 50).alias("u"),
        )
        .repartition(8)
    )
    iv = (
        spark.range(0, 800)
        .select(
            F.col("id").alias("iid"),
            ((F.col("id") * 12553) % 95_000).alias("lo"),
            (F.col("id") % 50).alias("ku"),
        )
        .withColumn("hi", F.col("lo") + 1 + (F.col("iid") % 4000))
        .repartition(4)
    )
    return pts, iv


def _oracle(pts, iv, keyed):
    cond = (F.col("lo") <= F.col("t")) & (F.col("t") < F.col("hi"))
    if keyed:
        cond = cond & (F.col("u") == F.col("ku"))
    return pts.join(iv, cond, "inner").select("pid", "iid")


@pytest.mark.parametrize("width", [100, 1000, 7000])
def test_inner_matches_bruteforce(data, width):
    pts, iv = data
    got = range_join(pts, iv, "t", "lo", "hi", bucket_width=width).select(
        "pid", "iid"
    )
    ref = _oracle(pts, iv, keyed=False)
    assert got.count() == ref.count()
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0


def test_keyed_inner(data):
    pts, iv = data
    got = range_join(
        pts, iv, "t", "lo", "hi", bucket_width=500, keys=("u", "ku")
    ).select("pid", "iid")
    ref = _oracle(pts, iv, keyed=True)
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0


def test_left_keeps_unmatched(data):
    pts, iv = data
    got = range_join(pts, iv, "t", "lo", "hi", bucket_width=500, how="left")
    inner = range_join(pts, iv, "t", "lo", "hi", bucket_width=500)
    matched_pids = inner.select("pid").distinct().count()
    total_pids = pts.select("pid").distinct().count()
    # every point appears; unmatched ones exactly once with null iid
    assert got.filter(F.col("iid").isNull()).count() == total_pids - matched_pids
    assert got.select("pid").distinct().count() == total_pids


def test_plan_is_equijoin_not_bnlj(data):
    pts, iv = data
    got = range_join(pts, iv, "t", "lo", "hi", bucket_width=500)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


# ------------------------------------------------ interval overlap join

from columnar_spark.operators.rangejoin import interval_overlap_join


def _brute_overlap(lrows, rrows, keyed=False):
    out = set()
    for la, llo, lhi, lk in lrows:
        for ra, rlo, rhi, rk in rrows:
            if llo < rhi and rlo < lhi and (not keyed or lk == rk):
                out.add((la, ra))
    return out


def test_overlap_join_matches_brute_force(spark):
    import random

    rnd = random.Random(7)
    lrows = [(i, lo := rnd.randrange(0, 1000), lo + rnd.randrange(1, 80), rnd.randrange(3)) for i in range(120)]
    rrows = [(i, lo := rnd.randrange(0, 1000), lo + rnd.randrange(1, 80), rnd.randrange(3)) for i in range(150)]
    L = spark.createDataFrame(lrows, "la: long, llo: long, lhi: long, lk: long")
    R = spark.createDataFrame(rrows, "ra: long, rlo: long, rhi: long, rk: long")

    for w in (1, 7, 64, 1000):
        got = {
            (r["la"], r["ra"])
            for r in interval_overlap_join(L, R, "llo", "lhi", "rlo", "rhi", w).collect()
        }
        assert got == _brute_overlap(lrows, rrows), w
        # each pair exactly once (no multi-bucket duplicates)
        cnt = interval_overlap_join(L, R, "llo", "lhi", "rlo", "rhi", w).count()
        assert cnt == len(got), w

    keyed = {
        (r["la"], r["ra"])
        for r in interval_overlap_join(
            L, R, "llo", "lhi", "rlo", "rhi", 50, keys=("lk", "rk")
        ).collect()
    }
    assert keyed == _brute_overlap(lrows, rrows, keyed=True)


def test_overlap_join_is_hash_join_not_bnlj(spark):
    L = spark.range(500).select(
        F.col("id").alias("la"), (F.col("id") * 10).alias("llo"), (F.col("id") * 10 + 25).alias("lhi")
    )
    R = spark.range(500).select(
        F.col("id").alias("ra"), (F.col("id") * 9).alias("rlo"), (F.col("id") * 9 + 12).alias("rhi")
    )
    j = interval_overlap_join(L, R, "llo", "lhi", "rlo", "rhi", 16)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
