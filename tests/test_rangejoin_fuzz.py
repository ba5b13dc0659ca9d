"""Property fuzz of the bucketed range join vs a brute-force oracle —
including negative and near-2^62 values, where the old double-division
bucketing could silently mis-bucket (double is exact only to 2^53;
integer `div` is exact everywhere and stays monotonic, so the residual
predicate always sees every true candidate)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from columnar_spark.operators.rangejoin import range_join

BIG = 2**61

coords = st.one_of(
    st.integers(min_value=-100, max_value=100),
    st.integers(min_value=BIG - 200, max_value=BIG + 200),
    st.integers(min_value=-BIG - 200, max_value=-BIG + 200),
)

points_s = st.lists(coords, min_size=1, max_size=25)
ivs_s = st.lists(st.tuples(coords, st.integers(min_value=0, max_value=50)),
                 min_size=1, max_size=15)
width_s = st.sampled_from([1, 3, 10, 64])


@given(pts=points_s, ivs=ivs_s, width=width_s)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bucketed_range_join_matches_bruteforce(spark, pts, ivs, width):
    intervals = [(lo, lo + span) for lo, span in ivs]
    want = sorted(
        (i, lo, hi)
        for i, p in enumerate(pts)
        for lo, hi in set(intervals)
        if lo <= p < hi
    )

    pdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pts)], "pid: long, x: long"
    )
    idf = spark.createDataFrame(
        sorted(set(intervals)), "lo: long, hi: long"
    )
    got = sorted(
        (r["pid"], r["lo"], r["hi"])
        for r in range_join(pdf, idf, "x", "lo", "hi", width).collect()
    )
    assert got == want


# ------------------------------------------ interval overlap join fuzz

from columnar_spark.operators.rangejoin import interval_overlap_join


@given(livs=ivs_s, rivs=ivs_s, width=width_s)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_overlap_join_matches_bruteforce_fuzz(spark, livs, rivs, width):
    L = sorted({(lo, lo + span + 1) for lo, span in livs})
    R = sorted({(lo, lo + span + 1) for lo, span in rivs})
    want = sorted(
        (i, j)
        for i, (llo, lhi) in enumerate(L)
        for j, (rlo, rhi) in enumerate(R)
        if llo < rhi and rlo < lhi
    )
    ldf = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(L)], "li: long, llo: long, lhi: long"
    )
    rdf = spark.createDataFrame(
        [(j, lo, hi) for j, (lo, hi) in enumerate(R)], "ri: long, rlo: long, rhi: long"
    )
    rows = interval_overlap_join(ldf, rdf, "llo", "lhi", "rlo", "rhi", width).collect()
    got = sorted((r["li"], r["ri"]) for r in rows)
    # exact set AND exactly-once emission at every width/magnitude
    assert got == want
