"""Property fuzz: heavy_hitters == GROUP BY/HAVING ground truth for
random multisets, thresholds, and partitionings."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from columnar_spark.operators.heavyhitters import heavy_hitters

vals_s = st.lists(
    st.integers(min_value=0, max_value=12), min_size=1, max_size=300
)
k_s = st.sampled_from([2, 3, 7, 20])
parts_s = st.sampled_from([1, 3, 8])


@given(vals=vals_s, k=k_s, parts=parts_s)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_heavy_hitters_matches_truth(spark, vals, k, parts):
    df = spark.createDataFrame([(v,) for v in vals], "v: long").repartition(parts)
    n = len(vals)
    truth = {}
    for v in vals:
        truth[v] = truth.get(v, 0) + 1
    want = {(v, c) for v, c in truth.items() if c * k > n}
    got = {(r["v"], r["cnt"]) for r in heavy_hitters(df, "v", k).collect()}
    assert got == want
