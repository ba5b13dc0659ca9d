"""Property-based differential fuzz of the as-of join vs pandas
merge_asof (direction='backward') — the widely-trusted single-node
semantics for point-in-time joins. Random keys, times (with ties across
sides, duplicates on the left, unmatched rows) must agree on every
(left row -> attached payload) pair for both how='inner' and
how='left'."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from columnar_spark.operators.asof import asof_join

keys = st.integers(min_value=0, max_value=3)
times = st.integers(min_value=0, max_value=50)

left_rows = st.lists(st.tuples(keys, times), min_size=1, max_size=40)
right_rows = st.lists(st.tuples(keys, times), min_size=1, max_size=40)


@given(lrows=left_rows, rrows=right_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_matches_pandas_merge_asof(spark, lrows, rrows):
    # left: allow duplicate (key,time); right must be unique per (key,time)
    # (the operator's documented precondition)
    lpdf = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)],
        columns=["lid", "k", "lt"],
    )
    rset = {(k, t) for k, t in rrows}
    rpdf = pd.DataFrame(
        [(k, t, k * 1000 + t) for k, t in sorted(rset)],
        columns=["k", "rt", "val"],
    )

    want_m = pd.merge_asof(
        lpdf.sort_values(["lt", "lid"]),
        rpdf.sort_values("rt"),
        left_on="lt",
        right_on="rt",
        by="k",
        direction="backward",
    )
    want = {
        int(r.lid): (None if pd.isna(r.val) else int(r.val))
        for r in want_m.itertuples()
    }

    ldf = spark.createDataFrame(lpdf, "lid: long, k: long, lt: long")
    rdf = spark.createDataFrame(rpdf, "k: long, rt: long, val: long")

    left_out = asof_join(ldf, rdf, "k", "k", "lt", "rt", ["val"], how="left")
    got_left = {int(r["lid"]): (None if r["matched_val"] is None else int(r["matched_val"]))
                for r in left_out.collect()}
    assert got_left == want

    inner_out = asof_join(ldf, rdf, "k", "k", "lt", "rt", ["val"], how="inner")
    got_inner = {int(r["lid"]): int(r["matched_val"]) for r in inner_out.collect()}
    assert got_inner == {k: v for k, v in want.items() if v is not None}
