"""Property fuzz of the distributed global rank/row_number (range
partition + broadcast offsets) vs a plain python sort — heavy ties,
duplicates, negatives, and tiny/huge partitions counts are exactly the
regimes where per-partition offset arithmetic goes wrong."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from columnar_spark.operators.rank import global_rank, global_row_number

vals = st.lists(
    st.integers(min_value=-5, max_value=5),  # narrow domain -> many ties
    min_size=1,
    max_size=50,
)


@given(vs=vals)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_global_rank_and_rownumber_match_python(spark, vs):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vs)], "rid: long, v: long"
    )

    out = global_row_number(df, order_by=["v", "rid"]).collect()
    got_rn = {r["rid"]: r["row_num"] for r in out}
    want_rn = {
        rid: i + 1
        for i, (v, rid) in enumerate(sorted((v, rid) for rid, v in enumerate(vs)))
    }
    assert got_rn == want_rn

    ranked = global_rank(df, order_by=["v"]).collect()
    got_rk = {r["rid"]: r["rnk"] for r in ranked}
    svals = sorted(vs)
    first_pos = {}
    for i, v in enumerate(svals):
        first_pos.setdefault(v, i + 1)
    want_rk = {rid: first_pos[v] for rid, v in enumerate(vs)}
    assert got_rk == want_rk
