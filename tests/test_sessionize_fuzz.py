"""Property fuzz of batch sessionization vs a python reference: random
per-user event times (ties included) must produce identical session
boundaries, extents, and counts for arbitrary gap thresholds."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from columnar_spark.streaming.sessionize import sessionize_batch

events_s = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # user
        st.integers(min_value=0, max_value=100),   # ts_us
    ),
    min_size=1,
    max_size=40,
)
gap_s = st.sampled_from([1, 5, 30])


def _python_sessions(rows, gap):
    by_user = {}
    for eid, (u, t) in enumerate(rows):
        by_user.setdefault(u, []).append((t, eid))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        sid = 0
        start = last = None
        n = 0
        for t, _ in evs:
            if start is None or t - last > gap:
                if start is not None:
                    out[(u, sid)] = (start, last, n)
                sid += 1
                start, n = t, 0
            last = t
            n += 1
        out[(u, sid)] = (start, last, n)
    return out


@given(rows=events_s, gap=gap_s)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sessionize_matches_python(spark, rows, gap):
    df = spark.createDataFrame(
        [(u, t, eid) for eid, (u, t) in enumerate(rows)],
        "user_id: long, ts_us: long, event_id: long",
    )
    got = {
        (r["user_id"], r["session_id"]): (
            r["session_start_us"], r["session_end_us"], r["n_events"],
        )
        for r in sessionize_batch(df, gap_us=gap).collect()
    }
    assert got == _python_sessions(rows, gap)
