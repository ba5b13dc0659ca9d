"""Property-based differential fuzz of the exact-percentile tiers: for
random data and random quantiles, ALL THREE access paths (builtin
map-merge, value-counts cumsum, distributed CDF) must return the same
double as DuckDB's quantile_cont — bit-exact, since the interpolation
recipe is the contract the oracle queries rely on."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from columnar_spark.operators.percentiles import percentiles_auto


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


values_strategy = st.lists(
    st.one_of(
        st.integers(min_value=-10**6, max_value=10**6).map(float),
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False, width=64,
        ),
    ),
    min_size=1,
    max_size=60,
)

q_strategy = st.floats(min_value=0.0, max_value=1.0, allow_nan=False).map(
    lambda q: round(q, 3)
)


@given(values=values_strategy, q=q_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_all_tiers_bit_equal_duckdb(spark, con, values, q):
    df = spark.createDataFrame([(v,) for v in values], "v: double")
    con.execute("DROP TABLE IF EXISTS t")
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    want = con.execute(f"SELECT quantile_cont(v, {q}) FROM t").fetchone()[0]

    for ndv_fake in (1, 100_000, 10**9):  # forces small / medium / large tier
        got = percentiles_auto(
            df, {"v": [(q, "p")]}, ndv={"v": ndv_fake}
        ).first()["p"]
        assert got == want or (got is None and want is None), (
            ndv_fake, q, got, want, sorted(values)[:5],
        )
