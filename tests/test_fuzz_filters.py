"""Property-based differential fuzzing of the filter surface: random
Filter specs evaluated by Spark (compile_filter) and DuckDB (to_sql) on
identical data must agree. Goes beyond the reference's test strategy
(SURVEY §5: golden end-to-end only, no property tests)."""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from columnar_spark.filters import Filter, FilterType, MvaAggr, compile_filter, to_sql

N = 200


def _make_rows():
    rows = []
    for i in range(N):
        rows.append(
            {
                "id": i,
                "i": None if i % 17 == 0 else (i * 7) % 40 - 20,
                "f": None if i % 13 == 0 else ((i * 31) % 100) / 4.0 - 10.0,
                "s": None if i % 11 == 0 else f"v{(i * 3) % 12}",
                "arr": None if i % 19 == 0 else sorted({(i * j) % 15 for j in range(i % 5)}),
            }
        )
    return rows


@pytest.fixture(scope="module")
def frames(spark):
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("i", T.LongType()),
            T.StructField("f", T.DoubleType()),
            T.StructField("s", T.StringType()),
            T.StructField("arr", T.ArrayType(T.LongType())),
        ]
    )
    rows = _make_rows()
    sdf = spark.createDataFrame(
        [(r["id"], r["i"], r["f"], r["s"], r["arr"]) for r in rows], schema
    ).cache()
    sdf.count()
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows))
    return sdf, con


_bound = st.one_of(st.none(), st.integers(-25, 25))
_fbound = st.one_of(st.none(), st.floats(-15.0, 15.0, allow_nan=False).map(lambda x: round(x, 2)))


@st.composite
def filters(draw):
    kind = draw(st.sampled_from(["int_range", "float_range", "int_values", "strings",
                                 "notnull", "mva_values", "mva_range"]))
    excl = draw(st.booleans())
    if kind == "int_range":
        return Filter("i", FilterType.RANGE, min_value=draw(_bound), max_value=draw(_bound),
                      left_closed=draw(st.booleans()), right_closed=draw(st.booleans()),
                      exclude=excl)
    if kind == "float_range":
        return Filter("f", FilterType.FLOATRANGE, min_value=draw(_fbound),
                      max_value=draw(_fbound), left_closed=draw(st.booleans()),
                      right_closed=draw(st.booleans()), exclude=excl)
    if kind == "int_values":
        return Filter("i", FilterType.VALUES,
                      values=tuple(sorted(draw(st.sets(st.integers(-25, 25), min_size=1, max_size=6)))),
                      exclude=excl)
    if kind == "strings":
        return Filter("s", FilterType.STRINGS,
                      strings=tuple(sorted(draw(st.sets(st.sampled_from([f"v{i}" for i in range(14)]),
                                                        min_size=1, max_size=4)))),
                      exclude=excl)
    if kind == "notnull":
        return Filter(draw(st.sampled_from(["i", "f", "s", "arr"])), FilterType.NOTNULL,
                      exclude=excl)
    if kind == "mva_values":
        return Filter("arr", FilterType.VALUES,
                      values=tuple(sorted(draw(st.sets(st.integers(0, 16), min_size=1, max_size=4)))),
                      mva=draw(st.sampled_from([MvaAggr.ANY, MvaAggr.ALL])), exclude=excl)
    return Filter("arr", FilterType.RANGE, min_value=draw(_bound), max_value=draw(_bound),
                  mva=draw(st.sampled_from([MvaAggr.ANY, MvaAggr.ALL])), exclude=excl)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(f=filters())
def test_filter_differential_vs_duckdb(frames, f):
    sdf, con = frames
    got = sorted(r["id"] for r in sdf.filter(compile_filter(f, sdf.schema)).select("id").collect())
    want = sorted(r[0] for r in con.execute(f"SELECT id FROM t WHERE {to_sql(f)}").fetchall())
    assert got == want, f


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(fs=st.lists(filters(), min_size=2, max_size=4))
def test_conjunction_differential_vs_duckdb(frames, fs):
    """AND-of-conjuncts parity — the reference host's zipper-intersection
    of filter iterators (common/blockiterator.h:39) as one predicate."""
    from columnar_spark.filters import compile_filters

    sdf, con = frames
    got = sorted(r["id"] for r in sdf.filter(compile_filters(fs, sdf.schema)).select("id").collect())
    sql = " AND ".join(to_sql(f) for f in fs)
    want = sorted(r[0] for r in con.execute(f"SELECT id FROM t WHERE {sql}").fetchall())
    assert got == want, fs


@pytest.fixture(scope="module")
def manifest(frames):
    from columnar_spark.stats import build_stats_manifest

    sdf, _ = frames
    return {r["column"]: r.asDict() for r in build_stats_manifest(sdf).collect()}


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(f=filters())
def test_early_reject_is_sound(frames, manifest, f):
    """Soundness property of the EarlyReject overlap test: whenever
    stats_can_match says no row can match, the compiled filter must
    really select zero rows. (The reverse — completeness — is not
    required: returning True when zero rows match is allowed.)"""
    from columnar_spark.stats import stats_can_match

    sdf, _ = frames
    if not stats_can_match(manifest, f):
        n = sdf.filter(compile_filter(f, sdf.schema)).count()
        assert n == 0, f"falsely rejected {n} matching rows for {f}"
