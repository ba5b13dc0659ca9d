"""Filter-surface semantics (reference C1-C11 parity, SURVEY §2.C)."""

import itertools

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from columnar_spark.filters import (
    Filter,
    FilterType,
    MvaAggr,
    apply_filters,
    compile_filter,
    to_sql,
)


@pytest.fixture(scope="module")
def df(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("i", T.LongType()),
            T.StructField("f", T.DoubleType()),
            T.StructField("s", T.StringType()),
            T.StructField("arr", T.ArrayType(T.LongType())),
        ]
    )
    rows = [
        (0, 5, 5.0, "a", [1, 2, 3]),
        (1, 10, 10.5, "b", []),
        (2, 20, 20.0, None, [2, 4]),
        (3, 25, 24.0, "a", [7]),
        (4, None, None, "c", None),
    ]
    return spark.createDataFrame(rows, schema)


def _ids(df, flt):
    return sorted(r["id"] for r in df.filter(flt).select("id").collect())


def _py_range(v, lo, hi, lc, rc):
    if v is None:
        return False
    if lo is not None and not (v >= lo if lc else v > lo):
        return False
    if hi is not None and not (v <= hi if rc else v < hi):
        return False
    return True


def test_all_16_range_shapes_and_exclude(df):
    """Every open/closed/unbounded bound combination (interval.h:24-52)
    times include/exclude, checked against a python evaluator."""
    data = {r["id"]: r["i"] for r in df.select("id", "i").collect()}
    for lo, hi in itertools.product([None, 5, 10], [None, 20, 25]):
        for lc, rc, excl in itertools.product([True, False], repeat=3):
            f = Filter("i", FilterType.RANGE, min_value=lo, max_value=hi,
                       left_closed=lc, right_closed=rc, exclude=excl)
            got = _ids(df, compile_filter(f, df.schema))
            # fully-unbounded range is degenerate: match-all, nulls included
            # (IsFilterDegenerate parity, columnar.cpp:707-718)
            want = sorted(
                i for i, v in data.items()
                if (True if lo is None and hi is None
                    else _py_range(v, lo, hi, lc, rc)) != excl
            )
            assert got == want, (lo, hi, lc, rc, excl)


def test_values_and_single_value_fast_path(df):
    f = Filter("i", FilterType.VALUES, values=(5,))
    assert _ids(df, compile_filter(f, df.schema)) == [0]
    f = Filter("i", FilterType.VALUES, values=(5, 25))
    assert _ids(df, compile_filter(f, df.schema)) == [0, 3]


def test_int_values_on_float_col_coerces(df):
    # FixupFilterSettings parity (filter.cpp:50-64): int 24 matches 24.0
    f = Filter("f", FilterType.VALUES, values=(24, 5))
    assert _ids(df, compile_filter(f, df.schema)) == [0, 3]


def test_int_range_on_float_col(df):
    f = Filter("f", FilterType.RANGE, min_value=10, max_value=21)
    assert _ids(df, compile_filter(f, df.schema)) == [1, 2]


def test_strings_and_exclude_null_semantics(df):
    f = Filter("s", FilterType.STRINGS, strings=("a",))
    assert _ids(df, compile_filter(f, df.schema)) == [0, 3]
    # exclude: null s (id=2) matches the exclude form
    f = Filter("s", FilterType.STRINGS, strings=("a",), exclude=True)
    assert _ids(df, compile_filter(f, df.schema)) == [1, 2, 4]


def test_notnull(df):
    f = Filter("f", FilterType.NOTNULL)
    assert _ids(df, compile_filter(f, df.schema)) == [0, 1, 2, 3]
    f = Filter("f", FilterType.NOTNULL, exclude=True)
    assert _ids(df, compile_filter(f, df.schema)) == [4]


def test_mva_any_all_and_empty_array_semantics(df):
    # ANY over empty array -> false; ALL over empty array -> true (vacuous)
    f = Filter("arr", FilterType.VALUES, values=(2,), mva=MvaAggr.ANY)
    assert _ids(df, compile_filter(f, df.schema)) == [0, 2]
    f = Filter("arr", FilterType.RANGE, min_value=1, max_value=4, mva=MvaAggr.ALL)
    assert _ids(df, compile_filter(f, df.schema)) == [0, 1, 2]  # id=1 empty: vacuous
    f = Filter("arr", FilterType.RANGE, min_value=1, max_value=4, mva=MvaAggr.ALL,
               exclude=True)
    assert _ids(df, compile_filter(f, df.schema)) == [3, 4]  # null arr matches exclude


def test_unsigned_clamp():
    # negative lower bound on an unsigned column clamps to unbounded
    f = Filter("i", FilterType.RANGE, min_value=-5, max_value=2 ** 40, unsigned=True)
    from columnar_spark.filters import _fixup

    fixed = _fixup(f, T.LongType())
    assert fixed.min_value is None and fixed.max_value is None


def test_conjunction(df):
    fs = [
        Filter("i", FilterType.RANGE, min_value=5, max_value=25),
        Filter("s", FilterType.STRINGS, strings=("a",)),
    ]
    out = apply_filters(df, fs)
    assert sorted(r["id"] for r in out.collect()) == [0, 3]


def test_to_sql_matches_spark_via_duckdb(spark, df):
    """Differential: to_sql() rendering against DuckDB on identical data."""
    import duckdb

    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    cases = [
        Filter("i", FilterType.RANGE, min_value=5, max_value=25, left_closed=False),
        Filter("i", FilterType.VALUES, values=(5, 20), exclude=True),
        Filter("s", FilterType.STRINGS, strings=("a", "c")),
        Filter("s", FilterType.STRINGS, strings=("a",), exclude=True),
        Filter("f", FilterType.NOTNULL),
        Filter("arr", FilterType.VALUES, values=(2, 7), mva=MvaAggr.ANY),
        Filter("arr", FilterType.RANGE, min_value=1, max_value=4, mva=MvaAggr.ALL,
               exclude=True),
    ]
    for f in cases:
        got = _ids(df, compile_filter(f, df.schema))
        want = sorted(
            r[0] for r in con.execute(f"SELECT id FROM t WHERE {to_sql(f)}").fetchall()
        )
        assert got == want, f
