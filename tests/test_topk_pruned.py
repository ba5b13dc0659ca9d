"""Zone-map-pruned top-k: file-subset reads, correctness parity on
clustered AND hostile layouts, null and ascending modes."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators.topk import topk_pruned
from columnar_spark.writer import WriteSpec, write_table


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("topk") / "orders.parquet")
    od = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    write_table(od, p, WriteSpec(cluster_by=("o_totalprice",), num_partitions=16))
    return p


def _expected(spark, path, col, k, desc, tie):
    order = [F.col(col).desc() if desc else F.col(col).asc(), F.col(tie).asc()]
    return [tuple(r) for r in spark.read.parquet(path).orderBy(*order).limit(k).collect()]


def test_pruned_reads_few_files_and_matches(spark, clustered):
    df, read, total = topk_pruned(
        spark, clustered, "o_totalprice", 20, descending=True, tiebreak_col="o_orderkey"
    )
    assert total == 16
    assert read <= 3, f"read {read}/{total} files"
    assert [tuple(r) for r in df.collect()] == _expected(
        spark, clustered, "o_totalprice", 20, True, "o_orderkey"
    )


def test_ascending_mode(spark, clustered):
    df, read, total = topk_pruned(
        spark, clustered, "o_totalprice", 15, descending=False, tiebreak_col="o_orderkey"
    )
    assert read <= 3
    assert [tuple(r) for r in df.collect()] == _expected(
        spark, clustered, "o_totalprice", 15, False, "o_orderkey"
    )


def test_hostile_layout_still_correct(spark, tmp_path):
    """Values interleaved across files: pruning degrades (reads more
    files) but never returns a wrong answer."""
    p = str(tmp_path / "hostile.parquet")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("v")
    )
    df.repartition(8).write.parquet(p)  # random assignment, overlapping ranges
    out, read, total = topk_pruned(spark, p, "v", 10, descending=True, tiebreak_col="id")
    expected = _expected(spark, p, "v", 10, True, "id")
    assert [tuple(r) for r in out.collect()] == expected
    assert read >= 1  # no soundness shortcut


def test_k_larger_than_first_files(spark, clustered):
    df, read, total = topk_pruned(
        spark, clustered, "o_totalprice", 3000, descending=True, tiebreak_col="o_orderkey"
    )
    got = [tuple(r) for r in df.collect()]
    assert got == _expected(spark, clustered, "o_totalprice", 3000, True, "o_orderkey")
    assert len(got) == 3000


def test_missing_stats_falls_back(spark, tmp_path):
    """A string-typed min/max is still fine; a column absent from the
    footer (never written) falls back to the full sort."""
    p = str(tmp_path / "plain.parquet")
    spark.range(100).select(F.col("id"), F.lit(None).cast("double").alias("v")).write.parquet(p)
    out, read, total = topk_pruned(spark, p, "v", 5, descending=True, tiebreak_col="id")
    assert out.count() == 5  # all-null column: still returns k rows (nulls last semantics aside)


from hypothesis import HealthCheck, given, settings, strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(-50, 50)),
        min_size=1,
        max_size=300,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(1, 40),
    desc=st.booleans(),
    nfiles=st.integers(1, 6),
)
def test_fuzz_topk_pruned_vs_full_sort(spark, tmp_path_factory, data, k, desc, nfiles):
    """Random values (heavy ties), random file layouts, random k and
    direction: the pruned result must equal the full sort exactly."""
    from pyspark.sql import functions as F

    p = str(tmp_path_factory.mktemp("tkfz") / "t.parquet")
    df = spark.createDataFrame(data, "id long, v long")
    df.repartition(nfiles).write.parquet(p)

    out, read, total = topk_pruned(
        spark, p, "v", k, descending=desc, tiebreak_col="id"
    )
    got = [tuple(r) for r in out.collect()]
    order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("id").asc()]
    want = [
        tuple(r)
        for r in spark.read.parquet(p).orderBy(*order).limit(k).collect()
    ]
    assert got == want, (k, desc, nfiles, read, total)


def test_all_empty_splits_fall_back(spark, tmp_path):
    p = str(tmp_path / "empty.parquet")
    spark.range(0).selectExpr("id", "CAST(id AS DOUBLE) AS v").repartition(3).write.parquet(p)
    out, read, total = topk_pruned(spark, p, "v", 5, tiebreak_col="id")
    assert out.count() == 0


def test_nullable_order_column_kth_null(spark, tmp_path):
    """ADVICE r3: footer row counts include NULL rows (which sort last
    under DESC), so the k-th observed value can be NULL — the audit must
    treat that as 'bound unknown' and read more files, not crash."""
    p = str(tmp_path / "nulls.parquet")
    # file A: 5 rows, 4 of them NULL -> phase 1 picks it for k=3 (its
    # cumulative rows cover k) but only yields 1 non-null value
    a = spark.createDataFrame(
        [(1, 100.0), (2, None), (3, None), (4, None), (5, None)],
        "id long, v double",
    )
    b = spark.createDataFrame(
        [(6, 90.0), (7, 80.0), (8, 70.0)], "id long, v double"
    )
    a.coalesce(1).write.parquet(p)
    b.coalesce(1).write.mode("append").parquet(p)
    out, read, total = topk_pruned(spark, p, "v", 3, descending=True, tiebreak_col="id")
    got = [tuple(r) for r in out.collect()]
    assert got == _expected(spark, p, "v", 3, True, "id")
    assert [r[1] for r in got] == [100.0, 90.0, 80.0]
