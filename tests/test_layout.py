"""Z-order keys, salted joins, Bloom-filter write options."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.functions.layout import salted_join, zorder2
from columnar_spark.writer import WriteSpec, write_table


def _py_zorder2(a: int, b: int, bits: int = 16) -> int:
    key = 0
    for i in range(bits - 1, -1, -1):
        key = (key << 1) | ((a >> i) & 1)
        key = (key << 1) | ((b >> i) & 1)
    return key


def test_zorder2_matches_python(spark):
    rows = [(3, 5), (0, 0), (65535, 1), (1234, 4321)]
    df = spark.createDataFrame(rows, "a: long, b: long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zorder2(F.col("a"), F.col("b")).alias("z")).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _py_zorder2(a, b)


def test_zorder_clusters_locality(spark):
    """Neighbors in (a, b) space land near each other in z-key order."""
    df = spark.createDataFrame(
        [(a, b) for a in range(32) for b in range(32)], "a: long, b: long"
    )
    z = df.select("a", "b", zorder2(F.col("a"), F.col("b"), bits=5).alias("z"))
    # the 4 quadrant corners sort into 4 distinct z-key quarters
    rows = sorted(z.collect(), key=lambda r: r["z"])
    first_quarter = rows[: len(rows) // 4]
    assert all(r["a"] < 16 and r["b"] < 16 for r in first_quarter)


def test_salted_join_equivalence(spark):
    left = spark.createDataFrame(
        [(i % 3, i) for i in range(1000)], "k: long, v: long"
    )
    right = spark.createDataFrame([(0, "x"), (1, "y"), (9, "z")], "k: long, s: string")
    plain = left.join(right, "k").groupBy("k").count()
    salted = salted_join(left, right, "k").groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left-join parity incl. unmatched keys
    p2 = left.join(right, "k", "left").where(F.col("s").isNull()).count()
    s2 = salted_join(left, right, "k", "left").where(F.col("s").isNull()).count()
    assert p2 == s2


def test_bloom_filter_write_option(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bloom") / "t")
    df = spark.range(1000).withColumn("k", F.col("id") * 7)
    write_table(df, path, WriteSpec(bloom_cols=["k"]))
    got = spark.read.parquet(path)
    assert got.count() == 1000 and "k" in got.columns


def test_salted_join_rejects_outer_modes(spark):
    from columnar_spark.functions.layout import salted_join

    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(df, df, "k", how="right")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(df, df, "k", how="full_outer")


def test_ensure_parallelism_adaptive(spark):
    from columnar_spark.functions.layout import ensure_parallelism

    narrow = spark.range(100).coalesce(1)
    spread = ensure_parallelism(narrow)
    assert spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert spread.count() == 100
    wide = spark.range(100).repartition(spark.sparkContext.defaultParallelism)
    assert ensure_parallelism(wide) is wide  # no-op on well-partitioned input


def test_stratified_sample_deterministic_and_proportional(spark):
    from columnar_spark.operators.sampling import sample_gate, stratified_sample

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = stratified_sample(docs, "doc_id", "lang", {"en": 0.5}, 0.1, salt="s1")
    b = stratified_sample(docs, "doc_id", "lang", {"en": 0.5}, 0.1, salt="s1")
    ids_a = sorted(r["doc_id"] for r in a.collect())
    assert ids_a == sorted(r["doc_id"] for r in b.collect())  # reproducible
    # different salt -> different sample
    c = stratified_sample(docs, "doc_id", "lang", {"en": 0.5}, 0.1, salt="s2")
    assert ids_a != sorted(r["doc_id"] for r in c.collect())
    # per-stratum rates near targets (binomial tolerance on ~200/280 rows)
    en_total = docs.filter(F.col("lang") == "en").count()
    en_kept = a.filter(F.col("lang") == "en").count()
    assert abs(en_kept / en_total - 0.5) < 0.15
    other_total = docs.filter(F.col("lang") != "en").count()
    other_kept = a.filter(F.col("lang") != "en").count()
    assert abs(other_kept / other_total - 0.1) < 0.08
    # the gate is a pure scan predicate (no shuffle)
    assert "Exchange" not in a._jdf.queryExecution().executedPlan().toString()
    with pytest.raises(ValueError, match="fraction"):
        sample_gate(F.col("doc_id"), 1.5)
