"""Copy-on-write MERGE: matched keys replaced, new keys inserted,
untouched rows preserved, schema widening by name."""

from pyspark.sql import functions as F

from columnar_spark.operators.upsert import merge_into


def test_merge_upserts_and_widens(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k: long, s: string, v: double"
    ).write.parquet(path)

    updates = spark.createDataFrame(
        [(2, "B", 99.0, "new"), (4, "d", 40.0, "new")],
        "k: long, s: string, v: double, extra: string",
    )
    nb, nu, na = merge_into(spark, path, updates, ["k"])
    assert (nb, nu, na) == (3, 2, 4)

    rows = {r["k"]: r for r in spark.read.parquet(path).collect()}
    assert rows[2]["s"] == "B" and rows[2]["v"] == 99.0 and rows[2]["extra"] == "new"
    assert rows[1]["s"] == "a" and rows[1]["extra"] is None  # widened with NULL
    assert rows[4]["s"] == "d"
    assert set(rows) == {1, 2, 3, 4}


def test_merge_is_idempotent_on_same_updates(spark, tmp_path):
    path = str(tmp_path / "t2.parquet")
    spark.range(5).withColumn("v", F.col("id") * 1.0).write.parquet(path)
    up = spark.range(3, 7).withColumn("v", F.lit(-1.0))
    merge_into(spark, path, up, ["id"])
    merge_into(spark, path, up, ["id"])
    rows = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert rows == {0: 0.0, 1: 1.0, 2: 2.0, 3: -1.0, 4: -1.0, 5: -1.0, 6: -1.0}
