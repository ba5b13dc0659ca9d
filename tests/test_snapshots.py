"""Time travel: COW rewrites retire the old table as a zero-copy
snapshot; read_table(version=) recovers any pre-rewrite state; vacuum
bounds retention; MERGE supports CDC deletes."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators.upsert import merge_into
from columnar_spark.snapshots import history, read_table, vacuum
from columnar_spark.writer import WriteSpec, compact_table, write_table


def test_merge_retires_snapshot_and_time_travels(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k: long, v: double"
    ).write.parquet(path)

    up1 = spark.createDataFrame([(2, -2.0), (4, 40.0)], "k: long, v: double")
    merge_into(spark, path, up1, ["k"])
    up2 = spark.createDataFrame([(5, 50.0)], "k: long, v: double")
    merge_into(spark, path, up2, ["k"])

    hist = history(path)
    assert [e.version for e in hist] == [1, 2]
    assert [e.op for e in hist] == ["merge", "merge"]
    assert hist[0].n_rows == 3 and hist[1].n_rows == 4

    # version 1 = state before the first merge
    v1 = {r["k"]: r["v"] for r in read_table(spark, path, version=1).collect()}
    assert v1 == {1: 10.0, 2: 20.0, 3: 30.0}
    # version 2 = state before the second merge (after the first)
    v2 = {r["k"]: r["v"] for r in read_table(spark, path, version=2).collect()}
    assert v2 == {1: 10.0, 2: -2.0, 3: 30.0, 4: 40.0}
    # current
    cur = {r["k"]: r["v"] for r in read_table(spark, path).collect()}
    assert cur == {1: 10.0, 2: -2.0, 3: 30.0, 4: 40.0, 5: 50.0}


def test_merge_deletes_tombstones(spark, tmp_path):
    path = str(tmp_path / "d.parquet")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k: long, s: string"
    ).write.parquet(path)

    updates = spark.createDataFrame([(2, "B"), (5, "e")], "k: long, s: string")
    deletes = spark.createDataFrame([(3,), (2,), (99,)], "k: long")
    nb, nu, na = merge_into(spark, path, updates, ["k"], deletes=deletes)
    assert (nb, nu) == (4, 2)

    rows = {r["k"]: r["s"] for r in spark.read.parquet(path).collect()}
    # 3 deleted; 2 is in BOTH updates and deletes -> update wins; 99 absent no-op
    assert rows == {1: "a", 2: "B", 4: "d", 5: "e"}
    assert na == 4
    # pre-merge state recoverable
    v1 = {r["k"]: r["s"] for r in read_table(spark, path, version=1).collect()}
    assert v1 == {1: "a", 2: "b", 3: "c", 4: "d"}


def test_restore_rolls_back_and_is_audited(spark, tmp_path):
    path = str(tmp_path / "r.parquet")
    spark.createDataFrame([(1, "x"), (2, "y")], "k: long, s: string").write.parquet(path)
    merge_into(spark, path, spark.createDataFrame([(3, "z")], "k: long, s: string"), ["k"])
    assert spark.read.parquet(path).count() == 3

    from columnar_spark.snapshots import restore

    restore(path, 1)  # back to the pre-merge 2-row state
    assert {r["k"] for r in spark.read.parquet(path).collect()} == {1, 2}
    # the displaced 3-row table was retired, restore is audited
    assert [e.op for e in history(path)] == ["merge", "restore-v1"]
    assert read_table(spark, path, version=2).count() == 3
    # snapshot 1 still exists (restore copied, not moved)
    assert read_table(spark, path, version=1).count() == 2


def test_cli_history_vacuum_restore(spark, tmp_path, capsys):
    import json

    from columnar_spark.__main__ import main

    path = str(tmp_path / "cli.parquet")
    spark.range(10).write.parquet(path)
    merge_into(spark, path, spark.range(10, 12), ["id"])
    merge_into(spark, path, spark.range(12, 13), ["id"])

    assert main(["history", path]) == 0
    hist = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [e["version"] for e in hist] == [1, 2]

    assert main(["restore", path, "--version", "1"]) == 0
    capsys.readouterr()
    assert spark.read.parquet(path).count() == 10

    assert main(["vacuum", path, "--retain-last", "1"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["removed_versions"] == [1, 2]


def test_compact_retires_snapshot_and_vacuum(spark, tmp_path):
    path = str(tmp_path / "c.parquet")
    df = spark.range(200).withColumn("v", F.col("id") * 2.0)
    # fragment: many tiny files
    write_table(df.repartition(16), path, WriteSpec())

    fb, fa = compact_table(spark, path, WriteSpec(cluster_by=["id"]))
    assert fb > fa

    # one more rewrite to get 2 retained snapshots
    up = spark.createDataFrame([(0, -1.0)], "id: long, v: double")
    merge_into(spark, path, up, ["id"])
    assert [e.op for e in history(path)] == ["compact", "merge"]
    assert read_table(spark, path, version=1).count() == 200

    removed = vacuum(path, retain_last=1)
    assert removed == [1]
    # log is an audit trail: entries survive, data does not
    assert [e.version for e in history(path)] == [1, 2]
    with pytest.raises(FileNotFoundError):
        read_table(spark, path, version=1)
    # newest snapshot still readable
    assert read_table(spark, path, version=2).count() == 200


def test_table_changes_between_versions(spark, tmp_path):
    from columnar_spark.snapshots import table_changes

    path = str(tmp_path / "cdf.parquet")
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k: long, s: string, v: double"
    ).write.parquet(path)
    merge_into(
        spark,
        path,
        spark.createDataFrame([(2, "B", 2.0), (4, "d", 4.0)], "k: long, s: string, v: double"),
        ["k"],
        deletes=spark.createDataFrame([(3,)], "k: long"),
    )

    # v1 (pre-merge) -> live
    rows = table_changes(spark, path, 1, None, ["k"]).collect()
    got = {(r["_change_type"], r["k"]): (r["s"], r["v"]) for r in rows}
    assert got == {
        ("delete", 3): ("c", 3.0),
        ("insert", 4): ("d", 4.0),
        ("update_preimage", 2): ("b", 2.0),
        ("update_postimage", 2): ("B", 2.0),
    }
    # identical states diff to empty
    assert table_changes(spark, path, None, None, ["k"]).count() == 0


def test_cli_index_build_and_diff(spark, tmp_path, capsys):
    import json

    from columnar_spark.__main__ import main

    path = str(tmp_path / "cd.parquet")
    spark.createDataFrame([(1, "a"), (2, "b")], "k: long, s: string").write.parquet(path)
    assert main(["index-build", path, "--col", "s"]) == 0
    capsys.readouterr()
    merge_into(
        spark, path, spark.createDataFrame([(2, "B")], "k: long, s: string"), ["k"]
    )
    assert main(["diff", path, "--from", "1", "--keys", "k"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_changes"] == 2  # update pre+post for k=2
    assert {r["_change_type"] for r in out["sample"]} == {
        "update_preimage", "update_postimage",
    }


def test_sql_version_as_of(spark, tmp_path):
    from columnar_spark.table import Engine

    sf = str(tmp_path)
    path = f"{sf}/orders.parquet"
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "o_orderkey: long, o_totalprice: double"
    ).write.parquet(path)
    merge_into(
        spark,
        path,
        spark.createDataFrame([(2, 99.0), (3, 30.0)], "o_orderkey: long, o_totalprice: double"),
        ["o_orderkey"],
    )

    eng = Engine(spark, sf)
    eng.register_views(["orders"])
    cur = eng.sql("SELECT SUM(o_totalprice) AS s FROM orders").first()["s"]
    assert cur == 10.0 + 99.0 + 30.0
    old = eng.sql("SELECT SUM(o_totalprice) AS s FROM orders VERSION AS OF 1").first()["s"]
    assert old == 30.0
    # works with predicates around the clause too
    rows = eng.sql(
        "SELECT o_orderkey FROM orders VERSION AS OF 1 WHERE o_totalprice > 15"
    ).collect()
    assert [r["o_orderkey"] for r in rows] == [2]
