"""Operational CLI (python -m columnar_spark): each subcommand drives
the same library paths the tests already prove; here we pin the wiring,
exit codes, and JSON output contract."""

import json

from columnar_spark.__main__ import main


def test_cli_ingest_check_stats_sql(spark, tmp_path_factory, capsys):
    dest = str(tmp_path_factory.mktemp("cli") / "layout")
    rc = main(["ingest", "/root/testdata/sf0.001", dest])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["built"] is True

    # idempotent second run: signature matches, no rebuild
    rc = main(["ingest", "/root/testdata/sf0.001", dest])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["built"] is False

    rc = main(["check", f"{dest}/lineitem.parquet"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["ok"] is True and out["errors"] == []

    rc = main(["stats", f"{dest}/nation.parquet"])
    man = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and man["n_nationkey"]["row_count"] == 25

    rc = main(
        ["sql", "SELECT COUNT(*) AS n FROM region", "--sf-dir", dest]
    )
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rc == 0 and rows == [{"n": 5}]


def test_cli_knn_query_without_index_fails_cleanly(spark, tmp_path_factory, capsys):
    table = str(tmp_path_factory.mktemp("cliknn") / "t.parquet")
    spark.range(3).selectExpr(
        "id AS vec_id", "array(cast(id as float), cast(id as float)) AS embedding"
    ).write.parquet(table)
    rc = main(["knn-query", table, "--id", "1"])
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 1 and "no index" in out["error"]
