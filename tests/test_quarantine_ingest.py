"""Malformed-record quarantine at the ingest boundary: good rows parse,
bad lines are captured verbatim (not dropped, not fatal), counts
reconcile, and the quarantine sidecar accumulates across batches."""

from __future__ import annotations

import pytest

from columnar_spark.sources.readers import read_source_quarantined


def test_json_quarantine_split(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "v": 10.5}\n'
        '{"id": 2, "v": "not-a-double"}\n'
        "{totally broken\n"
        '{"id": 3, "v": 0.25}\n'
    )
    good, bad = read_source_quarantined(
        spark, str(p), "json", attrs=[("id", "int64"), ("v", "float")]
    )
    assert sorted((r.id, r.v) for r in good.collect()) == [(1, 10.5), (3, 0.25)]
    bad_rows = bad.collect()
    assert len(bad_rows) == 2
    raws = {r.raw_record for r in bad_rows}
    assert any(r.startswith("{totally broken") for r in raws)
    assert any("not-a-double" in r for r in raws)
    assert all(r.source_file.endswith("in.jsonl") for r in bad_rows)


def test_csv_quarantine_split_and_sidecar_accumulates(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,v\n1,10.5\nnope,xx\n3,0.25\n")
    q = str(tmp_path / "quarantine")
    good, bad = read_source_quarantined(
        spark,
        str(p),
        "csv",
        attrs=[("id", "int64"), ("v", "float")],
        quarantine_path=q,
    )
    assert good.count() == 2 and bad.count() == 1
    assert spark.read.parquet(q).count() == 1
    # a second batch appends to the same quarantine dir
    p2 = tmp_path / "in2.csv"
    p2.write_text("id,v\nbroken,line\n")
    read_source_quarantined(
        spark,
        str(p2),
        "csv",
        attrs=[("id", "int64"), ("v", "float")],
        quarantine_path=q,
    )
    assert spark.read.parquet(q).count() == 2


def test_counts_reconcile(spark, tmp_path):
    lines = ['{"id": %d, "v": 1.0}' % i for i in range(20)]
    lines[5] = "oops"
    lines[13] = '{"id": "x", "v": []}'
    p = tmp_path / "mix.jsonl"
    p.write_text("\n".join(lines) + "\n")
    good, bad = read_source_quarantined(
        spark, str(p), "json", attrs=[("id", "int64"), ("v", "float")]
    )
    assert good.count() + bad.count() == 20


def test_parquet_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="csv/json"):
        read_source_quarantined(spark, "x", "parquet", attrs=[("id", "int64")])


def test_cli_append_with_quarantine(spark, tmp_path, capsys):
    import json as _json

    from columnar_spark.__main__ import main

    t = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1, 2.0)], "id long, v double").write.parquet(t)
    src = tmp_path / "batch.jsonl"
    src.write_text('{"id": 2, "v": 3.5}\nbroken line\n{"id": 3, "v": 1.5}\n')
    q = str(tmp_path / "quar")
    rc = main(["append", str(src), t, "--format", "json", "--quarantine", q])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["appended"] == 2 and out["quarantined"] == 1
    assert spark.read.parquet(t).count() == 3
    assert spark.read.parquet(q).count() == 1
