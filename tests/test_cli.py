"""Operational CLI surface: each subcommand runs in-process and emits
the documented JSON contract (scriptable like the reference's
indexer/indextool pair)."""

import json

import pytest

from columnar_spark.__main__ import main


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001/embeddings.parquet"
    t = str(tmp_path_factory.mktemp("cli") / "embeddings.parquet")
    spark.read.parquet(src).write.parquet(t)
    return t


def test_append_then_check(spark, table, tmp_path_factory, capsys):
    batch = str(tmp_path_factory.mktemp("cli_batch") / "b.parquet")
    spark.read.parquet(table).limit(50).write.parquet(batch)
    assert main(["append", batch, table]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["appended"] == 50

    assert main(["check", table]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] is True

    assert main(["stats", table]) == 0  # manifest written by append


def test_knn_build_and_query(table, capsys):
    assert main(["knn-build", table, "--nlist", "4"]) == 0
    capsys.readouterr()
    assert main(["knn-query", table, "--id", "1", "--k", "5"]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(hits) == 5 and hits[0]["id"] == 1  # self is its own 1-NN


def test_sql_runs_and_prints_rows(capsys):
    rc = main(["sql", "SELECT COUNT(*) AS n FROM region", "--sf-dir",
               "/root/testdata/sf0.001"])
    assert rc == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["n"] == 5


def test_knn_query_by_literal_vector(spark, table, capsys):
    main(["knn-build", table, "--nlist", "4"])
    capsys.readouterr()
    vec = spark.read.parquet(table).select("embedding").first()[0]
    arg = ",".join(str(float(x)) for x in vec)
    # --vec=... form: a leading negative float would otherwise parse as a flag
    assert main(["knn-query", table, f"--vec={arg}", "--k", "3"]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(hits) == 3

    assert main(["knn-query", table, "--vec", "1.0,2.0"]) == 1  # dim mismatch
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "dims" in err["error"]


def test_text_index_build_and_search(spark, tmp_path_factory, capsys):
    t = str(tmp_path_factory.mktemp("cli_ft") / "docs.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(t)

    assert main(["text-index-build", t]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dest"].endswith(".ftidx")

    assert main(["search", t, "vector scan", "--k", "3"]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(hits) == 3 and all("score" in h for h in hits)

    assert main(["search", t, "scan AND NOT vector", "--mode", "boolean", "--k", "5"]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert hits and all(set(h) == {"doc_id"} for h in hits)

    assert main(["search", t, "fast scan", "--mode", "phrase", "--k", "5"]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert all("n_occurrences" in h for h in hits)


def test_rollup_build_and_topk(spark, tmp_path_factory, capsys):
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("cli_r")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes)["ts"] in ("bigint", "long"):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    t = str(d / "events.parquet")
    ev.write.parquet(t)

    assert main(["rollup-build", t]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dest"].endswith(".rollup")

    assert main(["topk", t, "--col", "value", "--k", "5", "--tiebreak", "event_id"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["rows"]) == 5
    vals = [r["value"] for r in out["rows"]]
    assert vals == sorted(vals, reverse=True)


def test_percolate_cli_and_engine_search(spark, tmp_path_factory, capsys):
    d = tmp_path_factory.mktemp("cli_pc")
    t = str(d / "docs.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(t)
    rules = d / "rules.json"
    rules.write_text(
        '[{"id": "r1", "query": "scan vector"}, {"id": "r2", "query": "fox"}]'
    )
    assert main(["percolate", t, str(rules), "--limit", "5"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_matches"] >= 1 and len(out["matches"]) <= 5

    rules.write_text('[{"id": "b1", "query": "scan AND NOT vector"}]')
    assert main(["percolate", t, str(rules), "--mode", "boolean", "--limit", "5"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_matches"] >= 1

    # Engine.search facade, sidecar-aware
    from columnar_spark.table import Engine

    eng = Engine(spark, str(d))
    hits = eng.search("docs", "scan vector", k=3).collect()
    assert len(hits) == 3
    assert eng.search("docs", "fast scan", mode="phrase", k=5).count() >= 1
    assert eng.search("docs", "scan AND NOT vector", mode="boolean", k=5).count() == 5


def test_json_index_build_and_merge_cli(spark, tmp_path_factory, capsys):
    import pyspark.sql.functions as F

    d = tmp_path_factory.mktemp("cli_json")
    t = str(d / "events.parquet")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(t)

    assert main(["index-build", t, "--col", "props", "--json-path", "$.k"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["index"] == "props__j_k" and out["parent"] == "props"
    from columnar_spark.stats import load_value_index

    idx = load_value_index(spark, t, "props__j_k")
    assert idx is not None and idx.count() > 0

    # merge: update one row's props; the JSON index is invalidated
    up = str(d / "up.parquet")
    spark.read.parquet(t).limit(1).withColumn(
        "props", F.lit('{"k": 31337}')
    ).write.parquet(up)
    assert main(["merge", t, "--updates", up, "--keys", "event_id"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_after"] == out["rows_before"]
    assert load_value_index(spark, t, "props__j_k") is None  # disabled


def test_corpus_stats_and_bpe_train(spark, tmp_path_factory, capsys):
    d = tmp_path_factory.mktemp("cli_corpus")
    t = str(d / "docs.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(
        80
    ).write.parquet(t)

    assert main(["corpus-stats", t, "--top-collocations", "2", "--min-count", "2"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_tokens"] > 0 and len(out["collocations"]) == 2
    assert {"w1", "w2", "lift"} <= set(out["collocations"][0])

    merges_path = str(d / "merges.json")
    assert main(["bpe-train", t, "--n-merges", "10", "--out", merges_path,
                 "--stats"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_merges_learned"] == 10
    assert out["fertility"]["n_words"] > 0
    assert len(json.load(open(merges_path))) == 10


def test_vocab_monitor_cli_roundtrip(spark, tmp_path_factory, capsys):
    d = tmp_path_factory.mktemp("cli_vocab")
    t = str(d / "docs.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(
        40
    ).write.parquet(t)

    assert main(["vocab-monitor-init", t]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["monitor"].endswith(".vocab")

    assert main(["vocab-report", t]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    from columnar_spark.operators.collocations import vocab_stats

    want = vocab_stats(spark.read.parquet(t), "text").collect()[0]
    assert rep["n_tokens"] == want.n_tokens and rep["n_types"] == want.n_types


def test_graph_build_and_query_cli(table, capsys):
    assert main(["graph-build", table, "--num-parts", "3"]) == 0
    capsys.readouterr()
    assert main(["graph-query", table, "--id", "1", "--k", "5"]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(hits) == 5 and hits[0]["id"] == 1  # self is its own 1-NN
    assert main(["graph-query", table, "--vec", "1.0,2.0"]) == 1  # dim mismatch


def test_proj_build_and_check(spark, tmp_path_factory, capsys):
    d = tmp_path_factory.mktemp("cli_proj")
    li = str(d / "lineitem.parquet")
    orders = str(d / "orders.parquet")
    src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    src.limit(2000).write.parquet(li)
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").write.parquet(orders)
    # ad-hoc append writes the stats manifest `check` expects of an
    # engine-managed table (raw spark-written dirs legitimately fail it)
    batch = str(d / "batch.parquet")
    src.subtract(src.limit(2000)).limit(100).write.parquet(batch)
    assert main(["append", batch, li]) == 0
    capsys.readouterr()
    assert main([
        "proj-build", li, "--dim", orders, "--name", "lineorder",
        "--fact-key", "l_orderkey", "--dim-key", "o_orderkey",
        "--dim-cols", "o_custkey,o_orderdate,o_orderpriority",
        "--cluster-by", "o_orderdate",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["projection"] == "lineorder"

    from columnar_spark.projections import check_projection, load_join_projection

    assert load_join_projection(spark, li, "lineorder") is not None
    assert check_projection(spark, li, "lineorder") == []
    # the table checker walks it too
    assert main(["check", li]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] is True


def test_textstats_build_cli(spark, tmp_path_factory, capsys):
    d = tmp_path_factory.mktemp("cli_ts")
    docs = str(d / "documents.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(docs)
    assert main(["textstats-build", docs]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["index"] == "textstats"

    from columnar_spark.textstats import load_textstats

    side = load_textstats(spark, docs)
    assert side is not None and side.count() == spark.read.parquet(docs).count()
