"""Engine facade — the MCL host-contract sequence end-to-end."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.filters import Filter, FilterType
from columnar_spark.table import Engine

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, SF)


def test_scan_filter_project_limit(eng):
    fs = [Filter("l_quantity", FilterType.RANGE, min_value=10, max_value=20)]
    df = eng.scan("lineitem", fs, select=["l_orderkey", "l_quantity"], limit=5)
    rows = df.collect()
    assert len(rows) == 5
    assert set(df.columns) == {"l_orderkey", "l_quantity"}
    assert all(10 <= r["l_quantity"] <= 20 for r in rows)


def test_count_uses_value_index(eng, spark):
    f = Filter("l_linenumber", FilterType.VALUES, values=(1, 2))
    plain = eng.count("lineitem", [f])
    eng.build_value_index("lineitem", "l_linenumber")
    indexed = eng.count("lineitem", [f])
    assert plain == indexed
    want = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_linenumber").isin(1, 2))
        .count()
    )
    assert indexed == want


def test_estimate_and_early_reject(eng):
    f_none = Filter("l_quantity", FilterType.RANGE, min_value=1000, max_value=2000)
    assert eng.estimate("lineitem", f_none) == 0.0
    assert eng.early_reject("lineitem", [f_none])
    f_all = Filter("l_quantity", FilterType.RANGE)
    assert not eng.early_reject("lineitem", [f_all])


def test_engine_knn_filtered(eng):
    q = [0.1] * 64
    out = eng.knn(
        "embeddings", "embedding", q, k=5,
        filters=[Filter("label", FilterType.VALUES, values=(2,))],
    )
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["label"] == 2 for r in rows)


def test_engine_explain(eng):
    fs = [Filter("l_shipdate", FilterType.RANGE, min_value="1997-01-01")]
    rep = eng.explain(eng.scan("lineitem", fs, select=["l_orderkey"]))
    assert any("l_shipdate" in p for p in rep.pushed_filters)


def test_early_reject_is_conservative_overlap(eng):
    # A point range inside [min, max] estimates ~0 measure but CAN match:
    # the reject must be an overlap proof, not a selectivity estimate.
    f_point = Filter("l_quantity", FilterType.RANGE, min_value=25, max_value=25)
    assert not eng.early_reject("lineitem", [f_point])
    # Bound exactly at the column max, inclusive: can match.
    mx = float(eng.stats("lineitem")["l_quantity"]["max"])
    f_at_max = Filter("l_quantity", FilterType.RANGE, min_value=mx)
    assert not eng.early_reject("lineitem", [f_at_max])
    # Same bound exclusive: provably empty.
    f_above_max = Filter("l_quantity", FilterType.RANGE, min_value=mx, left_closed=False)
    assert eng.early_reject("lineitem", [f_above_max])
    # Exclude forms match nulls — never rejected from min/max alone.
    f_excl = Filter(
        "l_quantity", FilterType.RANGE, min_value=1000, max_value=2000, exclude=True
    )
    assert not eng.early_reject("lineitem", [f_excl])
    # VALUES entirely outside the domain: provably empty.
    f_vals = Filter("l_quantity", FilterType.VALUES, values=(100000, 200000))
    assert eng.early_reject("lineitem", [f_vals])


def test_knn_access_path_flips_with_selectivity(eng):
    # No IVF index trained -> always fullscan.
    assert eng.knn_access_path("embeddings", "embedding") == "fullscan"
    eng.train_knn_index("embeddings", "embedding", n_clusters=4)
    # Unfiltered -> approximate probe.
    assert eng.knn_access_path("embeddings", "embedding") == "ivf"
    # At sf0.001 (tiny N) the cost model rightly brute-forces everything
    # under default k/ef; pass a small ef so the flip itself is exercised.
    # Highly selective filter -> brute-forcing survivors is cheaper (and
    # exact): fullscan, the ShouldUseFullscan bypass.
    selective = [Filter("vec_id", FilterType.RANGE, min_value=0, max_value=3)]
    assert eng.knn_access_path("embeddings", "embedding", selective, k=2, ef=2) == "fullscan"
    # Broad filter -> stay approximate.
    broad = [Filter("vec_id", FilterType.RANGE)]
    assert eng.knn_access_path("embeddings", "embedding", broad, k=2, ef=2) == "ivf"
    # mode='auto' executes the chosen path end-to-end.
    q = [0.1] * 64
    rows = eng.knn("embeddings", "embedding", q, k=3, filters=selective, mode="auto").collect()
    assert len(rows) == 3 and all(0 <= r["vec_id"] <= 3 for r in rows)


def test_sql_count_rewrite_drops_base_scan(eng):
    """Engine.sql answers an index-covered COUNT(*) from the value index
    alone: the parquet base relation disappears from the physical plan."""
    eng.register_views(["lineitem"])
    eng.build_value_index("lineitem", "l_returnflag")

    q = "SELECT COUNT(*) AS n FROM lineitem WHERE l_returnflag = 'R'"
    rewritten = eng.sql(q)
    plain = eng.spark.sql(q)
    assert rewritten.first()["n"] == plain.first()["n"]
    plan = rewritten._jdf.queryExecution().executedPlan().toString()
    assert "lineitem.parquet" not in plan, plan  # base scan gone

    # Conjuncts on one column still rewrite (range + exclude forms).
    q2 = "SELECT COUNT(*) AS n FROM lineitem WHERE l_returnflag <> 'R' AND l_returnflag IS NOT NULL"
    r2 = eng.sql(q2)
    assert r2.first()["n"] == eng.spark.sql(q2).first()["n"]
    assert "lineitem.parquet" not in r2._jdf.queryExecution().executedPlan().toString()

    # Non-covered column: falls through, base scan present, same answer.
    q3 = "SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity BETWEEN 10 AND 20"
    r3 = eng.sql(q3)
    assert "lineitem" in r3._jdf.queryExecution().executedPlan().toString()
    assert r3.first()["n"] == eng.spark.sql(q3).first()["n"]

    # Multi-column predicate: not covered, falls through.
    q4 = "SELECT COUNT(*) AS n FROM lineitem WHERE l_returnflag = 'R' AND l_quantity < 10"
    assert eng.sql(q4).first()["n"] == eng.spark.sql(q4).first()["n"]

    # Numeric-column coverage: build, rewrite, compare.
    eng.build_value_index("lineitem", "l_linenumber")
    q5 = "SELECT COUNT(*) AS n FROM lineitem WHERE l_linenumber BETWEEN 2 AND 4"
    r5 = eng.sql(q5)
    assert r5.first()["n"] == eng.spark.sql(q5).first()["n"]
    assert "lineitem.parquet" not in r5._jdf.queryExecution().executedPlan().toString()


def test_show_indexes_lists_sidecars(spark, tmp_path):
    """SHOW INDEXES FROM t inventories every sidecar artifact."""
    from pyspark.sql import functions as F

    from columnar_spark.operators.fulltext import write_text_index
    from columnar_spark.stats import write_value_index
    from columnar_spark.table import Engine

    d = tmp_path / "showix"
    d.mkdir()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = str(d / "documents.parquet")
    docs.write.parquet(p)
    write_value_index(spark, p, "lang")
    write_text_index(spark, p)

    eng = Engine(spark, str(d))
    rows = {(r["kind"], r["column"]) for r in eng.sql("SHOW INDEXES FROM documents").collect()}
    assert ("value_index", "lang") in rows
    assert ("text_index", "—") in rows
    # a table with no sidecars reports none
    docs.limit(5).write.parquet(str(d / "bare.parquet"))
    rows2 = [r["kind"] for r in eng.sql("SHOW INDEXES FROM bare").collect()]
    assert rows2 == ["none"]


def test_sql_index_ddl_roundtrip(spark, tmp_path):
    """CREATE INDEX / CREATE TEXT INDEX / DROP INDEX through Engine.sql —
    the reference daemon's DDL surface over the sidecar artifacts."""
    import os

    sf = str(tmp_path)
    spark.read.parquet(f"{SF}/events.parquet").write.parquet(f"{sf}/events.parquet")
    spark.read.parquet(f"{SF}/documents.parquet").write.parquet(
        f"{sf}/documents.parquet"
    )
    e = Engine(spark, sf)
    e.register_views(["events"])

    r = e.sql("CREATE INDEX ON events(event_type)").first()
    assert r["kind"] == "value_index" and os.path.isdir(r["path"])
    # the new index serves the covered count, no base scan
    q = "SELECT COUNT(*) AS n FROM events WHERE event_type = 'click'"
    d = e.sql(q)
    assert "events.parquet" not in d._jdf.queryExecution().executedPlan().toString().replace(
        "events.parquet.vidx", ""
    )
    assert d.first()["n"] == e.spark.sql(q).first()["n"]

    r = e.sql("CREATE INDEX ON events(get_json_object(props, '$.k'))").first()
    assert r["column"] == "props__j_k" and os.path.isdir(r["path"])

    r = e.sql("CREATE TEXT INDEX ON documents(text, doc_id)").first()
    assert r["kind"] == "text_index" and os.path.isdir(r["path"])

    r = e.sql("DROP INDEX event_type ON events").first()
    assert not os.path.isdir(f"{sf}/events.parquet.vidx/event_type")
    # dropped: the covered count falls back to the base scan, same answer
    d2 = e.sql(q)
    assert d2.first()["n"] == e.spark.sql(q).first()["n"]

    shown = {(x["kind"], x["column"]) for x in e.sql("SHOW INDEXES FROM events").collect()}
    assert ("json_field_index", "props:$.k") in shown  # parent linkage surfaced
    assert ("value_index", "event_type") not in shown

    # COUNT(DISTINCT json field) also routes through the normalized name
    qd = "SELECT COUNT(DISTINCT get_json_object(props, '$.k')) AS d FROM events"
    dd = e.sql(qd)
    assert "events.parquet" not in dd._jdf.queryExecution().executedPlan().toString().replace(
        "events.parquet.vidx", ""
    )
    assert dd.first()["d"] == e.spark.sql(qd).first()["d"]


def test_sql_knn_surface(spark):
    """SELECT ... WHERE KNN(col, k, (v...)) [AND pred] — the reference
    daemon's KNN SQL form, filter-then-rank with deterministic ties."""
    e = Engine(spark, SF)
    emb = e.table("embeddings")
    q = [float(v) for v in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    vec = ", ".join(repr(v) for v in q)

    rows = e.sql(
        f"SELECT vec_id, label, knn_dist() FROM embeddings "
        f"WHERE KNN(embedding, 5, ({vec}))"
    ).collect()
    assert len(rows) == 5
    assert rows[0]["vec_id"] == 3 and abs(rows[0]["knn_dist"]) < 1e-9
    dists = [r["knn_dist"] for r in rows]
    assert dists == sorted(dists)

    # residual predicate pre-filters (filtered-KNN semantics)
    lab = rows[1]["label"]
    got = e.sql(
        f"SELECT vec_id, label FROM embeddings "
        f"WHERE KNN(embedding, 4, ({vec})) AND label = {lab}"
    ).collect()
    assert got and all(r["label"] == lab for r in got)


def test_sql_knn_index_option(spark, tmp_path):
    """OPTION mode=index serves the persisted IVF-PQ sidecar (the
    reference's index-backed SQL KNN); recall-gated vs the exact form,
    payload columns re-attached, filtered+index combination refused."""
    import pytest as _pytest

    from columnar_spark.operators.knn_index import build_vector_index

    src = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    p = str(tmp_path / "embeddings.parquet")
    src.write.parquet(p)
    build_vector_index(spark, src, p)
    e = Engine(spark, str(tmp_path))
    q = [float(v) for v in src.filter(F.col("vec_id") == 3).first()["embedding"]]
    vs = ", ".join(repr(v) for v in q)

    exact = e.sql(
        f"SELECT vec_id, knn_dist() FROM embeddings WHERE KNN(embedding, 10, ({vs}))"
    ).collect()
    idxr = e.sql(
        f"SELECT vec_id, label, knn_dist() FROM embeddings "
        f"WHERE KNN(embedding, 10, ({vs})) OPTION mode=index"
    ).collect()
    assert len(idxr) == 10
    assert idxr[0]["vec_id"] == 3  # self is nearest even through PQ+rerank
    recall = len({r["vec_id"] for r in exact} & {r["vec_id"] for r in idxr}) / 10
    assert recall >= 0.5, recall
    assert all(r["label"] is not None for r in idxr)  # payload re-attached

    with _pytest.raises(ValueError, match="residual"):
        e.sql(
            f"SELECT vec_id FROM embeddings "
            f"WHERE KNN(embedding, 5, ({vs})) AND label = 1 OPTION mode=index"
        )
    with _pytest.raises(ValueError, match="no persisted vector index"):
        e2 = Engine(spark, "/root/testdata/sf0.001")
        e2.sql(
            f"SELECT vec_id FROM embeddings WHERE KNN(embedding, 5, ({vs})) OPTION mode=index"
        )
