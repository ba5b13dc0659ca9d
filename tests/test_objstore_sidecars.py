"""Object-store sidecar commits (r8 item 4, extended r10 to the
projection/cohort/companion families): on a simulated object store — a
local root where os.rename/os.replace/shutil.move are FORBIDDEN — the
`.stats`, `.vidx`, `.rollup`, `.proj`, `.aggproj`, `.cohort`,
`.textstats`, and `.dedupsig` sidecars must build, read, append, and
freshness-gate through the staging + manifest-pointer protocol
(objstore.py). Families not yet migrated keep the explicit refusal,
and a REAL scheme (s3://...) with no registered transport refuses
loudly instead of writing to a local directory of that name."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from columnar_spark import objstore

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def store(tmp_path, monkeypatch):
    """A rename-forbidden local root registered as an object store."""
    root = str(tmp_path / "bucket")
    os.makedirs(root)

    real_rename, real_replace, real_move = os.rename, os.replace, shutil.move

    def _under(p):
        return os.path.abspath(str(p)).startswith(os.path.abspath(root))

    def guard(fn):
        def wrapped(src, dst, *a, **k):
            assert not (_under(src) or _under(dst)), (
                f"rename-family call under the object store: {src} -> {dst}"
            )
            return fn(src, dst, *a, **k)

        return wrapped

    monkeypatch.setattr(os, "rename", guard(real_rename))
    monkeypatch.setattr(os, "replace", guard(real_replace))
    monkeypatch.setattr(shutil, "move", guard(real_move))
    with objstore.simulate_object_store(root):
        yield root


def _install_table(spark, root, name, src=None):
    """PUT a table into the store (upload-whole copies, no renames)."""
    dst = os.path.join(root, f"{name}.parquet")
    os.makedirs(dst)
    shutil.copyfile(src or f"{SF}/{name}.parquet",
                    os.path.join(dst, "part-00000.parquet"))
    return dst


def test_value_index_build_read_append_freshness(spark, store, tmp_path):
    from columnar_spark.stats import (
        index_is_fresh,
        load_value_index,
        merge_value_index,
        value_index_path,
        write_value_index,
    )

    li = _install_table(spark, store, "lineitem")
    write_value_index(spark, li, "l_returnflag")
    vdir = value_index_path(li, "l_returnflag")
    assert objstore.live_files(vdir), "manifest pointer missing"
    idx = load_value_index(spark, li, "l_returnflag")
    base = spark.read.parquet(li)
    n0 = base.count()
    want = {
        (r["value"], r["cnt"])
        for r in base.groupBy(F.col("l_returnflag").alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert {(r["value"], r["cnt"]) for r in idx.collect()} == want

    # append: PUT a batch file into the table, merge the index
    batch = base.limit(500)
    pdf = batch.toPandas()
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pdf), os.path.join(li, "part-00001.parquet"))
    merge_value_index(spark, li, "l_returnflag", batch)
    assert index_is_fresh(li, vdir)
    idx2 = load_value_index(spark, li, "l_returnflag")
    total = sum(r["cnt"] for r in idx2.collect())
    assert total == n0 + 500

    # freshness: out-of-band table change -> stale -> None
    pq.write_table(pa.Table.from_pandas(pdf.head(10)),
                   os.path.join(li, "part-00002.parquet"))
    assert load_value_index(spark, li, "l_returnflag") is None

    # uncommitted junk segments are invisible to readers
    with open(os.path.join(vdir, "seg-deadbeef-99999.parquet"), "wb") as f:
        f.write(b"garbage not parquet")
    # (reload with check_fresh=False so the sig gate does not hide it)
    idx3 = load_value_index(spark, li, "l_returnflag", check_fresh=False)
    assert sum(r["cnt"] for r in idx3.collect()) == total


def test_stats_sidecar_build_and_read(spark, store):
    from columnar_spark.stats import (
        build_stats_manifest,
        ndv_from_sidecar,
        row_count_from_sidecar,
        write_stats_sidecar,
    )

    li = _install_table(spark, store, "lineitem")
    df = spark.read.parquet(li)
    write_stats_sidecar(spark, build_stats_manifest(df), li)
    assert objstore.live_files(li + ".stats"), "manifest pointer missing"
    assert row_count_from_sidecar(li) == df.count()
    ndv = ndv_from_sidecar(li)
    assert ndv and ndv.get("l_returnflag") == 3
    # rebuild (overwrite) flips the pointer; old segments become invisible
    write_stats_sidecar(spark, build_stats_manifest(df.limit(100)), li)
    assert row_count_from_sidecar(li) == 100


def test_rollup_build_append_read_and_replay(spark, store):
    from columnar_spark.streaming.rollup import (
        append_rollup_batch,
        finalize_rollup,
        load_rollup_sidecar,
        merge_rollup,
        rollup_sidecar_path,
        write_rollup_sidecar,
    )

    ev = _install_table(spark, store, "events")
    df = spark.read.parquet(ev)
    if dict(df.dtypes).get("ts") in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    half = df.filter(F.col("user_id") % 2 == 0)
    rest = df.filter(F.col("user_id") % 2 != 0)
    write_rollup_sidecar(half, ev)
    root = rollup_sidecar_path(ev)
    assert objstore.live_files(os.path.join(root, "partials"))
    # replay-safe append: same batch twice counts once
    append_rollup_batch(rest, os.path.join(root, "partials"), batch_id=1)
    append_rollup_batch(rest, os.path.join(root, "partials"), batch_id=1)
    loaded = load_rollup_sidecar(spark, ev)
    assert loaded is not None
    partials, _meta = loaded
    got = finalize_rollup(merge_rollup(partials))
    total = got.agg(F.sum("cnt")).first()[0]
    assert total == df.count()


def test_join_projection_round_trip(spark, store):
    from columnar_spark.projections import (
        load_join_projection,
        merge_projection_fact_delta,
        projection_path,
        write_join_projection,
    )

    li = _install_table(spark, store, "lineitem")
    orders = _install_table(spark, store, "orders")
    write_join_projection(
        spark, li, orders, name="lo", fact_key="l_orderkey",
        dim_key="o_orderkey", dim_cols=("o_orderdate",),
        fact_cols=("l_orderkey", "l_quantity"),
    )
    pdir = projection_path(li, "lo")
    assert objstore.live_files(pdir), "manifest pointer missing"
    proj = load_join_projection(spark, li, "lo")
    assert proj is not None
    n0 = proj.count()
    want = (
        spark.read.parquet(li)
        .join(spark.read.parquet(orders),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert n0 == want
    # fact-delta append lands as new segments + pointer update
    batch = spark.read.parquet(li).limit(100)
    merge_projection_fact_delta(spark, li, "lo", batch)
    # sidecar went ahead of the (unchanged) table: still readable with
    # check_fresh off, and row count grew by the joined batch
    proj2 = load_join_projection(spark, li, "lo", check_fresh=False)
    assert proj2.count() > n0


def test_agg_projection_round_trip(spark, store):
    from columnar_spark.aggprojections import (
        agg_projection_path,
        load_agg_projection,
        merge_agg_fact_delta,
        write_agg_projection,
    )

    li = _install_table(spark, store, "lineitem")
    write_agg_projection(
        spark, li, name="rf",
        keys={"l_returnflag": "l_returnflag"},
        measures=[{"name": "cnt", "agg": "count"}],
    )
    pdir = agg_projection_path(li, "rf")
    assert objstore.live_files(pdir), "manifest pointer missing"
    ap = load_agg_projection(spark, li, "rf")
    base = spark.read.parquet(li)
    want = {
        (r["l_returnflag"], r["cnt"]) for r in
        base.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert {(r["l_returnflag"], r["cnt"]) for r in ap.collect()} == want
    merge_agg_fact_delta(spark, li, "rf", base.limit(50))
    ap2 = load_agg_projection(spark, li, "rf", check_fresh=False)
    total = sum(r["cnt"] for r in ap2.collect())
    assert total == base.count() + 50


def test_cohort_sidecar_round_trip(spark, store):
    from columnar_spark.operators.cohort import (
        cohort_sidecar_path,
        load_cohort_matrix,
        write_cohort_sidecar,
    )

    ev = _install_table(spark, store, "events")
    write_cohort_sidecar(spark, ev)
    root = cohort_sidecar_path(ev)
    assert objstore.live_files(os.path.join(root, "matrix"))
    m = load_cohort_matrix(spark, ev)
    assert m is not None
    df = spark.read.parquet(ev)
    users = df.filter(F.col("user_id").isNotNull()).select("user_id").distinct().count()
    # each user appears exactly once in their cohort's day-0 column sum
    total = m.agg(F.sum("active_users")).first()[0]
    assert total is not None and total >= users


def test_textstats_and_dedupsig_round_trip(spark, store):
    from columnar_spark.dedupsig import (
        dedupsig_path,
        load_dedupsig,
        write_dedupsig_sidecar,
    )
    from columnar_spark.textstats import (
        load_textstats,
        textstats_path,
        write_textstats_sidecar,
    )

    docs = _install_table(spark, store, "documents")
    write_textstats_sidecar(spark, docs)
    assert objstore.live_files(textstats_path(docs))
    ts = load_textstats(spark, docs)
    n = spark.read.parquet(docs).count()
    assert ts is not None and ts.count() == n
    write_dedupsig_sidecar(spark, docs, num_hashes=8, shingle_k=1)
    assert objstore.live_files(dedupsig_path(docs))
    sig = load_dedupsig(spark, docs, num_hashes=8, shingle_k=1)
    assert sig is not None and 0 < sig.count() <= n


def test_real_scheme_refuses_at_writer_entry(spark):
    # every family's writer probes the transport BEFORE touching Spark:
    # a real scheme with no registered client is a loud refusal, not a
    # local directory named "s3:/..."
    from columnar_spark.operators.fulltext import write_text_index

    with pytest.raises(ValueError, match="object store"):
        write_text_index(spark, "s3a://bucket/docs.parquet")


def test_real_scheme_without_transport_refuses():
    with pytest.raises(ValueError, match="no transport"):
        objstore.put_json("s3://bucket/table.parquet.stats", "_meta.json", {})
    with pytest.raises(ValueError, match="no transport"):
        objstore.read_json("gs://bucket/x", "_live.json")


def test_vacuum_removes_only_orphans(spark, store):
    from columnar_spark.stats import (
        load_value_index,
        value_index_path,
        write_value_index,
    )

    li = _install_table(spark, store, "lineitem")
    write_value_index(spark, li, "l_returnflag")
    vdir = value_index_path(li, "l_returnflag")
    before = {(r["value"], r["cnt"]) for r in
              load_value_index(spark, li, "l_returnflag").collect()}
    # simulate a writer that died mid-commit: uploaded segments, no flip
    with open(os.path.join(vdir, "seg-orphan00-00000.parquet"), "wb") as f:
        f.write(b"half-uploaded garbage")
    # and a superseded generation left behind by an overwrite
    write_value_index(spark, li, "l_returnflag")  # flips to a new gen
    # default grace window PROTECTS fresh segments (an in-flight
    # append's uploads must survive a concurrent GC)
    assert objstore.vacuum_artifact(vdir) == []
    removed = objstore.vacuum_artifact(vdir, grace_s=0.0)
    assert any(r.startswith("seg-orphan00") for r in removed)
    # live set untouched: the reader still returns the exact index
    after = {(r["value"], r["cnt"]) for r in
             load_value_index(spark, li, "l_returnflag").collect()}
    assert after == before
    live = set(objstore.live_files(vdir))
    assert live and not (live & set(removed))


def test_text_index_round_trip(spark, store):
    from columnar_spark.operators.fulltext import (
        append_to_text_index,
        bm25_search_indexed,
        load_text_index,
        text_index_path,
        write_text_index,
    )

    docs = _install_table(spark, store, "documents")
    write_text_index(spark, docs)
    root = text_index_path(docs)
    man = objstore.read_json(root, "_live.json")
    assert man and "gen" in man, "generation pointer missing"
    loaded = load_text_index(spark, docs)
    assert loaded is not None
    postings, lengths, meta = loaded
    n = spark.read.parquet(docs).count()
    assert meta["n_docs"] == n and lengths.count() == n
    hits = bm25_search_indexed(spark, docs, "the data", k=5)
    assert hits.count() > 0
    # delta append inside the live generation (PUT-only), replay-safe
    batch = spark.read.parquet(docs).limit(20)
    assert append_to_text_index(spark, docs, batch, batch_id=7) is True
    assert append_to_text_index(spark, docs, batch, batch_id=7) is False
    _p2, l2, meta2 = load_text_index(spark, docs)
    assert meta2["n_docs"] == n + 20 and l2.count() == n + 20


def test_vector_index_round_trip(spark, store):
    from columnar_spark.operators.knn_index import (
        append_to_vector_index,
        build_vector_index,
        knn_index_path,
        load_vector_index,
    )

    emb = _install_table(spark, store, "embeddings")
    df = spark.read.parquet(emb)
    build_vector_index(spark, df, emb, nlist=4, m=4, k=8)
    root = knn_index_path(emb)
    man = objstore.read_json(root, "_live.json")
    assert man and "gen" in man, "generation pointer missing"
    idx = load_vector_index(emb)
    assert idx is not None and idx.root == root
    codes = spark.read.parquet(idx.vectors_path)
    n = df.count()
    assert codes.count() == n
    # append encodes with frozen centroids, PUT-only into the live gen
    append_to_vector_index(spark, df.limit(10), emb)
    idx2 = load_vector_index(emb, check_fresh=False)
    assert spark.read.parquet(idx2.vectors_path).count() == n + 10


def test_graph_index_round_trip(spark, store):
    from columnar_spark.operators.hnsw_index import (
        append_to_graph_index,
        build_graph_index,
        graph_index_path,
        knn_query_graph,
        load_graph_index_meta,
    )

    emb = _install_table(spark, store, "embeddings")
    df = spark.read.parquet(emb)
    build_graph_index(spark, df, emb, num_parts=2, M=8, ef_construction=32)
    root = graph_index_path(emb)
    man = objstore.read_json(root, "_live.json")
    assert man and "gen" in man, "generation pointer missing"
    meta = load_graph_index_meta(emb)
    assert meta is not None and meta["root"] == root
    q = [float(x) for x in df.first()["embedding"]]
    hits = knn_query_graph(spark, emb, q, k=3)
    assert hits.count() == 3
    # append publishes a NEW generation (merged touched parts + copied
    # untouched parts) — old one stays readable until vacuumed
    gen0 = man["gen"]
    append_to_graph_index(spark, df.limit(5), emb)
    man2 = objstore.read_json(root, "_live.json")
    assert man2["gen"] != gen0
    meta2 = load_graph_index_meta(emb, check_fresh=False)
    assert meta2 is not None
