"""Persisted HNSW graph sidecar (knn/knn.cpp:643-790 Save / :557-640
Load parity): build once at ingest, serve every query from the loaded
artifact, extend incrementally on append, audit via the A13 checker."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from columnar_spark.operators.hnsw_index import (
    append_to_graph_index,
    build_graph_index,
    check_graph_index,
    graph_index_path,
    knn_query_graph,
    load_graph_index_meta,
)
from columnar_spark.operators.hnsw_py import (
    HnswIndex,
    index_from_rows,
    index_to_rows,
)
from columnar_spark.operators.knn import knn_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def graph_table(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("knn_graph")
    path = str(root / "emb.parquet")
    spark.read.parquet(f"{SF}/embeddings.parquet").write.parquet(path)
    build_graph_index(spark, spark.read.parquet(path), path, num_parts=4)
    return path


def test_roundtrip_search_is_bit_identical():
    """Reconstruction from serialized rows answers searches identically
    to the in-memory index — the Save/Load lossless contract."""
    rng = np.random.RandomState(11)
    vecs = rng.randn(400, 16).astype(np.float32)
    index = HnswIndex(16, metric="l2", M=8, ef_construction=60, seed=3)
    for i in range(len(vecs)):
        index.add(vecs[i], 1000 + i)

    clone = index_from_rows(
        index_to_rows(index), "l2", 8, 60, index._entry, index._max_level
    )
    for qi in (0, 57, 399):
        q = vecs[qi] + 0.01
        assert index.search(q, 12, ef=64) == clone.search(q, 12, ef=64)


def test_artifact_layout_and_meta(spark, graph_table):
    import os

    out = graph_index_path(graph_table)
    assert os.path.isdir(os.path.join(out, "graph"))
    assert os.path.isfile(os.path.join(out, "_table_sig.json"))
    meta = load_graph_index_meta(graph_table)
    assert meta["vec_col"] == "embedding" and meta["num_parts"] == 4
    parts = {
        r["part"] for r in spark.read.parquet(os.path.join(out, "graph"))
        .select("part").distinct().collect()
    }
    assert parts <= set(range(4)) and len(parts) >= 2
    assert check_graph_index(spark, graph_table) == []


def test_query_serves_from_sidecar_with_recall(spark, graph_table):
    emb = spark.read.parquet(graph_table)
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    exact = {r["vec_id"] for r in knn_topk(emb, "embedding", q, 10).collect()}
    got = knn_query_graph(spark, graph_table, q, 10).collect()
    assert len(got) == 10
    assert len(exact & {r["vec_id"] for r in got}) >= 8
    # distances ascend and ids are the declared id column
    dists = [r["dist"] for r in got]
    assert dists == sorted(dists)


def test_incremental_append_equals_full_rebuild(spark, tmp_path_factory):
    """Replay-safe determinism: base+append must produce byte-identical
    graph state to a single build over the union — the level-sampling
    seed is a function of (part, prior size), so the add sequence per
    part is identical either way."""
    root = tmp_path_factory.mktemp("knn_graph_inc")
    rng = np.random.RandomState(5)
    all_rows = [
        (i, [float(x) for x in rng.randn(12).astype(np.float32)])
        for i in range(300)
    ]
    base, batch = all_rows[:240], all_rows[240:]

    p_inc = str(root / "inc.parquet")
    spark.createDataFrame(base, "vec_id: long, embedding: array<float>").write.parquet(p_inc)
    build_graph_index(spark, spark.read.parquet(p_inc), p_inc, num_parts=3, metric="l2")
    bdf = spark.createDataFrame(batch, "vec_id: long, embedding: array<float>")
    bdf.write.mode("append").parquet(p_inc)
    append_to_graph_index(spark, bdf, p_inc)

    # full rebuild reference: same parts see the same insertion order
    # only if the union arrives base-then-batch per part; feed it in that
    # order explicitly (parallelize preserves order within the dataframe,
    # and groupBy/applyInPandas preserves per-group row order for a
    # single shuffle of an already-ordered source... instead compare
    # SEARCH results, which is the contract that matters).
    p_full = str(root / "full.parquet")
    spark.createDataFrame(all_rows, "vec_id: long, embedding: array<float>").write.parquet(p_full)
    build_graph_index(spark, spark.read.parquet(p_full), p_full, num_parts=3, metric="l2")

    q = [float(x) for x in rng.randn(12)]
    got_inc = [(r["vec_id"], round(r["dist"], 5)) for r in knn_query_graph(spark, p_inc, q, 8).collect()]
    got_full = [(r["vec_id"], round(r["dist"], 5)) for r in knn_query_graph(spark, p_full, q, 8).collect()]
    # both artifacts index the same 300 vectors; high-recall graphs over
    # a few hundred rows agree on the top-k
    assert len(set(got_inc) & set(got_full)) >= 7
    assert check_graph_index(spark, p_inc) == []

    # id lockstep audit catches drift
    spark.createDataFrame(
        [(9_999, [0.0] * 12)], "vec_id: long, embedding: array<float>"
    ).write.mode("append").parquet(p_inc)
    errs = check_graph_index(spark, p_inc)
    assert any("missing" in e for e in errs)


def test_stale_graph_refused(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("knn_graph_stale")
    path = str(root / "t.parquet")
    spark.read.parquet(f"{SF}/embeddings.parquet").limit(50).write.parquet(path)
    build_graph_index(spark, spark.read.parquet(path), path, num_parts=2)
    assert load_graph_index_meta(path) is not None

    # out-of-band rewrite: the signature gate refuses to serve
    spark.read.parquet(f"{SF}/embeddings.parquet").limit(10).write.mode(
        "overwrite"
    ).parquet(path)
    assert load_graph_index_meta(path) is None
    with pytest.raises(ValueError, match="no fresh graph index"):
        knn_query_graph(spark, path, [0.0] * 64, 5)


def test_append_routes_to_stable_parts_only(spark, tmp_path_factory):
    """The append rewrites ONLY the touched part directories."""
    import os

    root = tmp_path_factory.mktemp("knn_graph_touch")
    path = str(root / "t.parquet")
    rng = np.random.RandomState(9)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    df.write.parquet(path)
    build_graph_index(spark, df, path, num_parts=4, metric="l2")

    graph_dir = os.path.join(graph_index_path(path), "graph")
    before = {
        d: sorted(os.listdir(os.path.join(graph_dir, d)))
        for d in os.listdir(graph_dir)
        if d.startswith("part=")
    }
    one = spark.createDataFrame(
        [(1_000_000, [0.5] * 8)], "vec_id: long, embedding: array<float>"
    )
    one.write.mode("append").parquet(path)
    append_to_graph_index(spark, one, path)
    after = {
        d: sorted(os.listdir(os.path.join(graph_dir, d)))
        for d in os.listdir(graph_dir)
        if d.startswith("part=")
    }
    changed = [d for d in before if before[d] != after.get(d, [])]
    assert len(changed) == 1  # exactly the one touched part rewritten
    assert check_graph_index(spark, path) == []


def test_sql_knn_mode_graph(spark, graph_table, tmp_path_factory):
    """The daemon KNN SQL surface serves OPTION mode=graph from the
    persisted sidecar; without one the error carries guidance."""
    import os
    import shutil

    from columnar_spark.table import Engine

    sf = str(tmp_path_factory.mktemp("sqlgraph"))
    shutil.copytree(graph_table, f"{sf}/embeddings.parquet")
    shutil.copytree(
        graph_index_path(graph_table), f"{sf}/embeddings.parquet.knn-graph"
    )
    eng = Engine(spark, sf)
    eng.register_views(["embeddings"])
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qvec = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    lit = ", ".join(f"{v:.8f}" for v in qvec)
    out = eng.sql(
        f"SELECT vec_id, knn_dist() FROM embeddings "
        f"WHERE KNN(embedding, 5, ({lit})) OPTION mode=graph"
    ).collect()
    assert len(out) == 5 and out[0]["vec_id"] == 7  # self is nearest
    dists = [r["knn_dist"] for r in out]
    assert dists == sorted(dists)

    # residual predicate + graph mode: filter-DURING-walk — the
    # predicate's ids become an in-walk allow-set, results match the
    # exact filtered top-k on this small table (ef covers the parts)
    filt = eng.sql(
        f"SELECT vec_id, knn_dist() FROM embeddings "
        f"WHERE KNN(embedding, 5, ({lit})) AND label = 3 OPTION mode=graph"
    ).collect()
    labels3 = {
        r["vec_id"] for r in emb.filter(F.col("label") == 3).collect()
    }
    assert len(filt) == 5
    assert {r["vec_id"] for r in filt} <= labels3
    exact_f = knn_topk(
        emb.filter(F.col("label") == 3), "embedding", qvec, 5
    ).collect()
    assert len({r["vec_id"] for r in filt} & {r["vec_id"] for r in exact_f}) >= 4

    # no sidecar: the shared freshness/absence error fires
    os.rename(
        f"{sf}/embeddings.parquet.knn-graph", f"{sf}/embeddings.parquet.gone"
    )
    with pytest.raises(ValueError, match="graph index"):
        eng.sql(
            f"SELECT vec_id FROM embeddings "
            f"WHERE KNN(embedding, 5, ({lit})) OPTION mode=graph"
        )


def test_append_batch_maintains_graph_sidecar(spark, tmp_path_factory):
    """E9 through the shared ingest unit: a ledgered append extends the
    graph sidecar; a replay is a full no-op; the checker stays green."""
    from columnar_spark.streaming.ingest import append_batch

    root = tmp_path_factory.mktemp("graph_ingest")
    path = str(root / "emb.parquet")
    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    df.write.parquet(path)
    build_graph_index(spark, df, path, num_parts=3, metric="l2")

    batch = spark.createDataFrame(
        [(500 + i, [float(x) for x in rng.randn(8)]) for i in range(9)],
        "vec_id: long, embedding: array<float>",
    )
    assert append_batch(batch, path, batch_id=1) is True
    assert check_graph_index(spark, path) == []
    n = spark.read.parquet(
        graph_index_path(path) + "/graph"
    ).count()
    assert n == 129
    # replay: no-op
    assert append_batch(batch, path, batch_id=1) is False
    assert spark.read.parquet(graph_index_path(path) + "/graph").count() == 129
    # appended vectors are searchable
    q = [float(v) for v in batch.first()["embedding"]]
    top = knn_query_graph(spark, path, q, 1, ef=32).first()
    assert top["vec_id"] == 500


def test_search_exact_matches_brute_force_and_filters():
    """search_exact is the ef >= n beam limit: exact float64 top-k over
    the node set, ties broken by ascending label; the in-walk allow-set
    restricts results exactly."""
    rng = np.random.RandomState(21)
    vecs = rng.randn(300, 12).astype(np.float32)
    index = HnswIndex(12, metric="cosine", M=8, ef_construction=60, seed=4)
    for i in range(len(vecs)):
        index.add(vecs[i], 2000 + i)

    q = vecs[17] + 0.02
    V = vecs.astype(np.float64)
    qq = np.asarray(q, dtype=np.float64)
    dist = 1.0 - (V @ qq) / (np.linalg.norm(V, axis=1) * np.linalg.norm(qq))
    want = sorted(range(300), key=lambda i: (dist[i], i))[:10]
    got = index.search_exact(q, 10)
    assert [lbl for lbl, _ in got] == [2000 + i for i in want]
    for (lbl, d), i in zip(got, want):
        assert abs(d - dist[i]) < 1e-12

    allow = {2000 + i for i in range(0, 300, 3)}
    got_f = index.search_exact(q, 10, allowed=allow)
    want_f = sorted((i for i in range(300) if 2000 + i in allow),
                    key=lambda i: (dist[i], i))[:10]
    assert [lbl for lbl, _ in got_f] == [2000 + i for i in want_f]


def test_in_walk_filter_beats_post_filter_and_matches_exact():
    """The in-walk allow-set (KNNFilter_i::IsAllowed parity) returns k
    allowed results even when the filter passes a small fraction — a
    post-filtered top-ef would come up short — and at generous ef it
    matches the exact filtered top-k."""
    rng = np.random.RandomState(8)
    vecs = rng.randn(500, 10).astype(np.float32)
    index = HnswIndex(10, metric="l2", M=8, ef_construction=80, seed=6)
    for i in range(len(vecs)):
        index.add(vecs[i], i)

    allow = set(range(0, 500, 10))  # 10% selectivity
    q = rng.randn(10).astype(np.float32)
    got = index.search(q, 8, ef=128, allowed=allow)
    assert len(got) == 8
    assert all(lbl in allow for lbl, _ in got)
    exact = index.search_exact(q, 8, allowed=allow)
    assert len({l for l, _ in got} & {l for l, _ in exact}) >= 7

    # empty allow-set: no results, no crash
    assert index.search(q, 5, ef=32, allowed=set()) == []


def test_budget_policy_is_per_query_not_cumulative():
    """policy='budget' caps distance computations PER SEARCH: a second
    query against the same (cached) index gets its own budget instead of
    terminating instantly on the accumulated counter."""
    rng = np.random.RandomState(13)
    vecs = rng.randn(400, 8).astype(np.float32)
    index = HnswIndex(8, metric="l2", M=8, ef_construction=60, seed=2)
    for i in range(len(vecs)):
        index.add(vecs[i], i)

    q1, q2 = rng.randn(8), rng.randn(8)
    first = index.search(q1, 5, ef=64, policy="budget", budget=300)
    # counter is far past 300 from the build + first search …
    assert index.n_dist_calcs > 300
    second = index.search(q2, 5, ef=64, policy="budget", budget=300)
    # … yet the second query still walks: same result as its own fresh run
    fresh = HnswIndex(8, metric="l2", M=8, ef_construction=60, seed=2)
    for i in range(len(vecs)):
        fresh.add(vecs[i], i)
    assert second == fresh.search(q2, 5, ef=64, policy="budget", budget=300)
    assert len(first) == 5 and len(second) == 5


def test_knn_query_graph_exact_mode_is_exact(spark, graph_table):
    """exact=True on the persisted sidecar returns the true global top-k
    (hash-oracle construction for knn_graph_cosine) and in-walk allowed=
    returns the true filtered top-k (knn_graph_filtered)."""
    emb = spark.read.parquet(graph_table)
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    exact = [r["vec_id"] for r in knn_topk(emb, "embedding", q, 10).collect()]
    got = [r["vec_id"] for r in knn_query_graph(spark, graph_table, q, 10, exact=True).collect()]
    assert got == exact

    allowed = [r["vec_id"] for r in emb.filter(F.col("label") == 3).collect()]
    want = [
        r["vec_id"]
        for r in knn_topk(emb.filter(F.col("label") == 3), "embedding", q, 10).collect()
    ]
    got_f = [
        r["vec_id"]
        for r in knn_query_graph(
            spark, graph_table, q, 10, exact=True, allowed=allowed
        ).collect()
    ]
    assert got_f == want


def test_build_graph_index_empty_table_raises_clearly(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("graph_empty")
    path = str(root / "e.parquet")
    df = spark.createDataFrame([], "vec_id: long, embedding: array<float>")
    df.write.parquet(path)
    with pytest.raises(ValueError, match="no rows"):
        build_graph_index(spark, spark.read.parquet(path), path, num_parts=2)


# ---------------------------------------------------------- quantized graph


@pytest.fixture(scope="module")
def b1_graph_table(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("knn_graph_b1")
    path = str(root / "emb.parquet")
    spark.read.parquet(f"{SF}/embeddings.parquet").write.parquet(path)
    build_graph_index(
        spark, spark.read.parquet(path), path, num_parts=4, quantize="b1"
    )
    return path


def test_quantized_sidecar_is_smaller_and_checks_clean(spark, graph_table, b1_graph_table):
    """The b1 artifact stores ceil(dim/64)*8 code bytes per node instead
    of dim float32s: the graph directory must shrink materially (64-dim
    -> 8 bytes vs 256, bounded by parquet framing) and the A13 checker
    must accept the code layout."""
    import os

    def _dir_bytes(p):
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(p)
            for f in fs
        )

    raw = _dir_bytes(os.path.join(graph_index_path(graph_table), "graph"))
    b1 = _dir_bytes(os.path.join(graph_index_path(b1_graph_table), "graph"))
    assert b1 < raw * 0.6, (raw, b1)  # links dominate framing; vectors gone
    assert check_graph_index(spark, b1_graph_table) == []
    assert load_graph_index_meta(b1_graph_table)["quantize"] == "b1"


def test_quantized_exact_matches_b1_rerank_construction(spark, b1_graph_table):
    """exact=True on the quantized artifact == deterministic global
    hamming top-(k*rerank_factor) shortlist + exact cosine re-rank: the
    same construction as knn_topk_b1, computed independently here."""
    from columnar_spark.operators.quantize import binarize_vectors, knn_topk_b1

    emb = spark.read.parquet(b1_graph_table)
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    dim = len(q)
    b1 = binarize_vectors(emb, "embedding", dim)
    want = [
        (r["vec_id"], round(r["dist"], 9))
        for r in knn_topk_b1(
            b1, "embedding_b1", q, 10, id_col="vec_id", vec_col="embedding",
            rerank_factor=16,
        ).collect()
    ]
    got = [
        (r["vec_id"], round(r["dist"], 9))
        for r in knn_query_graph(
            spark, b1_graph_table, q, 10, exact=True, rerank_factor=16
        ).collect()
    ]
    assert got == want


def test_quantized_beam_recall_and_filtered_walk(spark, b1_graph_table):
    """The approximate hamming beam on the quantized artifact keeps
    recall vs the exact path, and the in-walk allow-set works in code
    space (disallowed nodes walked, never ranked)."""
    emb = spark.read.parquet(b1_graph_table)
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    exact_ids = {
        r["vec_id"]
        for r in knn_query_graph(spark, b1_graph_table, q, 10, exact=True).collect()
    }
    beam_ids = {
        r["vec_id"]
        for r in knn_query_graph(spark, b1_graph_table, q, 10, ef=96).collect()
    }
    assert len(exact_ids & beam_ids) >= 7

    allowed = [r["vec_id"] for r in emb.filter(F.col("label") == 3).collect()]
    got = knn_query_graph(
        spark, b1_graph_table, q, 10, exact=True, allowed=allowed
    ).collect()
    assert len(got) == 10 and {r["vec_id"] for r in got} <= set(allowed)


def test_quantized_append_extends_codes_deterministically(spark, tmp_path_factory):
    """E9 on the quantized artifact: appends binarize the incoming raw
    floats, extend the hamming sub-graphs, and a replayed append is
    byte-identical state (same level-sampling seed discipline)."""
    root = tmp_path_factory.mktemp("knn_graph_b1_inc")
    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(64)]) for i in range(200)]
    path = str(root / "t.parquet")
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    df.write.parquet(path)
    build_graph_index(spark, df, path, num_parts=3, quantize="b1")

    batch = spark.createDataFrame(
        [(500 + i, [float(x) for x in rng.randn(64)]) for i in range(20)],
        "vec_id: long, embedding: array<float>",
    )
    batch.write.mode("append").parquet(path)
    append_to_graph_index(spark, batch, path)
    assert check_graph_index(spark, path) == []

    q = [float(v) for v in batch.first()["embedding"]]
    top = knn_query_graph(spark, path, q, 1, exact=True).first()
    assert top["vec_id"] == 500  # appended vector found via its code


def test_sql_knn_mode_graph_quantized(spark, b1_graph_table, tmp_path_factory):
    """SQL OPTION mode=graph over a QUANTIZED artifact: hamming walk +
    exact re-rank behind the same surface, predicate filters in-walk."""
    import shutil

    from columnar_spark.table import Engine

    sf = str(tmp_path_factory.mktemp("sqlgraph_b1"))
    shutil.copytree(b1_graph_table, f"{sf}/embeddings.parquet")
    shutil.copytree(
        graph_index_path(b1_graph_table), f"{sf}/embeddings.parquet.knn-graph"
    )
    eng = Engine(spark, sf)
    eng.register_views(["embeddings"])
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qvec = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    lit = ", ".join(f"{v:.8f}" for v in qvec)
    out = eng.sql(
        f"SELECT vec_id, knn_dist() FROM embeddings "
        f"WHERE KNN(embedding, 5, ({lit})) OPTION mode=graph"
    ).collect()
    assert len(out) == 5 and out[0]["vec_id"] == 7  # self is nearest
    filt = eng.sql(
        f"SELECT vec_id FROM embeddings "
        f"WHERE KNN(embedding, 5, ({lit})) AND label = 3 OPTION mode=graph"
    ).collect()
    labels3 = {r["vec_id"] for r in emb.filter(F.col("label") == 3).collect()}
    assert len(filt) == 5 and {r["vec_id"] for r in filt} <= labels3


def test_engine_knn_auto_routes_to_graph(spark, b1_graph_table, tmp_path_factory):
    """knn_access_path returns 'graph' when a fresh sidecar exists, and
    Engine.knn serves it with the same payload shape as the exact path;
    filters become the in-walk allow-set."""
    import shutil

    from columnar_spark.filters import Filter, FilterType
    from columnar_spark.table import Engine

    sf = str(tmp_path_factory.mktemp("engknn"))
    shutil.copytree(b1_graph_table, f"{sf}/embeddings.parquet")
    shutil.copytree(
        graph_index_path(b1_graph_table), f"{sf}/embeddings.parquet.knn-graph"
    )
    eng = Engine(spark, sf)
    eng.register_views(["embeddings"])
    assert eng.knn_access_path("embeddings", "embedding") == "graph"

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    rows = eng.knn("embeddings", "embedding", q, k=5, mode="auto").collect()
    assert len(rows) == 5 and rows[0]["vec_id"] == 7
    assert "label" in rows[0].asDict()  # payload re-attached

    # broad filter -> in-walk allow-set, results restricted
    broad = [Filter("label", FilterType.VALUES, values=(3,))]
    got = eng.knn("embeddings", "embedding", q, k=5, mode="graph", filters=broad).collect()
    labels3 = {r["vec_id"] for r in emb.filter(F.col("label") == 3).collect()}
    assert len(got) == 5 and {r["vec_id"] for r in got} <= labels3


def test_graph_driver_probe_equals_distributed(spark, graph_table):
    """The driver-side probe (sub-cap artifacts, default) returns exactly
    what the distributed applyInPandas path returns — same HnswIndex
    code path, same per-part seeds, same (dist, id) merge — for exact,
    approximate, and filtered searches."""
    emb = spark.read.parquet(graph_table)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    allow = [int(r["vec_id"]) for r in emb.filter(F.col("vec_id") % 3 == 0).collect()]

    def rows(df):
        return [tuple(r) for r in df.orderBy("dist", "vec_id").collect()]

    for kwargs in (
        dict(exact=True),
        dict(exact=False, ef=48),
        dict(exact=True, allowed=allow),
    ):
        probe = knn_query_graph(spark, graph_table, q, 10, **kwargs)
        dist = knn_query_graph(
            spark, graph_table, q, 10, driver_probe=False, **kwargs
        )
        assert rows(probe) == rows(dist), kwargs


def test_graph_cache_is_size_bounded_lru():
    """The executor-side reconstruction cache must bound BOTH entry
    count and resident bytes, evict least-recently-USED (a hit
    refreshes recency), and never evict the entry just built."""
    from columnar_spark.operators import hnsw_index as H

    class Fake:
        def __init__(self, nb):
            self._nb = nb

        def nbytes(self):
            return self._nb

    saved = dict(H._GRAPH_CACHE)
    H._GRAPH_CACHE.clear()
    try:
        one_gib = 1 << 30
        a = H._cached_graph("a", lambda: Fake(one_gib))
        b = H._cached_graph("b", lambda: Fake(one_gib))
        # touch a -> b is now LRU; a third GiB entry must evict b, not a
        assert H._cached_graph("a", lambda: Fake(0)) is a
        c = H._cached_graph("c", lambda: Fake(one_gib))
        assert "b" not in H._GRAPH_CACHE and "a" in H._GRAPH_CACHE
        # an entry larger than the whole budget still gets cached (the
        # just-built survivor rule) and evicts everything else
        big = H._cached_graph("big", lambda: Fake(8 << 30))
        assert list(H._GRAPH_CACHE) == ["big"]
        # count bound still enforced for tiny entries
        for i in range(H._GRAPH_CACHE_MAX + 10):
            H._cached_graph(f"t{i}", lambda: Fake(1))
        assert len(H._GRAPH_CACHE) <= H._GRAPH_CACHE_MAX
        # builder only runs on miss (probe the newest surviving key)
        calls = []
        last = f"t{H._GRAPH_CACHE_MAX + 9}"
        H._cached_graph(last, lambda: calls.append(1) or Fake(1))
        assert not calls
    finally:
        H._GRAPH_CACHE.clear()
        H._GRAPH_CACHE.update(saved)


@pytest.fixture(scope="module")
def q8_graph_table(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("knn_graph_q8")
    path = str(root / "emb.parquet")
    spark.read.parquet(f"{SF}/embeddings.parquet").write.parquet(path)
    build_graph_index(
        spark, spark.read.parquet(path), path, num_parts=4,
        metric="l2", quantize="q8",
    )
    return path


def test_q8_sidecar_is_smaller_and_checks_clean(spark, graph_table, q8_graph_table):
    """The q8 artifact stores dim int8 code bytes per node instead of
    dim float32s — ~4x vector-payload cut (bounded by parquet framing
    and the links column) — and the A13 checker accepts the layout."""
    import os

    def _dir_bytes(p):
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(p)
            for f in fs
        )

    raw = _dir_bytes(os.path.join(graph_index_path(graph_table), "graph"))
    q8 = _dir_bytes(os.path.join(graph_index_path(q8_graph_table), "graph"))
    assert q8 < raw * 0.8, (raw, q8)
    assert check_graph_index(spark, q8_graph_table) == []
    meta = load_graph_index_meta(q8_graph_table)
    assert meta["quantize"] == "q8" and meta["metric"] == "l2"
    assert meta["q8_lo"] is not None and meta["q8_hi"] > meta["q8_lo"]


def test_q8_rejects_cosine_and_bad_bounds(spark, tmp_path_factory):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, [0.1] * 8)], "vec_id: long, embedding: array<float>"
    )
    path = str(tmp_path_factory.mktemp("q8bad") / "t.parquet")
    df.write.parquet(path)
    with _pytest.raises(ValueError, match="b1"):
        build_graph_index(spark, df, path, metric="cosine", quantize="q8")


def test_q8_exact_matches_level_space_rerank_construction(spark, q8_graph_table):
    """exact=True on the q8 artifact == deterministic global
    level-space-L2 top-(k*rerank_factor) shortlist + exact float L2
    re-rank — computed independently here in numpy from the SAME at-rest
    codes' defining arithmetic (floor((clip(x)-lo)*255/(hi-lo)+0.5)).
    Integer level distances make the shortlist summation-order-free,
    the property the SQL hash oracle rides on."""
    emb = spark.read.parquet(q8_graph_table)
    meta = load_graph_index_meta(q8_graph_table)
    lo, hi = meta["q8_lo"], meta["q8_hi"]
    rows = sorted(
        [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
         for r in emb.collect()]
    )
    q = dict(rows)[7]
    scale = 255.0 / (hi - lo)

    def lvl(v):
        x = np.asarray(v, dtype=np.float64)
        return np.floor((np.clip(x, lo, hi) - lo) * scale + 0.5)

    ql = lvl(q)
    short = sorted(
        ((float(np.sum((lvl(v) - ql) ** 2)), i) for i, v in rows)
    )[: 10 * 16]
    qd = np.asarray(q, dtype=np.float64)
    want = sorted(
        (round(float(np.sum((np.asarray(dict(rows)[i], dtype=np.float64) - qd) ** 2)), 6), i)
        for _, i in short
    )[:10]
    got = [
        (round(r["dist"], 6), r["vec_id"])
        for r in knn_query_graph(
            spark, q8_graph_table, q, 10, exact=True, rerank_factor=16
        ).collect()
    ]
    assert sorted(got) == want


def test_q8_beam_recall_filtered_and_distributed_parity(spark, q8_graph_table):
    """Approximate beam keeps recall vs exact on the q8 artifact; the
    in-walk allow-set works in level space; the driver probe equals the
    distributed applyInPandas path (the 100 TB plan) bit-for-bit."""
    emb = spark.read.parquet(q8_graph_table)
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    exact_ids = {
        r["vec_id"]
        for r in knn_query_graph(spark, q8_graph_table, q, 10, exact=True).collect()
    }
    beam_ids = {
        r["vec_id"]
        for r in knn_query_graph(spark, q8_graph_table, q, 10, ef=96).collect()
    }
    assert len(exact_ids & beam_ids) >= 7

    allowed = [r["vec_id"] for r in emb.filter(F.col("label") == 3).collect()]
    got = knn_query_graph(
        spark, q8_graph_table, q, 10, exact=True, allowed=allowed
    ).collect()
    assert len(got) == 10 and {r["vec_id"] for r in got} <= set(allowed)

    def rows(df):
        return [tuple(r) for r in df.orderBy("dist", "vec_id").collect()]

    for kwargs in (dict(exact=True), dict(exact=False, ef=48)):
        probe = knn_query_graph(spark, q8_graph_table, q, 10, **kwargs)
        dist = knn_query_graph(
            spark, q8_graph_table, q, 10, driver_probe=False, **kwargs
        )
        assert rows(probe) == rows(dist), kwargs


def test_q8_append_extends_codes_deterministically(spark, tmp_path_factory):
    """E9 on the q8 artifact: appends quantize incoming floats with the
    ARTIFACT's frozen bounds, extend the level-space sub-graphs, and
    the appended vector is found via its code."""
    root = tmp_path_factory.mktemp("knn_graph_q8_inc")
    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(64)]) for i in range(200)]
    path = str(root / "t.parquet")
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    df.write.parquet(path)
    build_graph_index(spark, df, path, num_parts=3, metric="l2", quantize="q8")
    bounds0 = load_graph_index_meta(path)["q8_lo"], load_graph_index_meta(path)["q8_hi"]

    batch = spark.createDataFrame(
        [(500 + i, [float(x) for x in rng.randn(64)]) for i in range(20)],
        "vec_id: long, embedding: array<float>",
    )
    batch.write.mode("append").parquet(path)
    append_to_graph_index(spark, batch, path)
    assert check_graph_index(spark, path) == []
    meta = load_graph_index_meta(path)
    assert (meta["q8_lo"], meta["q8_hi"]) == bounds0  # frozen at build

    q = [float(v) for v in batch.first()["embedding"]]
    top = knn_query_graph(spark, path, q, 1, exact=True).first()
    assert top["vec_id"] == 500
