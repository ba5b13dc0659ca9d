"""Object-store sidecar commits (r8 verdict item 4): on a simulated
object store — a local root where os.rename/os.replace/shutil.move are
FORBIDDEN — the `.stats`, `.vidx`, and `.rollup` sidecars must build,
read, append, and freshness-gate through the staging + manifest-pointer
protocol (objstore.py). Other artifact kinds keep the explicit
require_posix_commit refusal."""

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


def test_other_artifacts_still_refuse(spark, store):
    from columnar_spark.projections import write_join_projection

    li = _install_table(spark, store, "lineitem")
    orders = _install_table(spark, store, "orders")
    with pytest.raises(ValueError, match="object store"):
        write_join_projection(
            spark, li, orders, name="x", fact_key="l_orderkey",
            dim_key="o_orderkey", dim_cols=("o_orderdate",),
        )


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
    removed = objstore.vacuum_artifact(vdir)
    assert any(r.startswith("seg-orphan00") for r in removed)
    # live set untouched: the reader still returns the exact index
    after = {(r["value"], r["cnt"]) for r in
             load_value_index(spark, li, "l_returnflag").collect()}
    assert after == before
    live = set(objstore.live_files(vdir))
    assert live and not (live & set(removed))
