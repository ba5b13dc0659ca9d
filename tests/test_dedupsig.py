"""Near-dup signature companion (dedupsig.py).

The load-bearing pin: minhash_dedup / simhash_dedup produce IDENTICAL
rows with and without the precomputed signatures — the sidecar stores
the very values the live aggregations would compute, so serving from it
can never change an answer, only its cost."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.dedupsig import (
    dedupsig_path,
    load_dedupsig,
    merge_dedupsig,
    signature_frame,
    write_dedupsig_sidecar,
)
from columnar_spark.operators import dedup as DD
from columnar_spark.operators.dedup import (
    minhash_signatures_agg,
    simhash_signatures_agg,
    token_shingles,
)
from columnar_spark.stats import index_is_fresh

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def table(spark, tmp_path):
    p = str(tmp_path / "documents.parquet")
    spark.read.parquet(f"{SF}/documents.parquet").write.parquet(p)
    return p


def _rows(df):
    return sorted([tuple(r) for r in df.collect()])


def test_signature_frame_matches_live_aggs(spark, table):
    df = spark.read.parquet(table)
    sigs = signature_frame(
        df, "doc_id", "text", num_hashes=64, shingle_k=1, store_shingle_hashes=False
    )
    base = df.select(
        F.col("doc_id").alias("__id"),
        token_shingles(F.col("text"), 1).alias("__sh"),
    )
    mh = minhash_signatures_agg(base, "__id", F.col("__sh"), 64)
    sh = simhash_signatures_agg(df, "doc_id", token_shingles(F.col("text"), 1))
    live = mh.join(sh, "__id").select(
        F.col("__id").alias("doc_id"),
        F.col("__sig").alias("minhash"),
        F.col("__sim").alias("simhash"),
    )
    assert _rows(sigs) == _rows(live)


def test_dedup_identical_with_and_without_sigs(spark, table):
    df = spark.read.parquet(table)
    write_dedupsig_sidecar(spark, table, num_hashes=64, shingle_k=1)
    sigs = load_dedupsig(spark, table, num_hashes=64, shingle_k=1)
    assert sigs is not None

    live_mh = DD.minhash_dedup(
        df, "text", "doc_id", num_hashes=64, bands=4, shingle_k=1,
        jaccard_threshold=0.9,
    )
    side_mh = DD.minhash_dedup(
        df, "text", "doc_id", num_hashes=64, bands=4, shingle_k=1,
        jaccard_threshold=0.9, signatures=sigs,
    )
    assert _rows(side_mh) == _rows(live_mh)

    live_sh = DD.simhash_dedup(
        df, "text", "doc_id", shingle_k=1, max_hamming=6, n_chunks=4
    )
    side_sh = DD.simhash_dedup(
        df, "text", "doc_id", shingle_k=1, max_hamming=6, n_chunks=4,
        signatures=sigs,
    )
    assert _rows(side_sh) == _rows(live_sh)


def test_shingle_hashes_sorted_distinct(spark, table):
    """The stored shingle_hashes are sorted and distinct — Jaccard over
    them equals string-shingle Jaccard absent 64-bit collisions (the
    with/without pin above exercises that end-to-end)."""
    df = spark.read.parquet(table)
    sigs = signature_frame(df, "doc_id", "text", 64, 1, store_shingle_hashes=True)
    row = sigs.filter(F.size("shingle_hashes") > 1).first()
    hs = row["shingle_hashes"]
    assert hs == sorted(hs) and len(hs) == len(set(hs))


def test_param_mismatch_and_staleness_refuse(spark, table):
    write_dedupsig_sidecar(spark, table, num_hashes=64, shingle_k=1)
    assert load_dedupsig(spark, table, num_hashes=64, shingle_k=1) is not None
    # different sketch parameters: never serve the wrong sketch
    assert load_dedupsig(spark, table, num_hashes=128, shingle_k=1) is None
    assert load_dedupsig(spark, table, num_hashes=64, shingle_k=3) is None
    # out-of-band rewrite: stale
    spark.read.parquet(table).limit(1).write.mode("append").parquet(table)
    assert not index_is_fresh(table, dedupsig_path(table))
    assert load_dedupsig(spark, table, num_hashes=64, shingle_k=1) is None


def test_merge_equals_rebuild(spark, table):
    write_dedupsig_sidecar(spark, table, num_hashes=64, shingle_k=1)
    delta = spark.createDataFrame(
        [
            (88801, "alpha beta gamma delta", "en", "t", 22),
            (88802, "alpha beta gamma delta", "en", "t", 22),  # exact dup
            (88803, "", "en", "t", 0),  # empty: no signature row
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    delta.write.mode("append").parquet(table)
    merge_dedupsig(spark, table, delta)
    side = load_dedupsig(spark, table, num_hashes=64, shingle_k=1)
    assert side is not None
    live = signature_frame(
        spark.read.parquet(table), "doc_id", "text", 64, 1
    )
    assert _rows(side) == _rows(live)
    # the exact-dup pair must carry identical sketches
    two = {r["doc_id"]: (tuple(r["minhash"]), r["simhash"])
           for r in side.filter(F.col("doc_id").isin(88801, 88802)).collect()}
    assert two[88801] == two[88802]
    # empty doc contributed no row
    assert side.filter(F.col("doc_id") == 88803).count() == 0


def test_optimize_compacts_companions(spark, table, tmp_path):
    """Per-batch appends fragment the row-local companions; OPTIMIZE
    coalesces them in place with identical content and a still-valid
    signature (the base table is untouched by the companion rewrite)."""
    import os

    from columnar_spark.table import Engine
    from columnar_spark.textstats import load_textstats, write_textstats_sidecar

    write_dedupsig_sidecar(spark, table, num_hashes=64, shingle_k=1)
    write_textstats_sidecar(spark, table)
    # fragment with several tiny ledgered appends
    from columnar_spark.streaming.ingest import append_batch
    from columnar_spark.writer import WriteSpec

    src = spark.read.parquet(table)
    for i in range(6):
        batch = src.orderBy("doc_id").limit(3).withColumn(
            "doc_id", F.col("doc_id") + F.lit(700000 + 10 * i)
        )
        assert append_batch(batch, table, WriteSpec(), batch_id=7000 + i)
    before = load_dedupsig(spark, table, 64, 1)
    assert before is not None
    rows_before = _rows(before)
    ts_before = _rows(load_textstats(spark, table))
    n_files = len([f for f in os.listdir(dedupsig_path(table)) if f.endswith(".parquet")])
    assert n_files > 5

    eng = Engine(spark, os.path.dirname(table))
    out = eng.sql("OPTIMIZE documents").first()
    assert out["op"] == "optimize"

    after = load_dedupsig(spark, table, 64, 1)
    assert after is not None  # sig still valid
    assert _rows(after) == rows_before
    ts_after = load_textstats(spark, table)
    assert ts_after is not None
    assert _rows(ts_after) == ts_before
    n_files2 = len([f for f in os.listdir(dedupsig_path(table)) if f.endswith(".parquet")])
    assert n_files2 < n_files
