"""Streaming near-dup detection: LSH bucket state flags incoming docs
that collide with earlier ones — across micro-batches AND across
restarts (second run reuses the first's checkpoint, so state must
survive recovery)."""

from columnar_spark.streaming.neardup import (
    banded_minhash,
    stream_neardup_candidates,
)

A = "the quick brown fox jumps over the lazy dog and runs far away today"
B = "the quick brown fox jumps over the lazy dog and runs far away tonight"  # ~dup of A
C = "completely different text about distributed query engines and columnar storage"
D = "the quick brown fox jumps over the lazy dog and runs far away today ok"  # ~dup of A


def _run(spark, src, ckpt, dst):
    # parquet sink (not memory): file sinks support restarting from an
    # existing checkpoint, which the cross-restart assertion relies on
    schema = "doc_id: long, text: string"
    stream = spark.readStream.schema(
        spark.createDataFrame([], schema).schema
    ).parquet(src)
    out = stream_neardup_candidates(stream)
    q = (
        out.writeStream.format("parquet").option("path", dst)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return {
        (r["doc_id"], r["matched_id"])
        for r in spark.read.parquet(dst).collect()
    }


def test_neardup_across_batches_and_restart(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sneardup")
    src, ckpt, dst = str(base / "src"), str(base / "ckpt"), str(base / "out")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        b1 = spark.createDataFrame(
            [(1, A), (2, B), (3, C)], "doc_id: long, text: string"
        )
        b1.coalesce(1).write.parquet(src)
        got1 = _run(spark, src, ckpt, dst)
        # B collides with A in >=1 band; C collides with nothing
        assert (2, 1) in got1
        assert all(d != 3 for d, _ in got1)

        # second batch, NEW query instance, SAME checkpoint: doc D must
        # match doc 1 via recovered state
        b2 = spark.createDataFrame([(4, D)], "doc_id: long, text: string")
        import glob, os, shutil

        tmp2 = str(base / "b2")
        b2.coalesce(1).write.parquet(tmp2)
        for f in glob.glob(os.path.join(tmp2, "*.parquet")):
            shutil.copy(f, os.path.join(src, "b2_" + os.path.basename(f)))
        got2 = _run(spark, src, ckpt, dst)
        assert (4, 1) in got2
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_banded_minhash_matches_batch_operator(spark):
    """The streaming path's banded signature must equal the batch LSH
    path's banding for the same doc (same hashes, same bands) — the
    guarantee that stream-flagged candidates mean the same thing as
    batch-flagged ones."""
    from pyspark.sql import functions as F

    from columnar_spark.operators.dedup import (
        band_hashes,
        minhash_signatures_agg,
        token_shingles,
    )

    docs = spark.createDataFrame(
        [(1, A), (2, B), (3, C)], "doc_id: long, text: string"
    )
    stream_form = {
        (r["doc_id"], r["band"]): r["bucket_hash"]
        for r in banded_minhash(docs).collect()
    }
    base = docs.select(
        F.col("doc_id").alias("__id"),
        token_shingles(F.col("text"), 3).alias("__sh"),
    )
    sig = minhash_signatures_agg(base, "__id", F.col("__sh"), 64)
    batch_form = {
        (r["__id"], r["band"]): r["bh"]
        for r in sig.select(
            "__id", F.posexplode(band_hashes(F.col("__sig"), 16, 4)).alias("band", "bh")
        ).collect()
    }
    assert stream_form == batch_form
