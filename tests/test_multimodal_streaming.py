"""Multimodal binary-column plumbing and streaming ingest/windows."""

import time

import pytest
from pyspark.sql import functions as F

from columnar_spark.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_media_features,
    sample_frames,
)
from columnar_spark.streaming.ingest import stream_ingest, windowed_counts
from columnar_spark.writer import WriteSpec, stats_path


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", b"\x89PNG-fake-payload-0" * 50, (64, 64, None, None)),
        (1, "image", b"\x89PNG-fake-payload-1" * 50, (32, 32, None, None)),
        (2, "audio", b"RIFF-fake-wav" * 100, (None, None, 16000, 2000)),
        (3, "video", b"\x00\x00ftyp-fake-mp4" * 200, (640, 480, None, 5000)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_fake_deterministic(media):
    a = {r["media_id"]: r["features"] for r in extract_media_features(media).collect()}
    b = {r["media_id"]: r["features"] for r in extract_media_features(media).collect()}
    assert a == b
    assert all(len(v) == FEATURE_DIM for v in a.values())
    assert a[0] != a[1]
    nb = {r["media_id"]: r["n_bytes"] for r in extract_media_features(media).collect()}
    assert nb[2] == 13 * 100


def _pil_available():
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil_available(), reason="Pillow present: real path active")
def test_extract_features_real_raises_without_pillow(media):
    with pytest.raises(Exception) as ei:
        extract_media_features(media, mode="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


@pytest.mark.skipif(not _pil_available(), reason="Pillow not installed")
def test_real_decode_with_pillow(spark):
    """Import-gated real path (same gating pattern as hnswlib): decode
    an actual PNG, statistics features + real bilinear resize."""
    import io

    from PIL import Image

    from columnar_spark.multimodal import FEATURE_DIM, MEDIA_SCHEMA, resize_images

    def png(w, h, color):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (0, "image", png(64, 48, (255, 0, 0)), (64, 48, None, None)),
        (1, "image", png(20, 20, (0, 0, 255)), (20, 20, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r["features"] for r in extract_media_features(media, mode="real").collect()}
    assert all(len(v) == FEATURE_DIM for v in feats.values())
    assert feats[0][3] > 0.9 and feats[0][4] < 0.1  # red image: high R mean
    assert feats[1][5] > 0.9  # blue image: high B mean
    out = {r["media_id"]: r for r in resize_images(media, 16, 16, mode="real").collect()}
    assert (out[0]["out_width"], out[0]["out_height"]) == (16, 12)
    assert len(out[0]["data"]) == 16 * 12 * 3


def test_sample_frames_shape(media):
    out = sample_frames(media, n_frames=4)
    rows = out.filter(F.col("media_id") == 3).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    assert all(len(r["frame_bytes"]) > 0 for r in rows)


def test_stream_ingest_and_stats(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    src, dst, ckpt = str(base / "src"), str(base / "dst"), str(base / "ckpt")

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.limit(300).write.parquet(src)

    q = stream_ingest(spark, src, dst, ckpt, ev.schema)
    q.awaitTermination(60)
    got = spark.read.parquet(dst)
    assert got.count() == 300

    man = spark.read.parquet(stats_path(dst))
    assert {r["column"] for r in man.collect()} >= {"event_id", "event_type"}

    # incremental: second batch of files picked up on next availableNow run
    ev.limit(500).write.mode("overwrite").parquet(src + "_b2")
    import shutil, os
    for f in os.listdir(src + "_b2"):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src + "_b2", f), os.path.join(src, "b2_" + f))
    q2 = stream_ingest(spark, src, dst, ckpt, ev.schema)
    q2.awaitTermination(60)
    assert spark.read.parquet(dst).count() == 800


def test_windowed_counts_static_parity(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if ev.schema["ts"].dataType.simpleString() in ("bigint", "long"):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    out = windowed_counts(ev, window="1 day", watermark="2 days")
    total = out.agg(F.sum("n")).first()[0]
    assert total == ev.count()
    assert {c for c in out.columns} == {
        "window_start", "window_end", "event_type", "n", "total_value",
    }


def test_resize_images_geometry_and_budget(media):
    from columnar_spark.multimodal import resize_images

    out = {r["media_id"]: r for r in resize_images(media, 16, 16).collect()}
    # 64x64 -> fits exactly to 16x16; 640x480 -> aspect-preserved 16x12
    assert (out[0]["out_width"], out[0]["out_height"]) == (16, 16)
    assert (out[3]["out_width"], out[3]["out_height"]) == (16, 12)
    for r in out.values():
        assert len(r["data"]) == r["out_width"] * r["out_height"] * 3  # 3 B/px
    # deterministic
    again = {r["media_id"]: bytes(r["data"]) for r in resize_images(media, 16, 16).collect()}
    assert {k: bytes(v["data"]) for k, v in out.items()} == again

    if not _pil_available():
        with pytest.raises(Exception, match="PIL|Pillow"):
            resize_images(media, 16, 16, mode="real").collect()


def test_media_features_to_neardup_pipeline(media):
    """Composition: media -> feature vectors -> embedding near-dup (the
    image-dedup pipeline shape, exact verify on the tiny corpus)."""
    from columnar_spark.operators.dedup import embedding_neardup_pairs
    from pyspark.sql import functions as F

    feats = extract_media_features(media).withColumn(
        "features", F.col("features").cast("array<double>")
    )
    pairs = embedding_neardup_pairs(
        feats, "features", "media_id", threshold=0.8, method="exact"
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}

    # numpy oracle over the same feature vectors
    import numpy as np

    vecs = {r["media_id"]: np.array(r["features"]) for r in feats.collect()}
    want = set()
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            cos = float(
                np.dot(vecs[a], vecs[b])
                / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))
            )
            if round(cos, 6) >= 0.8:
                want.add((a, b))
    assert got == want and len(want) >= 1


def test_stream_ingest_maintains_vector_index(spark, tmp_path_factory):
    """Per-batch vector-index maintenance: a table with a persisted
    IVF-PQ index gains appended codes for every streamed batch, with
    centroids/codebooks untouched (no retrain)."""
    from pyspark.sql import functions as F

    from columnar_spark.operators.knn_index import (
        build_vector_index,
        knn_query_indexed,
        load_vector_index,
    )
    from columnar_spark.streaming.ingest import stream_ingest

    base = tmp_path_factory.mktemp("vstream")
    src, ckpt = str(base / "src"), str(base / "ckpt")
    dst = str(base / "embeddings.parquet")

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.where(F.col("vec_id") % 2 == 0)
    rest = emb.where(F.col("vec_id") % 2 == 1)

    first.write.parquet(dst)
    build_vector_index(spark, first, dst, nlist=4, m=8, k=16)
    idx0 = load_vector_index(dst)
    n0 = spark.read.parquet(idx0.vectors_path).count()

    rest.write.parquet(src)
    q = stream_ingest(spark, src, dst, ckpt, emb.schema)
    q.awaitTermination(60)

    idx1 = load_vector_index(dst)
    assert idx1.centroids == idx0.centroids and idx1.codebooks == idx0.codebooks
    codes = spark.read.parquet(idx1.vectors_path)
    assert codes.count() == n0 + rest.count()

    qv = [float(x) for x in rest.select("embedding").first()["embedding"]]
    hits = {r["id"] for r in knn_query_indexed(spark, idx1, qv, 10, nprobe=4).collect()}
    assert hits & {r["vec_id"] for r in rest.collect()}
