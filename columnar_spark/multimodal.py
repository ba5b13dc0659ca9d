"""Multimodal (image/audio/video) column plumbing.

North-star extra: treat media as opaque `binary` columns with typed
metadata, and run decode / feature-extraction / frame-sampling as
Arrow-batched pandas functions over `mapInPandas` — the reference's
closest analog is its Rust embeddings sidecar (knn/knn.h:146-163,
embeddings/src/ffi.rs), which likewise moves variable-length payloads
through a narrow batch interface.

Codec gating (same pattern as the optional hnswlib / sentence-
transformers paths): `mode="real"` uses Pillow when it is importable on
the EXECUTORS — real pixel decode, statistics features, real
resampling — and raises NotImplementedError otherwise (no codec ships
in this container; the import is attempted inside the mapInPandas
kernel, where production executors would have the wheel). `mode="fake"`
produces a deterministic feature vector from the bytes so the
Spark-side plumbing — schema, partitioning, batch shape, Arrow
transfer — is real and tested everywhere, and stays the oracle path
(media_feature_stats recomputes it in DuckDB SQL).

Scale posture: mapInPandas streams Arrow batches per partition; no
driver-side collection; feature width is fixed so the output schema is
static. Binary payloads stay columnar end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("data", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8


def _pil_image_module():
    """Pillow's Image module when importable, else None — the
    import-gate for the real decode path (evaluated on the executor,
    where a production cluster installs the wheel)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _real_image_features(payload: bytes) -> list[float]:
    """Decoded-pixel statistics as the FEATURE_DIM-float vector:
    (w/4096, h/4096, aspect, mean_r, mean_g, mean_b, gray std/255,
    mean |dx| gradient/255) — cheap, deterministic, and shaped exactly
    like the fake path so downstream schemas never change."""
    import io

    import numpy as np

    Image = _pil_image_module()
    if Image is None:
        raise NotImplementedError(
            "media decode requires Pillow on the executors "
            "(pip install pillow); use mode='fake' for plumbing tests"
        )
    img = Image.open(io.BytesIO(payload)).convert("RGB")
    arr = np.asarray(img, dtype=np.float64) / 255.0
    gray = arr.mean(axis=2)
    dx = np.abs(np.diff(gray, axis=1)).mean() if gray.shape[1] > 1 else 0.0
    w, h = img.size
    return [
        min(w / 4096.0, 1.0),
        min(h / 4096.0, 1.0),
        min(w / max(h, 1), 8.0) / 8.0,
        float(arr[..., 0].mean()),
        float(arr[..., 1].mean()),
        float(arr[..., 2].mean()),
        float(gray.std()),
        float(dx),
    ]


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: 8 floats
    derived from a sha256 of the payload, in [0, 1)."""
    digest = hashlib.sha256(payload or b"").digest()
    return [
        int.from_bytes(digest[i * 4 : i * 4 + 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


def extract_media_features(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "media_id",
    mode: str = "fake",
    batch_hint: int | None = None,
) -> DataFrame:
    """(id, features array<float>, n_bytes) via mapInPandas.

    mode="real" decodes with Pillow when it is importable on the
    executors (image statistics features, _real_image_features) and
    raises NotImplementedError otherwise; everything around it (Arrow
    batching, schema, partition parallelism) is identical on both
    paths.
    """
    if mode not in ("fake", "real"):
        raise ValueError("mode must be 'fake' or 'real'")

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            # doubles, not float32: uint32/2^32 is exact in a double, so
            # the fake-decode path is cross-engine reproducible (the
            # media_feature_stats oracle recomputes it in DuckDB SQL)
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = _real_image_features if mode == "real" else _fake_features
        for pdf in it:
            payloads = pdf[data_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [fn(b) for b in payloads],
                    "n_bytes": [len(b) if b is not None else 0 for b in payloads],
                }
            )

    return df.select(id_col, data_col).mapInPandas(batches, out_schema)


def resize_images(
    df: DataFrame,
    target_width: int,
    target_height: int,
    data_col: str = "data",
    id_col: str = "media_id",
    meta_col: str = "meta",
    mode: str = "fake",
) -> DataFrame:
    """Image resize plumbing: output rows carry the resized payload plus
    updated (width, height) metadata. Geometry (aspect-preserving fit
    into the target box) is REAL and computed from the input metadata on
    both paths; mode="fake" emits a deterministic payload of the correct
    byte budget (3 bytes/pixel), mode="real" decodes with Pillow when
    importable on the executors (bilinear resample, raw RGB out — same
    3-bytes/pixel contract) and raises NotImplementedError otherwise."""
    if mode not in ("fake", "real"):
        raise ValueError("mode must be 'fake' or 'real'")

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("data", T.BinaryType()),
            T.StructField("out_width", T.IntegerType()),
            T.StructField("out_height", T.IntegerType()),
        ]
    )

    def _fit(w: int, h: int) -> tuple[int, int]:
        if not w or not h:
            return target_width, target_height
        scale = min(target_width / w, target_height / h)
        return max(int(w * scale), 1), max(int(h * scale), 1)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil_image_module() if mode == "real" else None
        if mode == "real" and Image is None:
            raise NotImplementedError(
                "image resampling requires Pillow on the executors "
                "(pip install pillow); use mode='fake' for plumbing tests"
            )
        for pdf in it:
            ids, datas, ws, hs = [], [], [], []
            for mid, payload, meta in zip(pdf[id_col], pdf[data_col], pdf[meta_col]):
                if mode == "real":
                    import io

                    img = Image.open(io.BytesIO(payload)).convert("RGB")
                    w, h = _fit(*img.size)
                    datas.append(img.resize((w, h), Image.BILINEAR).tobytes())
                else:
                    w_in = int(meta["width"]) if meta is not None and meta["width"] is not None else 0
                    h_in = int(meta["height"]) if meta is not None and meta["height"] is not None else 0
                    w, h = _fit(w_in, h_in)
                    seed = hashlib.sha256(payload or b"").digest()
                    budget = w * h * 3
                    datas.append((seed * (budget // len(seed) + 1))[:budget])
                ids.append(mid)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {id_col: ids, "data": datas, "out_width": ws, "out_height": hs}
            )

    return df.select(id_col, data_col, meta_col).mapInPandas(batches, out_schema)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    data_col: str = "data",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame with a
    byte-offset slice of the payload standing in for a decoded frame.
    Real decoders plug into the same (id, frame_idx, frame_bytes) shape."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[data_col]):
                payload = payload or b""
                step = max(len(payload) // max(n_frames, 1), 1)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[i * step : (i + 1) * step])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_bytes": frames})

    return df.select(id_col, data_col).mapInPandas(batches, out_schema)
