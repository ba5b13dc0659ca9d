"""Product quantization (PQ) for the ANN family.

Extends the reference's quantization ladder (knn/quantizer.cpp:
int8 trained-clip, BIT1 sign-bit — both implemented in
operators/quantize.py) one rung further, to the codebook compression
every 100 TB vector deployment ends up using: split each d-dim vector
into m subspaces, k-means each subspace into k centroids, store only
the m centroid ids (m bytes at k<=256 — a d*4/m compression, 32x for
d=64/m=8 like BIT1 but with far better distance fidelity).

Spark-first shapes, consistent with the rest of the KNN family:

- training: k-means++ + Lloyd on a bounded deterministic sample
  (default; the FAISS discipline — codebooks train on 10^4-10^5
  sampled vectors even for billion-vector corpora) or m distributed
  MLlib fits; the codebook is a tiny driver-side list either way.
- encoding: Arrow-batched pandas UDF (vectorized numpy argmin against
  the broadcast codebook) — the m*k-subtree pure-expression form
  (encode_expr) costs tens of seconds of Catalyst planning at k>=64.
- search: ADC (asymmetric distance computation) — the query builds an
  m x k lookup table of per-subspace distance contributions ONCE
  (driver-side, tiny), scoring is sum over subspaces of
  element_at(lut[j], code[j]+1): a literal-array gather, fully
  codegen'd, no Python in the scan. TakeOrderedAndProject keeps top
  k * rerank_factor candidates, optionally re-ranked exactly on the
  float column (the BIT1 re-rank discipline, quantize.py:170).

Approximation posture matches the reference: PQ is a storage/recall
knob asserted by recall gates, never used for oracle-checked results.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from columnar_spark.functions.vector import vec_lit
from columnar_spark.operators.knn import knn_topk


def train_pq(
    df: DataFrame,
    vec_col: str,
    dim: int,
    m: int = 8,
    k: int = 16,
    max_iter: int = 10,
    seed: int = 42,
    backend: str = "numpy",
    train_sample: int = 25_000,
) -> list[list[list[float]]]:
    """codebooks[j][c] = centroid c (dim/m floats) of subspace j.

    backend="numpy" (default): train on a bounded deterministic sample
    pulled to the driver — the standard PQ practice (codebooks are
    trained on ~10^4-10^5 sampled vectors even for billion-vector
    corpora; FAISS does exactly this), so the driver pull is bounded by
    `train_sample`, not the data. backend="mllib": m distributed KMeans
    fits — no sampling bias, ~1s JVM overhead per fit."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m

    if backend == "mllib":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        books: list[list[list[float]]] = []
        for j in range(m):
            sub = df.select(
                array_to_vector(
                    F.slice(F.col(vec_col), j * dsub + 1, dsub).cast("array<double>")
                ).alias("features")
            )
            model = KMeans(k=k, maxIter=max_iter, seed=seed + j).fit(sub)
            books.append([list(map(float, c)) for c in model.clusterCenters()])
        return books

    n = df.count()
    frac = min(1.0, train_sample / max(n, 1))
    sample = (
        df.select(vec_col).sample(fraction=frac, seed=seed).limit(train_sample)
        if frac < 1.0
        else df.select(vec_col)
    )
    X = np.array([r[0] for r in sample.collect()], dtype=np.float64)
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        kk = min(k, len(S))
        # k-means++ seeding (same init family as MLlib), then Lloyd
        C = np.empty((kk, dsub))
        C[0] = S[rng.integers(len(S))]
        d2 = ((S - C[0]) ** 2).sum(axis=1)
        for c in range(1, kk):
            p = d2 / d2.sum() if d2.sum() > 0 else None
            C[c] = S[rng.choice(len(S), p=p)]
            d2 = np.minimum(d2, ((S - C[c]) ** 2).sum(axis=1))
        for _ in range(max_iter):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for c in range(kk):
                pts = S[a == c]
                if len(pts):
                    C[c] = pts.mean(axis=0)
        books.append([list(map(float, c)) for c in C])
    return books


def encode_expr(vec: Column, codebooks: Sequence[Sequence[Sequence[float]]]) -> Column:
    """array<float> -> array<tinyint> of m codebook ids (pure expression)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])

    def sub_l2(sub: Column, cent: Sequence[float]) -> Column:
        return F.aggregate(
            F.zip_with(sub, vec_lit(cent), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    codes = []
    for j in range(m):
        sub = F.slice(vec, j * dsub + 1, dsub).cast("array<double>")
        dists = F.array(*[sub_l2(sub, c) for c in codebooks[j]])
        codes.append((F.array_position(dists, F.array_min(dists)) - 1).cast("tinyint"))
    return F.array(*codes)


def encode_vectors(
    df: DataFrame,
    vec_col: str,
    codebooks: Sequence[Sequence[Sequence[float]]],
    out_col: str | None = None,
) -> DataFrame:
    """Write-path step: add the PQ code column.

    Encoding is an Arrow-batched pandas UDF (vectorized numpy argmin
    over the broadcast codebook), not the pure-expression form: the
    expression tree is m*k aggregate subtrees (512 at m=8,k=64; 2048 at
    k=256) and Catalyst analysis/codegen of it costs tens of seconds —
    planning cost, not execution cost. encode_expr remains for small
    codebooks where staying fully in codegen matters more."""
    from pyspark.sql.functions import pandas_udf

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    B = [np.array(b, dtype=np.float64) for b in codebooks]

    @pandas_udf("array<tinyint>")
    def _enc(vs: pd.Series) -> pd.Series:
        X = np.array(vs.tolist(), dtype=np.float64)
        codes = np.empty((len(X), m), dtype=np.int8)
        for j in range(m):
            S = X[:, j * dsub : (j + 1) * dsub]
            # (n,k) distance matrix per subspace: ||s||^2 - 2 s.c + ||c||^2
            d = (
                (S * S).sum(axis=1, keepdims=True)
                - 2.0 * S @ B[j].T
                + (B[j] * B[j]).sum(axis=1)[None, :]
            )
            codes[:, j] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return df.withColumn(out_col or f"{vec_col}_pq", _enc(F.col(vec_col)))


def _adc_lut(
    query_vec: Sequence[float],
    codebooks: Sequence[Sequence[Sequence[float]]],
    metric: str,
) -> list[list[float]]:
    """m x k per-subspace distance contributions of the query — computed
    once on the driver (tiny), shipped as a literal."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    lut: list[list[float]] = []
    for j in range(m):
        q = query_vec[j * dsub : (j + 1) * dsub]
        row = []
        for c in codebooks[j]:
            if metric == "l2":
                row.append(sum((a - b) * (a - b) for a, b in zip(q, c)))
            elif metric == "ip":
                # larger ip = closer; negate so "smaller is better" holds
                row.append(-sum(a * b for a, b in zip(q, c)))
            else:
                raise ValueError("metric must be l2 or ip (cosine: normalize + ip)")
        lut.append(row)
    return lut


def adc_score_expr(code: Column, lut: Sequence[Sequence[float]]) -> Column:
    """sum over subspaces of lut[j][code[j]] — a literal-array gather."""
    lut_lit = F.array(*[vec_lit(row) for row in lut])
    total = F.lit(0.0)
    for j in range(len(lut)):
        total = total + F.element_at(
            F.element_at(lut_lit, j + 1), code[j].cast("int") + 1
        )
    return total


def knn_topk_pq(
    df: DataFrame,
    code_col: str,
    query_vec: Sequence[float],
    codebooks: Sequence[Sequence[Sequence[float]]],
    k: int,
    metric: str = "l2",
    id_col: str = "vec_id",
    vec_col: str | None = None,
    rerank_factor: int = 4,
) -> DataFrame:
    """Top-k by ADC over PQ codes; when `vec_col` is given, the
    k*rerank_factor ADC candidates are re-ranked by exact distance
    (metric semantics of knn_topk)."""
    lut = _adc_lut(list(map(float, query_vec)), codebooks, metric)
    scored = df.withColumn("pq_dist", adc_score_expr(F.col(code_col), lut))
    n_cand = k * rerank_factor if vec_col else k
    cands = scored.orderBy(F.col("pq_dist").asc()).limit(n_cand)
    if vec_col is None:
        return cands.select(id_col, "pq_dist")
    exact_metric = "ip" if metric == "ip" else "l2"
    return knn_topk(cands, vec_col, query_vec, k, metric=exact_metric, id_col=id_col)
