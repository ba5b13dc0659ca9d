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
    return knn_topk(cands, vec_col, query_vec, k, metric=exact_metric, id_col=id_col, unroll=False)


# ----------------------------------------------------------------- IVF-PQ

def train_ivfpq(
    df: DataFrame,
    vec_col: str,
    dim: int,
    nlist: int = 16,
    m: int = 8,
    k: int = 16,
    max_iter: int = 10,
    seed: int = 42,
    train_sample: int = 25_000,
):
    """Train the composite IVF-PQ index: coarse k-means centroids for the
    inverted lists, then PQ codebooks on the RESIDUALS (vec - centroid) —
    the standard composition (FAISS IVFPQ; residual PQ roughly halves
    quantization error vs raw-vector PQ because each list's residual
    cloud is centered at the origin). Returns (centroids, codebooks)."""
    from columnar_spark.operators.knn import assign_clusters, train_centroids

    centroids = train_centroids(df, vec_col, n_clusters=nlist, max_iter=max_iter, seed=seed)
    with_res = residual_col(
        assign_clusters(df, vec_col, centroids, "__ivfpq_c"), vec_col, centroids, "__ivfpq_c"
    )
    books = train_pq(
        with_res, "__ivfpq_res", dim, m=m, k=k, max_iter=max_iter, seed=seed,
        train_sample=train_sample,
    )
    return centroids, books


def residual_col(
    df: DataFrame,
    vec_col: str,
    centroids: Sequence[Sequence[float]],
    cluster_col: str,
    out_col: str = "__ivfpq_res",
) -> DataFrame:
    """vec - centroid[cluster], as a pure zip_with expression (the
    centroid table is a tiny literal array — no join, no shuffle)."""
    cent_lit = F.array(*[vec_lit(c) for c in centroids])
    cent = F.element_at(cent_lit, F.col(cluster_col) + 1)
    res = F.zip_with(F.col(vec_col).cast("array<double>"), cent, lambda a, b: a - b)
    return df.withColumn(out_col, res.cast("array<float>"))


def encode_ivfpq(
    df: DataFrame,
    vec_col: str,
    centroids: Sequence[Sequence[float]],
    codebooks: Sequence[Sequence[Sequence[float]]],
    cluster_col: str = "ivf_cluster",
    code_col: str = "pq_code",
) -> DataFrame:
    """Write-path step: tag each vector with its inverted list and the PQ
    code of its residual. At scale the output is partitioned/sorted by
    `cluster_col` (writer.WriteSpec) so a probe's cluster filter prunes
    whole files; the float column may then be dropped or kept only for
    re-ranking."""
    from columnar_spark.operators.knn import assign_clusters

    out = assign_clusters(df, vec_col, list(centroids), cluster_col)
    out = residual_col(out, vec_col, centroids, cluster_col)
    out = encode_vectors(out, "__ivfpq_res", codebooks, code_col)
    return out.drop("__ivfpq_res")


def knn_topk_ivfpq(
    df: DataFrame,
    code_col: str,
    query_vec: Sequence[float],
    centroids: Sequence[Sequence[float]],
    codebooks: Sequence[Sequence[Sequence[float]]],
    k: int,
    nprobe: int = 4,
    id_col: str = "vec_id",
    cluster_col: str = "ivf_cluster",
    vec_col: str | None = None,
    metric: str = "l2",
    rerank_factor: int = 4,
) -> DataFrame:
    """IVF-PQ search: probe the nprobe nearest inverted lists, score by
    ADC against a per-list residual lookup table, exact re-rank on top.

    ONE scan, no union-of-branches: the nprobe lookup tables are shipped
    as a single [nprobe][m][k] literal and each row gathers from its
    list's table via a tiny CASE over the probed cluster ids — fully
    codegen'd, zero Python in the scan. ||q - (c + r)||^2 decomposes as
    ||(q - c) - r||^2, so ADC on the residual code with table built from
    (q - c) is the exact PQ-space l2. For cosine, encode normalized
    vectors and pass metric="cosine" — the re-rank restores exact
    semantics (l2 order == cosine order on the unit sphere)."""
    import math

    q = list(map(float, query_vec))
    if metric == "cosine":
        nrm = math.sqrt(sum(x * x for x in q)) or 1.0
        q = [x / nrm for x in q]
    elif metric != "l2":
        raise ValueError("metric must be l2 or cosine")

    def _l2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    order = sorted(range(len(centroids)), key=lambda i: _l2(centroids[i], q))
    probe = order[: max(1, min(nprobe, len(centroids)))]

    luts = [
        _adc_lut([qi - ci for qi, ci in zip(q, centroids[c])], codebooks, "l2")
        for c in probe
    ]
    lut3 = F.array(*[F.array(*[vec_lit(row) for row in lut]) for lut in luts])

    pidx = F.when(F.col(cluster_col) == probe[0], 0)
    for i, c in enumerate(probe[1:], start=1):
        pidx = pidx.when(F.col(cluster_col) == c, i)
    my_lut = F.element_at(lut3, pidx + 1)

    code = F.col(code_col)
    score = F.lit(0.0)
    for j in range(len(codebooks)):
        score = score + F.element_at(F.element_at(my_lut, j + 1), code[j].cast("int") + 1)

    cands = (
        df.filter(F.col(cluster_col).isin([int(c) for c in probe]))
        .withColumn("pq_dist", score)
        .orderBy(F.col("pq_dist").asc())
        .limit(k * rerank_factor if vec_col else k)
    )
    if vec_col is None:
        return cands.select(id_col, "pq_dist")
    return knn_topk(cands, vec_col, query_vec, k, metric=metric, id_col=id_col, unroll=False)
