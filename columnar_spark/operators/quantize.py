"""Vector quantization — reference knn/quantizer.cpp parity (§2.F4).

The reference supports scalar 8-bit quantization with trained min/max
bounds and optional quantile clipping via a P² estimator
(quantizer.cpp:45, quantile.h:24-163). Spark-first re-expression:

- training pass = one aggregate: `percentile_approx` over the exploded
  vector values (the P² streaming-quantile analog — both are one-pass
  approximate quantile sketches);
- quantization = a pure `transform` expression casting to tinyint
  (int8), cutting vector storage 4x vs float32;
- search = dequantize-in-expression distance, so quantized KNN reuses
  the exact `knn_topk` machinery and stays inside codegen.

Correctness posture matches the reference: quantization is a recall/
storage knob, never used for oracle-checked results (BIT8 search is
asserted by recall, knn.h:39-46 semantics).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from columnar_spark.operators.knn import knn_topk


def train_quantizer(
    df: DataFrame,
    vec_col: str,
    clip: tuple[float, float] = (0.005, 0.995),
    accuracy: int = 10000,
) -> tuple[float, float]:
    """One-pass trained clip bounds over all vector components
    (quantizer Train/FinalizeTraining analog, knn/knn.cpp:643-790)."""
    row = (
        df.select(F.explode(F.col(vec_col)).alias("v"))
        .agg(
            F.percentile_approx(F.col("v").cast("double"), list(clip), accuracy).alias("q")
        )
        .first()
    )
    lo, hi = float(row["q"][0]), float(row["q"][1])
    if hi <= lo:
        hi = lo + 1e-9
    return lo, hi


def quantize_expr(vec: Column, lo: float, hi: float) -> Column:
    """float vector -> int8 vector in [-128, 127] with clipping."""
    scale = 255.0 / (hi - lo)
    return F.transform(
        vec,
        lambda x: (
            F.round(
                (F.least(F.greatest(x.cast("double"), F.lit(lo)), F.lit(hi)) - F.lit(lo))
                * F.lit(scale)
            )
            - 128
        ).cast("tinyint"),
    )


def dequantize_expr(qvec: Column, lo: float, hi: float) -> Column:
    """int8 vector -> reconstructed double vector."""
    scale = (hi - lo) / 255.0
    return F.transform(
        qvec, lambda q: (q.cast("double") + 128.0) * F.lit(scale) + F.lit(lo)
    )


def quantize_vectors(
    df: DataFrame, vec_col: str, lo: float, hi: float, out_col: str | None = None
) -> DataFrame:
    """Write-path step: add the int8 column (keep or drop the float one
    upstream as the storage budget dictates)."""
    return df.withColumn(out_col or f"{vec_col}_q8", quantize_expr(F.col(vec_col), lo, hi))


# ----------------------------------------------------------- 1-bit (BIT1)
#
# Reference ladder (knn/quantizer.cpp:182-641): BIT1SIMPLE packs raw sign
# bits (ScalarQuantizer1Bit_c::Encode, quantizer.cpp:191-214); BIT1 packs
# sign bits of (vector - centroid) with correction factors (RaBitQ-style
# BinaryQuantizer_c). Search is hamming distance via popcount(xor)
# (PopCnt, quantizer.cpp:256-270), optionally re-ranked exactly.
#
# Spark-first: bits pack into array<bigint> (64 dims/word — a 32x storage
# cut vs float32), hamming is bit_count(xor) folded over the words, and
# re-rank reuses exact knn_topk on a k*factor candidate set. Everything
# stays in codegen'd JVM expressions.


def train_binary_centroid(df: DataFrame, vec_col: str) -> list[float]:
    """Per-dimension mean — the BIT1 centroid (BinaryQuantizer_c quantizes
    vector-minus-centroid, quantizer.cpp:274+). One posexplode aggregate;
    the result is dim floats, trivially broadcastable."""
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .orderBy("pos")
        .collect()
    )
    return [float(r["m"]) for r in rows]


def binarize_expr(vec: Column, dim: int, centroid: Sequence[float] | None = None) -> Column:
    """Sign-bit pack: array<float>[dim] -> array<bigint>[ceil(dim/64)].
    Bit b of word w is set when component (w*64 + b) > 0 (or > centroid
    component when a centroid is given — the BIT1 form)."""
    n_words = (dim + 63) // 64
    words = []
    for w in range(n_words):
        acc = F.lit(0).cast("long")
        for b in range(min(64, dim - w * 64)):
            comp = F.element_at(vec, w * 64 + b + 1).cast("double")
            thresh = float(centroid[w * 64 + b]) if centroid is not None else 0.0
            acc = acc.bitwiseOR(
                F.when(
                    comp > thresh, F.shiftleft(F.lit(1).cast("long"), b)
                ).otherwise(F.lit(0).cast("long"))
            )
        words.append(acc)
    return F.array(*words)


def binarize_py(vec: Sequence[float], centroid: Sequence[float] | None = None) -> list[int]:
    """Driver-side query binarization, bit-identical to binarize_expr
    (signed-long word values)."""
    words = []
    for w in range((len(vec) + 63) // 64):
        acc = 0
        for b in range(min(64, len(vec) - w * 64)):
            thresh = centroid[w * 64 + b] if centroid is not None else 0.0
            if float(vec[w * 64 + b]) > thresh:
                acc |= 1 << b
        if acc >= 1 << 63:
            acc -= 1 << 64
        words.append(acc)
    return words


def hamming_words(a: Column, b: Column) -> Column:
    """Hamming distance between two packed sign-bit arrays — the PopCnt
    search kernel (quantizer.cpp:256-270) as bit_count(xor) folded over
    the words."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def binarize_vectors(
    df: DataFrame,
    vec_col: str,
    dim: int,
    centroid: Sequence[float] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Write-path step: add the packed sign-bit column."""
    return df.withColumn(
        out_col or f"{vec_col}_b1", binarize_expr(F.col(vec_col), dim, centroid)
    )


def knn_topk_b1(
    df: DataFrame,
    b1_col: str,
    query_vec: Sequence[float],
    k: int,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str | None = None,
    rerank_factor: int = 4,
    centroid: Sequence[float] | None = None,
) -> DataFrame:
    """Top-k over the packed sign-bit column by hamming distance.

    With `vec_col` given, the hamming scan selects k*rerank_factor
    candidates (TakeOrdered — no full shuffle) and exact knn_topk
    re-ranks them on the float vectors, the reference's rescoring step;
    without it, raw hamming order is returned with the distance in
    `dist` (BIT1SIMPLE behavior)."""
    q = binarize_py(query_vec, centroid)
    qlit = F.array(*[F.lit(w).cast("long") for w in q])
    cand = df.withColumn("__ham", hamming_words(F.col(b1_col), qlit))
    if vec_col is None:
        return (
            cand.orderBy(F.col("__ham").asc(), F.col(id_col).asc())
            .limit(k)
            .withColumnRenamed("__ham", "dist")
        )
    cand = cand.orderBy(F.col("__ham").asc(), F.col(id_col).asc()).limit(k * rerank_factor)
    return knn_topk(cand, vec_col, query_vec, k, metric=metric, id_col=id_col, unroll=False).drop("__ham")


# ------------------------------------------- asymmetric BIT1 x 4-bit query
#
# Reference BinaryQuantizer_c keeps the DATA at 1 bit but quantizes the
# QUERY to 4-bit precision stored as transposed bit planes
# (quantizer.cpp:222-641): the inner product against the sign bits is
# evaluated plane-by-plane as popcount(plane_p AND data_word) summed with
# weight 2^p — same storage as symmetric hamming, strictly more query
# information, higher pre-rerank recall.
#
# Math: with q4[d] = round((q[d] - qmin) * s), s = 15 / (qmax - qmin),
#   sum_{d set} q[d]  ~=  (1/s) * sum_p 2^p popcount(plane_p & bits)
#                          + qmin * popcount(bits)
# and the estimated IP against the +-1 sign pattern is
#   2 * sum_{d set} q[d] - sum_d q[d]   (last term constant per query),
# so documents rank by   (2/s) * asym + 2*qmin*popcount(bits)   descending.
# The popcount correction matters: without it, documents with more set
# bits are over/under-scored whenever qmin != 0.


def query_bit_planes(
    query_vec: Sequence[float], centroid: Sequence[float] | None = None
) -> tuple[list[list[int]], float, float]:
    """Driver-side 4-bit transposed query quantization: returns
    (planes[4][n_words], scale, qmin). Component d of the (centered)
    query maps to q4 in [0, 15]; bit p of q4 lands in plane p at the
    same (word, bit) position the data's sign bit occupies."""
    q = [
        float(v) - (float(centroid[i]) if centroid is not None else 0.0)
        for i, v in enumerate(query_vec)
    ]
    qmin, qmax = min(q), max(q)
    scale = 15.0 / (qmax - qmin) if qmax > qmin else 1.0
    n_words = (len(q) + 63) // 64
    planes = [[0] * n_words for _ in range(4)]
    import math

    for d, v in enumerate(q):
        # half-up (floor(x + 0.5)), NOT python's banker's rounding: the
        # engine-portable form a SQL oracle can replicate exactly
        q4 = int(math.floor((v - qmin) * scale + 0.5))
        q4 = 0 if q4 < 0 else (15 if q4 > 15 else q4)
        w, b = divmod(d, 64)
        for p in range(4):
            if (q4 >> p) & 1:
                planes[p][w] |= 1 << b
    # signed-long canon (matches binarize_py's word values)
    for p in range(4):
        planes[p] = [w - (1 << 64) if w >= 1 << 63 else w for w in planes[p]]
    return planes, scale, qmin


def asym_score_expr(
    b1_col: Column, planes: list[list[int]], scale: float, qmin: float
) -> Column:
    """Estimated inner product of the 4-bit query against the sign-bit
    pattern, as a pure JVM expression: 4 plane-AND-popcount folds plus
    the popcount correction. Higher = closer (descending rank)."""
    asym = F.lit(0)
    for p, plane in enumerate(planes):
        plit = F.array(*[F.lit(w).cast("long") for w in plane])
        s = F.aggregate(
            F.zip_with(b1_col, plit, lambda x, y: F.bit_count(x.bitwiseAND(y))),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        asym = asym + F.lit(1 << p) * s
    pc = F.aggregate(
        F.transform(b1_col, lambda x: F.bit_count(x)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        F.lit(2.0 / scale) * asym.cast("double")
        + F.lit(2.0 * qmin) * pc.cast("double")
    )


def knn_topk_b1q4(
    df: DataFrame,
    b1_col: str,
    query_vec: Sequence[float],
    k: int,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str | None = None,
    rerank_factor: int = 4,
    centroid: Sequence[float] | None = None,
) -> DataFrame:
    """Asymmetric BIT1 top-k: 1-bit data, 4-bit query (reference
    quantizer.cpp:222-641). Same storage and plan shape as knn_topk_b1;
    candidates rank by the asymmetric estimated IP instead of symmetric
    hamming, then exact re-rank on the float vectors when `vec_col` is
    given. Recall gain over symmetric at equal storage is pinned in
    tests/test_quantize_asym.py."""
    planes, scale, qmin = query_bit_planes(query_vec, centroid)
    scored = df.withColumn(
        "__asym", asym_score_expr(F.col(b1_col), planes, scale, qmin)
    )
    if vec_col is None:
        return (
            scored.orderBy(F.col("__asym").desc(), F.col(id_col).asc())
            .limit(k)
            .withColumnRenamed("__asym", "score")
        )
    cand = scored.orderBy(F.col("__asym").desc(), F.col(id_col).asc()).limit(
        k * rerank_factor
    )
    return knn_topk(cand, vec_col, query_vec, k, metric=metric, id_col=id_col, unroll=False).drop(
        "__asym"
    )


def knn_topk_q8(
    df: DataFrame,
    qvec_col: str,
    query_vec: Sequence[float],
    k: int,
    lo: float,
    hi: float,
    metric: str = "cosine",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k over an int8-quantized vector column: dequantize in the
    distance expression (storage 4x smaller; same plan shape)."""
    deq = dequantize_expr(F.col(qvec_col), lo, hi)
    tmp = df.withColumn("__deq", deq)
    return knn_topk(tmp, "__deq", query_vec, k, metric=metric, id_col=id_col, unroll=False).drop("__deq")
