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
    return knn_topk(tmp, "__deq", query_vec, k, metric=metric, id_col=id_col).drop("__deq")
