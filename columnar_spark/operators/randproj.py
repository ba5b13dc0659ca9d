"""Random-projection dimensionality reduction for embedding columns.

At 100 TB an embedding column dominates storage and every distance
computation is O(d). Johnson-Lindenstrauss: projecting onto a random
Gaussian matrix scaled by 1/sqrt(k) preserves pairwise L2 distances
within (1 +- eps) for k = O(log n / eps^2) — independent of the input
dimension. This is the cheap, data-independent rung below PQ/BIT1 on
the engine's compression ladder (operators/quantize.py, pq.py): no
training pass, composable with all of them (project THEN quantize),
and the projection of a query vector lives in the same space, so
KNN/LSH/dedup pipelines run unchanged on the reduced column.

Execution: the (d_in x k) matrix derives deterministically from a seed
(same matrix on every executor and every run — no state to persist
beyond the seed), broadcast once, applied as one numpy matmul per Arrow
batch via mapInPandas. Zero shuffle, output column order preserved.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def projection_matrix(d_in: int, d_out: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian JL matrix, scaled so E[|Mx|^2] = |x|^2."""
    rng = np.random.RandomState(seed)
    return (rng.standard_normal((d_in, d_out)) / np.sqrt(d_out)).astype(np.float32)


def project_vectors(
    df: DataFrame,
    vec_col: str,
    d_out: int,
    seed: int = 42,
    out_col: str | None = None,
) -> DataFrame:
    """Replace/add `out_col` (default `<vec_col>_rp<k>`) with the
    d_out-dim projection of `vec_col`. The input dimension is read from
    the first row (one tiny driver action, like the KNN query-vector
    fetch); all rows must share it."""
    out_col = out_col or f"{vec_col}_rp{d_out}"
    first = df.select(vec_col).first()
    if first is None:
        return df.withColumn(out_col, df[vec_col])  # empty frame: no-op
    d_in = len(first[0])
    M = projection_matrix(d_in, d_out, seed)
    bc = df.sparkSession.sparkContext.broadcast(M)

    fields = [f for f in df.schema.fields] + [
        T.StructField(out_col, T.ArrayType(T.FloatType()))
    ]
    out_schema = T.StructType(fields)
    cols = df.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = bc.value
        for b in it:
            X = np.stack(b[vec_col].to_numpy())  # (n, d_in) float
            Y = X.astype(np.float32) @ m  # (n, d_out)
            o = b[cols].copy()
            o[out_col] = list(Y)
            yield o

    return df.mapInPandas(batches, schema=out_schema)


def project_query(qvec, d_in: int, d_out: int, seed: int = 42) -> list[float]:
    """Project a driver-side query vector with the SAME matrix, so
    searches over the reduced column stay consistent."""
    M = projection_matrix(d_in, d_out, seed)
    return (np.asarray(qvec, dtype=np.float32) @ M).tolist()
