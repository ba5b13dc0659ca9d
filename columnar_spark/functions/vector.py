"""Vector distance expressions — reference knn/space.cpp parity.

The reference implements L2 / IP / COSINE SIMD kernels (knn/knn.h:32-37,
knn/space.cpp:47-131) and returns hnswlib-convention *distances*:
L2 -> squared L2, IP/COSINE -> 1 - product (smaller is closer). We keep
those conventions so declared KNN queries are directly comparable.

Everything here is a pure Catalyst expression (zip_with + aggregate over
array columns) evaluated in the JVM in double precision with a fixed
left-to-right summation order — deterministic and oracle-matchable (the
DuckDB oracle unrolls the same positional sum). No Python UDFs in the hot
path; at 100 TB these run inside whole-stage codegen next to the scan.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def vec_lit(vec: Sequence[float]) -> Column:
    """A query vector as an array<double> literal."""
    return F.array(*[F.lit(float(v)) for v in vec])


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def unit_vector(a: Column) -> Column:
    """L2-normalize to a unit array<double> (zero vectors pass through).
    The reference normalizes at build time for COSINE (knn.cpp:128-143);
    normalizing before IVF clustering makes L2 bucketing equivalent to
    cosine bucketing."""
    n = norm(a)
    return F.when(n == 0.0, a.cast("array<double>")).otherwise(
        F.transform(a, lambda x: x.cast("double") / n)
    )


def l2_sq(a: Column, b: Column) -> Column:
    """Squared L2 distance (hnswlib L2 space convention, knn/space.cpp)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ip_dist(a: Column, b: Column) -> Column:
    """Inner-product distance = 1 - dot (hnswlib IP space)."""
    return F.lit(1.0) - dot(a, b)


def cosine_sim(a: Column, b: Column, b_norm: float | Column | None = None) -> Column:
    """Cosine similarity; pass b_norm (python float) when b is a constant
    query vector to keep the plan free of redundant per-row work."""
    bn = F.lit(float(b_norm)) if isinstance(b_norm, (int, float)) else (b_norm or norm(b))
    return dot(a, b) / (norm(a) * bn)


def cosine_dist(a: Column, b: Column, b_norm: float | Column | None = None) -> Column:
    """1 - cosine similarity (hnswlib COSINE convention; the reference
    normalizes at build time, knn/knn.cpp:128-143 — we divide by norms
    instead, same result for non-degenerate vectors)."""
    return F.lit(1.0) - cosine_sim(a, b, b_norm)


def py_norm(vec: Sequence[float]) -> float:
    return math.sqrt(sum(float(v) * float(v) for v in vec))
