"""Data-layout expressions: z-order keys and skew-salted joins.

Layout is the reference's main lever (row-id-local min/max trees,
columnar/builder/builderminmax.h); in Spark the same lever is *cluster
the data so Parquet stats prune*. `zorder2` gives a two-column
interleaved key for `WriteSpec.cluster_by` when queries filter both
columns (the OPTIMIZE ZORDER analog). `salted_join` is the classic skew
mitigation for keys AQE's skew-join can't split (e.g. a single hot key
in a broadcast-ineligible join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder2(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` of two non-negative int columns into a
    Morton key. Inputs should be range-normalized ranks for skewed
    domains; for roughly-uniform ids the raw values work."""
    za = a.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    zb = b.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    key = F.lit(0).cast("long")
    for i in range(bits - 1, -1, -1):
        key = F.shiftleft(key, 1) + F.shiftright(za, i).bitwiseAND(F.lit(1))
        key = F.shiftleft(key, 1) + F.shiftright(zb, i).bitwiseAND(F.lit(1))
    return key


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with `salt`-way key salting: the (small-ish) right side
    is replicated salt times, the left side scatters hot keys across
    salt sub-keys. Result is identical to `left.join(right, on, how)`;
    use when one key dominates and AQE skew-join can't help (e.g.
    aggregation-free pipelines). Cost: right side x salt."""
    l2 = left.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    r2 = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l2.join(r2, [on, "__salt"], how).drop("__salt")
