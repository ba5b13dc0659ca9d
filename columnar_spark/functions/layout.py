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
    domains; for roughly-uniform ids the raw values work.

    This is the raw expression primitive; `writer.zorder_key` is the
    writer-integrated form (n columns, observed-min/max rank
    normalization, timestamp/date handling) behind
    `WriteSpec(zorder=True)` — use that for table layout."""
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
    salt sub-keys. Result is identical to `left.join(right, on, how)` for
    inner/left/left_semi/left_anti ONLY — an unmatched right row is
    replicated salt times, so right/full-outer would emit duplicates;
    those modes are rejected. Use when one key dominates and AQE
    skew-join can't help (e.g. aggregation-free pipelines). Cost: right
    side x salt."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "unmatched right rows are replicated `salt` times under outer modes"
        )
    l2 = left.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    r2 = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l2.join(r2, [on, "__salt"], how).drop("__salt")


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Round-robin repartition to cluster width IFF the input is under-
    partitioned — the guard before CPU-heavy per-row work (hashing,
    fingerprinting, signature folds).

    At 100 TB inputs arrive as thousands of Parquet row-groups and this is
    a no-op; it only fires when the scan yields fewer partitions than
    ~min_fraction of the cores (e.g. a single-row-group file, a collapsed
    AQE stage), where one straggler task would otherwise own all the CPU
    work. The shuffle it introduces moves exactly the under-partitioned
    (hence small-per-core) input once."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    nparts = df.rdd.getNumPartitions()
    if nparts < max(1, int(cores * min_fraction)):
        return df.repartition(cores)
    return df
