"""Test-only percentile oracle: exact interpolated percentiles via a
value->count cumsum. Relocated from columnar_spark.stats — the
production tiers all live in operators/percentiles.py (percentiles_auto
routes small-ndv to the builtin, medium to the GK-bracketed exact path,
large to the distributed CDF pipeline), so the single-partition cumsum
over ndv rows survives only here, as a differential oracle with no
production caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_percentiles_cumsum(df: DataFrame, col: str, probs: list[float]) -> DataFrame:
    """Exact interpolated percentiles from value->count pairs —
    bit-identical to Spark's `percentile` aggregate (and DuckDB
    quantile_cont). Returns one row with columns p0..p{len(probs)-1}.

    Test-oracle ceiling: one cumulative window over ndv rows in a
    single partition."""
    vc = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vc.withColumn("cum", F.sum("c").over(w))
    tot = vc.agg(F.sum("c").alias("n"))
    j = cum.crossJoin(F.broadcast(tot))
    aggs = []
    for i, p in enumerate(probs):
        pos = (F.col("n") - 1).cast("double") * F.lit(float(p))
        k = F.floor(pos)
        # value at 0-based sorted position k = smallest v with cum > k
        aggs.append(F.min(F.when(F.col("cum") > k, F.col("v"))).alias(f"lo{i}"))
        aggs.append(F.min(F.when(F.col("cum") > k + 1, F.col("v"))).alias(f"hi{i}"))
    aggs.append(F.max("n").alias("n"))
    g = j.agg(*aggs)
    outs = []
    for i, p in enumerate(probs):
        pos = (F.col("n") - 1).cast("double") * F.lit(float(p))
        lo_idx = F.floor(pos).cast("double")
        hi_idx = F.ceil(pos).cast("double")
        lo = F.col(f"lo{i}").cast("double")
        hi = F.coalesce(F.col(f"hi{i}"), F.col(f"lo{i}")).cast("double")
        # Spark Percentile's exact interpolation form (two-sided weights,
        # NOT lo + frac*(hi-lo) — they differ in the last ulp):
        #   (higher - pos) * lo + (pos - lower) * hi, lower==higher -> lo
        outs.append(
            F.when(hi_idx == lo_idx, lo)
            .otherwise((hi_idx - pos) * lo + (pos - lo_idx) * hi)
            .alias(f"p{i}")
        )
    return g.select(*outs)
