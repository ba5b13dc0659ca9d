"""Heavy hitters (frequent items) — exact answers at sketch cost.

`heavy_hitters(df, col, k)` returns every value whose frequency exceeds
n/k, with its exact count. The naive plan is `groupBy(col).count()` —
a full shuffle keyed on the value column, whose width is the table's
ndv: at 100 TB with a high-cardinality column (user ids, URLs, grams)
that shuffle IS the job. This operator never shuffles the full value
set:

1. **Candidate pass** (one scan, zero shuffle): each partition computes
   its local value counts in Arrow batches (mapInPandas, vectorized
   pandas value_counts) and emits only values with local count
   > n_p/k. Pigeonhole guarantee: if a value has global count > n/k
   over partitions with sizes n_p summing to n, then in at least one
   partition its local count exceeds n_p/k — so the emitted union is a
   SUPERSET of the true heavy hitters. At most k values can exceed a
   1/k share locally, so each partition emits <= k rows; the candidate
   set is <= k * num_partitions — kilobytes, not terabytes.
2. **Exact verify** (one scan, tiny shuffle): count only rows whose
   value is in the broadcast candidate list, then keep counts with
   count * k > n (exact integer compare, no float threshold).

The result is bit-identical to the naive plan (and is oracle-checked
against plain SQL GROUP BY/HAVING), but the only shuffle is over the
candidate subset. This is the same two-phase shape as the reference's
secondary-index count path (value-index candidates, exact verify —
/root/reference/secondary/secondary.cpp builds value->count tables for
the same reason); Misra-Gries/SpaceSaving would bound candidate memory
per partition harder, but per-partition exact dicts are already bounded
by partition ndv and keep the guarantee trivially auditable.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def heavy_hitter_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition candidate pass: (value, local_count, partition_rows)
    for every value exceeding a 1/k share of its partition. Superset of
    the global > n/k set by pigeonhole; <= k rows per partition."""
    field = df.schema[col]
    out_schema = T.StructType(
        [
            T.StructField("value", field.dataType),
            T.StructField("local_count", T.LongType()),
            T.StructField("partition_rows", T.LongType()),
        ]
    )

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        n_p = 0
        for b in batches:
            n_p += len(b)
            vc = b[col].value_counts(dropna=True)
            for v, c in vc.items():
                counts[v] = counts.get(v, 0) + int(c)
        if n_p == 0:
            return
        # local share test: local_count * k > n_p  (exact integers).
        # One NULL-valued marker row carries the partition size so the
        # caller recovers n without a second full scan (NULLs are never
        # candidates — value_counts drops them — so the marker is
        # unambiguous).
        items = [(v, c) for v, c in counts.items() if c * k > n_p]
        yield pd.DataFrame(
            {
                "value": pd.Series([v for v, _ in items] + [None], dtype=object),
                "local_count": [c for _, c in items] + [0],
                "partition_rows": [n_p] * (len(items) + 1),
            }
        )

    return df.select(col).mapInPandas(per_partition, schema=out_schema)


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact frequent items: (col, cnt) for every value with global
    count > n/k (n = total rows incl. NULLs; NULL itself is never a
    hitter), ordered by nothing (caller sorts). Two scans, no full-ndv
    shuffle; bit-identical to GROUP BY + HAVING cnt*k > n."""
    cand = heavy_hitter_candidates(df, col, k).collect()
    values = sorted({r["value"] for r in cand if r["value"] is not None})
    n = sum(r["partition_rows"] for r in cand if r["value"] is None)
    if not values:
        return (
            df.select(F.col(col), F.lit(0).cast("long").alias("cnt")).limit(0)
        )
    return (
        df.filter(F.col(col).isin(values))
        .groupBy(col)
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(n))
    )
