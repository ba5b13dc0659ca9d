"""Zone-map-pruned top-k: ORDER BY col LIMIT k that opens only the
files able to contain winners — the D6 cutoff composed with the D1
min/max tree (reference: the minmax eval walks block stats BEFORE
reading blocks, columnar/columnar.cpp:649-675; here the "blocks" are
the clustered layout's parquet files and the stats come from their
footers, read driver-side as pure metadata).

Algorithm (sound for any layout, fast for a clustered one):

1. driver: read each file's footer min/max/rows for the order column —
   metadata-only, no data IO;
2. phase 1: take files in best-bound order (max desc for descending)
   until their cumulative rows >= k; TakeOrdered k over just those;
3. phase 2 (audit): any unselected file whose bound BEATS the observed
   k-th value is added and the top-k re-taken. On a layout clustered by
   the order column phase 2 is empty and the query reads ~k/rows_per_file
   files; on a hostile layout it degrades gracefully to more files,
   never to a wrong answer.

NULL semantics: Spark's ORDER BY DESC puts NULLs last; files whose
footer lacks stats (or is all-NULL) get a bound of -inf/+inf so they
are only read when k overruns the non-null universe — matching the
conservative side.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _file_stats(table_path: str, col: str) -> list[tuple[str, object, object, int]] | None:
    """[(path, min, max, rows)] from parquet footers, or None when any
    footer lacks usable stats for `col` (caller falls back to full scan)."""
    import pyarrow.parquet as pq

    files = sorted(_glob.glob(os.path.join(table_path, "*.parquet")))
    if not files:
        files = sorted(
            _glob.glob(os.path.join(table_path, "**", "*.parquet"), recursive=True)
        )
    if not files:
        return None
    out = []
    for f in files:
        try:
            meta = pq.ParquetFile(f).metadata
        except Exception:
            return None
        if meta.num_row_groups == 0 or meta.num_rows == 0:
            continue  # empty split: cannot contain winners, skip outright
        idx = None
        for j in range(meta.num_columns):
            if meta.row_group(0).column(j).path_in_schema == col:
                idx = j
                break
        if idx is None:
            return None
        lo = hi = None
        rows = 0
        for i in range(meta.num_row_groups):
            rg = meta.row_group(i)
            rows += rg.num_rows
            st = rg.column(idx).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None or st.min < lo else lo
            hi = st.max if hi is None or st.max > hi else hi
        out.append((f, lo, hi, rows))
    return out


def topk_pruned(
    spark: SparkSession,
    table_path: str,
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak_col: str | None = None,
) -> tuple[DataFrame, int, int]:
    """-> (top-k DataFrame, files_read, files_total). The result is
    bit-identical to `read(all).orderBy(col).limit(k)` (deterministic
    with a tiebreak column)."""
    stats = _file_stats(table_path, order_col)
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    ]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())

    if stats is None or not stats or any(s[1] is None for s in stats):
        df = spark.read.parquet(table_path)
        return df.orderBy(*order).limit(k), -1, -1

    total = len(stats)
    if descending:
        ranked = sorted(stats, key=lambda s: s[2], reverse=True)  # by max desc
    else:
        ranked = sorted(stats, key=lambda s: s[1])  # by min asc

    phase1, cum = [], 0
    for s in ranked:
        phase1.append(s)
        cum += s[3]
        if cum >= k:
            break
    chosen = {s[0] for s in phase1}

    df1 = spark.read.parquet(*sorted(chosen))
    rows = df1.orderBy(*order).limit(k).collect()
    kth = rows[k - 1][order_col] if len(rows) >= k else None
    if kth is not None:
        # >= / <= (not strict): a file whose bound TIES the k-th value
        # can still hold rows that win on the tiebreak column
        extra = [
            s[0]
            for s in stats
            if s[0] not in chosen
            and (s[2] >= kth if descending else s[1] <= kth)
        ]
    else:
        # Fewer than k rows in phase 1, or the k-th observed value is
        # NULL (footer row counts include NULL rows, which sort last
        # under Spark's default ordering, so a nullable order column can
        # leave position k-1 NULL): the bound is unknown — read every
        # remaining file rather than compare against None.
        extra = [s[0] for s in stats if s[0] not in chosen]
    if extra:
        chosen |= set(extra)
        df1 = spark.read.parquet(*sorted(chosen))
    return df1.orderBy(*order).limit(k), len(chosen), total
