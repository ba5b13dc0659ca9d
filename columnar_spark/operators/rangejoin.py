"""Range (interval) join: points joined to containing intervals.

SURVEY §2.G lists range joins among the host-side join shapes the
engine must serve ("range/as-of via conditions or join + window"). The
naive Spark plan for `point BETWEEN lo AND hi` is a
BroadcastNestedLoopJoin — O(|L|x|R|) and the exact hazard the round-1
audit graded `weak` on the quadratic pair oracles.

The distributed form used everywhere intervals are joined at scale
(e.g. genomics/telemetry engines): bucketize. Pick a bucket width, map
each point to one bucket, EXPLODE each interval onto every bucket it
overlaps, equi-join on (key, bucket), then re-check the exact residual
predicate. Shuffle cost is |L| + |R| x avg_buckets_per_interval — linear,
not quadratic — and Catalyst runs the equi-join as a normal shuffle/
broadcast hash join with the residual as a post-join filter.

Correctness does not depend on the bucket width (the residual predicate
is exact); width only tunes replication vs bucket fan-in. A good width
is the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    keys: tuple[str, str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each `points` row to every `intervals` row with
    lo_col <= point < hi_col (half-open, the time-window convention;
    pass hi_col inclusive data through +1 if closed semantics are
    needed). Numeric (long-castable) point/lo/hi columns.

    keys=(left_key, right_key) adds an equi-key the pair must also
    match (the common "same user, event inside order window" shape) —
    it rides in the join key, further narrowing the shuffle.

    how="inner" or "left" (unmatched points kept with null interval
    side). Interval columns keep their names; callers project/alias.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"range_join supports inner/left, not {how!r}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    # Integer `div`, NOT double `/` + cast: double division is inexact
    # beyond 2^53, so two adjacent huge timestamps could land in
    # different buckets than their covering interval — a silent miss.
    # `div` truncates toward zero exactly, and truncation is monotonic,
    # so every point in [lo, hi-1] stays within the interval's bucket
    # span regardless of sign.
    p = points.withColumn(
        "__b", F.expr(f"CAST(`{point_col}` AS BIGINT) div {int(bucket_width)}")
    )
    # sequence() is bounded by the interval's own span / bucket_width;
    # a pathologically long interval replicates onto many buckets —
    # that is the documented width tradeoff, not a correctness issue.
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.expr(f"CAST(`{lo_col}` AS BIGINT) div {int(bucket_width)}"),
                # last bucket containing any point < hi (exclusive hi)
                F.expr(f"(CAST(`{hi_col}` AS BIGINT) - 1) div {int(bucket_width)}"),
            )
        ),
    )

    join_keys = ["__b"]
    if keys is not None:
        lk, rk = keys
        p = p.withColumn("__k", F.col(lk))
        iv = iv.withColumn("__k", F.col(rk))
        join_keys.append("__k")

    residual = (F.col(lo_col) <= F.col(point_col)) & (
        F.col(point_col) < F.col(hi_col)
    )
    if how == "inner":
        out = p.join(iv, join_keys, "inner").filter(residual)
        return out.drop("__b", "__k") if keys else out.drop("__b")

    # left: inner-match via the bucketed path, then add back unmatched
    # points with an anti join on the SAME bucketed candidates (no
    # second interval scan shape — both sides reuse the equi-join).
    matched = p.join(iv, join_keys, "inner").filter(residual)
    probe = matched.select(*points.columns).distinct()
    unmatched = points.join(probe, points.columns, "left_anti")
    for c in iv.columns:
        if c not in points.columns and c != "__b" and c != "__k":
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(dict(iv.dtypes)[c])
            )
    out = matched.drop("__b", "__k") if keys else matched.drop("__b")
    return out.unionByName(unmatched.select(out.columns))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: int,
    keys: tuple[str, str] | None = None,
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair whose half-open
    intervals [l_lo, l_hi) and [r_lo, r_hi) intersect — the two-sided
    sibling of range_join's point-in-interval (sessions x maintenance
    windows, order windows x shipment windows, genomic intervals).

    Same bucketize shape: BOTH sides explode onto the buckets their
    interval touches and equi-join on (bucket[, key]); shuffle is linear
    in rows x avg buckets per interval, never |L|x|R|. A pair sharing
    k buckets would match k times, so instead of a distinct() the join
    keeps exactly the FIRST overlapping bucket — the bucket of
    max(l_lo, r_lo), which provably lies in both intervals' spans —
    an exact, shuffle-free dedup predicate.

    Exactness does not depend on bucket_width (exact residual + exact
    integer `div` bucketing, see range_join's precision note); width
    only tunes replication. Column names must not collide across sides.
    Bounds must be integer-valued (epoch micros, positions — same
    contract as range_join): with fractional bounds the CAST-truncated
    bucket of max(l_lo, r_lo) can fall outside a span and drop a pair.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = int(bucket_width)

    def span(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            "__b",
            F.explode(
                F.sequence(
                    F.expr(f"CAST(`{lo}` AS BIGINT) div {w}"),
                    F.expr(f"(CAST(`{hi}` AS BIGINT) - 1) div {w}"),
                )
            ),
        )

    l = span(left, l_lo, l_hi)
    r = span(right, r_lo, r_hi)
    join_keys = ["__b"]
    if keys is not None:
        lk, rk = keys
        l = l.withColumn("__k", F.col(lk))
        r = r.withColumn("__k", F.col(rk))
        join_keys.append("__k")

    overlap = (F.col(l_lo) < F.col(r_hi)) & (F.col(r_lo) < F.col(l_hi))
    first_shared_bucket = F.expr(
        f"GREATEST(CAST(`{l_lo}` AS BIGINT), CAST(`{r_lo}` AS BIGINT)) div {w}"
    )
    out = (
        l.join(r, join_keys, "inner")
        .filter(overlap & (F.col("__b") == first_shared_bucket))
    )
    return out.drop("__b", "__k") if keys else out.drop("__b")
