"""Distributed exact interpolated percentiles.

Spark's builtin exact `percentile` aggregate accumulates a value->count
map per partition and MERGES THE FULL MAP single-threaded at the final
reduce — fine for low-cardinality columns, but on a high-cardinality
column (e.g. 583k distinct doubles at sf0.1, billions at 100 TB) the
final map is the whole column: unbounded single-node memory and the
dominant cost. The reference never faces this (its host daemon computes
percentiles; MCL only stores), so this operator is pure engine-side
scale work.

Plan shape (every step bounded, no driver materialization, fully lazy):

1. value counts        — groupBy(col).count(): map-side combine shuffle.
2. range partition     — repartitionByRange(value) + sortWithinPartitions:
                         global sort order across partitions, local order
                         within; tag rows with spark_partition_id().
3. per-partition sums  — tiny (#partitions rows); a single-partition
                         window over THAT (not the data) turns them into
                         partition-start offsets.
4. global cumulative   — broadcast-join offsets back, partitioned window
                         cumsum within each partition + offset.
5. rank brackets       — for each quantile q the 0-based positions
                         lo=floor((n-1)q), hi=ceil((n-1)q) with linear
                         interpolation weights (1-f, f); a broadcast
                         nested-loop join of the TINY rank table against
                         the cumulative table selects the bracketing
                         values; groupBy(q) sums weight*value.

Matches SQL percentile_cont / DuckDB quantile_cont semantics exactly
(verified in tests/test_percentiles.py against Spark's own percentile).
NULLs are excluded, like the builtins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def percentile_cont(
    df: DataFrame,
    col: str,
    qs: Sequence[float],
    names: Sequence[str] | None = None,
    num_range_partitions: int | None = None,
) -> DataFrame:
    """1-row DataFrame of exact interpolated percentiles of `col`.

    names[i] is the output column for qs[i] (default p<q-without-dot>).
    num_range_partitions defaults to the session shuffle parallelism.
    """
    if names is None:
        names = [f"p{str(q).replace('.', '')}" for q in qs]
    if len(names) != len(qs):
        raise ValueError("names and qs must align")

    sess = df.sparkSession
    nparts = num_range_partitions or int(sess.conf.get("spark.sql.shuffle.partitions"))

    v = F.col(col).cast("double")
    counts = df.filter(v.isNotNull()).groupBy(v.alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    ranged = (
        counts.repartitionByRange(nparts, F.col("__v"))
        .sortWithinPartitions("__v")
        .withColumn("__pid", F.spark_partition_id())
    )

    # Partition-start offsets: #partitions rows — the single-partition
    # window here is over a partition-count-sized table, not the data.
    psums = ranged.groupBy("__pid").agg(F.sum("__c").alias("__ps"))
    # partitionBy(lit(0)): same single partition (input is #partitions
    # rows, bounded), but an explicit one — avoids the misleading
    # "No Partition Defined" scale warning in executed plans/logs.
    w_off = (
        Window.partitionBy(F.lit(0))
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = psums.select(
        "__pid", F.coalesce(F.sum("__ps").over(w_off), F.lit(0)).alias("__off")
    )

    w_cum = Window.partitionBy("__pid").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = ranged.join(F.broadcast(offsets), "__pid").select(
        "__v",
        "__c",
        (F.sum("__c").over(w_cum) + F.col("__off")).alias("__cum"),
    )

    total = cum.agg(F.max("__cum").alias("__n"))
    qdf = sess.createDataFrame([(float(q), n) for q, n in zip(qs, names)], "__q double, __name string")
    pos = F.col("__q") * (F.col("__n") - 1).cast("double")
    frac = pos - F.floor(pos)
    ranks = (
        qdf.crossJoin(F.broadcast(total))
        .select(
            "__name",
            F.explode(
                F.array(
                    F.struct(
                        F.floor(pos).cast("long").alias("__r"),
                        (F.lit(1.0) - frac).alias("__w"),
                    ),
                    F.struct(F.ceil(pos).cast("long").alias("__r"), frac.alias("__w")),
                )
            ).alias("__rw"),
        )
        .select("__name", F.col("__rw.__r").alias("__r"), F.col("__rw.__w").alias("__w"))
        .filter(F.col("__w") > 0)
    )

    # Bracket join: tiny rank table broadcast against the cumulative CDF;
    # value at 0-based position r satisfies cum - c <= r < cum.
    hits = cum.join(
        F.broadcast(ranks),
        (F.col("__cum") - F.col("__c") <= F.col("__r")) & (F.col("__r") < F.col("__cum")),
    )
    per_q = hits.groupBy("__name").agg(F.sum(F.col("__w") * F.col("__v")).alias("__val"))

    out = None
    for name in names:
        one = per_q.filter(F.col("__name") == name).select(F.col("__val").alias(name))
        out = one if out is None else out.crossJoin(one)
    return out


def percentile_cont_bracket(
    df: DataFrame,
    col: str,
    qs: Sequence[float],
    names: Sequence[str] | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """Sketch-bracketed EXACT interpolated percentiles — the
    two-scan/no-sort access path for high-cardinality columns.

    Pass 1 (inside the plan, broadcast 1-row): a Greenwald-Khanna sketch
    (`approx_percentile`) brackets each target rank. GK's DETERMINISTIC
    rank-error guarantee (<= n/accuracy) makes the bracket sound: the
    values at quantiles q +- 2/accuracy enclose every rank the exact
    answer can touch. Pass 2: ONE conditional aggregate computes the
    exact count strictly below the bracket and collects the in-bracket
    values (~4n/accuracy rows + boundary ties — hundreds at millions of
    rows); exact order statistics then come from array indexing into the
    sorted bracket. No global sort, no value-counts shuffle, per-task
    memory bounded by the bracket width.

    Interpolation matches percentile_cont bit-for-bit:
    (1-f)*v_lo + f*v_hi (two-term sum — commutative, deterministic).
    """
    if names is None:
        names = [f"p{str(q).replace('.', '')}" for q in qs]
    if len(names) != len(qs):
        raise ValueError("names and qs must align")
    slack = 2.0 / accuracy

    v = F.col(col).cast("double")
    probe_qs = []
    for q in qs:
        probe_qs += [max(0.0, q - slack), min(1.0, q + slack)]
    arr = ", ".join(repr(float(x)) for x in probe_qs)
    stats = df.filter(v.isNotNull()).agg(
        F.expr(f"approx_percentile(CAST({col} AS DOUBLE), array({arr}), {accuracy})").alias("__b"),
        F.count(v).alias("__n"),
    )

    joined = df.filter(v.isNotNull()).crossJoin(F.broadcast(stats))
    aggs = []
    for i, q in enumerate(qs):
        lo, hi = F.col("__b")[2 * i], F.col("__b")[2 * i + 1]
        aggs.append(
            F.sum(F.when(v < lo, 1).otherwise(0)).cast("long").alias(f"__below_{i}")
        )
        aggs.append(
            F.array_sort(
                F.collect_list(F.when((v >= lo) & (v <= hi), v))
            ).alias(f"__vals_{i}")
        )
        # +-1-rank guard: at small n (sketch stores everything) and at
        # the n~accuracy boundary the needed floor/ceil rank can sit ONE
        # position outside the probed bracket — the adjacent extremes
        # extend the contiguous covered rank range by one on each side.
        aggs.append(F.max(F.when(v < lo, v)).alias(f"__prev_{i}"))
        aggs.append(F.min(F.when(v > hi, v)).alias(f"__next_{i}"))
    got = joined.groupBy("__n").agg(*aggs)  # __n is constant: 1 group

    outs = []
    for i, (q, name) in enumerate(zip(qs, names)):
        n = F.col("__n").cast("double")
        pos = F.lit(float(q)) * (n - F.lit(1.0))
        f_ = pos - F.floor(pos)
        prev, nxt = F.col(f"__prev_{i}"), F.col(f"__next_{i}")
        vals = F.concat(
            F.when(prev.isNotNull(), F.array(prev)).otherwise(
                F.array().cast("array<double>")
            ),
            F.col(f"__vals_{i}"),
            F.when(nxt.isNotNull(), F.array(nxt)).otherwise(
                F.array().cast("array<double>")
            ),
        )
        base = F.col(f"__below_{i}") - F.when(prev.isNotNull(), 1).otherwise(0)
        idx_lo = (F.floor(pos).cast("long") - base + 1).cast("int")
        idx_hi = (F.ceil(pos).cast("long") - base + 1).cast("int")
        # Fail loudly, not plausibly: if the bracket assumption is ever
        # violated past the ±1 guard, a non-positive index would make
        # element_at read from the array END (negative indexing) and
        # return a plausible-but-wrong percentile. Surface NULL instead.
        in_bounds_lo = (idx_lo >= 1) & (idx_lo <= F.size(vals))
        in_bounds_hi = (idx_hi >= 1) & (idx_hi <= F.size(vals))
        v_lo = F.when(in_bounds_lo, F.element_at(vals, idx_lo))
        v_hi = F.when(in_bounds_hi, F.element_at(vals, idx_hi))
        outs.append(
            F.when(f_ == 0.0, v_lo)
            .otherwise((F.lit(1.0) - f_) * v_lo + f_ * v_hi)
            .alias(name)
        )
    return got.select(*outs)


def percentile_disc(
    df: DataFrame,
    col: str,
    qs: Sequence[float],
    names: Sequence[str] | None = None,
) -> DataFrame:
    """ANSI PERCENTILE_DISC: the smallest actual value whose cumulative
    distribution is >= q (no interpolation) — matches Spark's builtin
    `percentile_disc` and DuckDB `quantile_disc` (verified in tests).

    Distributed form: value counts (map-side combine) + one ordered
    cumulative window over ndv (value,count) pairs — the medium-tier
    plan of percentiles_auto; DISC never needs the bracketing/weights
    machinery because the answer is always an existing value.
    """
    if names is None:
        names = [f"p{str(q).replace('.', '')}" for q in qs]
    if len(names) != len(qs):
        raise ValueError("names and qs must align")

    v = F.col(col).cast("double")
    counts = df.filter(v.isNotNull()).groupBy(v.alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    # Ordered cumsum over ndv pre-aggregated pairs (bounded by ndv, the
    # documented medium-tier ceiling; use the CDF pipeline shape of
    # percentile_cont if ndv itself is huge).
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.withColumn("__cum", F.sum("__c").over(w))
    tot = counts.agg(F.sum("__c").alias("__n"))
    j = cum.crossJoin(F.broadcast(tot))
    aggs = [
        F.min(
            F.when(
                F.col("__cum") >= F.lit(float(q)) * F.col("__n"), F.col("__v")
            )
        ).alias(n)
        for q, n in zip(qs, names)
    ]
    return j.agg(*aggs)


def percentiles_multi(
    df: DataFrame, spec: dict[str, list[tuple[float, str]]]
) -> DataFrame:
    """Exact percentiles for several columns in one 1-row result:
    spec = {column: [(q, out_name), ...]}. Independent pipelines
    crossJoined (each side is 1 row)."""
    out = None
    for col, pairs in spec.items():
        part = percentile_cont(df, col, [q for q, _ in pairs], [n for _, n in pairs])
        out = part if out is None else out.crossJoin(part)
    return out


# Tier boundaries for the access-path switch, by (estimated) ndv:
#   <= SMALL: Spark's builtin exact percentile. Its single-node merge of
#      per-partition value->count hash maps is trivial here, and ALL
#      small columns share one aggregate pass.
#   <= MEDIUM: distributed groupBy value counts, then one cumulative
#      window over ndv PRE-AGGREGATED (value,count) pairs. Same
#      ndv-bounded ceiling class as the builtin, but the bottleneck node
#      sorts 16-byte pairs instead of merging raw hash maps — measured
#      1.24s vs 1.61s on a 583k-ndv double column at sf0.1.
#   above: the fully distributed CDF pipeline (percentile_cont), whose
#      per-task memory is bounded regardless of cardinality.
DEFAULT_SMALL_NDV = 65_536
DEFAULT_NDV_THRESHOLD = 2_000_000


def auto_sketch_accuracy(n_rows: int) -> int:
    """Scale-balanced GK accuracy for the bracket path: sketch state
    grows ~O(accuracy) while the exact-refinement bracket holds
    ~4·n/accuracy rows, so accuracy ≈ 2·sqrt(n) balances the two costs
    at every scale (measured: the fixed 10k default spends ~70% of
    percentile_stats in the sketch scan at the 10x corpus, where
    2·sqrt(6M) ≈ 4.9k halves it; at 1e12 rows it grows to ~2e6 so the
    bracket stays ~2e6 rows instead of 4e8). The exact answer is
    accuracy-INVARIANT: brackets only select refinement candidates, and
    the below-count + ±1-rank guard reconstructs the same order
    statistics from any sound bracket (GK's deterministic ≤ n/accuracy
    rank error keeps every bracket sound at slack = 2/accuracy)."""
    import math

    return min(max(int(2.0 * math.sqrt(max(n_rows, 1))), 1_000), 10_000_000)


def percentiles_auto(
    df: DataFrame,
    spec: dict[str, list[tuple[float, str]]],
    ndv: dict[str, int] | None = None,
    ndv_threshold: int = DEFAULT_NDV_THRESHOLD,
    small_ndv: int = DEFAULT_SMALL_NDV,
    n_rows: int | None = None,
) -> DataFrame:
    """Access-path switch for exact percentiles — the same estimate-then-
    choose contract as the reference's scan-vs-index decisions
    (ShouldUseFullscan, knn/knn.cpp:217; EstimateMinMax,
    columnar/columnar.cpp:649-675):

    per column, if the (estimated) distinct count is below ndv_threshold
    use Spark's builtin exact percentile (single small map merge, 2-stage
    plan); otherwise use the distributed CDF pipeline whose memory is
    bounded per task regardless of cardinality.

    `ndv` supplies estimates (e.g. from the stats manifest); missing
    columns are probed with one approx_count_distinct job — the D3-style
    stats probe a planner runs before committing to a physical plan.
    """
    missing = [c for c in spec if ndv is None or c not in ndv]
    ndv = dict(ndv or {})
    if missing:
        row = df.agg(
            *[F.approx_count_distinct(c).alias(c) for c in missing]
        ).first()
        for c in missing:
            ndv[c] = int(row[c])

    # All small columns share ONE aggregate (a single scan / single
    # stage); medium and large columns each get their own pipeline,
    # crossJoined (every side is 1 row). The small boundary can never
    # exceed the medium one (a caller lowering ndv_threshold alone must
    # not put a column in two tiers).
    small_ndv = min(small_ndv, ndv_threshold)
    small = [c for c in spec if ndv[c] <= small_ndv]
    medium = [c for c in spec if small_ndv < ndv[c] <= ndv_threshold]
    large = [c for c in spec if ndv[c] > ndv_threshold]

    # r10: the small tier's disc probes and EVERY medium column's
    # bracket aggregate fuse into ONE main scan (the broadcast 1-row
    # stats crossJoin preserves row multiplicity, and every bracket
    # condition is already NULL-safe: `when(v < lo, 1)` is 0 on NULL,
    # collect_list/min/max ignore NULLs), and all medium columns share
    # ONE sketch-stats scan. percentile_stats drops from 3 lineitem
    # scans to 2 with bit-identical per-column algebra — the same
    # expressions over the same rows, just co-planned.
    import math

    out = None
    sel_small: list = []
    aggs_small: list = []
    if small:
        # Exact order statistics via builtin percentile_disc probes, then
        # the engine's ONE interpolation recipe (1-f)*v_lo + f*v_hi
        # applied outside (Spark's builtin lo + f*(hi-lo) differs by one
        # ULP on rounding edges). Rank pinning: the value at 0-based
        # sorted position r is percentile_disc at q=(r+0.5)/n — the
        # midpoint keeps q*n a full half-unit away from rank boundaries.
        cnt_row = df.agg(
            *[F.count(F.col(c).cast("double")).alias(f"__n_{i}") for i, c in enumerate(small)]
        ).first()
        k = 0
        for i, col in enumerate(small):
            n = int(cnt_row[f"__n_{i}"])
            for q, name in spec[col]:
                if n == 0:
                    sel_small.append(F.lit(None).cast("double").alias(name))
                    continue
                pos = float(q) * (n - 1)  # the same IEEE product every tier uses
                r0 = math.floor(pos)
                frac = pos - r0
                q0 = (r0 + 0.5) / n
                lo_name = f"__lo_{k}"
                aggs_small.append(
                    F.expr(
                        f"percentile_disc({q0!r}) WITHIN GROUP "
                        f"(ORDER BY CAST({col} AS DOUBLE))"
                    ).alias(lo_name)
                )
                if frac == 0.0:
                    sel_small.append(F.col(lo_name).alias(name))
                else:
                    q1 = (math.ceil(pos) + 0.5) / n
                    hi_name = f"__hi_{k}"
                    aggs_small.append(
                        F.expr(
                            f"percentile_disc({q1!r}) WITHIN GROUP "
                            f"(ORDER BY CAST({col} AS DOUBLE))"
                        ).alias(hi_name)
                    )
                    sel_small.append(
                        (
                            F.lit(1.0 - frac) * F.col(lo_name)
                            + F.lit(frac) * F.col(hi_name)
                        ).alias(name)
                    )
                k += 1

    if medium:
        fused = _bracket_fused(
            df,
            {c: spec[c] for c in medium},
            aggs_small,
            sel_small,
            accuracy=auto_sketch_accuracy(n_rows) if n_rows else 10_000,
        )
        out = fused
    elif aggs_small:
        out = df.agg(*aggs_small).select(*sel_small)
    elif small:  # every small column empty: literal NULL row
        out = df.sparkSession.range(1).select(*sel_small)
    for col in large:
        part = percentile_cont(
            df, col, [q for q, _ in spec[col]], [n for _, n in spec[col]]
        )
        out = part if out is None else out.crossJoin(part)
    return out


def _bracket_fused(
    df: DataFrame,
    spec: dict[str, list[tuple[float, str]]],
    extra_aggs: list,
    extra_sel: list,
    accuracy: int = 10_000,
) -> DataFrame:
    """All medium columns' GK-bracket aggregates + any small-tier disc
    probes in ONE stats scan + ONE main scan. Per-column algebra is
    verbatim percentile_cont_bracket (same probe quantiles, same ±1-rank
    guard, same interpolation); the NULL filter moves from the scan into
    the already-NULL-safe conditional aggregates, and the constant-key
    groupBy("__n") becomes a global aggregate carrying each column's
    count with min() (constant per scan)."""
    slack = 2.0 / accuracy
    cols = list(spec)

    stat_aggs = []
    for ci, col in enumerate(cols):
        v = F.col(col).cast("double")
        probe_qs = []
        for q, _ in spec[col]:
            probe_qs += [max(0.0, q - slack), min(1.0, q + slack)]
        arr = ", ".join(repr(float(x)) for x in probe_qs)
        stat_aggs.append(
            F.expr(
                f"approx_percentile(CAST({col} AS DOUBLE), array({arr}), {accuracy})"
            ).alias(f"__b_{ci}")
        )
        stat_aggs.append(F.count(v).alias(f"__cnt_{ci}"))
    stats = df.agg(*stat_aggs)

    joined = df.crossJoin(F.broadcast(stats))
    aggs = list(extra_aggs)
    for ci, col in enumerate(cols):
        v = F.col(col).cast("double")
        for i, (q, _) in enumerate(spec[col]):
            lo, hi = F.col(f"__b_{ci}")[2 * i], F.col(f"__b_{ci}")[2 * i + 1]
            aggs.append(
                F.sum(F.when(v < lo, 1).otherwise(0)).cast("long").alias(f"__below_{ci}_{i}")
            )
            aggs.append(
                F.array_sort(
                    F.collect_list(F.when((v >= lo) & (v <= hi), v))
                ).alias(f"__vals_{ci}_{i}")
            )
            aggs.append(F.max(F.when(v < lo, v)).alias(f"__prev_{ci}_{i}"))
            aggs.append(F.min(F.when(v > hi, v)).alias(f"__next_{ci}_{i}"))
        aggs.append(F.min(F.col(f"__cnt_{ci}")).alias(f"__n_{ci}"))
    got = joined.agg(*aggs)

    outs = list(extra_sel)
    for ci, col in enumerate(cols):
        n = F.col(f"__n_{ci}").cast("double")
        for i, (q, name) in enumerate(spec[col]):
            pos = F.lit(float(q)) * (n - F.lit(1.0))
            f_ = pos - F.floor(pos)
            prev, nxt = F.col(f"__prev_{ci}_{i}"), F.col(f"__next_{ci}_{i}")
            vals = F.concat(
                F.when(prev.isNotNull(), F.array(prev)).otherwise(
                    F.array().cast("array<double>")
                ),
                F.col(f"__vals_{ci}_{i}"),
                F.when(nxt.isNotNull(), F.array(nxt)).otherwise(
                    F.array().cast("array<double>")
                ),
            )
            base = F.col(f"__below_{ci}_{i}") - F.when(prev.isNotNull(), 1).otherwise(0)
            idx_lo = (F.floor(pos).cast("long") - base + 1).cast("int")
            idx_hi = (F.ceil(pos).cast("long") - base + 1).cast("int")
            in_bounds_lo = (idx_lo >= 1) & (idx_lo <= F.size(vals))
            in_bounds_hi = (idx_hi >= 1) & (idx_hi <= F.size(vals))
            v_lo = F.when(in_bounds_lo, F.element_at(vals, idx_lo))
            v_hi = F.when(in_bounds_hi, F.element_at(vals, idx_hi))
            outs.append(
                F.when(f_ == 0.0, v_lo)
                .otherwise((F.lit(1.0) - f_) * v_lo + f_ * v_hi)
                .alias(name)
            )
    return got.select(*outs)
