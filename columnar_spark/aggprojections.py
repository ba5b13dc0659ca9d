"""Aggregate (GROUP-BY) projections — pre-aggregated measure sidecars.

The join projection (projections.py) removes the per-query FK join but
every query over it still re-aggregates the full fact grain. This module
materializes declared GROUP-BY aggregates ONCE at ingest — group keys
(optionally enriched with dimension attributes) plus associative measure
partials — so the query family that reduces to "filter on key columns,
group by key columns, combine measures" reads O(groups) partial rows
instead of paying the fact-scan floor. This is the reference's
answer-from-the-index regime (secondary/secondary.cpp:531-551 serves
exact COUNTs from the index artifact without touching the table)
generalized from COUNT to the full associative-measure algebra the
rollup sidecar already proves (streaming/rollup.py).

Measure algebra (all associative + commutative, so batch boundaries are
invisible and merge-on-read over any partial split is exact):
- ``count``          -> long partials, merged by SUM
- ``sum``            -> int64 fixed-point (or decimal(38,0) wide)
                        partials, merged by SUM — exact, order-free
- ``min`` / ``max``  -> merged by MIN/MAX
- ``pairs``          -> array<struct<k,v>> of per-row (key expr, value
                        expr) entries, merged by array concatenation;
                        consumers fold the array with a filter lambda
                        (the "grouped line list" that serves a
                        line-level predicate UNDER a group-level grain,
                        e.g. q3's l_shipdate filter inside an
                        order-grain projection)

Maintenance is the projections.py delta algebra generalized to k
enrichment dims: with one table changing per (serial, writer-locked)
ingest event, Δ(S ⋈ E1 ⋈ ... ⋈ Ek) = ΔS ⋈ E* (fact append) or
S ⋈ ... ΔEi ... (dim append), and agg(Δjoin) appends as partial rows —
O(batch) fact-side work. Freshness gates on the signatures of the
source AND every enrichment table; any out-of-band rewrite makes the
artifact stale and callers fall back to the live recompute, which is
always correct (the same contract as every other sidecar here).

Scale posture: the artifact is O(groups) at rest (cluster_by re-sorts it
so the family's dominant predicate prunes row groups); query-time reads
are scans of the compacted artifact — no join, no fact shuffle. Appends
shuffle only the batch's partials. ``compacted`` in the meta records
whether the artifact currently holds exactly one row per group: readers
skip the merge-on-read groupBy when it does (the common, post-ingest
case) and pay one groupBy over partials when appends have landed since.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_spark.stats import table_signature

AGGPROJ_SUFFIX = ".aggproj"


def agg_projection_root(fact_path: str) -> str:
    return fact_path.rstrip("/") + AGGPROJ_SUFFIX


def agg_projection_path(fact_path: str, name: str) -> str:
    return os.path.join(agg_projection_root(fact_path), name)


def agg_projection_meta(fact_path: str, name: str) -> dict | None:
    from columnar_spark import objstore

    return objstore.read_json(agg_projection_path(fact_path, name), "_meta.json")


def agg_projections_on(fact_path: str) -> "list[str]":
    """Names of aggregate projections whose SOURCE is this table."""
    from columnar_spark import objstore

    root = agg_projection_root(fact_path)
    if "://" not in root and not os.path.isdir(root):
        return []
    return sorted(
        d for d in objstore.list_names(root)
        if objstore.read_json(os.path.join(root, d), "_meta.json") is not None
    )


def agg_projections_referencing(table_path: str) -> "list[tuple[str, str]]":
    """(fact_path, name) of aggregate projections in the same layout dir
    that ENRICH from this table — directory listing only, no data read."""
    layout = os.path.dirname(os.path.abspath(table_path))
    rel = os.path.basename(table_path.rstrip("/"))
    out = []
    try:
        entries = os.listdir(layout)
    except OSError:
        return []
    for e in entries:
        if not e.endswith(AGGPROJ_SUFFIX):
            continue
        fact_path = os.path.join(layout, e[: -len(AGGPROJ_SUFFIX)])
        for name in agg_projections_on(fact_path):
            meta = agg_projection_meta(fact_path, name)
            if meta is None:
                continue
            if any(en["table"] == rel for en in meta.get("enrich", ())):
                out.append((fact_path, name))
    return out


def _layout_dir(fact_path: str) -> str:
    return os.path.dirname(os.path.abspath(fact_path))


def _enriched(
    spark: SparkSession,
    fact_path: str,
    meta: dict,
    source_df: DataFrame | None = None,
    delta_enrich: "tuple[int, DataFrame] | None" = None,
) -> DataFrame:
    """source ⋈ E1 ⋈ ... ⋈ Ek with each enrich col renamed to its
    declared alias — THE one code path shared by the full build, both
    delta merges, and the checker's recount. ``delta_enrich=(i, ΔEi)``
    substitutes a delta frame for the i-th enrichment table (the
    dim-append increment S ⋈ ... ΔEi ...)."""
    from columnar_spark import objstore

    objstore.require_transport(fact_path)
    df = source_df if source_df is not None else spark.read.parquet(fact_path)
    layout = _layout_dir(fact_path)
    for i, en in enumerate(meta.get("enrich", ())):
        if delta_enrich is not None and delta_enrich[0] == i:
            dim = delta_enrich[1]
        else:
            dim = spark.read.parquet(os.path.join(layout, en["table"]))
        right = en["right_on"]
        sel = [F.col(right).alias("__agg_rk")]
        for src, alias in en["cols"].items():
            sel.append(F.col(src).alias(alias))
        df = df.join(
            dim.select(*sel), F.col(en["left_on"]) == F.col("__agg_rk")
        ).drop("__agg_rk")
    # Baked filter (filtered/partial projection): applied to the
    # ENRICHED frame on every path — full build, both delta merges, the
    # live fallback, and the checker's recount — so the artifact's
    # defining aggregation is always sigma(where)(S join E*) grouped.
    # sigma commutes with the per-batch delta joins, so the partial
    # algebra is unchanged. Consumers must only serve queries whose own
    # predicate IMPLIES the baked one (the hand-wired routes match it
    # exactly; the plain-SQL router refuses `where`-bearing artifacts).
    w = meta.get("where")
    if w:
        df = df.filter(F.expr(w))
    return df


def _partials(df: DataFrame, meta: dict) -> DataFrame:
    """One batch's partial rows: groupBy the key exprs, aggregate each
    measure into its partial form (already one row per group — a full
    build's output is born compacted)."""
    keys = [F.expr(e).alias(n) for n, e in meta["keys"].items()]
    aggs = []
    for m in meta["measures"]:
        kind = m["agg"]
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(m["name"]))
        elif kind == "sum":
            aggs.append(F.sum(F.expr(m["expr"])).alias(m["name"]))
        elif kind == "min":
            aggs.append(F.min(F.expr(m["expr"])).alias(m["name"]))
        elif kind == "max":
            aggs.append(F.max(F.expr(m["expr"])).alias(m["name"]))
        elif kind == "pairs":
            aggs.append(
                F.collect_list(
                    F.struct(
                        F.expr(m["expr"]).alias("k"), F.expr(m["expr2"]).alias("v")
                    )
                ).alias(m["name"])
            )
        else:
            raise ValueError(f"unknown measure agg {kind!r}")
    return df.groupBy(*keys).agg(*aggs)


def _merge(partials: DataFrame, meta: dict) -> DataFrame:
    """Merge-on-read: combine partial rows into one row per group with
    each measure's associative combine (SUM of counts/sums, MIN of mins,
    MAX of maxs, concat of pair lists)."""
    aggs = []
    for m in meta["measures"]:
        kind, n = m["agg"], m["name"]
        if kind in ("count", "sum"):
            agg = F.sum(n)
            if kind == "count":
                agg = agg.cast("long")
            aggs.append(agg.alias(n))
        elif kind == "min":
            aggs.append(F.min(n).alias(n))
        elif kind == "max":
            aggs.append(F.max(n).alias(n))
        elif kind == "pairs":
            aggs.append(F.flatten(F.collect_list(n)).alias(n))
    return partials.groupBy(*meta["keys"].keys()).agg(*aggs)


def _sig_payload(fact_path: str, meta: dict) -> dict:
    layout = _layout_dir(fact_path)
    return {
        "source": table_signature(fact_path),
        "enrich": {
            en["table"]: table_signature(os.path.join(layout, en["table"]))
            for en in meta.get("enrich", ())
        },
    }


def _write_sigs(fact_path: str, meta: dict, proj_dir: str) -> None:
    from columnar_spark import objstore

    objstore.put_json(proj_dir, "_table_sig.json", _sig_payload(fact_path, meta))


_SIG_KEYS = ("files", "bytes", "max_mtime_ms")


def _sigs_fresh(fact_path: str, meta: dict, proj_dir: str) -> bool:
    from columnar_spark import objstore

    rec = objstore.read_json(proj_dir, "_table_sig.json")
    if rec is None:
        return False
    live = _sig_payload(fact_path, meta)
    got_src = rec.get("source") or {}
    if any(got_src.get(k) != live["source"][k] for k in _SIG_KEYS):
        return False
    for tbl, sig in live["enrich"].items():
        got = (rec.get("enrich") or {}).get(tbl) or {}
        if any(got.get(k) != sig[k] for k in _SIG_KEYS):
            return False
    return True


def _write_meta(proj_dir: str, meta: dict) -> None:
    from columnar_spark import objstore

    objstore.put_json(proj_dir, "_meta.json", meta)


def write_agg_projection(
    spark: SparkSession,
    fact_path: str,
    *,
    name: str,
    keys: "dict[str, str]",
    measures: "list[dict]",
    enrich: "tuple[dict, ...]" = (),
    cluster_by: "tuple[str, ...]" = (),
    where: "str | None" = None,
    num_partitions: int | None = None,
) -> None:
    """Full (re)build: one source scan, the enrichment joins (dims are
    small by declaration — Catalyst/AQE broadcasts them), one grouped
    write. ``keys`` maps output name -> SQL expr; ``enrich`` entries are
    {table (layout-relative), left_on, right_on, cols: {src: alias}};
    ``measures`` entries are {name, agg, expr[, expr2]} plus optional
    SQL-router annotations (user/dp/nonnull, stored verbatim); ``where``
    is an optional baked filter (partial projection)."""
    meta = {
        "keys": dict(keys),
        "measures": list(measures),
        "enrich": [dict(e) for e in enrich],
        "cluster_by": list(cluster_by),
        "where": where,
        "compacted": True,
    }
    from columnar_spark import objstore

    out = _partials(_enriched(spark, fact_path, meta), meta)
    p = agg_projection_path(fact_path, name)
    if cluster_by:
        width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        nparts = num_partitions or max(1, min(width, 8))
        out = out.repartitionByRange(
            nparts, *[F.col(c) for c in cluster_by]
        ).sortWithinPartitions(*cluster_by)
    if objstore.is_object_store(fact_path):
        # staging + atomic manifest-pointer commit: segments PUT once,
        # one JSON pointer flip publishes the generation (objstore.py)
        objstore.write_df(spark, out, p, mode="overwrite")
    else:
        tmp = p + ".__build__"
        shutil.rmtree(tmp, ignore_errors=True)
        out.write.mode("overwrite").option("compression", "zstd").parquet(tmp)
        if os.path.isdir(p):
            old = p + ".__old__"
            shutil.rmtree(old, ignore_errors=True)
            os.rename(p, old)
            os.rename(tmp, p)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.makedirs(os.path.dirname(p), exist_ok=True)
            os.rename(tmp, p)
    _write_meta(p, meta)
    _write_sigs(fact_path, meta, p)


def load_agg_projection(
    spark: SparkSession, fact_path: str, name: str, check_fresh: bool = True
) -> DataFrame | None:
    """The merged aggregate relation (one row per group), or None when
    the artifact is absent or STALE (source or any enrichment table
    rewritten outside the framework) — callers fall back to the live
    aggregation, which is always correct. A compacted artifact is served
    as a plain scan (no merge groupBy in the plan)."""
    from columnar_spark import objstore

    p = agg_projection_path(fact_path, name)
    meta = agg_projection_meta(fact_path, name)
    if meta is None or ("://" not in p and not os.path.isdir(p)):
        return None
    if check_fresh and not _sigs_fresh(fact_path, meta, p):
        return None
    df = objstore.read_df(spark, p)
    if meta.get("compacted"):
        return df
    return _merge(df, meta)


def _stale_before_append(
    fact_path: str,
    meta: dict,
    proj_dir: str,
    changed_rel: str,
    pre_sig: "dict | None",
) -> bool:
    """True when the artifact did NOT match the table state just before
    the current append (`pre_sig` = the changed table's signature
    captured by the ingest path pre-append; `changed_rel` is
    "__source__" or the enrichment table's layout-relative name). A
    delta append onto a stale artifact would MASK an out-of-band base
    rewrite — the sig re-stamp after the fold records the current state
    and the artifact then serves wrong aggregates as fresh. None
    `pre_sig` (direct callers outside the ingest fold) skips the check:
    those callers own the staleness question themselves."""
    if pre_sig is None:
        return False
    from columnar_spark import objstore

    rec = objstore.read_json(proj_dir, "_table_sig.json")
    if rec is None:
        return True
    expected = _sig_payload(fact_path, meta)
    if changed_rel == "__source__":
        expected["source"] = pre_sig
    elif changed_rel in expected["enrich"]:
        expected["enrich"][changed_rel] = pre_sig
    got_src = rec.get("source") or {}
    if any(got_src.get(k) != expected["source"].get(k) for k in _SIG_KEYS):
        return True
    for tbl, sig in expected["enrich"].items():
        got = (rec.get("enrich") or {}).get(tbl) or {}
        if any(got.get(k) != (sig or {}).get(k) for k in _SIG_KEYS):
            return True
    return False


def merge_agg_fact_delta(
    spark: SparkSession,
    fact_path: str,
    name: str,
    delta: DataFrame,
    pre_sig: "dict | None" = None,
) -> None:
    """Fold one appended SOURCE batch in: agg(ΔS ⋈ E*) appends as
    partial rows — O(batch) work, nothing rewritten. When the ingest
    fold passes the source's pre-append signature and the artifact was
    ALREADY stale (out-of-band rewrite between ingest events), the fold
    rebuilds instead of appending — appending would mask the rewrite."""
    meta = agg_projection_meta(fact_path, name)
    if meta is None:
        return
    p = agg_projection_path(fact_path, name)
    if _stale_before_append(fact_path, meta, p, "__source__", pre_sig):
        rebuild_agg_projection(spark, fact_path, name)
        return
    from columnar_spark import objstore

    batch = _partials(_enriched(spark, fact_path, meta, source_df=delta), meta)
    if objstore.is_object_store(fact_path):
        objstore.write_df(spark, batch, p, mode="append")
    else:
        batch.write.mode("append").parquet(p)
    meta["compacted"] = False
    _write_meta(p, meta)
    _write_sigs(fact_path, meta, p)


def merge_agg_enrich_delta(
    spark: SparkSession,
    fact_path: str,
    name: str,
    table_rel: str,
    delta: DataFrame,
    pre_sig: "dict | None" = None,
) -> None:
    """Fold one appended ENRICHMENT batch in: agg(S ⋈ ... ΔEi ...)
    appends — inner-join increments only ever ADD rows for append-only
    tables, so the partial algebra stays exact (the projections.py dim
    delta generalized). Source-side O(|S|), dim appends are rare.
    `pre_sig` = the enrichment table's pre-append signature from the
    ingest fold; a pre-existing staleness rebuilds instead of masking."""
    meta = agg_projection_meta(fact_path, name)
    if meta is None:
        return
    slots = [i for i, en in enumerate(meta.get("enrich", ())) if en["table"] == table_rel]
    if not slots:
        return
    if _stale_before_append(
        fact_path, meta, agg_projection_path(fact_path, name), table_rel, pre_sig
    ):
        rebuild_agg_projection(spark, fact_path, name)
        return
    if len(slots) > 1:
        # a table enriched at several slots (e.g. nation as both the
        # customer's and the supplier's nation): the one-slot delta
        # formula is not separable — a new nation row can join at BOTH
        # slots of the same source row, and per-slot increments with the
        # other slot at its post-append state double-count that row.
        # Rebuild instead (dims are small by declaration).
        rebuild_agg_projection(spark, fact_path, name)
        return
    from columnar_spark import objstore

    p = agg_projection_path(fact_path, name)
    batch = _partials(
        _enriched(spark, fact_path, meta, delta_enrich=(slots[0], delta)), meta
    )
    if objstore.is_object_store(fact_path):
        objstore.write_df(spark, batch, p, mode="append")
    else:
        batch.write.mode("append").parquet(p)
    meta["compacted"] = False
    _write_meta(p, meta)
    _write_sigs(fact_path, meta, p)


def compact_agg_projection(spark: SparkSession, fact_path: str, name: str) -> None:
    """Collapse accumulated partials back to one row per group
    (rewrite-then-swap, re-clustered) — same discipline as
    writer.compact_table / rollup compaction."""
    meta = agg_projection_meta(fact_path, name)
    if meta is None:
        return
    from columnar_spark import objstore

    p = agg_projection_path(fact_path, name)
    merged = _merge(objstore.read_df(spark, p), meta)
    if meta.get("cluster_by"):
        merged = merged.repartitionByRange(
            max(1, min(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 8)),
            *[F.col(c) for c in meta["cluster_by"]],
        ).sortWithinPartitions(*meta["cluster_by"])
    if objstore.is_object_store(fact_path):
        # the merged generation's segments PUT, then ONE pointer flip —
        # readers see old partials or the compacted set, never a mix.
        # No self-overwrite hazard: write_df stages to a temp dir (the
        # plan executes against the OLD segments, which the protocol
        # never deletes) before any pointer change.
        objstore.write_df(spark, merged, p, mode="overwrite")
    else:
        tmp = p + ".__build__"
        shutil.rmtree(tmp, ignore_errors=True)
        merged.write.mode("overwrite").option("compression", "zstd").parquet(tmp)
        old = p + ".__old__"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(p, old)
        os.rename(tmp, p)
        shutil.rmtree(old, ignore_errors=True)
    meta["compacted"] = True
    _write_meta(p, meta)
    _write_sigs(fact_path, meta, p)


def rebuild_agg_projection(spark: SparkSession, fact_path: str, name: str) -> None:
    """Crash recovery / non-incremental fallback: rebuild from the
    (idempotent-appended) base tables."""
    meta = agg_projection_meta(fact_path, name)
    if meta is None:
        return
    write_agg_projection(
        spark,
        fact_path,
        name=name,
        keys=meta["keys"],
        measures=meta["measures"],
        enrich=tuple(meta.get("enrich", ())),
        cluster_by=tuple(meta.get("cluster_by") or ()),
        where=meta.get("where"),
    )


def live_agg_frame(spark: SparkSession, fact_path: str, name: str) -> DataFrame | None:
    """The projection's defining aggregation computed LIVE from the base
    tables (same _enriched/_partials path as the writer) — the
    always-correct form a caller serves when the artifact is stale."""
    meta = agg_projection_meta(fact_path, name)
    if meta is None:
        return None
    return _partials(_enriched(spark, fact_path, meta), meta)


def _canon(df: DataFrame, meta: dict) -> DataFrame:
    """Comparison form: pair arrays sorted (concat order is
    batch-dependent and semantically irrelevant — consumers fold with
    commutative lambdas)."""
    cols = []
    pair_names = {m["name"] for m in meta["measures"] if m["agg"] == "pairs"}
    for c in df.columns:
        cols.append(F.array_sort(F.col(c)).alias(c) if c in pair_names else F.col(c))
    return df.select(*cols)


def check_agg_projection(
    spark: SparkSession, fact_path: str, name: str
) -> "list[str]":
    """Structural audit: the stored artifact, merged, must agree
    row-for-row with a live recompute of the defining aggregation
    (exceptAll both ways — a count match alone would pass corrupted
    measure values). Measures are integer-exact by declaration, so the
    compare is exact."""
    meta = agg_projection_meta(fact_path, name)
    if meta is None:
        return [f"agg projection {name}: missing _meta.json"]
    from columnar_spark import objstore

    stored = _merge(
        objstore.read_df(spark, agg_projection_path(fact_path, name)), meta
    )
    live = live_agg_frame(spark, fact_path, name)
    a = _canon(stored, meta).select(*sorted(stored.columns))
    b = _canon(live, meta).select(*sorted(stored.columns))
    bad = a.exceptAll(b).limit(1).count() + b.exceptAll(a).limit(1).count()
    if bad:
        return [
            f"agg projection {name}: stored groups disagree with live recompute"
        ]
    return []
