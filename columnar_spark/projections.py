"""Denormalized join projections — pre-joined fact⋈dim sidecars.

The reference answers joins per-query; at 100 TB the dominant cost of the
orders⋈lineitem query family is re-paying the same FK join (a full
shuffle of the fact table, or a giant broadcast) on every query. This
module materializes the join ONCE at ingest into a column-pruned,
re-clustered projection — the SSB "lineorder" flattening / Vertica
pre-join projection pattern — and maintains it incrementally on appends.

Scale posture:
- the projection stores only the declared dim columns beside the fact
  columns (column-pruned, ~1.1-1.3x the fact table at rest), clustered
  by the dominant predicate column (o_orderdate) so date filters prune
  row groups the base layout cannot;
- append-only maintenance is EXACT delta algebra: when a fact batch ΔF
  lands, ΔF⋈D_current appends; when a dim batch ΔD lands, F_current⋈ΔD
  appends. Applied serially (the ledgered writer lock already enforces
  one writer per table), the increments sum to exactly Δ(F⋈D):
  ΔF⋈D_old + (F_old+ΔF)⋈ΔD = Δ(F⋈D) for append-only tables;
- the freshness gate records BOTH constituent tables' signatures
  (stats.table_signature); either table rewritten outside the
  framework's append/DML paths makes the projection stale and callers
  fall back to the live join, which is always correct.

The projection is an INNER join: serving a query from it is valid for
exactly the query shapes that inner-join the same tables on the same key
(every TPC-H-style orders⋈lineitem query here). Queries check the
required columns against the projection's declared column set before
routing (meta `columns`), so a projection can never serve a query it
does not cover.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from columnar_spark.stats import index_is_fresh, table_signature

PROJ_SUFFIX = ".proj"


def projection_root(fact_path: str) -> str:
    return fact_path.rstrip("/") + PROJ_SUFFIX


def projection_path(fact_path: str, name: str) -> str:
    return os.path.join(projection_root(fact_path), name)


def projection_meta(fact_path: str, name: str) -> dict | None:
    from columnar_spark import objstore

    return objstore.read_json(projection_path(fact_path, name), "_meta.json")


def _dim_abspath(fact_path: str, meta: dict) -> str:
    """Dim path is stored relative to the layout dir (the fact table's
    parent) so a relocated/copied layout keeps working."""
    return os.path.join(os.path.dirname(os.path.abspath(fact_path)), meta["dim"])


def _write_sigs(fact_path: str, dim_path: str, proj_dir: str) -> None:
    from columnar_spark import objstore

    objstore.put_json(
        proj_dir,
        "_table_sig.json",
        {"fact": table_signature(fact_path), "dim": table_signature(dim_path)},
    )


def _sigs_fresh(fact_path: str, dim_path: str, proj_dir: str) -> bool:
    from columnar_spark import objstore

    rec = objstore.read_json(proj_dir, "_table_sig.json")
    if rec is None:
        return False
    for key, path in (("fact", fact_path), ("dim", dim_path)):
        live = table_signature(path)
        got = rec.get(key) or {}
        if any(got.get(k) != live[k] for k in ("files", "bytes", "max_mtime_ms")):
            return False
    return True


def _project(fact_df: DataFrame, dim_df: DataFrame, meta: dict) -> DataFrame:
    """The canonical joined projection — ONE code path shared by the full
    build, both delta merges, and the checker's recount, so every serving
    mode materializes identical rows."""
    from pyspark.sql import functions as F

    dim = dim_df.select(
        meta["dim_key"],
        *[c for c in meta["dim_cols"] if c != meta["dim_key"]],
    )
    if meta["fact_key"] == meta["dim_key"]:
        # equal key names make an unqualified equality self-referential
        # (ambiguous at analysis); rename the dim side for the join only —
        # the select below reads the shared name from the fact side, whose
        # values the inner equality guarantees identical
        dim = dim.withColumnRenamed(meta["dim_key"], "__proj_dim_key")
        joined = fact_df.join(
            dim, F.col(meta["fact_key"]) == F.col("__proj_dim_key")
        ).drop("__proj_dim_key")
    else:
        joined = fact_df.join(
            dim, F.col(meta["fact_key"]) == F.col(meta["dim_key"])
        )
    return joined.select(*meta["columns"])


def write_join_projection(
    spark: SparkSession,
    fact_path: str,
    dim_path: str,
    *,
    name: str,
    fact_key: str,
    dim_key: str,
    dim_cols: "tuple[str, ...]",
    fact_cols: "tuple[str, ...] | None" = None,
    cluster_by: "tuple[str, ...]" = (),
    num_partitions: int | None = None,
) -> None:
    """Full (re)build: one fact scan, one join, one clustered write.
    Used by first-time ingest and crash recovery; appends go through
    merge_projection_fact_delta / merge_projection_dim_delta."""
    from columnar_spark import objstore

    objstore.require_transport(fact_path)
    fact_df = spark.read.parquet(fact_path)
    dim_df = spark.read.parquet(dim_path)
    fcols = list(fact_cols) if fact_cols is not None else list(fact_df.columns)
    meta = {
        "dim": os.path.relpath(
            os.path.abspath(dim_path), os.path.dirname(os.path.abspath(fact_path))
        ),
        "fact_key": fact_key,
        "dim_key": dim_key,
        "dim_cols": list(dim_cols),
        "columns": fcols + [c for c in dim_cols if c not in fcols],
        "cluster_by": list(cluster_by),
    }
    proj = _project(fact_df, dim_df, meta)
    p = projection_path(fact_path, name)
    if cluster_by:
        if num_partitions is None:
            from columnar_spark.writer import ROWS_PER_SPLIT

            width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
            num_partitions = max(
                1, min(width, fact_df.count() // ROWS_PER_SPLIT + 1)
            )
        from pyspark.sql import functions as F

        proj = proj.repartitionByRange(
            num_partitions, *[F.col(c) for c in cluster_by]
        ).sortWithinPartitions(*cluster_by)
    if objstore.is_object_store(fact_path):
        # staging + atomic manifest-pointer commit (objstore.py)
        objstore.write_df(spark, proj, p, mode="overwrite")
    else:
        proj.write.mode("overwrite").option("compression", "zstd").parquet(p)
    objstore.put_json(p, "_meta.json", meta)
    _write_sigs(fact_path, _dim_abspath(fact_path, meta), p)


def load_join_projection(
    spark: SparkSession, fact_path: str, name: str, check_fresh: bool = True
) -> DataFrame | None:
    """The persisted projection, or None when absent or STALE (either
    constituent table rewritten outside the framework) — callers fall
    back to the live join, which is always correct."""
    from columnar_spark import objstore

    p = projection_path(fact_path, name)
    meta = projection_meta(fact_path, name)
    if meta is None or ("://" not in p and not os.path.isdir(p)):
        return None
    if check_fresh and not _sigs_fresh(fact_path, _dim_abspath(fact_path, meta), p):
        return None
    return objstore.read_df(spark, p)


def projections_on(fact_path: str) -> "list[str]":
    """Names of projections whose FACT side is this table."""
    from columnar_spark import objstore

    root = projection_root(fact_path)
    if "://" not in root and not os.path.isdir(root):
        return []
    return sorted(
        d
        for d in objstore.list_names(root)
        if objstore.read_json(os.path.join(root, d), "_meta.json") is not None
    )


def projections_referencing_dim(dim_path: str) -> "list[tuple[str, str]]":
    """(fact_path, name) of projections in the same layout dir whose DIM
    side is this table — a directory listing, no data read."""
    layout = os.path.dirname(os.path.abspath(dim_path))
    out = []
    try:
        entries = os.listdir(layout)
    except OSError:
        return []
    for e in entries:
        if not e.endswith(PROJ_SUFFIX):
            continue
        fact_path = os.path.join(layout, e[: -len(PROJ_SUFFIX)])
        for name in projections_on(fact_path):
            meta = projection_meta(fact_path, name)
            if meta is not None and os.path.abspath(
                _dim_abspath(fact_path, meta)
            ) == os.path.abspath(dim_path):
                out.append((fact_path, name))
    return out


def _stale_before_append(
    fact_path: str,
    dim_path: str,
    proj_dir: str,
    changed: str,
    pre_sig: "dict | None",
) -> bool:
    """True when the artifact did not match the table state just before
    the current append (`pre_sig` = the changed side's signature
    captured pre-append by the ingest fold; `changed` is "fact" or
    "dim") — folding a delta onto an already-stale artifact would mask
    an out-of-band rewrite, because _write_sigs re-stamps from the
    post-append state. None pre_sig (direct callers) skips the check."""
    if pre_sig is None:
        return False
    from columnar_spark import objstore

    rec = objstore.read_json(proj_dir, "_table_sig.json")
    if rec is None:
        return True
    for key, path in (("fact", fact_path), ("dim", dim_path)):
        expected = pre_sig if key == changed else table_signature(path)
        got = rec.get(key) or {}
        if any(got.get(k) != expected.get(k) for k in ("files", "bytes", "max_mtime_ms")):
            return True
    return False


def merge_projection_fact_delta(
    spark: SparkSession,
    fact_path: str,
    name: str,
    delta: DataFrame,
    pre_sig: "dict | None" = None,
) -> None:
    """Fold one appended fact batch in: ΔF ⋈ D_current appends — O(batch)
    fact-side work, the dim side is read but never rewritten. A
    pre-existing staleness (vs the fact's pre-append signature from the
    ingest fold) rebuilds instead of masking."""
    meta = projection_meta(fact_path, name)
    if meta is None:
        return
    dim_path = _dim_abspath(fact_path, meta)
    p = projection_path(fact_path, name)
    if _stale_before_append(fact_path, dim_path, p, "fact", pre_sig):
        rebuild_projection(spark, fact_path, name)
        return
    from columnar_spark import objstore

    dim_df = spark.read.parquet(dim_path)
    batch = _project(delta, dim_df, meta)
    if objstore.is_object_store(fact_path):
        objstore.write_df(spark, batch, p, mode="append")
    else:
        batch.write.mode("append").parquet(p)
    _write_sigs(fact_path, dim_path, p)


def merge_projection_dim_delta(
    spark: SparkSession,
    fact_path: str,
    name: str,
    delta: DataFrame,
    pre_sig: "dict | None" = None,
) -> None:
    """Fold one appended dim batch in: F_current ⋈ ΔD appends. With the
    fact-delta rule and serial application (the per-table writer lock),
    the two increments sum to exactly Δ(F⋈D) for append-only tables."""
    meta = projection_meta(fact_path, name)
    if meta is None:
        return
    dim_path = _dim_abspath(fact_path, meta)
    p = projection_path(fact_path, name)
    if _stale_before_append(fact_path, dim_path, p, "dim", pre_sig):
        rebuild_projection(spark, fact_path, name)
        return
    from columnar_spark import objstore

    fact_df = spark.read.parquet(fact_path)
    batch = _project(fact_df, delta, meta)
    if objstore.is_object_store(fact_path):
        objstore.write_df(spark, batch, p, mode="append")
    else:
        batch.write.mode("append").parquet(p)
    _write_sigs(fact_path, dim_path, p)


def live_join_frame(spark: SparkSession, fact_path: str, name: str) -> DataFrame | None:
    """The projection's defining join computed LIVE from the base tables
    (same _project code path as the writer) — the always-correct form a
    caller serves when the stored artifact is stale."""
    meta = projection_meta(fact_path, name)
    if meta is None:
        return None
    return _project(
        spark.read.parquet(fact_path),
        spark.read.parquet(_dim_abspath(fact_path, meta)),
        meta,
    )


def rebuild_projection(spark: SparkSession, fact_path: str, name: str) -> None:
    """Crash recovery: a previous append died mid-application, so the
    incremental merge cannot know whether this projection absorbed the
    batch — rebuild from the (idempotent-appended) base tables."""
    meta = projection_meta(fact_path, name)
    if meta is None:
        return
    fact_df = spark.read.parquet(fact_path)
    fcols = [c for c in meta["columns"] if c in fact_df.columns]
    write_join_projection(
        spark,
        fact_path,
        _dim_abspath(fact_path, meta),
        name=name,
        fact_key=meta["fact_key"],
        dim_key=meta["dim_key"],
        dim_cols=tuple(meta["dim_cols"]),
        fact_cols=tuple(fcols),
        cluster_by=tuple(meta.get("cluster_by") or ()),
    )


def check_projection(
    spark: SparkSession, fact_path: str, name: str
) -> "list[str]":
    """Structural audit: the stored projection must agree ROW-FOR-ROW
    with a live recompute of the defining join (exceptAll both ways,
    like the textstats/dedupsig checkers) — a per-key count match alone
    would pass a projection whose dim attribute VALUES were corrupted."""
    meta = projection_meta(fact_path, name)
    errors: list[str] = []
    if meta is None:
        return [f"projection {name}: missing _meta.json"]
    from columnar_spark import objstore

    stored = objstore.read_df(spark, projection_path(fact_path, name)).select(
        *meta["columns"]
    )
    live = _project(
        spark.read.parquet(fact_path),
        spark.read.parquet(_dim_abspath(fact_path, meta)),
        meta,
    )
    bad = (
        stored.exceptAll(live).limit(1).count()
        + live.exceptAll(stored).limit(1).count()
    )
    if bad:
        errors.append(
            f"projection {name}: stored join rows disagree with live recompute"
        )
    return errors
