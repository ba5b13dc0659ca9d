"""Table snapshots, time travel, and vacuum for copy-on-write rewrites.

Every COW maintenance pass in this engine (`operators/upsert.merge_into`,
`writer.compact_table`) rewrites the table beside itself and swaps
directories. Before this module the old directory was deleted at swap
time; now it is RETIRED — renamed (zero data copy) into a version area

    <table>.versions/
        log.json              # append-only version log
        v000001/data/         # full snapshot: the pre-rewrite table dir
        v000001/stats/        # its stats-manifest sidecar, if present

so any previous complete table state stays readable:

    read_table(spark, path)             # current
    read_table(spark, path, version=3)  # as of version 3 (pre-op state)
    history(path)                       # version log entries
    vacuum(path, retain_last=2)         # bound retention

Scale posture: retiring a snapshot is a single directory rename — O(1)
metadata work regardless of table size, the same trick Delta/Iceberg get
from immutable data files + a metadata log. Storage grows by one table
copy per retained rewrite (inherent to COW without file-level reuse);
`vacuum` is the retention knob. The log is tiny JSON handled driver-side
— never a Spark job.

The reference engine versions at the index-artifact level (its builder
rewrites immutable chunk files; `/root/reference/columnar/builder.cpp`
keeps old blocks valid until the new ones land); table-level time travel
is an engine-side addition the same way the training-pipeline operators
are.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def _versions_root(path: str) -> str:
    return path.rstrip("/") + ".versions"


def _log_path(path: str) -> str:
    return os.path.join(_versions_root(path), "log.json")


@dataclass
class VersionEntry:
    version: int
    op: str
    ts_unix: float
    n_rows: int | None  # rows of the RETIRED snapshot (pre-op state)
    fmt: str


def _read_log(path: str) -> list[dict]:
    lp = _log_path(path)
    if not os.path.exists(lp):
        return []
    with open(lp) as f:
        return json.load(f)


def _write_log(path: str, entries: list[dict]) -> None:
    os.makedirs(_versions_root(path), exist_ok=True)
    tmp = _log_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entries, f, indent=1)
    os.replace(tmp, _log_path(path))


def history(path: str) -> list[VersionEntry]:
    """Version log, oldest first. Each entry is a RETIRED pre-rewrite
    snapshot; the live table at `path` is always 'version log[-1]+1'."""
    return [VersionEntry(**e) for e in _read_log(path)]


def swap_with_history(
    path: str,
    tmp: str,
    op: str,
    fmt: str = "parquet",
    n_rows_before: int | None = None,
    stats_sidecar: str | None = None,
    tmp_stats: str | None = None,
) -> int:
    """Atomic-enough COW swap that retires the old table as a snapshot.

    Moves the current `path` (and its stats sidecar, when given) into
    `<path>.versions/v{N}/`, then moves `tmp` into place. Returns the
    retired snapshot's version number. Caller has already fully written
    `tmp` (and `tmp_stats`); every move here is a rename, no data copy.
    """
    entries = _read_log(path)
    version = (entries[-1]["version"] + 1) if entries else 1
    vdir = os.path.join(_versions_root(path), f"v{version:06d}")
    os.makedirs(vdir, exist_ok=True)

    shutil.move(path, os.path.join(vdir, "data"))
    if stats_sidecar and os.path.exists(stats_sidecar):
        shutil.move(stats_sidecar, os.path.join(vdir, "stats"))
    shutil.move(tmp, path)
    if tmp_stats and os.path.exists(tmp_stats):
        shutil.move(tmp_stats, stats_sidecar)

    entries.append(
        VersionEntry(
            version=version, op=op, ts_unix=time.time(), n_rows=n_rows_before, fmt=fmt
        ).__dict__
    )
    _write_log(path, entries)
    return version


def snapshot_data_path(path: str, version: int) -> str:
    vdir = os.path.join(_versions_root(path), f"v{version:06d}", "data")
    if not os.path.exists(vdir):
        raise FileNotFoundError(
            f"version {version} of {path} not found (vacuumed or never existed); "
            f"available: {[e['version'] for e in _read_log(path) if os.path.exists(os.path.join(_versions_root(path), 'v%06d' % e['version'], 'data'))]}"
        )
    return vdir


def read_table(
    spark: SparkSession, path: str, version: int | None = None, fmt: str = "parquet"
) -> DataFrame:
    """Current table, or the retired snapshot `version` (the table state
    BEFORE the op that created that version entry)."""
    if version is None:
        return getattr(spark.read, fmt)(path)
    entries = {e["version"]: e for e in _read_log(path)}
    f = entries.get(version, {}).get("fmt", fmt)
    return getattr(spark.read, f)(snapshot_data_path(path, version))


def restore(path: str, version: int, fmt: str = "parquet") -> int:
    """Roll the live table back to snapshot `version`. The snapshot is
    COPIED into place (it stays available in history) and the displaced
    current table is itself retired as a new snapshot — so a restore is
    just another audited rewrite, and restoring a restore works. Returns
    the version number the displaced table was retired under.

    The copy is driver-side file I/O here; on an object store it maps to
    server-side copy of immutable files."""
    src = snapshot_data_path(path, version)
    tmp = path.rstrip("/") + ".restore.tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    shutil.copytree(src, tmp)
    return swap_with_history(path, tmp, op=f"restore-v{version}", fmt=fmt)


def vacuum(path: str, retain_last: int = 1) -> list[int]:
    """Drop all but the newest `retain_last` snapshots; returns the
    removed version numbers. The log keeps every entry (audit trail) —
    only data directories are reclaimed."""
    entries = _read_log(path)
    keep = {e["version"] for e in entries[-retain_last:]} if retain_last > 0 else set()
    removed = []
    for e in entries:
        v = e["version"]
        vdir = os.path.join(_versions_root(path), f"v{v:06d}")
        if v not in keep and os.path.exists(vdir):
            shutil.rmtree(vdir)
            removed.append(v)
    return removed


def table_changes(
    spark: SparkSession,
    path: str,
    v_from: int | None,
    v_to: int | None,
    keys: list[str],
    fmt: str = "parquet",
) -> DataFrame:
    """Change feed between two table states: what a MERGE/backfill/
    restore actually did (Delta CDF analog, computed from retained
    snapshots instead of logged — COW keeps whole states, so the diff
    is derivable after the fact for any retained pair).

    `v_from`/`v_to` are version numbers as in `history()`; None means
    the live table. Returns one row per differing key with
    `_change_type` in {'insert','delete','update_preimage',
    'update_postimage'} followed by that side's columns (update rows
    appear twice, pre+post — the Delta CDF shape).

    Plan: full outer join on `keys` + row-fingerprint comparison
    (xxhash64 over the non-key columns) — one shuffle per side, no
    driver-side state; scales like any keyed join.
    """
    from pyspark.sql import functions as F

    old = read_table(spark, path, v_from, fmt)
    new = read_table(spark, path, v_to, fmt)
    common = [c for c in old.columns if c in new.columns]
    payload = [c for c in common if c not in keys]

    def fp(df):
        cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in payload]
        return df.select(
            *[F.col(k) for k in keys],
            F.xxhash64(*cols).alias("__fp"),
            F.struct(*[F.col(c) for c in common]).alias("__row"),
        )

    o, n = fp(old).alias("o"), fp(new).alias("n")
    j = o.join(n, keys, "full_outer")
    deleted = j.filter(F.col("n.__fp").isNull()).select(
        F.lit("delete").alias("_change_type"), F.col("o.__row").alias("__row")
    )
    inserted = j.filter(F.col("o.__fp").isNull()).select(
        F.lit("insert").alias("_change_type"), F.col("n.__row").alias("__row")
    )
    changed = j.filter(
        F.col("o.__fp").isNotNull()
        & F.col("n.__fp").isNotNull()
        & (F.col("o.__fp") != F.col("n.__fp"))
    )
    pre = changed.select(
        F.lit("update_preimage").alias("_change_type"), F.col("o.__row").alias("__row")
    )
    post = changed.select(
        F.lit("update_postimage").alias("_change_type"), F.col("n.__row").alias("__row")
    )
    out = deleted.unionByName(inserted).unionByName(pre).unionByName(post)
    return out.select("_change_type", "__row.*")
