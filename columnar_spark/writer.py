"""Ingest / build path — reference §2.A parity (SURVEY P1).

The reference's columnar builder (columnar/builder.cpp:54-184) takes
row-at-a-time appends, chooses per-64K-block encodings from observed stats
(builderint.cpp:213-225), maintains a min/max zone-map tree
(builderminmax.h:25-146), sorts MVA sets, and optionally writes a hidden
`$name_HASH` companion column for strings (builder.cpp:83-87).

Spark-first equivalents, declared at the capability level (encoded size /
scan speed / skipping), not byte level:

- encodings: Parquet dictionary / RLE / delta + zstd page compression —
  chosen automatically per column chunk, the analog of the per-block
  CONST/TABLE/DELTA/GENERIC chooser;
- zone maps: Parquet row-group + page statistics, written automatically;
  amplified by clustering (`repartitionByRange` + `sortWithinPartitions`
  on the declared cluster key) so range predicates prune row groups —
  the analog of the reference's row-id-local minmax tree;
- sorted-MVA invariant: `array_sort` applied at write (accessormva.cpp
  front/back range test relies on sortedness);
- string-hash companion: optional `<col>__hash` xxhash64 column
  (builderint.cpp:446-466 analog) for cheap equality joins / dedup keys;
- structural checker (reference check.cpp:316) -> `check_table`:
  validates sortedness invariants and stats-manifest consistency.

Scale posture: the writer is a pure DataFrame transform + one
`repartitionByRange` shuffle; nothing driver-side. `target_file_rows`
controls output file granularity the way DOCS_PER_BLOCK=64K controls the
reference's block granularity (buildertraits.h:34-35).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_spark.stats import build_stats_manifest


@dataclass
class WriteSpec:
    """Declarative table layout — the analog of the reference's build-time
    Schema_t + Settings_t (common/schema.h:48-56, buildertraits.h:34-42)."""

    cluster_by: Sequence[str] = field(default_factory=tuple)
    sort_within: Sequence[str] = field(default_factory=tuple)
    mva_cols: Sequence[str] = field(default_factory=tuple)
    hash_cols: Sequence[str] = field(default_factory=tuple)
    # per-column Parquet Bloom filters — the secondary-index point-lookup
    # knob (reference A11/E2 analog at the storage layer)
    bloom_cols: Sequence[str] = field(default_factory=tuple)
    compression: str = "zstd"
    num_partitions: int | None = None
    format: str = "parquet"  # parquet | orc


def normalize(df: DataFrame, spec: WriteSpec) -> DataFrame:
    """Apply write-time invariants: sorted MVA arrays, hash companions."""
    for c in spec.mva_cols:
        df = df.withColumn(c, F.array_sort(F.col(c)))
    for c in spec.hash_cols:
        df = df.withColumn(f"{c}__hash", F.xxhash64(F.col(c)))
    return df


def write_table(df: DataFrame, path: str, spec: WriteSpec | None = None) -> None:
    """Normalize, cluster, and write Parquet + stats manifest."""
    spec = spec or WriteSpec()
    out = normalize(df, spec)
    if spec.cluster_by:
        n = spec.num_partitions or int(
            out.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        out = out.repartitionByRange(n, *[F.col(c) for c in spec.cluster_by])
        sort_cols = list(spec.sort_within) or list(spec.cluster_by)
        out = out.sortWithinPartitions(*sort_cols)
    if spec.format not in ("parquet", "orc"):
        raise ValueError("format must be parquet or orc")
    w = out.write.mode("overwrite").option("compression", spec.compression)
    for c in spec.bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
    getattr(w, spec.format)(path)
    # Stats manifest sidecar — the D1-D5/E7 surface for the planner.
    manifest = build_stats_manifest(getattr(df.sparkSession.read, spec.format)(path))
    manifest.write.mode("overwrite").parquet(stats_path(path))


def stats_path(table_path: str) -> str:
    return table_path.rstrip("/") + ".stats"


def check_table(
    spark: SparkSession, path: str, spec: WriteSpec | None = None
) -> list[str]:
    """Structural integrity checker — CheckColumnarStorage analog
    (columnar/accessor/check.cpp:316-322). Returns a list of violations
    (empty = clean): sorted-MVA invariant, hash-companion consistency,
    stats-manifest row count agreement."""
    spec = spec or WriteSpec()
    errors: list[str] = []
    df = getattr(spark.read, spec.format)(path)

    for c in spec.mva_cols:
        bad = df.filter(
            F.col(c).isNotNull() & (F.col(c) != F.array_sort(F.col(c)))
        ).count()
        if bad:
            errors.append(f"mva column {c}: {bad} rows violate sorted invariant")
    for c in spec.hash_cols:
        h = f"{c}__hash"
        if h not in df.columns:
            errors.append(f"hash companion {h} missing")
            continue
        bad = df.filter(F.col(h) != F.xxhash64(F.col(c))).count()
        if bad:
            errors.append(f"hash companion {h}: {bad} rows inconsistent")

    try:
        manifest = spark.read.parquet(stats_path(path))
        mrows = {r["column"]: r for r in manifest.collect()}
        n = df.count()
        for c, r in mrows.items():
            if r["row_count"] != n:
                errors.append(
                    f"stats manifest {c}: row_count {r['row_count']} != table {n}"
                )
    except Exception:
        errors.append("stats manifest missing or unreadable")
    return errors
