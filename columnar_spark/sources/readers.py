"""Format readers with declared schemas.

The engine's canonical storage is Parquet (writer.py); these readers
cover the ingest boundary — CSV / JSON lines / Parquet / ORC — with the
declared type system applied up front (no inference in production paths,
matching the reference's fixed build-time schema, SURVEY §1.2).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from columnar_spark.sources.schema import declare_schema

_FORMATS = {"csv", "json", "parquet", "orc"}


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str,
    attrs: Sequence[tuple[str, str]] | None = None,
    schema: T.StructType | None = None,
    **options,
) -> DataFrame:
    """Read `path` as `fmt` with a declared schema (attrs or StructType).
    CSV defaults to header=true; JSON is JSON-lines. Parquet/ORC embed
    their schema; a declared one is still enforced via cast-free select
    when provided."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {sorted(_FORMATS)}")
    if schema is None and attrs is not None:
        schema = declare_schema(attrs)

    reader = spark.read
    if fmt == "csv":
        options.setdefault("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None and fmt in ("csv", "json"):
        reader = reader.schema(schema)
    df = getattr(reader, fmt)(path)
    if schema is not None and fmt in ("parquet", "orc"):
        df = df.select(
            *[df[f.name].cast(f.dataType).alias(f.name) for f in schema.fields]
        )
    return df


_CORRUPT = "_corrupt_record"


def read_source_quarantined(
    spark: SparkSession,
    path: str,
    fmt: str,
    attrs: Sequence[tuple[str, str]] | None = None,
    schema: T.StructType | None = None,
    quarantine_path: str | None = None,
    **options,
) -> tuple[DataFrame, DataFrame]:
    """CSV / JSON-lines ingest with malformed-record quarantine.

    At 100 TB a single bad line must neither kill the job (FAILFAST)
    nor silently vanish (DROPMALFORMED): PERMISSIVE parsing captures
    each unparseable line verbatim in a corrupt-record column, and the
    batch splits into (good_rows, quarantined) — quarantined carrying
    the raw line plus its source file for triage. Pass
    `quarantine_path` to also persist the bad rows as parquet (append
    mode: one quarantine dir accumulates across ingest batches).

    Returns (good, bad). The parsed frame is cached for the split —
    Spark disallows filtering on the internal corrupt column of a
    streaming-fresh parse (SPARK-21610), and the ingest batch is about
    to be materialized anyway.
    """
    from pyspark.sql import functions as F

    if fmt not in ("csv", "json"):
        raise ValueError("quarantine ingest applies to csv/json (text formats)")
    if schema is None:
        if attrs is None:
            raise ValueError("a declared schema is required (attrs or schema)")
        schema = declare_schema(attrs)
    if _CORRUPT not in [f.name for f in schema.fields]:
        schema = T.StructType(
            list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
        )

    reader = spark.read
    if fmt == "csv":
        options.setdefault("header", "true")
    options["mode"] = "PERMISSIVE"
    options["columnNameOfCorruptRecord"] = _CORRUPT
    for k, v in options.items():
        reader = reader.option(k, v)
    reader = reader.schema(schema)
    # input_file_name must be captured on the scan itself — after the
    # cache the in-memory relation no longer knows the file
    df = (
        getattr(reader, fmt)(path)
        .withColumn("_source_file", F.input_file_name())
        .cache()
    )

    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT, "_source_file")
    bad = df.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_record"),
        F.col("_source_file").alias("source_file"),
    )
    if quarantine_path is not None:
        bad.write.mode("append").parquet(quarantine_path)
    return good, bad
