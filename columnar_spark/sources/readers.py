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
