"""Table catalog: load the driver testdata star schema.

Reference parity: an MCL "table" is one columnar file addressed by dense
row-ids (SURVEY §1.1; columnar/columnar.h). Here a table is a Parquet
dataset; Spark partitions play the role of the reference's @rowid
pseudo-shards (columnar/columnar.cpp:599-636) — intra-query parallelism
by row ranges is Spark partitioning itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that should always be broadcast in joins.
BROADCAST_DIMS = {"region", "nation", "supplier", "customer", "part"}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str, register: bool = False) -> dict[str, DataFrame]:
    """Load every testdata table; optionally register as temp views."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        p = table_path(sf_dir, name)
        if not os.path.exists(p):
            continue
        df = spark.read.parquet(p)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
