"""columnar-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of manticoresoftware/columnar (MCL).

This is NOT a port of the reference C++/Rust libraries. The reference
(see SURVEY.md) is a columnar storage + secondary-index + KNN library whose
host daemon supplies SQL. Here the same capability set is re-expressed
Spark-first:

- storage/encodings (reference columnar/builder/*)      -> writer.py (Parquet
  with clustering, dictionary/zstd, sorted MVA invariant, stats manifest)
- pushed-down filter surface (reference columnar/accessor/* "analyzers",
  common/filter.h)                                      -> filters.py
- zone maps / estimates / index-covered counts (reference secondary/*,
  columnar.cpp EstimateMinMax)                          -> stats.py
- KNN / vector search (reference knn/*)                 -> operators/knn.py
- embeddings & training-data pipeline ops (reference embeddings/*, plus
  north-star extras)                                    -> functions/,
  operators/dedup.py, multimodal.py
- everything the reference delegates to its host daemon (joins, aggs,
  windows, sorts)                                       -> Spark SQL builtins,
  exercised by the declared queries in __spark_entry__.py
"""

from columnar_spark.session import ext_jar_path, get_spark, tune
from columnar_spark.catalog import TABLES, load_tables
from columnar_spark.filters import (
    Filter,
    FilterType,
    MvaAggr,
    compile_filter,
    compile_filters,
)
from columnar_spark.stats import (
    write_json_field_index,
    write_posting_index,
    write_value_index,
)
from columnar_spark.operators.upsert import (
    alter_add_column,
    alter_drop_column,
    delete_where,
    merge_into,
    reindex_table,
    truncate_table,
    update_set,
)
from columnar_spark.table import Engine
from columnar_spark.writer import (
    WriteSpec,
    build_sf_layout,
    check_table,
    drop_stale_sidecars,
    write_table,
)

__all__ = [
    "get_spark",
    "tune",
    "ext_jar_path",
    "TABLES",
    "load_tables",
    "Filter",
    "FilterType",
    "MvaAggr",
    "compile_filter",
    "compile_filters",
    "Engine",
    "WriteSpec",
    "write_table",
    "check_table",
    "build_sf_layout",
    "write_value_index",
    "write_posting_index",
    "write_json_field_index",
    "delete_where",
    "merge_into",
    "update_set",
    "truncate_table",
    "alter_add_column",
    "alter_drop_column",
    "reindex_table",
    "drop_stale_sidecars",
]

__version__ = "0.1.0"
