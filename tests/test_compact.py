"""Small-file compaction: fragment a table with per-batch appends (the
streaming-ingest pattern), compact, and verify file count, content
equality, invariants, and the refreshed stats manifest."""

import os

from pyspark.sql import functions as F

from columnar_spark.writer import WriteSpec, check_table, compact_table, stats_path


def _parquet_files(path):
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def test_compact_reduces_files_preserves_content(spark, tmp_path):
    path = str(tmp_path / "frag.parquet")
    # 40 micro-batch appends -> >=40 tiny files
    for i in range(40):
        spark.range(i * 10, (i + 1) * 10).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        ).write.mode("append").parquet(path)
    assert len(_parquet_files(path)) >= 40

    spec = WriteSpec(cluster_by=("id",))
    before_df = spark.read.parquet(path).orderBy("id").collect()
    nb, na = compact_table(spark, path, spec, rows_per_split=200)
    assert nb >= 40 and na == 2  # 400 rows / 200 per split

    after = spark.read.parquet(path)
    assert after.orderBy("id").collect() == before_df
    # write_table refreshed the stats manifest for the compacted table
    assert check_table(spark, path, spec) == []
    assert os.path.isdir(stats_path(path))


def test_compact_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "ok.parquet")
    spark.range(100).coalesce(1).write.parquet(path)
    nb, na = compact_table(spark, path, WriteSpec(), rows_per_split=1000)
    assert (nb, na) == (1, 1)
