"""Z-order clustering: bit-interleaved layout keeps Parquet file/row-group
zone maps tight on EVERY cluster key, where lexicographic clustering only
prunes on the leading key."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from columnar_spark.writer import WriteSpec, write_table, zorder_key


def _files_overlapping(path, col, lo, hi):
    """How many parquet files could contain col in [lo, hi], per their
    column-chunk min/max stats (what a zone-map scan would open)."""
    n = 0
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                cmeta = md.row_group(rg).column(ci)
                if cmeta.path_in_schema == col and cmeta.statistics is not None:
                    s = cmeta.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            n += 1
    return n


def _grid(spark, n=40000):
    # two INDEPENDENT dimensions (a full 200x200 grid) — the case a
    # single-key sort can't serve
    return (
        spark.range(n)
        .select(
            F.col("id"),
            (F.col("id") % 200).alias("x"),
            ((F.col("id") / 200).cast("long") % 200).alias("y"),
        )
    )


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    df = _grid(spark)
    lin = str(tmp_path / "lin.parquet")
    zed = str(tmp_path / "zed.parquet")
    write_table(df, lin, WriteSpec(cluster_by=("x", "y"), num_partitions=16))
    write_table(df, zed, WriteSpec(cluster_by=("x", "y"), num_partitions=16, zorder=True))

    # leading key: both layouts prune hard
    assert _files_overlapping(zed, "x", 0, 9) <= 16 // 2
    assert _files_overlapping(lin, "x", 0, 9) <= 16 // 2
    # trailing key: lexicographic is blind (every file spans all y),
    # z-order still prunes
    lin_y = _files_overlapping(lin, "y", 0, 9)
    zed_y = _files_overlapping(zed, "y", 0, 9)
    assert lin_y == 16  # no pruning at all
    assert zed_y <= 8, (lin_y, zed_y)


def test_zorder_key_locality_and_nulls(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (0.0, 1000.0), (1000.0, 0.0), (1000.0, 1000.0), (None, 500.0)],
        "a: double, b: double",
    )
    rows = df.select("a", "b", zorder_key(df, ["a", "b"]).alias("z")).collect()
    z = {(r["a"], r["b"]): r["z"] for r in rows}
    # corners order: (0,0) < (1000,0),(0,1000) < (1000,1000)
    assert z[(0.0, 0.0)] < z[(1000.0, 0.0)] < z[(1000.0, 1000.0)]
    assert z[(0.0, 0.0)] < z[(0.0, 1000.0)] < z[(1000.0, 1000.0)]
    # null ranks as 0 on that dimension
    assert z[(None, 500.0)] < z[(1000.0, 1000.0)]


def test_zorder_rows_roundtrip(spark, tmp_path):
    df = _grid(spark, n=5000)
    path = str(tmp_path / "rt.parquet")
    write_table(df, path, WriteSpec(cluster_by=("x", "y"), num_partitions=8, zorder=True))
    got = spark.read.parquet(path)
    assert got.count() == 5000
    assert "__z" not in got.columns
    assert {r["id"] for r in got.collect()} == set(range(5000))
