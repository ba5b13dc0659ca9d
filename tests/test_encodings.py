"""A2-A7 encoding-chooser parity, verified on the written artifact.

The reference picks an int/string encoding per 64k block by data shape
(CONST / TABLE<=256-uniques / DELTA / GENERIC FOR+PFOR / HASH,
columnar/builder/builderint.h:31-40). This engine delegates the choice
to Parquet's writer, which makes the same class of decision per column
chunk: dictionary (RLE_DICTIONARY/PLAIN_DICTIONARY) when a value table
is small — the TABLE analog — and falls back to PLAIN + zstd when
cardinality defeats the dictionary (the GENERIC analog; zstd's entropy
stage captures what FOR/PFOR would). These tests pin that the
delegated chooser actually RESPONDS to data shape on our written
layout, rather than trusting it as a design note: same writer, two data
shapes, two different encodings — plus zone-map stats (A10) and zstd on
every chunk.
"""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from columnar_spark.writer import WriteSpec, write_table


def _chunk_meta(path):
    out = {}
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for i in range(rg.num_columns):
                c = rg.column(i)
                out.setdefault(c.path_in_schema, []).append(
                    (c.compression, set(c.encodings), c.statistics)
                )
    return out


def test_encoding_chooser_responds_to_data_shape(spark, tmp_path_factory):
    n = 50_000
    df = spark.range(n).select(
        F.col("id").alias("monotonic"),                      # unique ints
        (F.col("id") % 3).cast("int").alias("low_card_int"),  # TABLE-able
        F.concat(F.lit("tag_"), (F.col("id") % 5)).alias("low_card_str"),
        (F.xxhash64(F.col("id")) / 1e9).alias("high_card_float"),
        F.lit(7).alias("const_int"),                          # CONST-able
    )
    path = str(tmp_path_factory.mktemp("enc") / "t")
    write_table(df, path, WriteSpec(cluster_by=("monotonic",), num_partitions=2))

    meta = _chunk_meta(path)
    dict_encs = {"PLAIN_DICTIONARY", "RLE_DICTIONARY"}

    for col, chunks in meta.items():
        for compression, encodings, stats in chunks:
            assert compression == "ZSTD", (col, compression)
            assert stats is not None and stats.has_min_max, col  # A10 zone maps

    # TABLE analog: tiny value tables -> dictionary pages
    for col in ("low_card_int", "low_card_str", "const_int"):
        assert all(encs & dict_encs for _, encs, _ in meta[col]), col
    # GENERIC analog: unique values defeat the dictionary -> PLAIN + zstd
    assert all("PLAIN" in encs for _, encs, _ in meta["high_card_float"]), meta[
        "high_card_float"
    ]

    # zone maps must be usable: clustered column's per-chunk ranges are
    # narrow (disjoint-ish), the precondition for row-group pruning
    ranges = [
        (s.min, s.max) for _, _, s in meta["monotonic"]
    ]
    widths = [hi - lo for lo, hi in ranges]
    assert max(widths) < n  # no chunk spans the whole key space
