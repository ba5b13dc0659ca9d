"""Text-feature companion sidecar (computed columns at rest).

Pins the contract that makes sidecar serving safe: the writer, the
incremental merge, and the live query path all evaluate the SAME
text_features projection, so a query served from the sidecar is
row-for-row identical to the live computation; staleness (base table
rewritten outside the framework) falls back to live."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.stats import index_is_fresh
from columnar_spark.textstats import (
    load_textstats,
    merge_textstats,
    text_features,
    textstats_path,
    write_textstats_sidecar,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture()
def table(spark, tmp_path):
    """A private copy of the documents table (we mutate it)."""
    p = str(tmp_path / "documents.parquet")
    _docs(spark).write.parquet(p)
    return p


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("doc_id").collect()]


def test_sidecar_matches_live_projection(spark, table):
    write_textstats_sidecar(spark, table)
    side = load_textstats(spark, table)
    assert side is not None
    live = text_features(spark.read.parquet(table))
    assert _sorted_rows(side) == _sorted_rows(live)
    # schema parity too: serving must not change types
    assert side.schema == live.schema


def test_stale_sidecar_refused(spark, table):
    write_textstats_sidecar(spark, table)
    assert load_textstats(spark, table) is not None
    # out-of-band rewrite: append a parquet file without the framework
    spark.createDataFrame(
        [(99991, "some new text body here", "en", "t", 23)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("append").parquet(table)
    assert not index_is_fresh(table, textstats_path(table))
    assert load_textstats(spark, table) is None  # falls back to live


def test_incremental_merge_equals_rebuild(spark, table):
    write_textstats_sidecar(spark, table)
    delta = spark.createDataFrame(
        [
            (99901, "the quick brown fox jumps over the lazy dog", "en", "t", 44),
            (99902, "le chat est sur la table et le chien dort", "fr", "t", 41),
            (99903, "", "en", "t", 0),
            (99904, "   ", "en", "t", 3),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    delta.write.mode("append").parquet(table)
    merge_textstats(spark, table, delta)
    side = load_textstats(spark, table)
    assert side is not None  # merge refreshed the signature
    live = text_features(spark.read.parquet(table))
    assert _sorted_rows(side) == _sorted_rows(live)


def test_query_serves_sidecar_bit_identical(spark, table, tmp_path):
    """doc_text_stats / doc_lang_fingerprint / doc_quality_filter return
    the same rows with and without the sidecar."""
    import __spark_entry__ as entry

    sf_dir = str(tmp_path)  # table already lives at {tmp_path}/documents.parquet
    qs = entry.queries()
    before = {
        n: _sorted_rows(qs[n](spark, sf_dir))
        for n in ("doc_text_stats", "doc_lang_fingerprint", "doc_quality_filter")
    }
    write_textstats_sidecar(spark, table)
    assert load_textstats(spark, table) is not None
    for n, rows in before.items():
        assert _sorted_rows(qs[n](spark, sf_dir)) == rows, n


def test_edge_rows_exact(spark, tmp_path):
    """Empty / whitespace / unicode-space / punctuation-only documents
    produce the same features through the sidecar as live."""
    p = str(tmp_path / "docs.parquet")
    df = spark.createDataFrame(
        [
            ("a", ""),
            ("b", " \t\n"),
            ("c", "!!! ??? ..."),
            ("d", "word"),
            ("e", " nbsp separated"),  # NBSP is NOT ASCII whitespace
        ],
        "doc_id string, text string",
    )
    df.write.parquet(p)
    write_textstats_sidecar(spark, p)
    side = load_textstats(spark, p)
    live = text_features(spark.read.parquet(p))
    assert _sorted_rows(side) == _sorted_rows(live)
