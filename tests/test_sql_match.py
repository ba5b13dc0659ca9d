"""Engine.sql MATCH() surface — the daemon's fulltext query shape:
WEIGHT() ranking, attribute-predicate composition (filter-then-rank),
LIMIT cutoff, boolean/phrase OPTION modes, sidecar parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators import fulltext as FT
from columnar_spark.table import Engine

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, SF)


def test_match_bm25_weight_and_limit(eng, spark):
    got = eng.sql(
        "SELECT doc_id, WEIGHT() FROM documents WHERE MATCH('vector scan') LIMIT 5"
    ).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = FT.bm25_search(docs, "vector scan", k=5).collect()
    assert [(r.doc_id, r.weight) for r in got] == [(r.doc_id, r.score) for r in want]


def test_match_with_attribute_predicate_filters_then_ranks(eng, spark):
    got = eng.sql(
        "SELECT doc_id, WEIGHT(), lang FROM documents "
        "WHERE MATCH('vector scan') AND lang = 'en' LIMIT 5"
    ).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = FT.bm25_search(
        docs.filter(F.col("lang") == "en"), "vector scan", k=5
    ).collect()
    assert [(r.doc_id, r.weight) for r in got] == [(r.doc_id, r.score) for r in want]
    assert all(r.lang == "en" for r in got)


def test_match_star_and_alias(eng, spark):
    got = eng.sql(
        "SELECT *, WEIGHT() AS w FROM documents WHERE MATCH('vector') LIMIT 3"
    )
    base_cols = spark.read.parquet(f"{SF}/documents.parquet").columns
    assert got.columns == base_cols + ["w"]
    rows = got.collect()
    assert len(rows) == 3
    assert rows[0].w >= rows[1].w >= rows[2].w


def test_match_boolean_mode_deterministic_cutoff(eng, spark):
    got = eng.sql(
        "SELECT doc_id FROM documents WHERE MATCH('vector AND scan') "
        "LIMIT 7 OPTION mode=boolean"
    ).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = (
        FT.match_boolean(docs, "vector AND scan")
        .orderBy("doc_id")
        .limit(7)
        .collect()
    )
    assert [r.doc_id for r in got] == [r.doc_id for r in want]


def test_weight_refused_outside_bm25(eng):
    with pytest.raises(ValueError, match="WEIGHT"):
        eng.sql(
            "SELECT doc_id, WEIGHT() FROM documents WHERE MATCH('vector') "
            "OPTION mode=boolean"
        )


def test_match_serves_persisted_sidecar(spark, tmp_path):
    d = tmp_path
    t = str(d / "documents.parquet")
    spark.read.parquet(f"{SF}/documents.parquet").limit(200).write.parquet(t)
    FT.write_text_index(spark, t)
    e = Engine(spark, str(d))
    got = e.sql(
        "SELECT doc_id, WEIGHT() FROM documents WHERE MATCH('vector scan') LIMIT 5"
    ).collect()
    want = FT.bm25_search(
        spark.read.parquet(t), "vector scan", k=5
    ).collect()
    assert [(r.doc_id, r.weight) for r in got] == [(r.doc_id, r.score) for r in want]


def test_match_highlight_respects_indexed_text_col(spark, tmp_path):
    """HIGHLIGHT() must snippet the text index's registered text column,
    not a hardcoded 'text' — a table whose prose lives under another
    name (here 'body', plus a decoy 'text' column) fails or mis-snips
    otherwise."""
    d = tmp_path
    t = str(d / "documents.parquet")
    (
        spark.read.parquet(f"{SF}/documents.parquet")
        .limit(50)
        .withColumnRenamed("text", "body")
        .withColumn("text", F.lit("decoy column with no query terms"))
        .write.parquet(t)
    )
    FT.write_text_index(spark, t, text_col="body")
    e = Engine(spark, str(d))
    rows = e.sql(
        "SELECT doc_id, HIGHLIGHT() FROM documents WHERE MATCH('vector scan') LIMIT 3"
    ).collect()
    assert rows
    for r in rows:
        assert "<b>" in r.highlight  # snips the indexed column, not the decoy
        inner = r.highlight.split("<b>")[1].split("</b>")[0].lower()
        assert inner in ("vector", "scan")


def test_non_match_sql_unaffected(eng):
    row = eng.sql("SELECT COUNT(*) AS n FROM region").collect()[0]
    assert row.n == 5


def test_match_highlight(eng):
    rows = eng.sql(
        "SELECT doc_id, HIGHLIGHT(), WEIGHT() FROM documents "
        "WHERE MATCH('vector scan') LIMIT 4"
    ).collect()
    assert len(rows) == 4
    for r in rows:
        assert "<b>" in r.highlight and "</b>" in r.highlight
        inner = r.highlight.split("<b>")[1].split("</b>")[0].lower()
        assert inner in ("vector", "scan")


def test_match_highlight_alias_and_wraps_all_terms(eng, spark):
    rows = eng.sql(
        "SELECT doc_id, HIGHLIGHT() AS snip FROM documents "
        "WHERE MATCH('vector') LIMIT 2"
    ).collect()
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()}
    for r in rows:
        assert "vector" in docs[r.doc_id].lower()
        # every visible occurrence of the term inside the snippet is wrapped
        assert "<b>" in r.snip
        stripped = r.snip.replace("<b>", "").replace("</b>", "")
        assert "vector" in stripped.lower()


def test_match_facet_clause(eng, spark):
    got = eng.sql(
        "SELECT doc_id FROM documents WHERE MATCH('vector scan') FACET lang"
    ).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = (
        FT.facet_counts(docs, "vector scan", ["lang"])
        .orderBy("facet", "value")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert all(r.facet == "lang" and r.cnt > 0 for r in got)


def test_match_facet_with_predicate_and_multi_col(eng, spark):
    got = eng.sql(
        "SELECT doc_id FROM documents WHERE MATCH('vector') AND lang = 'en' "
        "FACET lang, source"
    ).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(F.col("lang") == "en")
    want = (
        FT.facet_counts(docs, "vector", ["lang", "source"])
        .orderBy("facet", "value")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_match_facet_refused_outside_bm25(eng):
    with pytest.raises(ValueError, match="FACET"):
        eng.sql(
            "SELECT doc_id FROM documents WHERE MATCH('vector') "
            "FACET lang OPTION mode=boolean"
        )


def test_call_suggest_and_qsuggest(eng, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = eng.sql("CALL SUGGEST('vectr', 'documents')").collect()
    want = FT.spell_suggest(docs, "vectr").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert any("vector" in tuple(map(str, r)) for r in got)

    got = eng.sql("CALL QSUGGEST('vec', 'documents')").collect()
    want = FT.keyword_suggest(docs, "vec").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_call_keywords_plain_and_analyzed(eng, spark, tmp_path):
    rows = eng.sql("CALL KEYWORDS('Vector SCAN', 'documents')").collect()
    assert [(r.keyword, r.normalized) for r in rows] == [
        ("Vector", "vector"),
        ("SCAN", "scan"),
    ]
    # against a stemmed/stopworded sidecar the normalized form follows
    # the index's analyzer (stopwords echo as '')
    t = str(tmp_path / "documents.parquet")
    spark.read.parquet(f"{SF}/documents.parquet").limit(100).write.parquet(t)
    FT.write_text_index(spark, t, analyzer={"stem": True, "stopwords": ["the"]})
    e = Engine(spark, str(tmp_path))
    rows = e.sql("CALL KEYWORDS('the tables', 'documents')").collect()
    assert rows[0].keyword == "the" and rows[0].normalized == ""
    # the sidecar's s-stemmer strips the plural
    assert rows[1].keyword == "tables" and rows[1].normalized == "table"


def test_show_tables(eng):
    rows = {r.table: r.row_count for r in eng.sql("SHOW TABLES").collect()}
    assert "region" in rows and "documents" in rows and "lineitem" in rows


def test_plain_select_facet(eng, spark):
    """FACET after a plain (non-MATCH) SELECT — the daemon allows FACET
    on any query; single-frame adaptation returns the facet counts over
    the WHERE-filtered set."""
    got = {
        (r.facet, r.value): r.cnt
        for r in eng.sql(
            "SELECT doc_id FROM documents WHERE lang = 'en' FACET source"
        ).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(F.col("lang") == "en")
    want = {
        ("source", str(r["source"])): r["count"]
        for r in docs.groupBy("source").count().collect()
    }
    assert got == want
    # multi-column, no WHERE
    two = eng.sql("SELECT doc_id FROM documents FACET lang, source").collect()
    facets = {r.facet for r in two}
    assert facets == {"lang", "source"}


def test_plain_facet_with_limit(eng, spark):
    rows = eng.sql("SELECT doc_id FROM documents FACET source LIMIT 2").collect()
    assert len(rows) == 2 and all(r.facet == "source" for r in rows)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    full = sorted(
        ((r["count"], str(r["source"])) for r in docs.groupBy("source").count().collect()),
        key=lambda t: (-t[0], t[1]),
    )
    want_vals = sorted(v for _, v in full[:2])
    assert sorted(r.value for r in rows) == want_vals
