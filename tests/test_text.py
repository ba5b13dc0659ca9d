"""Text-analysis expressions."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.functions import text as CT


def _one(spark, s, expr):
    return spark.createDataFrame([(s,)], "t: string").select(expr.alias("v")).first()["v"]


def test_token_counts(spark):
    assert _one(spark, "a  b\tc", CT.token_count(F.col("t"))) == 3
    assert _one(spark, "", CT.token_count(F.col("t"))) == 0
    assert _one(spark, "hello, world!", CT.bpe_ish_token_count(F.col("t"))) == 4


def test_alpha_ratio(spark):
    assert _one(spark, "ab!!", CT.alpha_ratio(F.col("t"))) == 0.5
    assert _one(spark, "", CT.alpha_ratio(F.col("t"))) == 0.0


def test_mean_word_length(spark):
    assert _one(spark, "ab abcd", CT.mean_word_length(F.col("t"))) == 3.0


def test_lang_id(spark):
    assert _one(spark, "the cat is in the house and it is happy",
                CT.lang_id(F.col("t"))) == "en"
    assert _one(spark, "le chat est dans la maison et les oiseaux",
                CT.lang_id(F.col("t"))) == "fr"
    assert _one(spark, "xyzzy qwerty", CT.lang_id(F.col("t"))) == "und"


def test_fingerprint_deterministic_and_shift_sensitive(spark):
    a = _one(spark, "one two three four five", CT.doc_fingerprint(F.col("t")))
    b = _one(spark, "one two three four five", CT.doc_fingerprint(F.col("t")))
    c = _one(spark, "five four three two one", CT.doc_fingerprint(F.col("t")))
    assert a == b
    assert a != c
    assert len(a) == 32  # md5 hex


def test_quality_score_bounds(spark):
    good = _one(spark, "the cat is on the mat and it is a good cat " * 5,
                CT.quality_score(F.col("t")))
    bad = _one(spark, "@@@@ ####", CT.quality_score(F.col("t")))
    assert 0.0 <= bad < good <= 1.0


def test_redact_pii(spark):
    s = "mail me@example.com or call +1 555-123-4567, see https://x.io/a"
    out = _one(spark, s, CT.redact_pii(F.col("t")))
    assert "<EMAIL>" in out and "<PHONE>" in out and "<URL>" in out
    assert "example.com" not in out and "555" not in out


def test_strip_markup(spark):
    out = _one(spark, "<p>Hello <b>world</b></p>  extra", CT.strip_markup(F.col("t")))
    assert out == "Hello world extra"


def test_word_ngrams_and_guard(spark):
    from columnar_spark.functions.text import word_ngrams

    df = spark.createDataFrame([("a b c",), ("solo",), ("",)], "text: string")
    got = [r["g"] for r in df.select(word_ngrams(F.col("text")).alias("g")).collect()]
    assert got[0] == ["a b", "b c"]
    assert got[1] == []  # size < n must not hit sequence()'s descending range
    assert got[2] == []


def test_repetition_signals_small(spark):
    from columnar_spark.functions.text import repetition_signals

    df = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "a b c d e f")], "id: long, text: string"
    )
    got = {r["id"]: r for r in repetition_signals(df, "id", "text").collect()}
    # doc 1: grams = [x y, y x, x y, y x, x y] -> top 'x y' 3/5, all dup
    assert got[1]["top2gram_cover"] == round(3 / 5, 6)
    assert got[1]["dup2gram_frac"] == 1.0
    assert got[1]["uniq_tok_ratio"] == round(2 / 6, 6)
    # doc 2: all grams unique
    assert got[2]["top2gram_cover"] == round(1 / 5, 6)
    assert got[2]["dup2gram_frac"] == 0.0
    assert got[2]["uniq_tok_ratio"] == 1.0


def test_chunk_documents_invariants(spark):
    from columnar_spark.functions.text import chunk_documents

    rows = [
        (1, " ".join(f"w{i}" for i in range(150))),  # 3 chunks at 64/16
        (2, "a b c"),                                # short: one chunk
        (3, ""),                                     # empty: none
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = chunk_documents(df, chunk_tokens=64, overlap=16)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in out.collect()
    }
    # doc 1: starts at 0, 48, 96, 144 -> 4 windows (150 tokens, stride 48)
    assert {c for d, c in got if d == 1} == {0, 1, 2, 3}
    assert got[(1, 0)][0] == 64 and got[(1, 3)][0] == 150 - 144
    # overlap: last 16 tokens of chunk 0 == first 16 of chunk 1
    assert got[(1, 0)][1].split()[-16:] == got[(1, 1)][1].split()[:16]
    # reconstruction: stride-strided concatenation covers every token once
    recon = []
    for c in range(4):
        toks = got[(1, c)][1].split()
        recon.extend(toks if c == 0 else toks[16:])
    assert recon == [f"w{i}" for i in range(150)]
    assert got[(2, 0)] == (3, "a b c")
    assert not any(d == 3 for d, _ in got)
