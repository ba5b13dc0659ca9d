"""Corpus-statistics operators: python-reference parity (exact counts,
bit-identical pinned-op-order floats) on hand and random corpora.

Cross-engine (DuckDB) bit-identity of the same queries is covered by the
entry oracles (bigram_collocations_docs / tfidf_keywords_docs /
vocab_stats_docs hash-match in tools/check_correctness.py at sf0.001,
sf0.01 and the sf0.1 full differential).
"""

from __future__ import annotations

import random
import struct
from collections import Counter

import pytest

from columnar_spark.operators.collocations import (
    bigram_collocations,
    tfidf_keywords,
    vocab_drift,
    vocab_stats,
)


def _bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


def _tok(s: str) -> list[str]:
    return s.split()


def _ref_bigrams(texts, min_count, k):
    uni, bi = Counter(), Counter()
    for t in texts:
        w = _tok(t)
        uni.update(w)
        bi.update(zip(w, w[1:]))
    n_uni, n_bi = sum(uni.values()), sum(bi.values())
    out = []
    for (a, b), c in bi.items():
        if c < min_count:
            continue
        lift = ((float(c) * float(n_uni)) / float(n_bi)) * (
            float(n_uni) / (float(uni[a]) * float(uni[b]))
        )
        out.append((a, b, c, uni[a], uni[b], lift))
    out.sort(key=lambda r: (-r[5], r[0], r[1]))
    return out[:k]


def _ref_tfidf(rows, k):
    tf: dict[tuple, int] = Counter()
    for doc_id, t in rows:
        tf.update((doc_id, w) for w in _tok(t.lower()))
    dfreq = Counter(w for (_, w) in tf)
    n_docs = len(rows)
    per_doc: dict = {}
    for (doc_id, w), c in tf.items():
        score = (float(c) * float(n_docs)) / float(dfreq[w])
        per_doc.setdefault(doc_id, []).append((w, c, dfreq[w], score))
    out = []
    for doc_id, terms in per_doc.items():
        terms.sort(key=lambda r: (-r[3], r[0]))
        out.extend((doc_id, w, c, d, s) for (w, c, d, s) in terms[:k])
    return sorted(out)


CORPUS = [
    "new york is a big city",
    "new york has new people",
    "the city of new york",
    "york is not new here",
    "a b a b a b",
]


def test_bigram_collocations_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = [tuple(r) for r in bigram_collocations(df, "text", min_count=2, k=10).collect()]
    want = _ref_bigrams(CORPUS, 2, 10)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:5] == w[:5], (g, w)
        assert _bits(g[5]) == _bits(w[5]), (g, w)


def test_bigram_min_count_filters_but_totals_precede_filter(spark):
    # 'new york' appears 3x, 'a b' 3x, 'b a' 2x; with min_count=3 the
    # b-a pair drops but its occurrences still count toward n_bi —
    # pinned by matching the reference, which does the same.
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = [tuple(r) for r in bigram_collocations(df, "text", min_count=3, k=10).collect()]
    want = _ref_bigrams(CORPUS, 3, 10)
    assert [g[:2] for g in got] == [w[:2] for w in want]
    for g, w in zip(got, want):
        assert _bits(g[5]) == _bits(w[5])


def test_tfidf_keywords_matches_reference(spark):
    rows = [(i, t) for i, t in enumerate(CORPUS)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = tfidf_keywords(df, "doc_id", "text", k=3).collect()
    got = sorted((r.doc_id, r.term, r.tf, r.dfreq, r.score) for r in out)
    want = _ref_tfidf(rows, 3)
    assert [g[:4] for g in got] == [w[:4] for w in want]
    for g, w in zip(got, want):
        assert _bits(g[4]) == _bits(w[4])


def test_vocab_stats_exact(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    r = vocab_stats(df, "text").collect()[0]
    uni = Counter(w for t in CORPUS for w in _tok(t))
    n_tokens, n_types = sum(uni.values()), len(uni)
    n_hapax = sum(1 for c in uni.values() if c == 1)
    assert (r.n_tokens, r.n_types, r.n_hapax) == (n_tokens, n_types, n_hapax)
    assert _bits(r.type_token_ratio) == _bits(float(n_types) / float(n_tokens))
    assert _bits(r.hapax_ratio) == _bits(float(n_hapax) / float(n_types))


@pytest.mark.parametrize("seed", [1, 7])
def test_collocations_fuzz_vs_reference(spark, seed):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
        for _ in range(120)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [tuple(r) for r in bigram_collocations(df, "text", min_count=2, k=25).collect()]
    want = _ref_bigrams(texts, 2, 25)
    assert [g[:5] for g in got] == [w[:5] for w in want]
    for g, w in zip(got, want):
        assert _bits(g[5]) == _bits(w[5])


def _ref_drift(rows, a, b):
    ca, cb = Counter(), Counter()
    for g, t in rows:
        (ca if g == a else cb).update(_tok(t))
    ta, tb = sum(ca.values()), sum(cb.values())
    words = set(ca) | set(cb)
    s_num = sum(abs(ca[w] * tb - cb[w] * ta) for w in words)
    tv = 0.5 * (float(s_num) / (float(ta) * float(tb)))
    shared = sum(1 for w in words if ca[w] > 0 and cb[w] > 0)
    return (
        len(ca),
        len(cb),
        shared,
        len(words),
        float(shared) / float(len(words)),
        tv,
    )


def test_vocab_drift_matches_reference(spark):
    rows = [
        ("en", "the cat sat on the mat"),
        ("en", "the dog sat"),
        ("fr", "le chat sat sur le tapis"),
        ("fr", "le chien"),
        ("de", "der hund ignored entirely"),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = tuple(vocab_drift(df, "lang", "en", "fr").collect()[0])
    want = _ref_drift([r for r in rows if r[0] in ("en", "fr")], "en", "fr")
    assert got[:4] == want[:4]
    assert _bits(got[4]) == _bits(want[4])
    assert _bits(got[5]) == _bits(want[5])


def test_vocab_drift_identical_slices_is_zero(spark):
    rows = [("a", "x y z x"), ("b", "x y z x")]
    df = spark.createDataFrame(rows, "g string, text string")
    r = vocab_drift(df, "g", "a", "b").collect()[0]
    assert r.tv_distance == 0.0 and r.jaccard_types == 1.0
    assert r.n_shared == r.n_union == 3


def test_vocab_drift_disjoint_slices_is_one(spark):
    rows = [("a", "x y"), ("b", "p q r")]
    df = spark.createDataFrame(rows, "g string, text string")
    r = vocab_drift(df, "g", "a", "b").collect()[0]
    assert r.tv_distance == 1.0 and r.n_shared == 0


def test_vocab_drift_fuzz_vs_reference(spark):
    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(25)]
    rows = [
        (rng.choice(["a", "b"]), " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for _ in range(150)
    ]
    df = spark.createDataFrame(rows, "g string, text string")
    got = tuple(vocab_drift(df, "g", "a", "b").collect()[0])
    want = _ref_drift(rows, "a", "b")
    assert got[:4] == want[:4]
    assert _bits(got[4]) == _bits(want[4])
    assert _bits(got[5]) == _bits(want[5])


def test_empty_and_single_token_docs(spark):
    df = spark.createDataFrame(
        [("",), ("  ",), ("solo",), ("a b",), ("a b",)], "text string"
    )
    rows = bigram_collocations(df, "text", min_count=1, k=10).collect()
    assert [(r.w1, r.w2, r.c_ab) for r in rows] == [("a", "b", 2)]
    v = vocab_stats(df, "text").collect()[0]
    assert (v.n_tokens, v.n_types, v.n_hapax) == (5, 3, 1)
