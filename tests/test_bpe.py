"""BPE trainer/encoder: paper-example parity, determinism, the
trainer-vs-greedy-encoder self-consistency invariant, the vocabulary
guard, and the distributed encode path."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators.bpe import (
    END,
    MAX_TRAIN_VOCAB,
    apply_bpe,
    bpe_fertility_stats,
    encode_word,
    train_bpe,
    word_counts,
)


def test_sennrich_paper_example():
    # Sennrich et al. 2016 §3.2 toy vocabulary. With </w> appended the
    # first merges must pick up the dominant 'es'/'est' cluster.
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(wc, n_merges=4, min_pair_count=1)
    assert merges[0] == ("e", "s")  # 9 occurrences, the paper's pick
    assert merges[1] == ("es", "t")  # 9
    assert merges[2] == ("est", END)  # 9
    ranks = {p: i for i, p in enumerate(merges)}
    assert "est" + END in "".join(encode_word("newest", ranks)).replace(" ", "")


def test_trainer_encoder_self_consistency():
    # the greedy lowest-rank encoder reproduces the trainer's final
    # segmentation on every training word — the classic BPE invariant
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3), ("new", 4)]
    merges = train_bpe(wc, n_merges=12, min_pair_count=1)
    ranks = {p: i for i, p in enumerate(merges)}
    # recompute the trainer's final vocab segmentation
    from columnar_spark.operators.bpe import _merge_word

    vocab = {w: tuple(w) + (END,) for w, _ in wc}
    for pair in merges:
        vocab = {w: _merge_word(s, pair) for w, s in vocab.items()}
    for w, sym in vocab.items():
        assert tuple(encode_word(w, ranks)) == sym, w


def test_training_is_deterministic_under_shuffled_input():
    rng = random.Random(5)
    wc = [(f"w{i}x{i % 7}", rng.randint(1, 40)) for i in range(200)]
    m1 = train_bpe(wc, n_merges=30)
    shuffled = wc[:]
    rng.shuffle(shuffled)
    m2 = train_bpe(shuffled, n_merges=30)
    assert m1 == m2


def test_vocab_guard_refuses_unbounded_state():
    wc = [(f"w{i}", 1) for i in range(MAX_TRAIN_VOCAB + 1)]
    with pytest.raises(ValueError, match="distinct words|entries"):
        train_bpe(wc, n_merges=1)


def test_word_counts_and_apply_bpe_distributed(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cats sat"),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    wc = word_counts(df, "text")
    got = {r["word"]: r["count"] for r in wc.collect()}
    want = Counter(
        w for _, t in docs if t for w in t.lower().split()
    )
    assert got == dict(want)

    merges = train_bpe(wc, n_merges=20, min_pair_count=1)
    enc = apply_bpe(df, merges, "text").orderBy("doc_id").collect()
    ranks = {p: i for i, p in enumerate(merges)}
    for r in enc:
        text = r["text"]
        want_pieces = (
            [p for w in text.lower().split() for p in encode_word(w, ranks)]
            if text
            else []
        )
        assert r["bpe_tokens"] == want_pieces, r["doc_id"]
    # reconstruction: joining pieces and stripping markers recovers text
    row = enc[0]
    joined = "".join(row["bpe_tokens"]).replace(END, " ").strip()
    assert joined == docs[0][1]


def test_fertility_stats(spark):
    df = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "aa")], "doc_id long, text string"
    )
    merges = train_bpe(word_counts(df, "text"), n_merges=10, min_pair_count=1)
    r = bpe_fertility_stats(df, merges, "text").collect()[0]
    assert r.n_words == 4
    ranks = {p: i for i, p in enumerate(merges)}
    want_pieces = sum(
        len(encode_word(w, ranks)) for w in ["aa", "aa", "bb", "aa"]
    )
    assert r.n_pieces == want_pieces
    assert r.fertility == float(want_pieces) / 4.0


# ---------------------------------------------------------------------------
# Hypothesis fuzz: encoder equivalences on arbitrary (incl. unseen) words
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcde", min_size=1, max_size=12)
_corpus = st.lists(
    st.tuples(_word, st.integers(min_value=1, max_value=50)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=60, deadline=None)
@given(corpus=_corpus, probe=_word)
def test_fuzz_concat_invariant_and_sequential_equivalence(corpus, probe):
    """(a) the pieces of ANY word concatenate back to word + END marker;
    (b) greedy lowest-rank encoding equals applying the merge list in
    rank order — the classic equivalence, pinned for unseen words too."""
    from columnar_spark.operators.bpe import _merge_word

    merges = train_bpe(corpus, n_merges=25, min_pair_count=1)
    ranks = {p: i for i, p in enumerate(merges)}
    pieces = encode_word(probe, ranks)
    assert "".join(pieces) == probe + END
    sym = tuple(probe) + (END,)
    for pair in merges:
        sym = _merge_word(sym, pair)
    assert tuple(pieces) == sym


def _naive_train(rows, n_merges, min_pair_count=1):
    """Recount-everything reference trainer (the pre-optimization form)."""
    from columnar_spark.operators.bpe import _merge_word, _pair_counts

    vocab = [(tuple(w) + (END,), c) for w, c in rows if w]
    merges = []
    for _ in range(n_merges):
        pc = _pair_counts(vocab)
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        merges.append(best[0])
        vocab = [(_merge_word(s, best[0]), c) for s, c in vocab]
    return merges


@settings(max_examples=40, deadline=None)
@given(corpus=_corpus)
def test_fuzz_incremental_trainer_equals_naive(corpus):
    assert train_bpe(corpus, n_merges=20, min_pair_count=1) == _naive_train(
        corpus, 20, 1
    )


def test_py_tokens_mirrors_jvm_tokens(spark):
    from columnar_spark.operators.bpe import _py_tokens

    nasty = [
        "\tfoo bar\n",
        "a b",  # NBSP: ONE token to Java \s, two to str.split()
        "  x\ty \x0b z\r",
        "",
        " \t ",
        "plain words here",
    ]
    df = spark.createDataFrame([(s,) for s in nasty], "text string")
    from columnar_spark.functions import text as CT

    jvm = [
        r["tk"]
        for r in df.select(CT.tokens(F.col("text")).alias("tk")).collect()
    ]
    assert jvm == [_py_tokens(s) for s in nasty]
    assert jvm[1] == ["a b"]  # the NBSP word stays whole on BOTH sides
