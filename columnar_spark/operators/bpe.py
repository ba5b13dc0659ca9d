"""Byte-pair-encoding tokenizer support: distributed vocabulary
extraction, bounded-state merge training, broadcast Arrow-batch
encoding, and fertility statistics.

Production BPE trainers (the Sennrich et al. 2016 algorithm behind
sentencepiece / HF tokenizers) do NOT iterate over the corpus: they
train on the WEIGHTED WORD VOCABULARY — (word, count) pairs — because a
pair-merge's frequency delta only depends on which words contain the
pair, scaled by word count. That is exactly the right Spark split at
100 TB:

- the corpus scan is ONE distributed explode -> groupBy(word) count
  (`word_counts`) — the only step that touches every byte;
- merge learning (`train_bpe`) iterates driver-side over the
  vocabulary-bounded count table, behind the house quadratic-guard
  pattern (dedup._guard_quadratic's contract: refuse unbounded driver
  state loudly rather than OOM);
- encoding (`apply_bpe`) broadcasts the learned merge ranks and maps
  the corpus in Arrow batches (mapInPandas — the sanctioned Python
  path), with a per-batch word cache so each distinct word is encoded
  once per batch, not once per occurrence.

Determinism contract: merge selection breaks frequency ties by
lexicographic pair order, so training is reproducible across runs,
partitionings, and engines — the property every oracle/test here pins.
The greedy encoder applies the LOWEST-RANK merge first (the standard
BPE encode loop), which reproduces the trainer's final segmentation on
the training vocabulary — pinned by test (the classic self-consistency
invariant).

Reference relationship: the reference's text handling is storage +
hashing (SURVEY §2.A7/A8); its embeddings library consumes externally
trained tokenizers. This module is part of the training-data-pipeline
family (the brief's "token counting (whitespace + a BPE-ish regex)"
row, taken to a real trainer/encoder).
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as CT

END = "</w>"  # end-of-word marker (Sennrich et al. 2016 convention)

# Exact Python mirror of functions.text.tokens: Java regex \s is the
# ASCII class [ \t\n\x0B\f\r]. Python's str.split() must NOT be used —
# it also splits on Unicode spaces (NBSP etc.) the JVM tokenizer keeps
# inside words, which would make training (JVM word_counts) and
# encoding (Python) disagree on what a word is.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")
_JAVA_WS_EDGE = " \t\n\x0b\f\r"


def _py_tokens(s: str) -> list[str]:
    s = s.strip(_JAVA_WS_EDGE)
    return _JAVA_WS.split(s) if s else []

# Driver-side training state is vocabulary-bounded, not corpus-bounded,
# but "vocabulary" can still be pathological (random bytes); refuse
# loudly past this many distinct words (the house guard pattern).
MAX_TRAIN_VOCAB = 500_000


def word_counts(df: DataFrame, text_col: str = "text", lowercase: bool = True) -> DataFrame:
    """(word, count) weighted vocabulary — the one corpus-wide scan.
    One explode + one word-keyed shuffle; output is vocabulary-sized."""
    t = F.col(text_col)
    tk = CT.tokens(F.lower(t) if lowercase else t)
    return (
        df.select(F.explode(tk).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )


def _pair_counts(vocab: list[tuple[tuple[str, ...], int]]) -> Counter:
    pc: Counter = Counter()
    for sym, cnt in vocab:
        for i in range(len(sym) - 1):
            pc[(sym[i], sym[i + 1])] += cnt
    return pc


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, a, b = 0, pair[0], pair[1]
    while i < len(sym):
        if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(
    wc: DataFrame | list[tuple[str, int]],
    n_merges: int = 100,
    min_pair_count: int = 2,
    max_vocab: int = MAX_TRAIN_VOCAB,
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from a (word, count) vocabulary.

    Accepts the `word_counts` DataFrame (collected under the guard) or
    an already-materialized list. Each word starts as its character
    sequence plus the END marker; every round merges the
    highest-frequency adjacent pair (ties -> lexicographic smallest
    pair, the determinism contract) and stops early when no pair
    reaches `min_pair_count`. Returns the ordered merge list — rank =
    list position.
    """
    if isinstance(wc, DataFrame):
        n = wc.count()
        if n > max_vocab:
            raise ValueError(
                f"training vocabulary has {n} distinct words (> {max_vocab}); "
                "pre-filter the vocabulary (e.g. min word count) before training"
            )
        rows = [(r["word"], int(r["count"])) for r in wc.collect()]
    else:
        rows = list(wc)
        if len(rows) > max_vocab:
            raise ValueError(
                f"training vocabulary has {len(rows)} entries (> {max_vocab})"
            )
    vocab: list[tuple[tuple[str, ...], int]] = [
        (tuple(w) + (END,), c) for w, c in rows if w
    ]
    # Incremental trainer (the actual Sennrich/sentencepiece structure):
    # pair counts and a pair -> {word ids} index are maintained across
    # merges, so each merge touches ONLY the words containing the merged
    # pair — O(affected words), not O(vocabulary) per merge. The naive
    # recount-everything form lives in tests as the parity oracle.
    pc: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for i, (sym, cnt) in enumerate(vocab):
        for j in range(len(sym) - 1):
            p = (sym[j], sym[j + 1])
            pc[p] += cnt
            where.setdefault(p, set()).add(i)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pc:
            break
        # highest count, lexicographically smallest pair on ties —
        # the determinism contract
        pair = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[pair] < min_pair_count:
            break
        merges.append(pair)
        for i in sorted(where.get(pair, ())):
            old, cnt = vocab[i]
            new = _merge_word(old, pair)
            vocab[i] = (new, cnt)
            old_pairs = Counter(zip(old, old[1:]))
            new_pairs = Counter(zip(new, new[1:]))
            for p, k in (old_pairs - new_pairs).items():
                pc[p] -= k * cnt
                if pc[p] <= 0:
                    del pc[p]
                if p not in new_pairs:
                    s = where.get(p)
                    if s is not None:
                        s.discard(i)
                        if not s:
                            del where[p]
            for p, k in (new_pairs - old_pairs).items():
                pc[p] += k * cnt
                where.setdefault(p, set()).add(i)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode: repeatedly apply the lowest-rank applicable
    merge (the standard encode loop; reproduces the trainer's final
    segmentation on training words)."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Encode `text_col` with the learned merges: appends an
    array<string> column of BPE pieces (END-marked) per document.

    mapInPandas over Arrow batches with a per-batch word->pieces cache:
    each DISTINCT word in a batch is encoded once (Zipf makes the cache
    hit rate high), and the merge-rank dict rides the closure broadcast
    — no join, no shuffle, schema-stable.
    """
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # fresh StructType — StructType.add mutates the receiver, and
    # df.schema must stay untouched for mapInPandas to resolve inputs
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(StringType()))]
    )
    names = [f.name for f in out_schema.fields]

    def enc(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def doc_pieces(text) -> list[str]:
            if text is None:
                return []
            s = text.lower() if lowercase else text
            pieces: list[str] = []
            for w in _py_tokens(s):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks)
                pieces.extend(got)
            return pieces

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [doc_pieces(t) for t in pdf[text_col]]
            yield pdf[names]

    return df.mapInPandas(enc, schema=out_schema)


def bpe_fertility_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """One-row tokenizer-quality report over a corpus: total words,
    total BPE pieces, and fertility (pieces per word — the number
    tokenizer teams track per language/domain). Distributed encode +
    one aggregate."""
    enc = apply_bpe(df, merges, text_col, out_col="__pieces")
    n_words = F.sum(CT.token_count(F.col(text_col)).cast("long"))
    n_pieces = F.sum(F.size("__pieces").cast("long"))
    return enc.agg(
        n_words.alias("n_words"),
        n_pieces.alias("n_pieces"),
        (F.sum(F.size("__pieces").cast("long")).cast("double") / n_words.cast("double")).alias(
            "fertility"
        ),
    )
