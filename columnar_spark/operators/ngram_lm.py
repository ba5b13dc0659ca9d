"""Bigram language-model scoring — the perplexity-style quality signal
LLM data pipelines filter on (KenLM-filtering's shape, reduced to a
bigram model with add-one smoothing so the entire fit AND score are
declarative relational algebra — no model binary, no UDF).

Fit = two aggregations over the corpus (bigram counts, unigram counts
+ vocab size). Score = explode each document's bigrams, join the count
tables (broadcast when the vocabulary is small, shuffle join on the
bigram key at scale), and fold per-position log-probs in POSITION order
so the double is partitioning-independent and matches any engine
computing the same expression:

    logp(w_i | w_{i-1}) = ln( (C2(w_{i-1}, w_i) + 1) / (C1(w_{i-1}) + V) )

Scores are avg log-prob (perplexity = exp(-avg); monotone equivalent,
so filters threshold avg_logp directly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from columnar_spark.operators.fulltext import tokenize


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, pos, prev, cur) — one row per bigram occurrence."""
    toks = tokenize(F.col(text_col))
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("prev"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("cur"),
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(pairs).alias("pos", "bg")
    ).select("doc_id", "pos", F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))


def fit_bigram_lm(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """-> (bigram_counts(prev, cur, c2), unigram_counts(prev, c1), V).
    Unigram counts exclude each document's LAST token (they count
    bigram CONTEXTS, the denominator's event space); V is the full
    distinct-token vocabulary."""
    bg = _doc_bigrams(df, id_col, text_col)
    c2 = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.groupBy("prev").agg(F.count(F.lit(1)).alias("c1"))
    v = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("t"))
        .agg(F.countDistinct("t"))
        .first()[0]
    )
    return c2, c1, int(v)


def score_bigram_lm(
    df: DataFrame,
    c2: DataFrame,
    c1: DataFrame,
    v: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logp) for every document with >= 1
    bigram. Unseen bigrams smooth to 1/(c1+V); unseen contexts (possible
    when scoring out-of-corpus docs) to 1/V."""
    bg = _doc_bigrams(df, id_col, text_col)
    joined = (
        bg.join(c2, ["prev", "cur"], "left")
        .join(c1, ["prev"], "left")
        .withColumn(
            "logp",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + F.lit(1.0))
                / (F.coalesce(F.col("c1"), F.lit(0)).cast("double") + F.lit(float(v)))
            ),
        )
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        (
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("pos", "logp"))),
                F.lit(0.0),
                lambda acc, x: acc + x["logp"],
            )
            / F.count(F.lit(1))
        ).alias("avg_logp"),
    )


def bigram_lm_reference(docs: list[tuple[int, str]]) -> dict[int, tuple[int, float]]:
    """Python twin (fit on `docs`, score `docs`) for differential tests."""
    import math
    import re

    from columnar_spark.operators.fulltext import TOKEN_SPLIT_RE

    toks = {
        i: [t for t in re.split(TOKEN_SPLIT_RE, s.lower()) if t] for i, s in docs
    }
    c2: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    vocab = set()
    for ts in toks.values():
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    v = len(vocab)
    out = {}
    for i, ts in toks.items():
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            continue
        s = 0.0
        for a, b in pairs:
            s += math.log((c2.get((a, b), 0) + 1.0) / (c1.get(a, 0) + float(v)))
        out[i] = (len(pairs), s / len(pairs))
    return out
