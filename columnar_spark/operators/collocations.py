"""Corpus-level statistics for training-data curation: collocation
mining, per-document keyword extraction, and vocabulary health.

These extend the training-pipeline operator family (text analysis /
quality side — the reference's text handling stops at string storage +
hashing, SURVEY §2.A7/A8); a data-curation team uses them to spot
boilerplate (high-lift collocations), label documents (keywords), and
track corpus health across dumps (vocabulary growth / hapax share).

House conventions:

- Tokenization is `functions.text.tokens` (trim + whitespace split),
  the same tokenizer every other documents-table operator uses, so the
  DuckDB oracles share the established
  `list_filter(string_split_regex(...), x -> x <> '')` mirror.
- Scores are exact rationals over integer counts evaluated in ONE
  pinned IEEE-754 op order — multiply/divide only, no log. IEEE 754
  requires correctly-rounded *,/ so any engine that mirrors the op
  sequence produces bit-identical doubles (the functions/money.py
  convention); the classic PMI/tf-idf logs are monotone wrappers that
  would only add libm cross-engine skew, so we rank by the rational
  lift itself.

Scale posture: every step is explode -> groupBy -> key-equi-join —
shuffles keyed on token/bigram (bounded by vocabulary, not corpus
size), per-document windows for top-k, scalar totals derived from the
count tables (never a second corpus scan) and broadcast. No driver
state, no collect, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as CT


def _unigram_counts(df: DataFrame, tk: Column) -> DataFrame:
    """(w, c) token frequencies — one explode + one shuffle on token."""
    return (
        df.select(F.explode(tk).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bigram_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k adjacent-bigram collocations ranked by lift.

    lift(a, b) = P(a,b) / (P(a) * P(b)) with P over token / bigram
    positions — the exponent-free core of PMI (PMI = ln(lift), a
    monotone map, so the ranking is identical). Computed in the pinned
    order

        ((c_ab * n_uni) / n_bi) * (n_uni / (c_a * c_b))

    all DOUBLE, which a DuckDB oracle mirrors bit-identically.

    `min_count` drops rare pairs (classic collocation-mining hygiene:
    a 1-occurrence typo pair otherwise tops the lift table); totals
    n_uni / n_bi are computed BEFORE that filter. Deterministic output:
    ORDER BY lift DESC, w1, w2 LIMIT k (TakeOrdered — no global sort).

    Scale: bigram/unigram count tables are vocabulary-sized; the two
    count joins shuffle on the word key; totals are one-row broadcasts.
    """
    tk = CT.tokens(F.col(text_col))
    toks = df.select(tk.alias("_tk"))
    pairs = (
        toks.filter(F.size("_tk") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(slice(_tk, 1, size(_tk) - 1),"
                    " (x, i) -> struct(x AS w1, _tk[i + 1] AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    uc = _unigram_counts(toks, F.col("_tk"))
    tot = pc.agg(F.sum("c_ab").alias("n_bi")).crossJoin(
        uc.agg(F.sum("c").alias("n_uni"))
    )
    u1 = uc.select(F.col("w").alias("_w1"), F.col("c").alias("c_a"))
    u2 = uc.select(F.col("w").alias("_w2"), F.col("c").alias("c_b"))
    j = (
        pc.filter(F.col("c_ab") >= min_count)
        .join(u1, F.col("w1") == F.col("_w1"))
        .join(u2, F.col("w2") == F.col("_w2"))
        .crossJoin(F.broadcast(tot))
    )
    lift = (
        (F.col("c_ab").cast("double") * F.col("n_uni").cast("double"))
        / F.col("n_bi").cast("double")
    ) * (
        F.col("n_uni").cast("double")
        / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
    )
    return (
        j.select("w1", "w2", "c_ab", "c_a", "c_b", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
    )


def tfidf_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Per-document top-k keywords by the rational tf-idf variant

        score = (tf * n_docs) / df

    (classic tf-idf is tf * ln(n_docs / df); dropping the ln keeps the
    per-document ranking VERY close — ln is monotone in n_docs/df, and
    within one document tf and df trade off the same way — while making
    the score an exact one-multiply-one-divide rational, bit-identical
    cross-engine). Tokens are lowercased (keyword identity, matching
    the stopword/quality operators' casing).

    Deterministic per-doc cutoff: row_number over
    (score DESC, term ASC) <= k; term is unique within a document so
    the order is total. The window is partitioned by document —
    distributed, no single-partition exchange.
    """
    tk = CT.tokens(F.lower(F.col(text_col)))
    tf = (
        df.select(F.col(id_col), F.explode(tk).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    nd = df.agg(F.count(F.lit(1)).alias("n_docs"))
    score = (F.col("tf").cast("double") * F.col("n_docs").cast("double")) / F.col(
        "dfreq"
    ).cast("double")
    w = Window.partitionBy(id_col).orderBy(
        score.desc(), F.col("term").asc()
    )
    return (
        tf.join(dfq, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(id_col, "term", "tf", "dfreq", score.alias("score"))
    )


def vocab_drift(
    df: DataFrame,
    group_col: str,
    a: str,
    b: str,
    text_col: str = "text",
) -> DataFrame:
    """Unigram-distribution drift between two corpus slices (langs,
    sources, dump vintages): total-variation distance plus type-set
    overlap — the curation dashboard's "did this dump change?" row.

        TV(p, q) = 0.5 * sum_w |p_w - q_w|

    KL/JS need logs; TV is exactly rational: |c_a/ta - c_b/tb| =
    |c_a*tb - c_b*ta| / (ta*tb), so the numerators are INTEGERS summed
    exactly (decimal(38,0) — immune to int64 overflow at any corpus
    size; DuckDB mirrors with HUGEINT) and ONE pinned division+scale at
    the end makes the double bit-identical cross-engine.

    One filtered scan, one token-keyed shuffle, vocabulary-sized
    aggregate state, one-row totals broadcast. Output: type counts per
    slice, shared/union types, Jaccard of type sets, TV distance.
    """
    tk = CT.tokens(F.col(text_col))
    counts = (
        df.filter(F.col(group_col).isin(a, b))
        .select(F.col(group_col).alias("_g"), F.explode(tk).alias("w"))
        .groupBy("w")
        .agg(
            F.sum(F.when(F.col("_g") == a, 1).otherwise(0)).alias("c_a"),
            F.sum(F.when(F.col("_g") == b, 1).otherwise(0)).alias("c_b"),
        )
    )
    return vocab_drift_from_counts(counts)


def vocab_drift_from_counts(counts: DataFrame) -> DataFrame:
    """The drift aggregate over a (w, c_a, c_b) paired-count frame —
    shared by batch `vocab_drift` and the streaming monitor's
    drift-since-snapshot path (streaming/vocab.drift_since), making the
    streamed report bit-identical to the batch one over the same rows."""
    tot = counts.agg(F.sum("c_a").alias("ta"), F.sum("c_b").alias("tb"))
    j = counts.crossJoin(F.broadcast(tot))
    dec = "decimal(38,0)"
    num = F.abs(
        F.col("c_a").cast(dec) * F.col("tb").cast(dec)
        - F.col("c_b").cast(dec) * F.col("ta").cast(dec)
    )
    n_shared = F.sum(F.when((F.col("c_a") > 0) & (F.col("c_b") > 0), 1).otherwise(0))
    return (
        j.groupBy("ta", "tb")
        .agg(
            F.sum(F.when(F.col("c_a") > 0, 1).otherwise(0)).cast("long").alias("n_types_a"),
            F.sum(F.when(F.col("c_b") > 0, 1).otherwise(0)).cast("long").alias("n_types_b"),
            n_shared.cast("long").alias("n_shared"),
            F.count(F.lit(1)).alias("n_union"),
            (
                n_shared.cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("jaccard_types"),
            (
                F.lit(0.5)
                * (
                    F.sum(num).cast("double")
                    / (F.col("ta").cast("double") * F.col("tb").cast("double"))
                )
            ).alias("tv_distance"),
        )
        .drop("ta", "tb")
    )


def vocab_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus vocabulary health report: total tokens, distinct
    types, hapax legomena (frequency-1 types), type-token ratio and
    hapax share. TTR falling / hapax share spiking across dumps is the
    standard signal for template spam vs scrape diversity drift.

    Exact integer counts; the two ratios are single IEEE divisions.
    One explode + one token-keyed shuffle, then a one-row aggregate.
    """
    return vocab_stats_from_counts(_unigram_counts(df, CT.tokens(F.col(text_col))))


def vocab_stats_from_counts(uc: DataFrame) -> DataFrame:
    """The report aggregate over a (w, c) unigram-count frame — shared
    by batch `vocab_stats` and the streaming monitor's merge-on-read
    path (streaming/vocab.vocab_report), which is what makes the
    streamed report bit-identical to the batch one: identical counts in,
    identical pinned divisions out."""
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return uc.agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        hapax.cast("long").alias("n_hapax"),
        (F.count(F.lit(1)).cast("double") / F.sum("c").cast("double")).alias(
            "type_token_ratio"
        ),
        (hapax.cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "hapax_ratio"
        ),
    )
