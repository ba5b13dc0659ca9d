"""Benchmark decontamination — flag training documents that share a
word n-gram with an evaluation/benchmark set.

The standard LLM-training-data hygiene pass (the 13-gram overlap check
popularized by GPT-3/PaLM dataset reports): any document containing an
n-gram that also appears in a benchmark/eval corpus is contaminated and
must be dropped or audited before training. The reference engine has no
counterpart (it stores and searches; corpus hygiene is host-side) — this
is one of the training-pipeline operators this engine adds as
first-class.

Scale posture (100 TB corpus vs ~MB-GB benchmark set):

- The benchmark n-gram set is DISTINCT-deduped then broadcast — eval
  suites are tiny next to the corpus, so the corpus side never
  shuffles its exploded grams for the join.
- The corpus side explodes per-document DISTINCT grams (array_distinct
  before explode keeps the explode width = unique grams per doc),
  broadcast-hash-joins, and partially aggregates per doc_id — the only
  shuffle is the final groupBy keyed on doc_id, whose width is bounded
  by the number of CONTAMINATED (doc, gram) pairs, a tiny fraction of
  the corpus.
- Everything is Catalyst expressions (split/transform/explode) — no
  Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from columnar_spark.functions.text import word_ngrams

# Hard ceiling on the broadcast eval-set side of the semantic report:
# 50k x 64-dim float64 vectors ~ 26 MB broadcast — comfortably inside
# executor memory, while corpus-sized eval sets are refused with
# guidance instead of OOMing mid-job.
EVAL_SET_MAX_ROWS = 50_000


def _gram_col(text: Column, n: int) -> Column:
    # lower() before splitting so casing differences never mask overlap;
    # single-space split matches an engine-agnostic string_split oracle.
    return F.array_distinct(word_ngrams(F.lower(text), n))


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    benchmark_grams: DataFrame | None = None,
) -> DataFrame:
    """Per-document contamination counts: (id_col, n_hits) for every
    corpus document sharing >= 1 distinct word n-gram with any benchmark
    document. Documents with zero overlap are absent (filter-join
    semantics — the common case at scale, where almost nothing hits).

    Pass `benchmark_grams` (a precomputed/persisted distinct-gram frame,
    e.g. streaming/decontaminate.benchmark_gram_set) to skip re-exploding
    the benchmark corpus — the streaming path computes it once and
    reuses it every micro-batch."""
    if benchmark_grams is not None:
        bench_grams = benchmark_grams
    else:
        bench_grams = (
            benchmark.select(F.explode(_gram_col(F.col(text_col), n)).alias("gram"))
            .distinct()
        )
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(_gram_col(F.col(text_col), n)).alias("gram")
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    max_hits: int = 0,
) -> DataFrame:
    """Return the clean corpus: drop documents with more than `max_hits`
    overlapping benchmark n-grams (default 0 = any overlap drops).
    Implemented as a left-anti join against the report. The flagged set
    is NOT broadcast-hinted: contamination is usually rare (AQE will
    broadcast a small set at runtime), but it is data-dependent and
    unbounded — a pathological overlap at 100 TB could flag millions of
    ids, where a forced broadcast would OOM the executors."""
    hits = contamination_report(corpus, benchmark, id_col, text_col, n)
    flagged = hits.filter(F.col("n_hits") > max_hits).select(id_col)
    return corpus.join(flagged, id_col, "left_anti")


def semantic_contamination_report(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
) -> DataFrame:
    """Embedding-space decontamination: flag corpus items whose vector is
    cosine-similar (>= threshold) to ANY benchmark/eval item — catches
    paraphrased or reformatted contamination the n-gram pass misses.

    Unlike corpus SELF near-dup (where all-pairs is quadratic and LSH is
    mandatory), corpus x benchmark is n x b with b tiny — so the exact
    broadcast cross product IS the scale path: one corpus scan, bench
    vectors broadcast, distances in codegen, per-id aggregation is the
    only shuffle (bounded by flagged rows). Returns
    (id_col, n_hits, max_sim)."""
    from columnar_spark.functions.vector import dot, norm

    # "b tiny by contract" gets a hard guard, not a docstring (house
    # pattern: dedup._guard_quadratic, knn.BATCH_QUERY_MAX_ROWS): a
    # corpus-sized eval set would broadcast-OOM the executors and the
    # n x b cross product would silently go quadratic.
    nb = bench_emb.count()
    if nb > EVAL_SET_MAX_ROWS:
        raise ValueError(
            f"semantic_contamination_report broadcasts the eval set and "
            f"computes corpus x eval distances; it refuses eval sets over "
            f"{EVAL_SET_MAX_ROWS} rows (got {nb}). Chunk the eval set and "
            "union the reports, or use the LSH near-dup path "
            "(embedding_neardup_lsh) for set-vs-set at corpus scale."
        )

    # Norms precomputed ONCE per row on each side (a projection below
    # the join evaluates per stream row / per broadcast row, not per
    # pair) — computing cosine_sim(a, b) per pair would re-fold both
    # norms
    # |bench| times per corpus row. Values are bit-identical: the same
    # norm expression, just cached.
    bench = F.broadcast(
        bench_emb.select(
            F.col(vec_col).cast("array<double>").alias("__bv")
        ).withColumn("__bn", norm(F.col("__bv")))
    )
    corpus = corpus_emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__cv")
    ).withColumn("__cn", norm(F.col("__cv")))
    sim = dot(F.col("__cv"), F.col("__bv")) / (F.col("__cn") * F.col("__bn"))
    return (
        corpus.crossJoin(bench)
        .select(F.col(id_col), sim.alias("__sim"))
        .filter(F.col("__sim") >= threshold)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_hits"),
            F.round(F.max("__sim"), 6).alias("max_sim"),
        )
    )
