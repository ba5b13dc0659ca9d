"""Deduplication operators for large-scale training-data pipelines.

North-star extras beyond the reference inventory (the reference's closest
machinery is the string-hash companion column, SURVEY §2.A8,
columnar/builder/builderint.cpp:446-466 — its purpose is exactly fast
equality/dedup on strings, which `exact_dedup` generalizes).

Scale design notes (100 TB posture):

- exact dedup: one hash-shuffle on the key; the window picks a
  deterministic survivor per group. No driver state.
- MinHash/SimHash signatures: explode(shingles) + codegen'd aggregates
  (one shuffle on id, each hash computed exactly once — see
  minhash_signatures_agg for why the per-row HOF form is a trap).
- candidate generation: equi-join on (band, band_hash) buckets. The
  *_pairs operators enumerate all intra-bucket pairs (O(bucket^2) — fine
  for genuinely rare duplicates); the *_dedup operators join members to a
  per-bucket representative (O(n x bands) regardless of corpus
  self-similarity — the form that survives 100 TB).
- n-gram Jaccard / embedding-cosine: exact verify over candidates only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from columnar_spark.functions.text import tokens
from columnar_spark.functions.vector import cosine_sim

I64_MAX = 0x7FFFFFFFFFFFFFFF


# ---------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep one deterministic survivor (min id) per exact-duplicate group
    of `cols`. Hash-groupBy semantics; single shuffle on the group key."""
    w = Window.partitionBy(*cols).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_groups(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Exact-duplicate clusters: one row per duplicated value with the
    surviving id, duplicate count, and member ids."""
    return (
        df.groupBy(*cols)
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
        )
        .filter(F.col("dup_count") > 1)
    )


# ---------------------------------------------------------------- shingles

def token_shingles(text: Column, k: int = 3) -> Column:
    """Token k-shingles as strings; documents shorter than k tokens yield
    one shingle (the whole text).

    k=1 short-circuits to distinct tokens — the general expression's
    per-position work is ~16x slower and pure overhead there. For k>=2,
    slice+array_join measures ~2x faster than k element_at lookups per
    shingle at k=3 (one bounds check + bulk copy vs scattered reads;
    output identical — tokens() never yields nulls)."""
    toks = tokens(text)
    if k == 1:
        return F.array_distinct(toks)
    n = F.size(toks)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - F.lit(k - 1)),
                lambda i: F.array_join(F.slice(toks, i, k), " "),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def ngram_jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two DISTINCT-element shingle arrays (exact).

    |a ∪ b| = |a| + |b| - |a ∩ b| when each array holds no duplicates —
    true for every in-repo caller (token_shingles/array_distinct outputs
    and the sorted-distinct sidecar hash lists) — so the union is never
    materialized: one array_intersect per pair instead of an intersect
    AND a union allocation (measured on the minhash verify join,
    tools/ab_minhash2.py). Same rational value, bit-identical double."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")


# ---------------------------------------------------------------- minhash

def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature as a per-row expression: for seed i, min over
    shingles of xxhash64(s, i).

    NOTE: only use this form when the result feeds exactly one consumer —
    Catalyst's CollapseProject/CollapseRepartition freely inline projection
    expressions into every downstream reference, turning the 64 aggregates
    into 64xN re-evaluations. The dedup operators below use
    `minhash_signatures_agg` (explode + groupBy), which evaluates each hash
    exactly once inside whole-stage codegen and shuffles by id — the right
    plan shape at scale."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.aggregate(
            shingles,
            F.lit(I64_MAX),
            lambda acc, s: F.least(acc, F.xxhash64(s, seed)),
        ),
    )


def minhash_signatures_agg(
    df: DataFrame, id_col: str, shingles: Column, num_hashes: int
) -> DataFrame:
    """(id, __sig array<long>) via explode + codegen'd min-aggregates.
    One shuffle on id; each shingle hashed num_hashes times, exactly once.
    (Measured: an ensure_parallelism spread here is a net LOSS locally —
    the hash work is cheap relative to the extra shuffle's stage overhead;
    at scale the scan is already wide.)"""
    ex = df.select(F.col(id_col).alias("__id"), F.explode(shingles).alias("__s"))
    aggs = [
        F.min(F.xxhash64(F.col("__s"), F.lit(seed))).alias(f"__h{seed}")
        for seed in range(num_hashes)
    ]
    wide = ex.groupBy("__id").agg(*aggs)
    return wide.select(
        "__id", F.array(*[F.col(f"__h{i}") for i in range(num_hashes)]).alias("__sig")
    )


def band_hashes(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: hash each contiguous slice of the signature."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(F.slice(signature, b * rows_per_band + 1, rows_per_band), b),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding, verified with exact
    shingle Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b.

    Plan shape: project signatures -> posexplode bands -> self equi-join on
    (band, band_hash) -> distinct candidate pairs -> verify join back to
    shingles. All shuffles are on small hash keys; the verify step touches
    candidates only.
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("__id"),
        token_shingles(F.col(text_col), shingle_k).alias("__sh"),
    )
    sig = minhash_signatures_agg(base, "__id", F.col("__sh"), num_hashes)
    banded = sig.select(
        "__id",
        F.posexplode(band_hashes(F.col("__sig"), bands, rows_per_band)).alias(
            "__band", "__bh"
        ),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.__band") == F.col("r.__band"))
            & (F.col("l.__bh") == F.col("r.__bh"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()
    )
    sh = base.select(F.col("__id"), F.col("__sh"))
    verified = (
        cand.join(sh.alias("sa"), F.col("id_a") == F.col("sa.__id"))
        .join(sh.alias("sb"), F.col("id_b") == F.col("sb.__id"))
        .select(
            "id_a",
            "id_b",
            F.round(ngram_jaccard(F.col("sa.__sh"), F.col("sb.__sh")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    return verified


def minhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Scalable near-duplicate *dedup* (vs. all-pairs enumeration): each
    LSH band bucket elects a representative (min id); every other member
    is verified only against its representative. Candidate volume is
    O(n x bands) regardless of how self-similar the corpus is — the
    all-pairs variant degenerates to O(n^2) when everything collides,
    which is exactly the regime where you are deduping.

    Returns (id, keep_id, jaccard): rows that near-duplicate an earlier
    surviving row, with the earliest matched representative.

    Verify joins intentionally reuse the per-doc shingle arrays from
    `base` rather than re-tokenizing after the join: a doc appears in
    MANY candidate pairs, so tokenize-after-join recomputes shingles
    per PAIR instead of per DOC (measured 2.0s -> 2.5s at sf0.1; worse
    the duppier the corpus).
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("__id"),
        token_shingles(F.col(text_col), shingle_k).alias("__sh"),
    )
    if signatures is not None:
        # precomputed at ingest (columnar_spark.dedupsig, `minhash`
        # column): the 64-hashes-per-shingle aggregation — the dominant
        # cost of this operator at scale — was paid once at write; only
        # banding, election and the exact-Jaccard verify (which still
        # tokenizes, one regex pass) run per query
        sig = signatures.select(
            F.col(id_col).alias("__id"), F.col("minhash").alias("__sig")
        )
    else:
        sig = minhash_signatures_agg(base, "__id", F.col("__sh"), num_hashes)
    banded = sig.select(
        "__id",
        F.posexplode(band_hashes(F.col("__sig"), bands, rows_per_band)).alias(
            "__band", "__bh"
        ),
    )
    # Representative election as a bucket-partitioned window min: ONE
    # shuffle of the banded rows and — unlike a groupBy+join back onto
    # banded — ONE evaluation of the signature pipeline (the join's two
    # sides each re-derived sig; ReuseExchange can't unify them because
    # partial aggregation sits below one exchange and not the other).
    # Measured 1.59s -> 1.28s on the sf0.1 headline. A degenerate bucket
    # lands in one task either way (the join keyed on the same bucket
    # has the identical hot-key placement); the window's partition
    # buffer is spill-safe.
    wb = Window.partitionBy("__band", "__bh")
    cand = (
        banded.withColumn("__rep", F.min("__id").over(wb))
        .filter(F.col("__id") > F.col("__rep"))
        .select("__id", "__rep")
        .distinct()
    )
    if signatures is not None and "shingle_hashes" in signatures.columns:
        # hash-verify: Jaccard over the stored sorted-distinct shingle
        # hashes — 8-byte longs shuffle instead of shingle strings, and
        # the text is never touched (identical value absent 64-bit
        # collisions; the hash_grams regime of strip_repeated_spans)
        vsrc = signatures.select(
            F.col(id_col).alias("__id"), F.col("shingle_hashes").alias("__sh")
        )
    else:
        vsrc = base
    # Both verify joins probe the SAME (__id, __sh) source keyed on
    # __id — aliased self-joins with explicit conditions (no renamed
    # join key on the rep side) keep the two source subtrees
    # canonically identical, and the first join's projection carries
    # only (member id, rep id, member shingles) into the second
    # exchange (measured faster than the rename-the-key form,
    # tools/ab_minhash2.py; rows identical).
    src = vsrc.select(F.col("__id"), F.col("__sh"))
    sa, sb, c = src.alias("sa"), src.alias("sb"), cand.alias("c")
    verified = (
        c.join(sa, F.col("c.__id") == F.col("sa.__id"))
        .select(
            F.col("c.__id").alias("__mid"),
            F.col("c.__rep").alias("__rep"),
            F.col("sa.__sh").alias("__sha"),
        )
        .join(sb, F.col("__rep") == F.col("sb.__id"))
        .select(
            F.col("__mid").alias("__id"),
            "__rep",
            F.round(ngram_jaccard(F.col("__sha"), F.col("sb.__sh")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    return (
        verified.groupBy("__id")
        .agg(F.min("__rep").alias("keep_id"), F.max("jaccard").alias("jaccard"))
        .select(F.col("__id").alias("id"), "keep_id", "jaccard")
    )


# ---------------------------------------------------------------- simhash

def feature_hashes(shingles: Column) -> Column:
    """xxhash64 per shingle — materialize this before simhash64 so the
    64 per-bit votes fold over cheap longs, not re-hashed strings."""
    return F.transform(shingles, lambda s: F.xxhash64(s))


def simhash_signatures_agg(df: DataFrame, id_col: str, shingles: Column) -> DataFrame:
    """(id, __sim long) via explode + 64 codegen'd vote-sum aggregates —
    same exactly-once (and no-spread) rationale as minhash_signatures_agg."""
    ex = df.select(F.col(id_col).alias("__id"), F.explode(shingles).alias("__s")).select(
        "__id", F.xxhash64(F.col("__s")).alias("__hh")
    )
    votes = ex.groupBy("__id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("__hh"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"__v{b}")
            for b in range(64)
        ]
    )
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = F.shiftleft(sim, 1) + F.when(F.col(f"__v{b}") > 0, 1).otherwise(0).cast("long")
    return votes.select("__id", sim.alias("__sim"))


def simhash64(hashes_col: str) -> Column:
    """64-bit SimHash over a named array<bigint> feature-hash column: for
    each bit position, the sign of sum(+1/-1) votes, folded into one long.

    Written as a SQL expression because the bit index is a lambda variable
    (the Python shiftright wrapper only accepts literal shift amounts)."""
    return F.expr(
        f"""
        aggregate(
          transform(sequence(0, 63),
            b -> CASE WHEN aggregate({hashes_col}, 0,
                   (acc, h) -> acc + (CASE WHEN (shiftright(h, b) & 1) = 1
                                      THEN 1 ELSE -1 END)) > 0
                 THEN 1L ELSE 0L END),
          0L, (acc, bit) -> shiftleft(acc, 1) + bit)
        """
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 2,
    max_hamming: int = 8,
    n_chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share at least one of
    `n_chunks` signature chunks (pigeonhole: any pair within
    n_chunks-1 bit flips per chunk region is caught), verified by full
    hamming distance."""
    chunk_bits = 64 // n_chunks
    # simhash_signatures_agg's groupBy is itself the materialization point:
    # the signature arrives post-shuffle, so neither join side re-tokenizes.
    base = simhash_signatures_agg(df, id_col, token_shingles(F.col(text_col), shingle_k))
    chunks = base.select(
        "__id",
        "__sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("__sim"), c * chunk_bits).bitwiseAND(
                        F.lit((1 << chunk_bits) - 1)
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("__chunk", "__ch"),
    )
    left = chunks.alias("l")
    right = chunks.alias("r")
    return (
        left.join(
            right,
            (F.col("l.__chunk") == F.col("r.__chunk"))
            & (F.col("l.__ch") == F.col("r.__ch"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            hamming64(F.col("l.__sim"), F.col("r.__sim")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 2,
    max_hamming: int = 8,
    n_chunks: int = 4,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Representative-based SimHash dedup (see minhash_dedup for the
    O(n x chunks) candidate argument). Returns (id, keep_id, hamming).

    With `signatures` (the ingest-time sidecar, columnar_spark.dedupsig,
    `simhash` column) the operator never touches the text at all: the
    hamming verify runs on the stored 64-bit sketches, so the whole
    query is a |docs|-row sidecar scan + the chunk-bucket election."""
    chunk_bits = 64 // n_chunks
    if signatures is not None:
        base = signatures.select(
            F.col(id_col).alias("__id"), F.col("simhash").alias("__sim")
        )
    else:
        base = simhash_signatures_agg(
            df, id_col, token_shingles(F.col(text_col), shingle_k)
        )
    chunks = base.select(
        "__id",
        "__sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("__sim"), c * chunk_bits).bitwiseAND(
                        F.lit((1 << chunk_bits) - 1)
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("__chunk", "__ch"),
    )
    # same window-min election as minhash_dedup (single evaluation of
    # the signature pipeline); the struct min carries the elected
    # representative's signature alongside its id in one window pass
    wc = Window.partitionBy("__chunk", "__ch")
    best = F.min(F.struct(F.col("__id"), F.col("__sim"))).over(wc)
    cand = (
        chunks.withColumn("__rep", best["__id"])
        .withColumn("__repsim", best["__sim"])
        .filter(F.col("__id") > F.col("__rep"))
        .select("__id", "__sim", "__rep", "__repsim")
        .distinct()
    )
    verified = cand.select(
        "__id",
        "__rep",
        hamming64(F.col("__sim"), F.col("__repsim")).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
    return (
        verified.groupBy("__id")
        .agg(F.min("__rep").alias("keep_id"), F.min("hamming").alias("hamming"))
        .select(F.col("__id").alias("id"), "keep_id", "hamming")
    )


# ------------------------------------------------- transitive clustering

def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Transitive duplicate clusters from a pair list: (id, component)
    where component is the MIN id reachable through any chain of pairs.

    The representative-assignment *_dedup operators attach each doc to
    one bucket representative — A~B and B~C may land in different
    groups. This closes the transitivity gap with the standard
    distributed min-label propagation: every iteration joins each node's
    current label against the edge list and keeps the minimum seen;
    converges in O(diameter) rounds (near-dup cluster diameters are tiny
    — chains longer than ~5 are rare), each round one shuffle-join on
    id. `localCheckpoint` truncates the growing lineage so Catalyst
    doesn't re-expand the whole iteration per round (the same
    re-evaluation trap the signature aggs document).

    Raises after max_iter rounds without convergence rather than
    returning silently-wrong clusters."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    for _ in range(max_iter):
        # label each node with min(own, min over neighbors' labels)
        neighbor = (
            edges.join(labels, edges["dst"] == labels["id"])
            .select(F.col("src").alias("id"), F.col("comp"))
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


# ------------------------------------------------------- embedding cosine

# Hard ceiling for the quadratic correctness-oracle paths (method="exact",
# all-pairs verify). These exist ONLY to validate the LSH/bucketed forms at
# test scale; refusing large inputs keeps them from ever reaching a
# production-sized table, where the O(n^2) join is a non-starter.
QUADRATIC_ORACLE_MAX_ROWS = 100_000


def _guard_quadratic(df: DataFrame, what: str) -> None:
    n = df.count()
    if n > QUADRATIC_ORACLE_MAX_ROWS:
        raise ValueError(
            f"{what} is a quadratic correctness oracle (O(n^2) self-join) and "
            f"refuses inputs over {QUADRATIC_ORACLE_MAX_ROWS} rows (got {n}). "
            "Use the LSH/bucketed variant for production scale."
        )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    method: str = "lsh",
    n_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity.

    method="exact": full self-join (correctness oracle; quadratic).
    method="lsh": random-hyperplane sign sketch; candidates share the full
    sign signature (high-threshold regime), then exact cosine verify.
    Hyperplanes are generated with a deterministic LCG so plans are
    reproducible without numpy state.
    """
    dim_row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = dim_row["d"]

    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))

    if method == "exact":
        _guard_quadratic(base, "embedding_neardup_pairs(method='exact')")
        left, right = base.alias("l"), base.alias("r")
        pairs = left.join(right, F.col("l.__id") < F.col("r.__id"))
    else:
        # Deterministic pseudo-random unit-free hyperplanes via LCG.
        def lcg(n: int, s: int) -> list[float]:
            out, x = [], (s * 2654435761 + 1013904223) % (1 << 32)
            for _ in range(n):
                x = (1103515245 * x + 12345) % (1 << 31)
                out.append((x / float(1 << 31)) * 2.0 - 1.0)
            return out

        planes = [lcg(dim, seed + p) for p in range(n_planes)]
        from columnar_spark.functions.vector import dot, vec_lit

        # folds, not dim-unrolls: n_planes chains in one projection blow
        # past the JIT method limit and run interpreted (measured hazard)
        sig = F.concat(
            *[
                F.when(dot(F.col("__v"), vec_lit(pl)) >= 0, F.lit("1")).otherwise(F.lit("0"))
                for pl in planes
            ]
        )
        sketched = base.withColumn("__sig", sig)
        left, right = sketched.alias("l"), sketched.alias("r")
        pairs = left.join(
            right,
            (F.col("l.__sig") == F.col("r.__sig")) & (F.col("l.__id") < F.col("r.__id")),
        )

    return pairs.select(
        F.col("l.__id").alias("id_a"),
        F.col("r.__id").alias("id_b"),
        F.round(cosine_sim(F.col("l.__v"), F.col("r.__v")), 6).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)


# --------------------------- repeated substring spans (ExactSubstr dedup)
#
# The substring-granular dedup of Lee et al., "Deduplicating Training Data
# Makes Language Models Better" (2021): any substring of >= N tokens that
# occurs more than once in the corpus is repeated content (boilerplate,
# licenses, mirrored paragraphs) and should be cut from the training text.
# The paper builds a corpus-wide suffix array; the Spark-first form works
# at token n-gram granularity, which detects exactly the same >=n-token
# repeats (every repeated substring of length >= n contains a repeated
# n-gram at each offset, so the union of repeated n-gram windows IS the
# repeated-substring coverage, quantized to n-token resolution).
#
# Scale design: one groupBy on the gram key with map-side combine, then a
# join of occurrences against the (rare) repeated grams — the corpus
# never self-joins. Islands merge per doc under a doc-partitioned window
# (state bounded by doc length). `hash_grams=True` swaps the shuffle key
# from the gram STRING to xxhash64(gram) — 8-byte keys at 100 TB; the
# string form is kept for the DuckDB-portable oracle.


def repeated_span_grams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    hash_grams: bool = False,
) -> DataFrame:
    """(__id, __s, __key): every n-token window of every doc, 1-based
    start position, keyed by the gram text — or, with hash_grams=True
    (the production strip default), by a 128-bit compound hash
    struct(xxhash64(gram), xxhash64(reverse(gram))). 64 bits is NOT
    enough at corpus scale: ~1e10 distinct grams puts a birthday
    collision near certainty, and a collision merges two unrelated
    grams — under keep_first, a passage that occurs exactly ONCE could
    be cut with no surviving copy (silent loss of unique training
    text). Two independent 64-bit digests push that bound to ~2^-64
    per corpus. Text keys remain the oracle-exact form."""
    toks = F.split(F.col(text_col), " ")  # literal single-space split:
    # exactly string_split(text, ' ') in ANSI SQL — the oracle contract
    base = df.select(F.col(id_col).alias("__id"), toks.alias("__toks")).filter(
        F.size("__toks") >= n
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("__toks") - F.lit(n - 1)),
        lambda i: F.array_join(F.slice("__toks", i, n), " "),
    )
    g = (
        base.select("__id", F.posexplode(grams).alias("__p", "__gram"))
        .select(
            "__id",
            (F.col("__p") + 1).alias("__s"),
            (
                F.struct(
                    F.xxhash64("__gram").alias("h1"),
                    F.xxhash64(F.reverse(F.col("__gram"))).alias("h2"),
                )
                if hash_grams
                else F.col("__gram")
            ).alias("__key"),
        )
    )
    return g


# Kernel gate for the rolling-hash gram keys: the mapInArrow kernel pays
# the fixed Python-worker round-trip every execution (measured +0.18s at
# sf0.1 where the whole query is ~0.45s) and wins in proportion to gram
# volume (10x corpus: 2.13s text-keys vs 1.52s kernel). The crossover
# sits between the two measured corpora (~0.36 MB and ~3.4 MB of
# documents); 2 MiB splits it. Same pattern and rationale as
# decontaminate.KERNEL_BYTES_CONF (guide §1.3: an optimization that
# helps one scale must not hurt the measured one). 0 forces the kernel.
SPANS_KERNEL_BYTES_CONF = "spark.columnar.spans.kernelBytesThreshold"
SPANS_KERNEL_BYTES_DEFAULT = 2 * 1024 * 1024


def _spans_kernel_worthwhile(df: DataFrame) -> bool:
    try:
        thr = int(
            df.sparkSession.conf.get(
                SPANS_KERNEL_BYTES_CONF, str(SPANS_KERNEL_BYTES_DEFAULT)
            )
        )
    except Exception:
        thr = SPANS_KERNEL_BYTES_DEFAULT
    if thr <= 0:
        return True
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return True
    return size >= thr


def repeated_span_gram_keys_arrow(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(__id, __s, __k1, __k2): one row per n-token window, keyed by a
    128-bit rolling hash of the window's tokens, computed in a
    mapInArrow kernel — gram STRINGS never materialize as JVM rows
    (guide §4.2; the transform+array_join window builder is an
    interpreted HOF evaluated per position, and the gram text would
    otherwise be carried through the count shuffle).

    Key equality == gram-string equality: tokens come from the literal
    single-space split (Python str.split(" ") has exactly Spark
    split(text, ' ') limit=-1 semantics, empties kept), tokens are
    space-free so ' '.join is injective on token sequences, token
    identity hashes through per-task factorize + blake2b(16 bytes) per
    DISTINCT token (deterministic across tasks and processes — no
    PYTHONHASHSEED dependence), and the two gram keys are independent
    degree-n polynomials over the two 64-bit digest halves. Same
    collision posture as the hash_grams struct keys (two independent
    64-bit digests, ~2^-64 per-corpus false-merge bound)."""
    import numpy as np

    nn = int(n)
    id_type = df.select(id_col).schema.fields[0].dataType.simpleString()
    out_schema = f"__id {id_type}, __s long, __k1 long, __k2 long"
    src = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))

    def _kernel(batches):
        import pandas as pd
        import pyarrow as pa
        from hashlib import blake2b

        A1 = np.uint64(0x9E3779B97F4A7C15)
        A2 = np.uint64(0xC2B2AE3D27D4EB4F)

        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            parts = [
                t.split(" ") if t is not None else None for t in texts
            ]
            lens = np.fromiter(
                (len(p) if p is not None else 0 for p in parts),
                dtype=np.int64,
                count=len(parts),
            )
            valid = np.maximum(lens - nn + 1, 0)
            tot_valid = int(valid.sum())
            if tot_valid == 0:
                yield pa.RecordBatch.from_arrays(
                    [ids.slice(0, 0),
                     pa.array([], type=pa.int64()),
                     pa.array([], type=pa.int64()),
                     pa.array([], type=pa.int64())],
                    names=["__id", "__s", "__k1", "__k2"],
                )
                continue
            flat = np.empty(int(lens.sum()), dtype=object)
            i = 0
            for p in parts:
                if p is not None:
                    flat[i : i + len(p)] = p
                    i += len(p)
            codes, uniques = pd.factorize(flat)
            uh = np.empty((len(uniques), 2), dtype=np.uint64)
            for j, u in enumerate(uniques):
                d = blake2b(u.encode("utf-8"), digest_size=16).digest()
                uh[j, 0] = int.from_bytes(d[:8], "little")
                uh[j, 1] = int.from_bytes(d[8:], "little")
            th1 = uh[codes, 0]
            th2 = uh[codes, 1]
            T = len(flat)
            m_tot = T - nn + 1
            with np.errstate(over="ignore"):
                k1 = np.zeros(m_tot, dtype=np.uint64)
                k2 = np.zeros(m_tot, dtype=np.uint64)
                for j in range(nn):
                    k1 = k1 * A1 + th1[j : j + m_tot]
                    k2 = k2 * A2 + th2[j : j + m_tot]
            offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
            doc_idx = np.repeat(np.arange(len(parts)), valid)
            base = np.repeat(
                np.concatenate([[0], np.cumsum(valid)[:-1]]), valid
            )
            starts_local = np.arange(tot_valid) - base
            starts_global = offs[doc_idx] + starts_local
            yield pa.RecordBatch.from_arrays(
                [
                    ids.take(pa.array(doc_idx)),
                    pa.array(starts_local + 1, type=pa.int64()),
                    pa.array(k1[starts_global].view(np.int64)),
                    pa.array(k2[starts_global].view(np.int64)),
                ],
                names=["__id", "__s", "__k1", "__k2"],
            )

    return src.mapInArrow(_kernel, out_schema)


def repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    keep_first: bool = False,
    hash_grams: bool = False,
) -> DataFrame:
    """Merged (doc, span_start, span_end) token intervals covered by
    n-grams that occur more than once corpus-wide (including twice within
    one doc — self-repetition is repetition). 1-based inclusive token
    positions. keep_first=True exempts each gram's globally first
    occurrence (ordered by (id, position)) so one copy of every repeated
    passage survives a subsequent strip."""
    rep = _repeated_occurrences(
        df, text_col, id_col, n, hash_grams, with_first=keep_first
    )
    if keep_first:
        rep = rep.filter(~F.col("__is_first"))
    return _merged_spans(rep, n, id_col)


def _repeated_occurrences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    hash_grams,
    with_first: bool = True,
) -> DataFrame:
    """(__id, __s[, __is_first]) for every occurrence of a gram that
    repeats corpus-wide; __is_first marks the gram's globally first
    occurrence (ordered by (id, position)) and is only computed when a
    caller needs it (with_first). `hash_grams`: False = gram text keys,
    True = xxhash64-struct keys, "kernel" = the Arrow rolling-hash keys
    (repeated_span_gram_keys_arrow — gram strings never materialize;
    same results absent 128-bit collisions). "kernel" is size-gated:
    below SPANS_KERNEL_BYTES_CONF the fixed Python-boundary cost exceeds
    the gram-volume win, so small inputs take the text-key plan (the
    oracle-exact declared form — identical rows either way)."""
    if hash_grams == "kernel" and not _spans_kernel_worthwhile(df):
        hash_grams = False
    if hash_grams == "kernel":
        g = repeated_span_gram_keys_arrow(df, text_col, id_col, n)
        wk = Window.partitionBy("__k1", "__k2")
    else:
        g = repeated_span_grams(df, text_col, id_col, n, hash_grams)
        # gram-partitioned window count/min: one shuffle of the
        # occurrences and ONE evaluation of the tokenize+gram pipeline
        # (a groupBy+join back onto g would re-derive it on both join
        # sides — the same trap minhash_dedup's representative election
        # had)
        wk = Window.partitionBy("__key")
    out = g.withColumn("__cnt", F.count(F.lit(1)).over(wk))
    cols = ["__id", "__s"]
    if with_first:
        first = F.min(F.struct(F.col("__id"), F.col("__s"))).over(wk)
        out = out.withColumn(
            "__is_first",
            (F.col("__id") == first["__id"]) & (F.col("__s") == first["__s"]),
        )
        cols.append("__is_first")
    return out.filter(F.col("__cnt") > 1).select(*cols)


def _merged_spans(occ: DataFrame, n: int, id_col: str) -> DataFrame:
    """Union of [__s, __s+n-1] windows merged into maximal intervals —
    gaps-and-islands per doc: a window start past the running max end
    (+1: token-adjacent coverage is one contiguous cut) breaks a group.
    Doc-partitioned window; state bounded by doc length."""
    sp = occ.select("__id", "__s", (F.col("__s") + F.lit(n - 1)).alias("__e"))
    wo = Window.partitionBy("__id").orderBy("__s")
    wprev = wo.rowsBetween(Window.unboundedPreceding, -1)
    sp = (
        sp.withColumn("__maxe", F.max("__e").over(wprev))
        .withColumn(
            "__brk",
            F.when(
                F.col("__maxe").isNull() | (F.col("__s") > F.col("__maxe") + 1), 1
            ).otherwise(0),
        )
        .withColumn("__grp", F.sum("__brk").over(wo))
    )
    return (
        sp.groupBy("__id", "__grp")
        .agg(
            F.min("__s").cast("long").alias("span_start"),
            F.max("__e").cast("long").alias("span_end"),
        )
        .select(F.col("__id").alias(id_col), "span_start", "span_end")
    )


def strip_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    keep_first: bool = True,
    hash_grams: bool = True,
) -> DataFrame:
    """Rewrite `text_col` with every repeated span's tokens removed.
    keep_first=True is the paper's keep-one-occurrence policy: tokens
    inside a gram's globally FIRST occurrence are protected, so exactly
    one copy of every repeated passage survives — including
    self-overlapping repeats inside a single doc, where the cut windows
    overlap the surviving copy. Pure codegen rewrite: the per-doc span
    lists join on (repeated docs only) and an indexed array filter drops
    covered-but-unprotected tokens — no UDF, no driver-side pass."""
    occ = _repeated_occurrences(df, text_col, id_col, n, hash_grams)
    cut = occ.filter(~F.col("__is_first")) if keep_first else occ
    spans = _merged_spans(cut, n, id_col)
    agg = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__cut")
    )
    joined = df.join(agg, id_col, "left")
    if keep_first:
        protect = _merged_spans(occ.filter(F.col("__is_first")), n, id_col)
        pagg = protect.groupBy(id_col).agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("__protect")
        )
        joined = joined.join(pagg, id_col, "left")
    else:
        joined = joined.withColumn(
            "__protect",
            F.lit(None).cast("array<struct<span_start:long,span_end:long>>"),
        )

    def _covered(spans_col):
        def pred(i):
            return F.exists(
                F.coalesce(
                    spans_col,
                    F.array().cast("array<struct<span_start:long,span_end:long>>"),
                ),
                lambda sp: (i + 1 >= sp["span_start"]) & (i + 1 <= sp["span_end"]),
            )

        return pred

    in_cut = _covered(F.col("__cut"))
    in_protect = _covered(F.col("__protect"))
    toks = F.split(F.col(text_col), " ")
    kept = F.filter(toks, lambda x, i: ~in_cut(i) | in_protect(i))
    return (
        joined.withColumn(
            text_col,
            F.when(F.col("__cut").isNotNull(), F.array_join(kept, " ")).otherwise(
                F.col(text_col)
            ),
        )
        .drop("__cut", "__protect")
    )
