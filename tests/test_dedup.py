"""Dedup / similarity operators (north-star training-data ops)."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators import dedup as DD


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (3, "completely different text about spark engines"),
        (4, "completely different text about spark engines"),  # exact dup of 3
        (5, "unrelated words entirely banana apple orange"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_exact_dedup_keeps_min_id(docs):
    out = DD.exact_dedup(docs, ["text"], "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 1, 3, 5]


def test_duplicate_groups(docs):
    out = {r["keep_id"]: r for r in DD.duplicate_groups(docs, ["text"], "doc_id").collect()}
    assert set(out) == {0, 3}
    assert out[0]["member_ids"] == [0, 2] and out[0]["dup_count"] == 2


def test_ngram_jaccard_exact_value(spark):
    df = spark.createDataFrame([(["a", "b", "c"], ["b", "c", "d"])], "x: array<string>, y: array<string>")
    v = df.select(DD.ngram_jaccard(F.col("x"), F.col("y")).alias("j")).first()["j"]
    assert v == 2 / 4


def test_minhash_estimates_jaccard(docs):
    """MinHash signature agreement rate approximates exact Jaccard."""
    base = docs.select(
        F.col("doc_id").alias("__id"),
        DD.token_shingles(F.col("text"), 2).alias("__sh"),
    )
    sig = {r["__id"]: r["__sig"] for r in
           DD.minhash_signatures_agg(base, "__id", F.col("__sh"), 128).collect()}
    sh = {r["__id"]: set(r["__sh"]) for r in base.collect()}
    est = sum(a == b for a, b in zip(sig[0], sig[1])) / 128
    exact = len(sh[0] & sh[1]) / len(sh[0] | sh[1])
    assert abs(est - exact) < 0.2
    # identical docs -> identical signatures
    assert sig[0] == sig[2]


def test_minhash_dedup_finds_planted_dups(docs):
    out = {r["id"]: r["keep_id"] for r in
           DD.minhash_dedup(docs, "text", "doc_id", num_hashes=64, bands=16,
                            shingle_k=2, jaccard_threshold=0.5).collect()}
    assert out[2] == 0          # exact dup
    assert out[4] == 3          # exact dup
    assert out.get(1) == 0      # near-dup
    assert 5 not in out


def test_minhash_lsh_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             DD.minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=64, bands=16,
                                  shingle_k=2, jaccard_threshold=0.99).collect()}
    assert (0, 2) in pairs and (3, 4) in pairs


def test_simhash_identical_docs_and_dedup(docs):
    base = DD.simhash_signatures_agg(docs, "doc_id", DD.token_shingles(F.col("text"), 2))
    sims = {r["__id"]: r["__sim"] for r in base.collect()}
    assert sims[0] == sims[2] and sims[3] == sims[4]
    assert DD.hamming64(F.lit(sims[0]), F.lit(sims[1])) is not None

    out = {r["id"]: r["keep_id"] for r in
           DD.simhash_dedup(docs, "text", "doc_id", shingle_k=2,
                            max_hamming=10, n_chunks=4).collect()}
    assert out[2] == 0 and out[4] == 3


def test_embedding_neardup_exact_and_lsh(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, v: array<float>")
    exact = {(r["id_a"], r["id_b"]) for r in
             DD.embedding_neardup_pairs(df, "v", "vec_id", threshold=0.95,
                                        method="exact").collect()}
    assert exact == {(0, 1)}
    lsh = {(r["id_a"], r["id_b"]) for r in
           DD.embedding_neardup_pairs(df, "v", "vec_id", threshold=0.95,
                                      method="lsh", n_planes=4).collect()}
    assert lsh <= exact  # LSH candidates are verified, never false-positive


def test_connected_components_matches_union_find(spark):
    """Transitive clustering vs a python union-find oracle, on chains,
    cycles, stars, and singletons-with-self... (edges only)."""
    from columnar_spark.operators.dedup import connected_components

    edges = [
        (1, 2), (2, 3), (3, 4),          # chain -> comp 1
        (10, 11), (11, 10),              # cycle/dup edge -> comp 10
        (20, 21), (20, 22), (20, 23),    # star -> comp 20
        (30, 31), (32, 31),              # V shape -> comp 30
        (5, 40),                         # bridges nothing else
    ]
    pairs = spark.createDataFrame(edges, "id_a: long, id_b: long")
    got = {
        r["id"]: r["comp"]
        for r in connected_components(pairs, max_iter=10).collect()
    }

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}
    assert got == want


def test_connected_components_on_minhash_pairs(spark):
    """End-to-end: LSH pair candidates -> transitive clusters; every
    pair's endpoints must share a component."""
    from columnar_spark.operators.dedup import connected_components, minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=32, bands=4, shingle_k=1,
        jaccard_threshold=0.9,
    ).select("id_a", "id_b")
    comp = connected_components(pairs)
    lookup = {r["id"]: r["comp"] for r in comp.collect()}
    for r in pairs.collect():
        assert lookup[r["id_a"]] == lookup[r["id_b"]]


def test_prefix2_limited_split_equals_full_tokenize(spark):
    """_prefix2_tokens (btrim + limit-3 split) must equal the full
    tokenize-then-slice form for every input shape: leading/trailing
    whitespace runs, tabs/newlines, one-token docs, empty and
    all-whitespace docs, unicode NBSP (NOT split — both forms keep it
    inside a token)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from columnar_spark.functions.text import tokens

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "  leading spaces here"),
        (3, "\t tab\nnewline mix \r"),
        (4, "one"),
        (5, ""),
        (6, "   \t  "),
        (7, "nbsp stays one-token second"),
        (8, "a  b   c"),
    ]
    df = spark.createDataFrame(rows, "id: long, text: string")
    got = df.select(
        "id", E._prefix2_tokens(F.col("text")).alias("p")
    ).collect()
    want = df.select(
        "id",
        F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 2)).alias("p"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
