"""Incremental (streaming) near-duplicate detection.

The batch MinHash-LSH dedup (operators/dedup.py:minhash_dedup) answers
"which docs in THIS corpus duplicate each other". A training-data
ingest pipeline also needs the incremental form: as documents stream
in, flag each one that near-duplicates ANYTHING seen before — without
re-scanning history. Reference analog: the columnar store's index
maintenance on inserts (SURVEY §2 E9); the LSH-state design follows
the published streaming-LSH discipline (state per band bucket, O(1)
probe per band).

Shape: per incoming doc compute the same banded MinHash signature the
batch operator uses, explode to (band, bucket_hash) keys, and keep one
stateful row per bucket — the first doc id that ever hit it.
Collisions emit (doc_id, first_seen_id) candidate rows; exact
verification (ngram_jaccard on the two texts) stays a batch join
downstream, on candidates only. State is bounded by the number of
distinct buckets (~n_docs x bands), each a 16-byte pair — 1B docs x 16
bands ~ 256 GB across the cluster's state stores, shardable by bucket
key; a TTL (`GroupStateTimeout`) can cap it for open-ended streams.

Per-band bucket state means a doc colliding with an earlier doc in K
bands emits K candidate rows; dedupe downstream (the batch verifier's
groupBy does). Like every LSH path in this engine the output is
candidates, recall-gated, never oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from columnar_spark.operators.dedup import (
    band_hashes,
    minhash_signature,
    token_shingles,
)

NEARDUP_STATE_SCHEMA = T.StructType([T.StructField("first_id", T.LongType())])

NEARDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("matched_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
    ]
)


def _bucket_fn(key, pdfs, state):
    import pandas as pd

    if state.hasTimedOut:  # TTL eviction for open-ended streams
        state.remove()
        return
    band = int(key[0])
    ids = sorted({int(i) for pdf in pdfs for i in pdf["doc_id"].tolist()})
    if not ids:
        return
    if state.exists:
        (first,) = state.get
        dups = ids
    else:
        first, dups = ids[0], ids[1:]
        state.update((first,))
    if dups:
        yield pd.DataFrame(
            {"doc_id": dups, "matched_id": [first] * len(dups),
             "band": [band] * len(dups)}
        )


def banded_minhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_id, band, bucket_hash) — one row per band. The per-row
    signature expression is safe here: it feeds exactly one consumer
    (the posexplode), so Catalyst cannot duplicate the aggregates."""
    sig = minhash_signature(
        token_shingles(F.col(text_col), shingle_k), num_hashes
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(band_hashes(sig, bands, num_hashes // bands)).alias(
            "band", "bucket_hash"
        ),
    )


def stream_neardup_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Streaming operator: emits (doc_id, matched_id, band) whenever an
    incoming document lands in an LSH bucket already claimed by an
    earlier document (within this stream's checkpointed state)."""
    banded = banded_minhash(docs, text_col, id_col, num_hashes, bands, shingle_k)
    return banded.groupBy("band", "bucket_hash").applyInPandasWithState(
        _bucket_fn,
        outputStructType=NEARDUP_OUT_SCHEMA,
        stateStructType=NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
