"""Text -> embedding vectors — reference embeddings/ parity (§2.F7).

The reference ships a Rust sidecar exposing `TextToEmbeddings_i::Convert`
(knn/knn.h:146-163) with a model registry spanning API providers
(OpenAI text-embedding-{ada-002,3-small,3-large} — openai.rs:17,87-89;
Voyage — voyage.rs:17-18; Jina — jina.rs) and local candle models
(local.rs:7-21), dispatched by model name (mod.rs:27-69).

Spark-first re-expression: `embed_text` runs an Arrow-batched
`mapInPandas` over the text column — the batch interface maps 1:1 onto
provider batch APIs and local model forward passes. No model weights or
network exist in this container, so every registry entry is backed by the
same deterministic hash-projection stub (unit-norm, fixed dim per model);
`provider="api"/"local"` models raise NotImplementedError at the exact
call site a real client would occupy. The registry dims mirror the
reference's real ones so downstream schemas are production-shaped.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


@dataclass(frozen=True)
class EmbedModel:
    name: str
    dim: int
    provider: str  # "stub" | "api" | "local"


# Mirrors the shape of the reference registry (embeddings/src/model/mod.rs:27-69,
# dims per openai.rs:87-89); only "stub" entries are executable here.
MODEL_REGISTRY: dict[str, EmbedModel] = {
    m.name: m
    for m in [
        EmbedModel("stub-64", 64, "stub"),
        EmbedModel("stub-256", 256, "stub"),
        EmbedModel("openai/text-embedding-ada-002", 1536, "api"),
        EmbedModel("openai/text-embedding-3-small", 1536, "api"),
        EmbedModel("openai/text-embedding-3-large", 3072, "api"),
        EmbedModel("voyage/voyage-3", 1024, "api"),
        EmbedModel("jina/jina-embeddings-v3", 1024, "api"),
        EmbedModel("local/bert-base", 768, "local"),
    ]
}


def _stub_embed(text: str, dim: int) -> list[float]:
    """Deterministic unit-norm pseudo-embedding: sha256-seeded values.
    Stands in for a model forward pass; stable across sessions."""
    out: list[float] = []
    i = 0
    while len(out) < dim:
        digest = hashlib.sha256(f"{text}\x00{i}".encode()).digest()
        for j in range(0, 32, 4):
            if len(out) >= dim:
                break
            out.append(int.from_bytes(digest[j : j + 4], "big") / 2**31 - 1.0)
        i += 1
    n = math.sqrt(sum(v * v for v in out)) or 1.0
    return [v / n for v in out]


def embed_text(
    df: DataFrame,
    text_col: str,
    model: str = "stub-64",
    out_col: str = "embedding",
) -> DataFrame:
    """Append an embedding column via Arrow-batched mapInPandas.

    Batch size follows spark.sql.execution.arrow.maxRecordsPerBatch; the
    per-batch loop is where a provider client or local model would run
    (Convert(texts[], threads) ↔ one partition per worker)."""
    if model not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {model!r}; see MODEL_REGISTRY")
    spec = MODEL_REGISTRY[model]

    out_fields = [*df.schema.fields, T.StructField(out_col, T.ArrayType(T.FloatType()))]
    out_schema = T.StructType(out_fields)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if spec.provider != "stub":
                raise NotImplementedError(
                    f"model {spec.name!r} needs a {spec.provider} backend "
                    "(network/model weights unavailable in this container); "
                    "use a stub-* model"
                )
            pdf = pdf.copy()
            pdf[out_col] = [_stub_embed(t or "", spec.dim) for t in pdf[text_col]]
            yield pdf

    return df.mapInPandas(batches, out_schema)
