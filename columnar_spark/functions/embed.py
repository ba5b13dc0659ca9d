"""Text -> embedding vectors — reference embeddings/ parity (§2.F7).

The reference ships a Rust sidecar exposing `TextToEmbeddings_i::Convert`
(knn/knn.h:146-163) with a model registry spanning API providers
(OpenAI text-embedding-{ada-002,3-small,3-large} — openai.rs:17,87-89;
Voyage — voyage.rs:17-18; Jina — jina.rs) and local models
(local.rs:7-21), dispatched by model name (mod.rs:27-69, `Model` enum).

Spark-first re-expression: `embed_text` runs an Arrow-batched
`mapInPandas` over the text column — the batch interface maps 1:1 onto
provider batch APIs and local model forward passes. Dispatch mirrors the
reference (mod.rs:71-80 predict match):

- provider="api": a real HTTP batch client (`ApiEmbedClient`, stdlib
  urllib — openai.rs:96-122 request shape: POST {input, model} with a
  Bearer key, read data[].embedding). Runs whenever an API key is
  present (argument or the provider's conventional env var); without one
  it raises at the same call site the reference raises its key error.
  The client is covered by a mocked-transport unit test, the same
  strategy as the reference's openai_test.rs.
- provider="local": sentence-transformers forward pass, import-gated
  like hnswlib (no weights/wheel in this container -> ImportError with
  guidance; the code path is real).
- provider="stub": deterministic sha256 hash-projection (unit-norm,
  fixed dim) — the always-executable path tests and demos use.

The per-partition client instantiation inside mapInPandas means workers
never pickle sockets/models, and each partition batches its own requests
— Convert(texts[], threads) ↔ one partition per worker.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import urllib.error
import urllib.request
from dataclasses import dataclass
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


@dataclass(frozen=True)
class EmbedModel:
    name: str
    dim: int
    provider: str  # "stub" | "api" | "local" | "local-hf"
    api_url: str | None = None
    key_env: str | None = None
    model_id: str | None = None  # provider-side model name
    # local-hf pooling: "mean" (BERT/T5-style encoders) or "last"
    # (decoder-style embedding models, e.g. Qwen3-Embedding)
    pooling: str = "mean"


# Mirrors the shape of the reference registry (embeddings/src/model/mod.rs:27-69,
# dims per openai.rs:87-89; endpoints/env conventions are the providers'
# public ones, same as the reference's clients).
MODEL_REGISTRY: dict[str, EmbedModel] = {
    m.name: m
    for m in [
        EmbedModel("stub-64", 64, "stub"),
        EmbedModel("stub-256", 256, "stub"),
        EmbedModel(
            "openai/text-embedding-ada-002", 1536, "api",
            "https://api.openai.com/v1/embeddings", "OPENAI_API_KEY",
            "text-embedding-ada-002",
        ),
        EmbedModel(
            "openai/text-embedding-3-small", 1536, "api",
            "https://api.openai.com/v1/embeddings", "OPENAI_API_KEY",
            "text-embedding-3-small",
        ),
        EmbedModel(
            "openai/text-embedding-3-large", 3072, "api",
            "https://api.openai.com/v1/embeddings", "OPENAI_API_KEY",
            "text-embedding-3-large",
        ),
        EmbedModel(
            "voyage/voyage-3", 1024, "api",
            "https://api.voyageai.com/v1/embeddings", "VOYAGE_API_KEY", "voyage-3",
        ),
        EmbedModel(
            "jina/jina-embeddings-v3", 1024, "api",
            "https://api.jina.ai/v1/embeddings", "JINA_API_KEY",
            "jina-embeddings-v3",
        ),
        EmbedModel("local/bert-base", 768, "local", model_id="bert-base-uncased"),
        # Non-BERT local families through plain transformers (the
        # reference's candle registry spans BERT/Gemma/Llama/Mistral/
        # Qwen3/T5, local.rs:7-21): T5 encoder with mean pooling and a
        # Qwen3 decoder-style embedder with last-token pooling.
        EmbedModel(
            "local/t5-base", 768, "local-hf", model_id="t5-base", pooling="mean"
        ),
        EmbedModel(
            "local/qwen3-embedding-0.6b", 1024, "local-hf",
            model_id="Qwen/Qwen3-Embedding-0.6B", pooling="last",
        ),
        # Decoder-family embedding heads (reference local.rs:7-21 loads
        # Gemma/Llama/Mistral locally via candle): last-token pooling,
        # the decoder-embedding convention (e.g. E5-Mistral's model
        # card) — causal attention puts the sequence summary on the
        # final non-pad state.
        EmbedModel(
            "local/llama-3.2-1b", 2048, "local-hf",
            model_id="meta-llama/Llama-3.2-1B", pooling="last",
        ),
        EmbedModel(
            "local/e5-mistral-7b", 4096, "local-hf",
            model_id="intfloat/e5-mistral-7b-instruct", pooling="last",
        ),
        EmbedModel(
            "local/gemma-2b", 2048, "local-hf",
            model_id="google/gemma-2b", pooling="last",
        ),
    ]
}

API_BATCH_SIZE = 128  # texts per HTTP request (providers cap around 2048)


class ApiEmbedClient:
    """Minimal batch client for the OpenAI-compatible /v1/embeddings shape
    all three reference providers speak (openai.rs:106-122: POST
    {"input": [...], "model": id} + Authorization: Bearer; response
    {"data": [{"embedding": [...]}, ...]} ordered by input index).

    `transport` is injectable for tests (mocked like openai_test.rs);
    the default posts with urllib (stdlib — no extra wheels)."""

    def __init__(
        self,
        api_url: str,
        api_key: str,
        model_id: str,
        timeout: float = 10.0,
        transport=None,
    ):
        if not api_key or api_key != api_key.strip():
            raise ValueError("API key must be non-empty with no surrounding whitespace")
        self.api_url = api_url
        self.api_key = api_key
        self.model_id = model_id
        self.timeout = timeout
        self._transport = transport or self._http_post

    def _http_post(self, body: dict) -> dict:
        req = urllib.request.Request(
            self.api_url,
            data=json.dumps(body).encode(),
            headers={
                "Authorization": f"Bearer {self.api_key}",
                "Content-Type": "application/json",
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read())

    def embed(self, texts: Sequence[str]) -> list[list[float]]:
        out: list[list[float]] = []
        for start in range(0, len(texts), API_BATCH_SIZE):
            chunk = list(texts[start : start + API_BATCH_SIZE])
            payload = self._transport({"input": chunk, "model": self.model_id})
            rows = sorted(payload["data"], key=lambda d: d.get("index", 0))
            if len(rows) != len(chunk):
                raise ValueError(
                    f"provider returned {len(rows)} embeddings for {len(chunk)} inputs"
                )
            out.extend([list(map(float, d["embedding"])) for d in rows])
        return out


def _local_embed(texts: Sequence[str], model_id: str) -> list[list[float]]:
    """sentence-transformers forward pass — import-gated (local.rs:7-21
    analog; the wheel/weights are not in this container)."""
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError as e:
        raise ImportError(
            f"model {model_id!r} needs the optional 'sentence-transformers' "
            "package (plus downloaded weights); use a stub-* model here"
        ) from e
    model = SentenceTransformer(model_id)
    return [list(map(float, v)) for v in model.encode(list(texts))]


def pool_states(hidden, mask, pooling: str):
    """Pooling math shared by every local-hf family, as a pure numpy
    function so it is unit-testable without the optional torch wheel:
    'mean' = masked average over token states (encoder families),
    'last' = the last non-pad token's state (decoder families)."""
    import numpy as np

    hidden = np.asarray(hidden, dtype=np.float64)
    mask = np.asarray(mask)
    if pooling == "last":
        idx = mask.sum(axis=1) - 1
        return hidden[np.arange(hidden.shape[0]), idx]
    if pooling != "mean":
        raise ValueError(f"pooling must be mean|last, got {pooling!r}")
    m = mask[..., None].astype(np.float64)
    denom = np.maximum(m.sum(axis=1), 1.0)
    return (hidden * m).sum(axis=1) / denom


def _local_hf_embed(
    texts: Sequence[str], model_id: str, pooling: str = "mean"
) -> list[list[float]]:
    """Plain-transformers forward pass for non-BERT families — the
    reference's candle local registry spans BERT/Gemma/Llama/Mistral/
    Qwen3/T5 (local.rs:7-21); this is the transformers-import-gated
    analog. Encoder models (T5) mean-pool masked token states; decoder
    embedding models (Qwen3-Embedding) take the last non-pad token
    state, per their model cards."""
    try:
        import torch
        from transformers import AutoModel, AutoTokenizer
    except ImportError as e:
        raise ImportError(
            f"model {model_id!r} needs the optional 'transformers' + 'torch' "
            "packages (plus downloaded weights); use a stub-* model here"
        ) from e
    tok = AutoTokenizer.from_pretrained(model_id)
    model = AutoModel.from_pretrained(model_id)
    model.eval()
    enc = tok(list(texts), padding=True, truncation=True, return_tensors="pt")
    with torch.no_grad():
        if getattr(model.config, "is_encoder_decoder", False):
            hidden = model.get_encoder()(**enc).last_hidden_state
        else:
            hidden = model(**enc).last_hidden_state
    pooled = pool_states(
        hidden.cpu().numpy(), enc["attention_mask"].cpu().numpy(), pooling
    )
    return [list(map(float, v)) for v in pooled]


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


def resolve_api_key(spec: EmbedModel, api_key: str | None = None) -> str | None:
    """Explicit key wins; else the provider's conventional env var."""
    if api_key:
        return api_key
    if spec.key_env:
        return os.environ.get(spec.key_env) or None
    return None


def embed_batch(
    texts: Sequence[str],
    spec: EmbedModel,
    api_key: str | None = None,
    transport=None,
    api_url: "str | None" = None,
    timeout: "float | None" = None,
) -> list[list[float]]:
    """One batch through the dispatched backend — the TextModel::predict
    match (mod.rs:71-80). Separated from the Spark plumbing so the mocked
    unit tests exercise exactly what workers run. `api_url`/`timeout`
    override the registry endpoint and the per-request deadline per call
    (ModelOptions::api_url / api_timeout, mod.rs:27-69 — self-hosted
    OpenAI-compatible gateways and slow batch endpoints)."""
    if spec.provider == "stub":
        return [_stub_embed(t or "", spec.dim) for t in texts]
    if spec.provider == "api":
        key = resolve_api_key(spec, api_key)
        if key is None and transport is None:
            raise RuntimeError(
                f"model {spec.name!r} needs an API key (pass api_key= or set "
                f"{spec.key_env}); no network credentials in this environment"
            )
        client = ApiEmbedClient(
            api_url or spec.api_url, key or "mocked", spec.model_id,
            timeout=10.0 if timeout is None else timeout,
            transport=transport,
        )
        return client.embed(texts)
    if spec.provider == "local":
        return _local_embed(texts, spec.model_id)
    if spec.provider == "local-hf":
        return _local_hf_embed(texts, spec.model_id, spec.pooling)
    raise ValueError(f"unknown provider {spec.provider!r}")


def validate_api_key(
    spec_or_model,
    api_key: str | None = None,
    *,
    api_url: "str | None" = None,
    timeout: "float | None" = None,
    transport=None,
) -> bool:
    """Driver-side credential probe (ModelOptions::validate_api_key,
    embeddings/src/model/mod.rs:27-69): one single-text request through
    the real client BEFORE any distributed work, so a bad or expired key
    fails the statement in milliseconds instead of failing every task of
    a 100 TB mapInPandas job. 401/403 surfaces as ValueError naming the
    provider; transient/network errors propagate unchanged (the caller
    decides whether to retry). Returns True on success."""
    spec = (
        MODEL_REGISTRY[spec_or_model]
        if isinstance(spec_or_model, str)
        else spec_or_model
    )
    if spec.provider != "api":
        return True  # nothing to validate for stub/local backends
    key = resolve_api_key(spec, api_key)
    if key is None and transport is None:
        raise RuntimeError(
            f"model {spec.name!r} needs an API key (pass api_key= or set "
            f"{spec.key_env}); no network credentials in this environment"
        )
    client = ApiEmbedClient(
        api_url or spec.api_url, key or "mocked", spec.model_id,
        timeout=10.0 if timeout is None else timeout,
        transport=transport,
    )
    try:
        vecs = client.embed(["ping"])
    except urllib.error.HTTPError as e:
        if e.code in (401, 403):
            raise ValueError(
                f"API key for {spec.name!r} rejected by the provider "
                f"(HTTP {e.code})"
            ) from e
        raise
    if not vecs or not vecs[0]:
        raise ValueError(
            f"provider for {spec.name!r} returned no embedding for the "
            "validation probe"
        )
    return True


def embed_text(
    df: DataFrame,
    text_col: str,
    model: str = "stub-64",
    out_col: str = "embedding",
    api_key: str | None = None,
    api_url: "str | None" = None,
    timeout: "float | None" = None,
    validate_key: bool = False,
) -> DataFrame:
    """Append an embedding column via Arrow-batched mapInPandas.

    Batch size follows spark.sql.execution.arrow.maxRecordsPerBatch; the
    per-batch `embed_batch` call is where the provider client or local
    model runs (Convert(texts[], threads) ↔ one partition per worker).
    `api_url`/`timeout` override the registry endpoint and per-request
    deadline; `validate_key=True` runs the driver-side credential probe
    first (ModelOptions parity, mod.rs:27-69)."""
    if model not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {model!r}; see MODEL_REGISTRY")
    spec = MODEL_REGISTRY[model]
    # Fail fast on the driver for api models with no key — not per-task.
    if spec.provider == "api" and resolve_api_key(spec, api_key) is None:
        raise RuntimeError(
            f"model {spec.name!r} needs an API key (pass api_key= or set "
            f"{spec.key_env}); no network credentials in this environment"
        )
    if validate_key:
        validate_api_key(spec, api_key, api_url=api_url, timeout=timeout)

    out_fields = [*df.schema.fields, T.StructField(out_col, T.ArrayType(T.FloatType()))]
    out_schema = T.StructType(out_fields)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = embed_batch(
                list(pdf[text_col]), spec, api_key,
                api_url=api_url, timeout=timeout,
            )
            yield pdf

    return df.mapInPandas(batches, out_schema)
