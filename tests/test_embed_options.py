"""F7 ModelOptions parity (reference embeddings/src/model/mod.rs:27-69):
per-call api_url / timeout overrides and the driver-side
validate_api_key probe, exercised through a mocked transport exactly
like the reference's openai_test.rs."""

import urllib.error

import pytest

from columnar_spark.functions.embed import (
    MODEL_REGISTRY,
    ApiEmbedClient,
    embed_batch,
    validate_api_key,
)

SPEC = MODEL_REGISTRY["openai/text-embedding-3-small"]


def _ok_transport(calls):
    def transport(body):
        calls.append(body)
        return {
            "data": [
                {"index": i, "embedding": [0.1] * 4}
                for i in range(len(body["input"]))
            ]
        }

    return transport


def test_validate_api_key_probe_success():
    calls = []
    assert validate_api_key(SPEC, "sk-test", transport=_ok_transport(calls))
    assert len(calls) == 1 and calls[0]["input"] == ["ping"]
    assert calls[0]["model"] == SPEC.model_id


def test_validate_api_key_rejection_is_actionable():
    def transport(body):
        raise urllib.error.HTTPError(SPEC.api_url, 401, "unauthorized", {}, None)

    with pytest.raises(ValueError, match="rejected.*401"):
        validate_api_key(SPEC, "sk-bad", transport=transport)


def test_validate_api_key_other_errors_propagate():
    def transport(body):
        raise urllib.error.HTTPError(SPEC.api_url, 503, "busy", {}, None)

    with pytest.raises(urllib.error.HTTPError):
        validate_api_key(SPEC, "sk-test", transport=transport)


def test_validate_api_key_noop_for_local_backends():
    assert validate_api_key(MODEL_REGISTRY["stub-64"]) is True


def test_per_call_url_and_timeout_override():
    # the overrides must reach the constructed client — pin via a
    # transport-free client construction
    c = ApiEmbedClient("https://gw.internal/v1/embeddings", "k", "m", timeout=3.5)
    assert c.api_url == "https://gw.internal/v1/embeddings"
    assert c.timeout == 3.5
    # and through embed_batch's plumbing with a mocked transport
    seen = []
    out = embed_batch(
        ["a", "b"], SPEC, api_key="sk", transport=_ok_transport(seen),
        api_url="https://gw.internal/v1/embeddings", timeout=2.0,
    )
    assert len(out) == 2 and len(out[0]) == 4
    assert len(seen) == 1


def test_probe_refuses_empty_response():
    def transport(body):
        return {"data": [{"index": 0, "embedding": []}]}

    with pytest.raises(ValueError, match="no embedding"):
        validate_api_key(SPEC, "sk", transport=transport)
