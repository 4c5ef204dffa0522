"""HTTP service end-to-end: engine loop thread, SSE streaming, OpenAI API.

reference behavior: src/service/inferflow_service.cc (engine loop + chunked
streaming + /chat/completions routing).
"""

import json
import threading
import time

import numpy as np
import pytest

from inferflow_tpu.models.zoo import make_spec, make_synthetic_params
from inferflow_tpu.runtime.engine import InferenceEngine
from inferflow_tpu.serving import InferFlowService, InferFlowClient
from inferflow_tpu.serving.service_data import (InferFlowRequest,
                                                get_utf8_end_pos,
                                                ResponseChunk)
from inferflow_tpu.tokenizer.vocab import Vocabulary
from inferflow_tpu.tokenizer.tokenizer import Tokenizer


def _toy_tokenizer(vocab_size):
    """Byte-fallback-only vocabulary over single bytes."""
    v = Vocabulary()
    v.add(b"<unk>")
    v.add(b"<s>")
    v.add(b"</s>")
    for b in range(256):
        v.add(b"<0x%02X>" % b, 0.0, 3)
    while len(v.tokens) < vocab_size:
        v.add(b"<extra_%d>" % len(v.tokens))
    v.unk_id, v.bos_id, v.eos_id = 0, 1, 2
    v.find_byte_token_start()
    return Tokenizer(v, "bpe")


@pytest.fixture(scope="module")
def service():
    spec = make_spec("test-tiny", layers=2, heads=4, kv_heads=4,
                     embd=64, inter=128, vocab=300)
    spec.max_context_len = 96
    params = make_synthetic_params(spec, weight_format=None, stacked=False)
    tok = _toy_tokenizer(300)
    eng = InferenceEngine(spec, params, max_concurrent_queries=4,
                          kv_cache_quantized=False, tokenizer=tok,
                          vocab=tok.vocab)
    svc = InferFlowService(eng, port=0, model_name="test-tiny")
    svc.start(block=False)
    yield svc
    svc.stop()


def test_health(service):
    client = InferFlowClient(f"http://127.0.0.1:{service.port}")
    import urllib.request
    with urllib.request.urlopen(
            f"http://127.0.0.1:{service.port}/health", timeout=10) as r:
        data = json.loads(r.read())
    assert data["status"] == "ok"


def test_blocking_query(service):
    client = InferFlowClient(f"http://127.0.0.1:{service.port}")
    resp = client.query("hello", max_output_len=8, temperature=0.0,
                        decoding_alg="greedy")
    assert resp["is_end"] is True
    assert "text" in resp


def test_openai_blocking(service):
    client = InferFlowClient(f"http://127.0.0.1:{service.port}")
    resp = client.query("hi there", max_output_len=8, openai=True)
    assert resp["object"] == "chat.completion"
    assert resp["choices"][0]["finish_reason"] == "stop"
    assert "content" in resp["choices"][0]["message"]


def test_streaming_openai(service):
    client = InferFlowClient(f"http://127.0.0.1:{service.port}")
    chunks = list(client.stream("stream me", max_output_len=8, openai=True))
    assert chunks, "no SSE chunks received"
    assert chunks[-1]["choices"][0]["finish_reason"] == "stop"


def test_concurrent_queries(service):
    client = InferFlowClient(f"http://127.0.0.1:{service.port}")
    results = {}

    def go(i):
        results[i] = client.query(f"query {i}", max_output_len=6)

    threads = [threading.Thread(target=go, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 3
    assert all(r.get("is_end") for r in results.values())


def test_utf8_end_pos():
    full = "héllo✓".encode("utf-8")
    assert get_utf8_end_pos(full) == len(full)
    # cut inside the 3-byte check mark
    assert get_utf8_end_pos(full[:-1]) == len(full) - 3
    assert get_utf8_end_pos(b"") == 0
    assert get_utf8_end_pos("é".encode("utf-8")[:1]) == 0


def test_openai_request_parse():
    req = InferFlowRequest.from_openai_json({
        "messages": [{"role": "system", "content": "be nice"},
                     {"role": "user", "content": "hello"}],
        "max_tokens": 32, "stream": True, "temperature": 0.5})
    assert req.system_prompt == "be nice" and req.text == "hello"
    assert req.max_output_len == 32 and req.is_streaming_mode
    assert req.is_openai


def test_response_chunk_formats():
    c = ResponseChunk(7, "hi", True)
    native = json.loads(c.to_json())
    assert native["query_id"] == 7 and native["is_end"]
    oa = json.loads(c.to_json_openai())
    assert oa["choices"][0]["message"]["content"] == "hi"
    chunk = json.loads(c.to_json_openai_chunk())
    assert chunk["choices"][0]["delta"]["content"] == "hi"


def test_encdec_sync_service(rng):
    """Encoder-decoder models serve via the synchronous core
    (per-request generation, streaming + blocking)."""
    import jax.numpy as jnp
    from inferflow_tpu.models.spec import HyperParams, ModelSpec
    from inferflow_tpu.runtime.encoder_engine import EncDecEngine

    E, I, V, H = 32, 64, 300, 4
    hp = HyperParams(vocab_size=V, embd_dims=E, encoder_layers=1,
                     encoder_heads=H, decoder_layers=1, decoder_heads=H,
                     decoder_kv_heads=H, hidden_dim=E,
                     decoder_intermediate_size=I)
    spec = ModelSpec(hyper_params=hp, network_structure="encoder_decoder",
                     norm_alg="std", activation_fn="relu",
                     pos_embedding_alg="sinusoidal2", max_context_len=32)

    def w(k, n):
        return jnp.asarray(rng.standard_normal((k, n)) * 0.08, jnp.bfloat16)

    def attn():
        return {"wq": w(E, E), "wk": w(E, E), "wv": w(E, E), "wo": w(E, E),
                "pre_norm": jnp.ones((E,), jnp.bfloat16)}

    params = {
        "enc_embeddings": w(V, E), "dec_embeddings": w(V, E),
        "enc_layers": [{"attn": attn(),
                        "ffn": {"w1": w(E, I), "w2": w(I, E),
                                "pre_norm": jnp.ones((E,), jnp.bfloat16)}}],
        "layers": [{"attn": attn(), "cross_attn": attn(),
                    "ffn": {"w1": w(E, I), "w2": w(I, E),
                            "pre_norm": jnp.ones((E,), jnp.bfloat16)}}],
        "dec_output_norm": jnp.ones((E,), jnp.bfloat16),
        "lm_head": w(E, V),
    }
    tok = _toy_tokenizer(V)
    eng = EncDecEngine(spec, params, tokenizer=tok, vocab=tok.vocab)
    svc = InferFlowService(eng, port=0, model_name="encdec-test")
    svc.start(block=False)
    try:
        client = InferFlowClient(f"http://127.0.0.1:{svc.port}")
        resp = client.query("translate me", max_output_len=5)
        assert resp["is_end"] is True
        chunks = list(client.stream("more text", max_output_len=5,
                                    openai=True))
        assert chunks and chunks[-1]["choices"][0]["finish_reason"] == "stop"
    finally:
        svc.stop()
