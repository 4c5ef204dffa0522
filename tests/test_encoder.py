"""Encoder-only (BERT) and encoder-decoder forward tests
(reference: inference_engine.cc:893-954 encoder/enc-dec paths)."""

import numpy as np
import pytest
import jax.numpy as jnp

from inferflow_tpu.models.spec import HyperParams, ModelSpec
from inferflow_tpu.models.encoder import (encoder_forward, mlm_logits,
                                          encdec_forward)
from inferflow_tpu.runtime.kv_cache import KVCache

E, I, V, H = 32, 64, 64, 4


def _bert_spec(layers=2):
    hp = HyperParams(vocab_size=V, embd_dims=E, encoder_layers=layers,
                     encoder_heads=H, decoder_heads=H, hidden_dim=E,
                     decoder_intermediate_size=I)
    return ModelSpec(hyper_params=hp, network_structure="encoder_only",
                     norm_alg="std", activation_fn="gelu",
                     pos_embedding_alg="")


def _encdec_spec(layers=2):
    hp = HyperParams(vocab_size=V, embd_dims=E, encoder_layers=layers,
                     encoder_heads=H, decoder_layers=layers, decoder_heads=H,
                     decoder_kv_heads=H, hidden_dim=E,
                     decoder_intermediate_size=I)
    return ModelSpec(hyper_params=hp, network_structure="encoder_decoder",
                     norm_alg="std", activation_fn="relu",
                     pos_embedding_alg="sinusoidal2")


def _attn_params(rng, with_bias=True):
    def w(k, n):
        return jnp.asarray(rng.standard_normal((k, n)) * 0.08, jnp.bfloat16)

    p = {"wq": w(E, E), "wk": w(E, E), "wv": w(E, E), "wo": w(E, E),
         "post_norm": jnp.ones((E,), jnp.bfloat16),
         "post_norm_b": jnp.zeros((E,), jnp.bfloat16)}
    if with_bias:
        for nm in ("wq", "wk", "wv", "wo"):
            p[nm + "_b"] = jnp.zeros((E,), jnp.bfloat16)
    return p


def _ffn_params(rng):
    def w(k, n):
        return jnp.asarray(rng.standard_normal((k, n)) * 0.08, jnp.bfloat16)

    return {"w1": w(E, I), "w2": w(I, E),
            "post_norm": jnp.ones((E,), jnp.bfloat16),
            "post_norm_b": jnp.zeros((E,), jnp.bfloat16)}


@pytest.fixture
def bert_params(rng):
    layers = [{"attn": _attn_params(rng), "ffn": _ffn_params(rng)}
              for _ in range(2)]
    return {
        "enc_embeddings": jnp.asarray(rng.standard_normal((V, E)) * 0.05,
                                      jnp.bfloat16),
        "enc_pos_embeddings": jnp.asarray(
            rng.standard_normal((64, E)) * 0.02, jnp.bfloat16),
        "enc_token_type_embeddings": jnp.asarray(
            rng.standard_normal((2, E)) * 0.02, jnp.bfloat16),
        "enc_input_norm": jnp.ones((E,), jnp.bfloat16),
        "enc_input_norm_b": jnp.zeros((E,), jnp.bfloat16),
        "enc_layers": layers,
        "mlm_transform": jnp.asarray(rng.standard_normal((E, E)) * 0.08,
                                     jnp.bfloat16),
        "mlm_norm": jnp.ones((E,), jnp.bfloat16),
        "lm_head_b": jnp.zeros((V,), jnp.bfloat16),
    }


def test_bert_forward_and_mask_logits(bert_params):
    spec = _bert_spec()
    tokens = jnp.asarray([[2, 9, 33, 7]], jnp.int32)
    pos = jnp.arange(4)[None, :]
    hidden = encoder_forward(spec, bert_params, tokens, pos)
    assert hidden.shape == (1, 4, E)
    logits = mlm_logits(spec, bert_params, hidden)
    assert logits.shape == (1, 4, V)
    assert bool(jnp.isfinite(logits).all())


def test_bert_bidirectional(bert_params):
    """Changing a LATER token must change an EARLIER position's hidden
    state (bidirectional attention, unlike the causal decoder)."""
    spec = _bert_spec()
    pos = jnp.arange(4)[None, :]
    h1 = encoder_forward(spec, bert_params,
                         jnp.asarray([[2, 9, 33, 7]], jnp.int32), pos)
    h2 = encoder_forward(spec, bert_params,
                         jnp.asarray([[2, 9, 33, 50]], jnp.int32), pos)
    assert not np.allclose(np.asarray(h1[0, 0], np.float32),
                           np.asarray(h2[0, 0], np.float32))


@pytest.fixture
def encdec_params(rng):
    enc_layers = [{"attn": dict(_attn_params(rng)),
                   "ffn": _ffn_params(rng)} for _ in range(2)]
    dec_layers = [{"attn": dict(_attn_params(rng)),
                   "cross_attn": dict(_attn_params(rng)),
                   "ffn": _ffn_params(rng)} for _ in range(2)]
    return {
        "enc_embeddings": jnp.asarray(rng.standard_normal((V, E)) * 0.05,
                                      jnp.bfloat16),
        "dec_embeddings": jnp.asarray(rng.standard_normal((V, E)) * 0.05,
                                      jnp.bfloat16),
        "enc_layers": enc_layers,
        "layers": dec_layers,
        "dec_output_norm": jnp.ones((E,), jnp.bfloat16),
        "lm_head": jnp.asarray(rng.standard_normal((E, V)) * 0.05,
                               jnp.bfloat16),
    }


def test_encdec_forward(encdec_params):
    spec = _encdec_spec()
    enc_tokens = jnp.asarray([[5, 6, 7, 8, 9]], jnp.int32)
    dec_tokens = jnp.asarray([[1, 4]], jnp.int32)
    logits, cache, enc_states = encdec_forward(spec, encdec_params,
                                               enc_tokens, dec_tokens)
    assert logits.shape == (1, 2, V)
    assert enc_states.shape == (1, 5, E)
    assert bool(jnp.isfinite(logits).all())


def test_encdec_incremental_matches_full(encdec_params):
    """Cached step-by-step decode must match the full re-forward."""
    spec = _encdec_spec()
    enc_tokens = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    dec = [1, 9, 23]

    full, _, _ = encdec_forward(spec, encdec_params, enc_tokens,
                                jnp.asarray([dec], jnp.int32))

    hp = spec.hyper_params
    cache = KVCache.create(hp.decoder_layers, 1, 16, hp.kv_heads,
                           hp.head_dim, quantized=False)
    enc_states = None
    for i, t in enumerate(dec):
        logits, cache, enc_states = encdec_forward(
            spec, encdec_params, enc_tokens,
            jnp.asarray([[t]], jnp.int32), cache=cache,
            enc_states=enc_states)
    np.testing.assert_allclose(np.asarray(logits[0, -1], np.float32),
                               np.asarray(full[0, -1], np.float32),
                               rtol=0.1, atol=0.15)
    # argmax agreement is the serving-level contract
    assert int(jnp.argmax(logits[0, -1])) == int(jnp.argmax(full[0, -1]))
