"""Decoder forward tests: numpy-reference equivalence, KV-cache decode
consistency, quantized weights/KV, architecture knobs (GQA, ALiBi, parallel
attention, fused QKV, MoE)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inferflow_tpu.models.spec import HyperParams, ModelSpec
from inferflow_tpu.models.decoder import decoder_forward
from inferflow_tpu.runtime.kv_cache import KVCache
from inferflow_tpu.quant import quantize_np, QuantizedTensor


def make_spec(**kw):
    hp_kw = kw.pop("hp", {})
    hp_defaults = dict(vocab_size=97, embd_dims=64, decoder_layers=2,
                       decoder_heads=4, decoder_kv_heads=4, hidden_dim=64,
                       decoder_intermediate_size=128)
    hp_defaults.update(hp_kw)
    hp = HyperParams(**hp_defaults)
    defaults = dict(norm_alg="rms", activation_fn="silu",
                    pos_embedding_alg="rope", qk_column_order=0)
    defaults.update(kw)
    return ModelSpec(sid="test", hyper_params=hp, **defaults)


def make_params(spec, rng, fused_qkv=False, bias=False, moe=False):
    hp = spec.hyper_params
    E, H, I = hp.embd_dims, hp.head_dim, hp.decoder_intermediate_size
    kv_dim = hp.kv_heads * H
    q_dim = hp.decoder_heads * H

    def w(k, n):
        return (rng.standard_normal((k, n)) * 0.06).astype(np.float32)

    def ffn():
        d = {"pre_norm": np.ones(E, np.float32) + rng.standard_normal(E).astype(np.float32) * 0.01,
             "w1": w(E, I), "w2": w(I, E), "w3": w(E, I)}
        if bias:
            d["w1_b"] = w(1, I)[0]
            d["w2_b"] = w(1, E)[0]
        return d

    layers = []
    for _ in range(hp.decoder_layers):
        attn = {"pre_norm": np.ones(E, np.float32)}
        if fused_qkv:
            attn["qkv"] = w(E, q_dim + 2 * kv_dim)
            if bias:
                attn["qkv_b"] = w(1, q_dim + 2 * kv_dim)[0]
        else:
            attn.update({"wq": w(E, q_dim), "wk": w(E, kv_dim),
                         "wv": w(E, kv_dim)})
        attn["wo"] = w(q_dim, E)
        layer = {"attn": attn}
        if moe:
            layer["moe"] = {"gate": w(E, 4),
                            "experts": [ffn() for _ in range(4)]}
        else:
            layer["ffn"] = ffn()
        layers.append(layer)

    return {"dec_embeddings": (rng.standard_normal((hp.vocab_size, E)) * 0.1
                               ).astype(np.float32),
            "dec_output_norm": np.ones(E, np.float32),
            "lm_head": w(E, hp.vocab_size),
            "layers": layers}


def np_reference_forward(spec, params, tokens):
    """Straight-line numpy implementation of the same decoder math."""
    hp = spec.hyper_params
    H, nh, nkv = hp.head_dim, hp.decoder_heads, hp.kv_heads
    x = params["dec_embeddings"][tokens]  # (T, E)
    T = x.shape[0]
    pos = np.arange(T)

    def rms(v, wgt):
        m = np.mean(v.astype(np.float64) ** 2, axis=-1, keepdims=True)
        return (v / np.sqrt(m + spec.norm_eps) * wgt).astype(np.float64)

    def rope_np(v, positions):  # interleaved, order 1
        out = v.copy().astype(np.float64)
        d = v.shape[-1]
        for t in range(v.shape[0]):
            for h in range(v.shape[1]):
                for i in range(d // 2):
                    theta = positions[t] * (spec.rope_theta ** (-2.0 * i / d))
                    c, s = np.cos(theta), np.sin(theta)
                    x0, x1 = v[t, h, 2 * i], v[t, h, 2 * i + 1]
                    out[t, h, 2 * i] = x0 * c - x1 * s
                    out[t, h, 2 * i + 1] = x0 * s + x1 * c
        return out

    x = x.astype(np.float64)
    for lp in params["layers"]:
        a = lp["attn"]
        h = rms(x, a["pre_norm"])
        q = (h @ a["wq"]).reshape(T, nh, H)
        k = (h @ a["wk"]).reshape(T, nkv, H)
        v = (h @ a["wv"]).reshape(T, nkv, H)
        q, k = rope_np(q, pos), rope_np(k, pos)
        group = nh // nkv
        outs = np.zeros((T, nh, H))
        for hh in range(nh):
            kk = k[:, hh // group]
            vv = v[:, hh // group]
            scores = (q[:, hh] @ kk.T) / np.sqrt(H)
            mask = np.tril(np.ones((T, T), bool))
            scores = np.where(mask, scores, -1e30)
            p = np.exp(scores - scores.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            outs[:, hh] = p @ vv
        x = x + outs.reshape(T, nh * H) @ a["wo"]
        f = lp["ffn"]
        h = rms(x, f["pre_norm"])
        g = h @ f["w1"]
        u = h @ f["w3"]
        act = g / (1 + np.exp(-g)) * u
        x = x + act @ f["w2"]
    x = rms(x, params["dec_output_norm"])
    return x @ params["lm_head"]


def test_forward_matches_numpy_reference(rng):
    spec = make_spec()
    params = make_params(spec, rng)
    tokens = rng.integers(0, 97, size=12)
    ref = np_reference_forward(spec, params, tokens)
    logits, _ = decoder_forward(spec, params, jnp.asarray(tokens)[None, :],
                                jnp.arange(12)[None, :], None)
    got = np.asarray(logits)[0]
    # bf16 activations: compare top-1 agreement + correlation
    assert (got.argmax(-1) == ref.argmax(-1)).mean() >= 0.9
    c = np.corrcoef(got.reshape(-1), ref.reshape(-1))[0, 1]
    assert c > 0.999, c


@pytest.mark.parametrize("quantized_kv", [False, True])
def test_kv_cache_decode_matches_full_forward(rng, quantized_kv):
    """Incremental decode with the KV cache must match full-context forward."""
    spec = make_spec(hp={"decoder_kv_heads": 2})  # GQA 4q/2kv
    params = make_params(spec, rng)
    T = 10
    tokens = rng.integers(0, 97, size=T)

    full_logits, _ = decoder_forward(
        spec, params, jnp.asarray(tokens)[None, :], jnp.arange(T)[None, :], None)

    hp = spec.hyper_params
    cache = KVCache.create(hp.decoder_layers, 1, 16, hp.kv_heads, hp.head_dim,
                           quantized=quantized_kv)
    # prefill 6, then decode 4 one by one
    logits_p, cache = decoder_forward(
        spec, params, jnp.asarray(tokens[:6])[None, :], jnp.arange(6)[None, :],
        cache)
    outs = [np.asarray(logits_p)[0]]
    for t in range(6, T):
        lg, cache = decoder_forward(
            spec, params, jnp.asarray(tokens[t:t + 1])[None, :],
            jnp.asarray([[t]]), cache)
        outs.append(np.asarray(lg)[0])
    inc = np.concatenate(outs, axis=0)
    full = np.asarray(full_logits)[0]
    tol = 0.6 if quantized_kv else 0.06
    assert np.abs(inc - full).max() < tol, np.abs(inc - full).max()
    assert (inc.argmax(-1) == full.argmax(-1)).all()


def test_quantized_weights_close_to_dense(rng):
    spec = make_spec()
    params = make_params(spec, rng)
    qparams = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy ok

    def quantize_tree(p):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict):
                out[k] = quantize_tree(v)
            elif isinstance(v, list):
                out[k] = [quantize_tree(e) for e in v]
            elif isinstance(v, np.ndarray) and v.ndim == 2 and k != "dec_embeddings":
                out[k] = QuantizedTensor.from_np(quantize_np(v, "Q8_B32T2"))
            else:
                out[k] = v
        return out

    qparams = quantize_tree(params)
    tokens = rng.integers(0, 97, size=8)
    dense, _ = decoder_forward(spec, params, jnp.asarray(tokens)[None, :],
                               jnp.arange(8)[None, :], None)
    quant, _ = decoder_forward(spec, qparams, jnp.asarray(tokens)[None, :],
                               jnp.arange(8)[None, :], None)
    d, q = np.asarray(dense)[0], np.asarray(quant)[0]
    assert (d.argmax(-1) == q.argmax(-1)).mean() >= 0.8
    assert np.corrcoef(d.reshape(-1), q.reshape(-1))[0, 1] > 0.99


def test_architecture_knobs_run(rng):
    """Fused QKV + biases + ALiBi + parallel attention + std norm."""
    spec = make_spec(norm_alg="std", pos_embedding_alg="alibi",
                     is_parallel_attn=True, mlp_attn_share_input=True,
                     activation_fn="gelu")
    params = make_params(spec, rng, fused_qkv=True, bias=True)
    tokens = rng.integers(0, 97, size=5)
    logits, _ = decoder_forward(spec, params, jnp.asarray(tokens)[None, :],
                                jnp.arange(5)[None, :], None)
    assert logits.shape == (1, 5, 97)
    assert np.isfinite(np.asarray(logits)).all()


def test_moe_runs_and_routes(rng):
    spec = make_spec(hp={"experts": 4, "moe_top_k": 2})
    params = make_params(spec, rng, moe=True)
    tokens = rng.integers(0, 97, size=6)
    logits, _ = decoder_forward(spec, params, jnp.asarray(tokens)[None, :],
                                jnp.arange(6)[None, :], None)
    assert logits.shape == (1, 6, 97)
    assert np.isfinite(np.asarray(logits)).all()
