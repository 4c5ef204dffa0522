"""Encoder-only (BERT) and encoder-decoder (m2m100/BART) forward passes.

reference: the encoder/encoder-decoder paths of GpuInferenceWorker +
InferenceEngine (inference_worker.cc:358-384 cross-attention InputKV,
inference_engine.cc:893-954 encoder pass then decoder pass; encoder-only
sampling at the [MASK] position :939-954).

Layer convention (covers both norm placements):
    h   = pre_norm(x)  if present else x
    y   = sublayer(h)
    out = x + y
    out = post_norm(out) if present      # BERT-style post-norm
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.activations import activate
from ..ops.attention import mha
from ..ops.linear import linear
from ..ops.norms import apply_norm
from ..ops.rope import rope, sinusoidal_embedding
from .spec import ModelSpec


def _norm(spec: ModelSpec, x, p: dict, key: str):
    w = p.get(key)
    b = p.get(f"{key}_b")
    if w is None and b is None:
        return None
    return apply_norm(spec.norm_alg, x, w, b, spec.norm_eps)


def _self_attention(spec: ModelSpec, lp: dict, x, positions, *,
                    n_heads: int, causal: bool, kv=None, seq_len=None,
                    use_pallas: bool = True):
    """Self- or cross-attention sub-layer.  kv: optional (B, Tk, E) source
    states for cross-attention (keys/values projected from them)."""
    hp = spec.hyper_params
    head_dim = (hp.embd_dims // n_heads if n_heads else hp.head_dim)
    b, t, _ = x.shape
    src = kv if kv is not None else x
    tk = src.shape[1]

    q = linear(x, lp["wq"], lp.get("wq_b"), use_pallas=use_pallas)
    k = linear(src, lp["wk"], lp.get("wk_b"), use_pallas=use_pallas)
    v = linear(src, lp["wv"], lp.get("wv_b"), use_pallas=use_pallas)
    q = q.reshape(b, t, n_heads, head_dim)
    k = k.reshape(b, tk, n_heads, head_dim)
    v = v.reshape(b, tk, n_heads, head_dim)

    if kv is None and spec.pos_embedding_alg == "rope":
        rd = spec.effective_rope_dim()
        q = rope(q, positions, base=spec.rope_theta, order=spec.rope_order,
                 rope_dim=rd)
        k = rope(k, positions, base=spec.rope_theta, order=spec.rope_order,
                 rope_dim=rd)

    out = mha(q, k, v, q_positions=positions, causal=causal,
              kv_len=seq_len, kq_scale=spec.kq_scale)
    out = out.reshape(b, t, n_heads * head_dim)
    return linear(out, lp["wo"], lp.get("wo_b"), use_pallas=use_pallas)


def _ffn(spec: ModelSpec, lp: dict, x, *, use_pallas: bool = True):
    a = linear(x, lp["w1"], lp.get("w1_b"), use_pallas=use_pallas)
    g = None
    if "w3" in lp:
        g = linear(x, lp["w3"], lp.get("w3_b"), use_pallas=use_pallas)
    h = activate(spec.activation_fn, a, g)
    return linear(h, lp["w2"], lp.get("w2_b"), use_pallas=use_pallas)


def _sublayer(spec: ModelSpec, p: dict, x, fn):
    h = _norm(spec, x, p, "pre_norm")
    y = fn(h if h is not None else x)
    out = x + y
    post = _norm(spec, out, p, "post_norm")
    return post if post is not None else out


def encoder_layer(spec: ModelSpec, lp: dict, x, positions, *,
                  n_heads: int, seq_len=None, use_pallas: bool = True):
    x = _sublayer(spec, lp["attn"], x,
                  lambda h: _self_attention(spec, lp["attn"], h, positions,
                                            n_heads=n_heads, causal=False,
                                            seq_len=seq_len,
                                            use_pallas=use_pallas))
    x = _sublayer(spec, lp["ffn"], x,
                  lambda h: _ffn(spec, lp["ffn"], h, use_pallas=use_pallas))
    return x


def encoder_embed(spec: ModelSpec, params: dict, tokens, positions,
                  token_type=None):
    emb = params["enc_embeddings"]
    x = jnp.take(emb, tokens, axis=0).astype(jnp.bfloat16)
    if spec.pos_embedding_alg in ("sinusoidal", "sinusoidal2"):
        scheme = 1 if spec.pos_embedding_alg == "sinusoidal" else 2
        pe = sinusoidal_embedding(positions.reshape(-1), x.shape[-1],
                                  scheme=scheme, order=2)
        x = x + pe.reshape(x.shape).astype(x.dtype)
    if "enc_pos_embeddings" in params:
        off = spec.pos_embedding_offset
        x = x + jnp.take(params["enc_pos_embeddings"], positions + off,
                         axis=0).astype(x.dtype)
    if "enc_token_type_embeddings" in params:
        tt = token_type if token_type is not None \
            else jnp.zeros_like(tokens)
        x = x + jnp.take(params["enc_token_type_embeddings"], tt,
                         axis=0).astype(x.dtype)
    if "enc_input_norm" in params:
        x = apply_norm(spec.norm_alg, x, params.get("enc_input_norm"),
                       params.get("enc_input_norm_b"), spec.norm_eps)
    return x


def encoder_forward(spec: ModelSpec, params: dict, tokens, positions,
                    token_type=None, *, seq_len=None,
                    use_pallas: bool = True):
    """Full encoder stack -> (B, T, E) hidden states.  seq_len: optional
    (B,) valid token counts — padded positions are masked out of the
    bidirectional attention (batched/bucketed serving)."""
    hp = spec.hyper_params
    n_heads = hp.encoder_heads or hp.decoder_heads
    x = encoder_embed(spec, params, tokens, positions, token_type)
    for lp in params["enc_layers"]:
        x = encoder_layer(spec, lp, x, positions, n_heads=n_heads,
                          seq_len=seq_len, use_pallas=use_pallas)
    if "enc_output_norm" in params:
        x = apply_norm(spec.norm_alg, x, params.get("enc_output_norm"),
                       params.get("enc_output_norm_b"), spec.norm_eps)
    return x


def mlm_logits(spec: ModelSpec, params: dict, hidden, *,
               use_pallas: bool = True):
    """BERT MLM head: transform -> norm -> tied-embedding projection + bias
    (sampled at [MASK] positions; inference_engine.cc:939-954)."""
    x = hidden
    if "mlm_transform" in params:
        x = linear(x, params["mlm_transform"], params.get("mlm_transform_b"),
                   use_pallas=use_pallas)
        x = activate(spec.activation_fn or "gelu", x, None)
        x = apply_norm("std", x, params.get("mlm_norm"),
                       params.get("mlm_norm_b"), spec.norm_eps)
    head = params.get("lm_head")
    if head is None:
        head = params["enc_embeddings"].T
    logits = linear(x, head, params.get("lm_head_b"), use_pallas=use_pallas)
    return logits.astype(jnp.float32)


def compute_cross_kv(spec: ModelSpec, layers, enc_states, *,
                     use_pallas: bool = True):
    """Pre-project each decoder layer's cross-attention K/V from the
    encoder states ONCE per query (the cross_attn_kv_cache of
    kv_cache.h:80; built on first decode step,
    inference_worker.cc:1106-1114)."""
    hp = spec.hyper_params
    n_heads = hp.decoder_heads
    head_dim = hp.embd_dims // n_heads if n_heads else hp.head_dim
    b, tk, _ = enc_states.shape
    out = []
    for lp in layers:
        if "cross_attn" not in lp:
            out.append(None)
            continue
        ca = lp["cross_attn"]
        k = linear(enc_states, ca["wk"], ca.get("wk_b"),
                   use_pallas=use_pallas).reshape(b, tk, n_heads, head_dim)
        v = linear(enc_states, ca["wv"], ca.get("wv_b"),
                   use_pallas=use_pallas).reshape(b, tk, n_heads, head_dim)
        out.append((k, v))
    return out


def _cross_attention(spec: ModelSpec, lp: dict, x, *, n_heads: int,
                     kv_proj, enc_len=None, use_pallas: bool = True):
    """Cross-attention with pre-projected K/V.  enc_len: optional (B,)
    valid encoder rows per slot (batched serving pads encoder outputs to
    a common max length)."""
    hp = spec.hyper_params
    head_dim = hp.embd_dims // n_heads if n_heads else hp.head_dim
    b, t, _ = x.shape
    k, v = kv_proj
    q = linear(x, lp["wq"], lp.get("wq_b"), use_pallas=use_pallas)
    q = q.reshape(b, t, n_heads, head_dim)
    positions = jnp.zeros((b, t), jnp.int32)
    out = mha(q, k, v, q_positions=positions, causal=False,
              kv_len=enc_len, kq_scale=spec.kq_scale)
    out = out.reshape(b, t, n_heads * head_dim)
    return linear(out, lp["wo"], lp.get("wo_b"), use_pallas=use_pallas)


def encdec_decoder_layer(spec: ModelSpec, lp: dict, x, positions,
                         enc_states, layer_cache=None, cross_kv=None, *,
                         enc_len=None, use_pallas: bool = True):
    """Decoder layer with cross-attention over encoder states.

    Self-attention uses the same KV-cache machinery as decoder.py;
    cross-attention K/V come pre-projected via compute_cross_kv (the
    cross-attn KV cache) or are derived from enc_states on the fly."""
    from .decoder import attention_block

    hp = spec.hyper_params
    n_heads = hp.decoder_heads

    def self_attn(h):
        nonlocal layer_cache
        out, layer_cache = attention_block(spec, lp["attn"], h, positions,
                                           layer_cache,
                                           use_pallas=use_pallas)
        return out

    x = _sublayer(spec, lp["attn"], x, self_attn)
    if "cross_attn" in lp:
        if cross_kv is not None:
            x = _sublayer(spec, lp["cross_attn"], x,
                          lambda h: _cross_attention(
                              spec, lp["cross_attn"], h, n_heads=n_heads,
                              kv_proj=cross_kv, enc_len=enc_len,
                              use_pallas=use_pallas))
        else:
            x = _sublayer(spec, lp["cross_attn"], x,
                          lambda h: _self_attention(
                              spec, lp["cross_attn"], h, positions,
                              n_heads=n_heads, causal=False, kv=enc_states,
                              use_pallas=use_pallas))
    x = _sublayer(spec, lp["ffn"], x,
                  lambda h: _ffn(spec, lp["ffn"], h, use_pallas=use_pallas))
    return x, layer_cache


def encdec_embed_dec(spec: ModelSpec, params: dict, dec_tokens, positions):
    """Decoder-side token embedding for enc-dec models (sinusoidal /
    learned positions), shared by encdec_forward and the batch engine."""
    x = jnp.take(params["dec_embeddings"], dec_tokens, axis=0
                 ).astype(jnp.bfloat16)
    if spec.pos_embedding_alg in ("sinusoidal", "sinusoidal2"):
        scheme = 1 if spec.pos_embedding_alg == "sinusoidal" else 2
        pe = sinusoidal_embedding(positions.reshape(-1), x.shape[-1],
                                  scheme=scheme, order=2)
        x = x + pe.reshape(x.shape).astype(x.dtype)
    if "dec_pos_embeddings" in params:
        off = spec.pos_embedding_offset
        x = x + jnp.take(params["dec_pos_embeddings"], positions + off,
                         axis=0).astype(x.dtype)
    return x


def encdec_forward(spec: ModelSpec, params: dict, enc_tokens, dec_tokens,
                   *, cache=None, enc_states=None, cross_kvs=None,
                   use_pallas: bool = True):
    """Encoder-decoder forward.  Runs (or reuses) the encoder, then the
    decoder with cross-attention; returns (logits, cache, enc_states).
    Pass cross_kvs (compute_cross_kv) to reuse the projected cross K/V."""
    from ..runtime.kv_cache import layer_cache_slice, store_layer_cache
    from .decoder import output_logits

    b, te = enc_tokens.shape
    if enc_states is None:
        enc_pos = jnp.broadcast_to(jnp.arange(te, dtype=jnp.int32)[None, :],
                                   (b, te))
        # encoder side of an enc-dec checkpoint lives under enc_* keys
        enc_params = dict(params)
        if "enc_embeddings" not in enc_params and \
                "dec_embeddings" in enc_params:
            enc_params["enc_embeddings"] = enc_params["dec_embeddings"]
        enc_states = encoder_forward(spec, enc_params, enc_tokens, enc_pos,
                                     use_pallas=use_pallas)

    td = dec_tokens.shape[1]
    if cache is not None:
        positions = cache.length[:, None] + jnp.arange(td, dtype=jnp.int32)[None, :]
    else:
        positions = jnp.broadcast_to(jnp.arange(td, dtype=jnp.int32)[None, :],
                                     (b, td))
    x = encdec_embed_dec(spec, params, dec_tokens, positions)

    for i, lp in enumerate(params["layers"]):
        lc = None if cache is None else layer_cache_slice(cache, i)
        ckv = cross_kvs[i] if cross_kvs is not None else None
        x, lc = encdec_decoder_layer(spec, lp, x, positions, enc_states,
                                     lc, cross_kv=ckv,
                                     use_pallas=use_pallas)
        if cache is not None:
            cache = store_layer_cache(cache, i, lc)
    logits = output_logits(spec, params, x, use_pallas=use_pallas)
    if cache is not None:
        cache = cache.with_length(cache.length + td)
    return logits, cache, enc_states
