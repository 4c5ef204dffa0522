"""Decoder-only transformer forward (functional, jit-able).

TPU-native re-design of the reference's GpuInferenceWorker layer loop
(src/transformer/inference_worker.cc:234-981): instead of per-device worker
threads with ping-pong heaps, one pure function over a params pytree, with
the KV cache threaded as a donated carry.  Covers the reference's
architecture knobs: GQA, fused/split QKV, RoPE column orders + partial
rotary, ALiBi, parallel-attention (Falcon/Phi), pre/post norms with
norm_base, GLU FFNs, MoE with shared experts and layer ranges, embedding
scaling, tied/untied lm_head.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.activations import activate
from ..ops.attention import mha
from ..ops.linear import linear
from ..ops.norms import apply_norm, linear_norm
from ..ops.rope import alibi_bias, rope, sinusoidal_embedding
from ..runtime.kv_cache import KVCache
from .spec import ModelSpec


def _norm(spec: ModelSpec, x, layer_params, prefix: str, base: float = 0.0):
    w = layer_params.get(f"{prefix}")
    b = layer_params.get(f"{prefix}_b")
    if w is None and b is None:
        return x
    return apply_norm(spec.norm_alg, x, w, b, spec.norm_eps, base)


def _split_qkv(spec: ModelSpec, qkv, n_heads, n_kv_heads, head_dim):
    """Split a fused QKV projection output.

    qkv_format=1: concatenated [Q | K | V] (model.h:109).
    qkv_format=0: interleaved by head group — each of the n_kv_heads groups
    carries (group q heads, 1 k head, 1 v head) contiguously, the layout
    produced when checkpoints store per-head interleaved QKV
    (reference AssignColumns de-interleave, tensor_opr.h:46).
    """
    b, t, _ = qkv.shape
    q_dim = n_heads * head_dim
    kv_dim = n_kv_heads * head_dim
    if spec.qkv_format == 1:
        q = qkv[..., :q_dim]
        k = qkv[..., q_dim:q_dim + kv_dim]
        v = qkv[..., q_dim + kv_dim:q_dim + 2 * kv_dim]
    else:
        group = n_heads // n_kv_heads
        per = (group + 2) * head_dim
        x = qkv.reshape(b, t, n_kv_heads, per)
        q = x[..., :group * head_dim].reshape(b, t, q_dim)
        k = x[..., group * head_dim:(group + 1) * head_dim].reshape(b, t, kv_dim)
        v = x[..., (group + 1) * head_dim:].reshape(b, t, kv_dim)
    return q, k, v


def attention_block(spec: ModelSpec, lp: dict, x, positions,
                    layer_cache: Optional[dict], *, use_pallas: bool = True):
    """Self-attention sub-layer.

    layer_cache: None, or a per-layer cache slice
      {'k','v': (B,S,H,D) storage, 'k_scale','v_scale': opt, 'start': (B,)}
    Returns (output, updated layer_cache).
    """
    hp = spec.hyper_params
    n_heads = hp.decoder_heads
    n_kv = hp.kv_heads
    head_dim = hp.head_dim
    b, t, _ = x.shape

    if "qkv" in lp:
        qkv = linear(x, lp["qkv"], lp.get("qkv_b"), use_pallas=use_pallas)
        q, k, v = _split_qkv(spec, qkv, n_heads, n_kv, head_dim)
    else:
        q = linear(x, lp["wq"], lp.get("wq_b"), use_pallas=use_pallas)
        k = linear(x, lp["wk"], lp.get("wk_b"), use_pallas=use_pallas)
        v = linear(x, lp["wv"], lp.get("wv_b"), use_pallas=use_pallas)

    q = q.reshape(b, t, n_heads, head_dim)
    k = k.reshape(b, t, n_kv, head_dim)
    v = v.reshape(b, t, n_kv, head_dim)

    if spec.pos_embedding_alg == "rope":
        rd = spec.effective_rope_dim()
        q = rope(q, positions, base=spec.rope_theta, order=spec.rope_order,
                 rope_dim=rd)
        k = rope(k, positions, base=spec.rope_theta, order=spec.rope_order,
                 rope_dim=rd)

    bias = None
    if layer_cache is not None and "ring" in layer_cache and t > 1:
        # sequence-parallel prefill: the prompt's seq axis is sharded over
        # the mesh 'sp' axis; K/V blocks rotate over ICI while each shard
        # accumulates its queries (parallel/ring_attention.py — the
        # long-context fresh design; no reference counterpart, SURVEY §5).
        # K/V still append to the cache for the decode steps that follow.
        from ..parallel.ring_attention import ring_attention
        from ..runtime.kv_cache import update_layer_cache
        r = layer_cache["ring"]
        layer_cache = update_layer_cache(layer_cache, k, v)
        out = ring_attention(q, k, v, mesh=r["mesh"], axis_name=r["axis"],
                             q_positions=positions, kv_len=r.get("kv_len"),
                             kq_scale=spec.kq_scale)
        out = out.reshape(b, t, n_heads * head_dim)
        out = linear(out, lp["wo"], lp.get("wo_b"), use_pallas=use_pallas)
        if spec.attn_out_scale != 1.0:
            out = out * spec.attn_out_scale
        return out, layer_cache
    if layer_cache is not None and "slot" in layer_cache:
        # chunked prefill: T-token chunk of ONE slot appended to the main
        # cache, then flash chunk attention over rows [0, start + T)
        cache = layer_cache["cache"]
        layer = layer_cache["layer"]
        slot = layer_cache["slot"]
        start = layer_cache["chunk_start"]
        cache = cache.update_layer_slot(layer, slot, k, v, start)
        layer_cache = dict(layer_cache, cache=cache)
        use_fused = layer_cache.get("fused", False)
        if use_fused:
            from ..kernels.attention import chunk_attention
            out, cache = chunk_attention(q, cache, layer, slot, start,
                                         kq_scale=spec.kq_scale)
            layer_cache = dict(layer_cache, cache=cache)
        else:
            k_all, v_all = cache.read_layer(layer, x.dtype)
            k_slot = jax.lax.dynamic_slice_in_dim(k_all, slot, 1, axis=0)
            v_slot = jax.lax.dynamic_slice_in_dim(v_all, slot, 1, axis=0)
            out = mha(q, k_slot, v_slot, q_positions=positions,
                      kv_len=jnp.asarray(start + t, jnp.int32).reshape(1),
                      kq_scale=spec.kq_scale)
        out = out.reshape(b, t, n_heads * head_dim)
        out = linear(out, lp["wo"], lp.get("wo_b"), use_pallas=use_pallas)
        if spec.attn_out_scale != 1.0:
            out = out * spec.attn_out_scale
        return out, layer_cache
    if layer_cache is not None:
        from ..runtime.kv_cache import update_layer_cache, read_layer_cache
        layer_cache = update_layer_cache(layer_cache, k, v)
        if "cache" in layer_cache and t == 1 and not layer_cache.get("xla"):
            # fused Pallas decode attention: Q8 dequant-on-read + online
            # softmax directly over the stacked cache, per-slot lengths
            # (reference fused softmax unary_tensor_opr.h:460-536 +
            # KV dequant kv_cache.cc:104-249).  The cache flows THROUGH
            # the kernel (aliased) — keep the returned one.
            from ..kernels.attention import decode_attention
            out, thru_cache = decode_attention(q, layer_cache["cache"],
                                               layer_cache["layer"],
                                               layer_cache["start"] + 1,
                                               kq_scale=spec.kq_scale)
            layer_cache = dict(layer_cache, cache=thru_cache)
        else:
            k_full, v_full = read_layer_cache(layer_cache, x.dtype)
            kv_len = layer_cache["start"] + t
            if spec.pos_embedding_alg == "alibi":
                bias = alibi_bias(n_heads, jnp.arange(k_full.shape[1]))
            out = mha(q, k_full, v_full, q_positions=positions,
                      kv_len=kv_len, kq_scale=spec.kq_scale, bias=bias)
    else:
        if spec.pos_embedding_alg == "alibi":
            bias = alibi_bias(n_heads, jnp.arange(t))
        out = mha(q, k, v, q_positions=positions, kq_scale=spec.kq_scale,
                  bias=bias)

    out = out.reshape(b, t, n_heads * head_dim)
    out = linear(out, lp["wo"], lp.get("wo_b"), use_pallas=use_pallas)
    if spec.attn_out_scale != 1.0:
        out = out * spec.attn_out_scale
    return out, layer_cache


def ffn_block(spec: ModelSpec, lp: dict, x, *, use_pallas: bool = True):
    """Dense FFN: w1 (+w3 gate) -> activation -> w2
    (reference ProcessGpuLayer_FeedForward, inference_worker.cc:1726-1903)."""
    if "w1n3" in lp:
        h = linear(x, lp["w1n3"], lp.get("w1n3_b"), use_pallas=use_pallas)
        inter = h.shape[-1] // 2
        if spec.w1n3_ranks > 1:
            # rank-major fused layout (parallel/tp_step.py): per rank
            # [w1_r | w3_r]; un-interleave back to original column order
            r = spec.w1n3_ranks
            v = h.reshape(h.shape[:-1] + (r, 2, inter // r))
            a = v[..., 0, :].reshape(h.shape[:-1] + (inter,))
            g = v[..., 1, :].reshape(h.shape[:-1] + (inter,))
        else:
            a, g = h[..., :inter], h[..., inter:]
    else:
        a = linear(x, lp["w1"], lp.get("w1_b"), use_pallas=use_pallas)
        g = None
        if "w3" in lp:
            g = linear(x, lp["w3"], lp.get("w3_b"), use_pallas=use_pallas)
    h = activate(spec.activation_fn, a, g)
    out = linear(h, lp["w2"], lp.get("w2_b"), use_pallas=use_pallas)
    if spec.ffn_out_scale != 1.0:
        out = out * spec.ffn_out_scale
    return out


def moe_block(spec: ModelSpec, lp: dict, x, *, use_pallas: bool = True):
    """Sparse-MoE FFN: on-device top-k routing + expert mix.

    The reference routes on the HOST (BuildRowsForMoE, host_tensor_opr.h:55,
    with a device->host logits round trip, inference_worker.cc:1924-2146);
    here routing stays on device.  Two paths:

      - decode (T==1, B*top_k < E, experts stacked): gather ONLY the
        selected experts' weights from the E-leading stacked pytree via
        dynamic indexing — HBM bytes per step scale with top_k/E instead
        of streaming every expert (the reference reads top-k only too,
        inference_worker.cc:2053-2121);
      - prefill / large batch: dense one-hot combine over all experts
        (every expert is touched by some token anyway; static shapes).
    """
    hp = spec.hyper_params
    top_k = hp.moe_top_k or 2
    stacked = lp.get("experts_stacked")
    if stacked is not None:
        n_exp = _stacked_layer_count(stacked)
    else:
        n_exp = len(lp["experts"])

    gate_logits = linear(x, lp["gate"], lp.get("gate_b"),
                         use_pallas=use_pallas).astype(jnp.float32)
    probs = jax.nn.softmax(gate_logits, axis=-1)  # (B, T, E)
    top_vals, top_idx = jax.lax.top_k(probs, top_k)
    if hp.moe_norm_top_k_prob:
        top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)

    b, t, _ = x.shape
    if stacked is not None and t == 1 and b * top_k < n_exp:
        # routed decode: per-slot gather of the top-k experts' weights
        out = jnp.zeros_like(x, dtype=jnp.float32)
        for bi in range(b):
            xi = x[bi:bi + 1]
            for j in range(top_k):
                elp = _index_layer(stacked, top_idx[bi, 0, j])
                y = ffn_block(spec, elp, xi, use_pallas=use_pallas)
                out = out.at[bi].add(y[0].astype(jnp.float32)
                                     * top_vals[bi, 0, j])
    else:
        # dense combine weights (B, T, E)
        onehot = jax.nn.one_hot(top_idx, n_exp,
                                dtype=jnp.float32)  # (B,T,K,E)
        combine = jnp.einsum("btke,btk->bte", onehot, top_vals)
        out = jnp.zeros_like(x, dtype=jnp.float32)
        for e in range(n_exp):
            elp = (_index_layer(stacked, e) if stacked is not None
                   else lp["experts"][e])
            y = ffn_block(spec, elp, x, use_pallas=use_pallas)
            out = out + y.astype(jnp.float32) * combine[..., e:e + 1]
    if "shared" in lp and lp["shared"]:
        out = out + ffn_block(spec, lp["shared"], x,
                              use_pallas=use_pallas).astype(jnp.float32)
    return out.astype(x.dtype)


def decoder_layer(spec: ModelSpec, lp: dict, x, positions,
                  layer_cache: Optional[dict], *, use_pallas: bool = True,
                  tp_axis: Optional[str] = None):
    """One decoder layer honoring is_parallel_attn / mlp_attn_share_input /
    is_attn_post_as_residual (inference_worker.cc:762-981).

    tp_axis: set when running INSIDE shard_map over a tensor-parallel
    mesh axis (parallel/tp_step.py): the attention and FFN sub-layer
    outputs are partial sums from this shard's row-split wo/w2 and are
    psum'd here — the same two all-reduce points as the reference
    (inference_worker.cc:2148-2335)."""
    attn_p = lp["attn"]
    residual = x

    def _reduce(out):
        return out if tp_axis is None else jax.lax.psum(out, tp_axis)

    h = x
    if spec.use_self_attn_pre_norm:
        h = _norm(spec, x, attn_p, "pre_norm", spec.attn_pre_norm_base)
    attn_out, layer_cache = attention_block(spec, attn_p, h, positions,
                                            layer_cache, use_pallas=use_pallas)
    attn_out = _reduce(attn_out)

    if spec.is_parallel_attn:
        # Falcon/Phi: FFN reads the same (normed) input; outputs summed
        ffn_in = h if spec.mlp_attn_share_input else _norm(
            spec, x, lp.get("ffn", lp.get("moe", {})), "pre_norm",
            spec.ffn_pre_norm_base)
        if "moe" in lp:
            ffn_out = moe_block(spec, lp["moe"], ffn_in, use_pallas=use_pallas)
        else:
            ffn_out = ffn_block(spec, lp["ffn"], ffn_in, use_pallas=use_pallas)
        return residual + attn_out + _reduce(ffn_out), layer_cache

    attn_out = _norm(spec, attn_out, attn_p, "post_norm")
    if spec.is_attn_post_as_residual:
        x = residual + attn_out
    else:
        x = attn_out

    residual = x
    if "moe" in lp:
        mp = lp["moe"]
        h = _norm(spec, x, mp, "pre_norm", spec.ffn_pre_norm_base)
        ffn_out = _reduce(moe_block(spec, mp, h, use_pallas=use_pallas))
        ffn_out = _norm(spec, ffn_out, mp, "post_norm")
    else:
        fp = lp["ffn"]
        h = _norm(spec, x, fp, "pre_norm", spec.ffn_pre_norm_base)
        ffn_out = _reduce(ffn_block(spec, fp, h, use_pallas=use_pallas))
        ffn_out = _norm(spec, ffn_out, fp, "post_norm")
    return residual + ffn_out, layer_cache


def embed_tokens(spec: ModelSpec, params: dict, tokens, positions,
                 input_embeds=None):
    """Token embedding + pre-layer transforms
    (ProcessPreLayer, inference_worker.cc:435-550).

    input_embeds: optional pre-gathered (B, T, E) rows — the host-RAM
    embedding path (reference be_host_embeddings + GetEmbdTensor,
    inference_engine.cc:1298-1353)."""
    if input_embeds is not None:
        x = input_embeds.astype(jnp.bfloat16)
    else:
        emb = params["dec_embeddings"]
        x = jnp.take(emb, tokens, axis=0).astype(jnp.bfloat16)
    if spec.has_embedding_linear_norm:
        x = linear_norm(x, spec.embedding_linear_scale)
    if spec.pos_embedding_alg in ("sinusoidal", "sinusoidal2"):
        if spec.has_linear_norm_before_sinusoidal and not spec.has_embedding_linear_norm:
            x = linear_norm(x, spec.embedding_linear_scale)
        scheme = 1 if spec.pos_embedding_alg == "sinusoidal" else 2
        pe = sinusoidal_embedding(positions.reshape(-1), x.shape[-1],
                                  scheme=scheme, order=2)
        x = x + pe.reshape(x.shape).astype(x.dtype)
    if "dec_pos_embeddings" in params:  # learned positions (OPT/BERT style)
        off = spec.pos_embedding_offset
        x = x + jnp.take(params["dec_pos_embeddings"], positions + off,
                         axis=0).astype(x.dtype)
    if "dec_input_norm" in params:
        x = apply_norm(spec.norm_alg, x, params.get("dec_input_norm"),
                       params.get("dec_input_norm_b"), spec.norm_eps)
    return x


def output_logits(spec: ModelSpec, params: dict, x, *, use_pallas: bool = True):
    """Output norm + lm_head (ProcessPostLayer, inference_worker.cc:552-679)."""
    x = apply_norm(spec.norm_alg, x, params.get("dec_output_norm"),
                   params.get("dec_output_norm_b"), spec.norm_eps,
                   spec.output_norm_base)
    head = params.get("lm_head")
    if head is None:
        head = params["dec_embeddings"].T  # tied weights
    # Quantized heads are normalized at LOAD time (model_loader
    # _prepare_tensor, mirroring network_builder.cc:439-444 which only
    # normalizes F16/F32 host tensors); runtime normalization covers the
    # dense/tied-weights case.
    if spec.normalize_lm_head and isinstance(head, jax.Array):
        head = head / jnp.linalg.norm(head.astype(jnp.float32), axis=0,
                                      keepdims=True).astype(head.dtype)
    logits = linear(x, head, params.get("lm_head_b"), use_pallas=use_pallas)
    if spec.out_scale != 1.0:
        logits = logits * spec.out_scale
    return logits.astype(jnp.float32)


def decoder_forward(spec: ModelSpec, params: dict, tokens, positions,
                    cache: Optional[KVCache] = None, *,
                    use_pallas: bool = True, input_embeds=None
                    ) -> Tuple[jax.Array, Optional[KVCache]]:
    """Full decoder forward.

    tokens/positions: (B, T) int32; positions are absolute (cache offsets).
    Returns (logits (B, T, V) float32, updated cache).
    """
    from ..runtime.kv_cache import layer_cache_slice, store_layer_cache

    x = embed_tokens(spec, params, tokens, positions, input_embeds)
    for i, lp in enumerate(params["layers"]):
        lc = None if cache is None else layer_cache_slice(cache, i)
        x, lc = decoder_layer(spec, lp, x, positions, lc,
                              use_pallas=use_pallas)
        if cache is not None:
            cache = store_layer_cache(cache, i, lc)
    logits = output_logits(spec, params, x, use_pallas=use_pallas)
    if cache is not None:
        cache = cache.with_length(cache.length + tokens.shape[1])
    return logits, cache


def stack_pytrees(vals):
    """Stack a list of structurally-identical param pytrees along a NEW
    leading axis (handles plain arrays and every quantized leaf type)."""
    if isinstance(vals[0], dict):
        return {k: stack_pytrees([v[k] for v in vals]) for k in vals[0]}
    if isinstance(vals[0], list):  # e.g. moe experts
        n = len(vals[0])
        return [stack_pytrees([v[j] for v in vals]) for j in range(n)]
    first = vals[0]
    if hasattr(first, "qt"):  # QuantizedWithDelta
        from ..quant.delta import QuantizedWithDelta, DeltaTensor
        return QuantizedWithDelta(
            stack_pytrees([v.qt for v in vals]),
            DeltaTensor(jnp.stack([v.delta.idx for v in vals]),
                        jnp.stack([v.delta.val for v in vals])))
    if hasattr(first, "kind"):  # GlobalQuantTensor
        from ..quant.codec_jax import GlobalQuantTensor
        return GlobalQuantTensor(
            first.kind, (len(vals),) + tuple(first.shape),
            jnp.stack([v.codes for v in vals]),
            jnp.stack([v.params for v in vals]))
    if hasattr(first, "planes"):  # QuantizedTensor
        from ..quant.codec_jax import QuantizedTensor
        planes = {k: jnp.stack([v.planes[k] for v in vals])
                  for k in first.planes}
        scale = jnp.stack([v.scale for v in vals])
        base = (None if first.base is None
                else jnp.stack([v.base for v in vals]))
        return QuantizedTensor(first.format,
                               (len(vals),) + tuple(first.shape),
                               planes, scale, base)
    if hasattr(first, "data"):  # Int8MXUTensor
        from ..quant.codec_jax import Int8MXUTensor
        return Int8MXUTensor((len(vals),) + tuple(first.shape),
                             jnp.stack([v.data for v in vals]),
                             jnp.stack([v.scale for v in vals]))
    return jnp.stack([jnp.asarray(v) for v in vals])


def stack_moe_experts(layers: list) -> list:
    """Replace each layer's moe['experts'] list with an E-leading stacked
    pytree under moe['experts_stacked'] (consuming the list).

    Enables the routed decode path in moe_block: top-k expert weights are
    gathered by dynamic index from the stacked leading axis, so a decode
    step streams top_k/E of the expert bytes instead of all of them
    (reference routes on host then gathers rows,
    inference_worker.cc:2053-2121; here the GATHER moves weights, which is
    the memory-bound quantity at batch-1 decode)."""
    for layer in layers:
        moe = layer.get("moe")
        if not moe or "experts" not in moe or not moe["experts"]:
            continue
        experts = moe["experts"]
        keys = set(experts[0].keys())
        if any(set(e.keys()) != keys for e in experts):
            continue
        try:
            stacked = stack_pytrees(experts)
        except Exception:
            continue  # heterogeneous formats: keep the list path
        moe["experts_stacked"] = stacked
        del moe["experts"]
    return layers


def stack_layers(layers: list, consume: bool = False) -> dict:
    """Stack homogeneous per-layer param dicts into one leading-L pytree
    (for lax.scan over layers and layer-sharded pipeline parallelism).

    consume=True releases each per-layer leaf as soon as its stacked copy
    exists (deletes the dict entries), holding peak memory to weights +
    one stacked slot instead of 2x the weights — necessary to stack
    10GB-class models on a 16GB chip."""
    stack = stack_pytrees

    keys = set()
    for l in layers:
        keys.update(l.keys())
    if any(set(l.keys()) != keys for l in layers):
        raise ValueError("layers are not homogeneous; cannot stack")
    if not consume:
        return stack(layers)

    def rec(nodes):
        out = {}
        for key in list(nodes[0].keys()):
            vals = [nd[key] for nd in nodes]
            if isinstance(vals[0], dict):
                out[key] = rec(vals)
            elif isinstance(vals[0], list) and vals[0] \
                    and isinstance(vals[0][0], dict):
                out[key] = [rec([v[j] for v in vals])
                            for j in range(len(vals[0]))]
            else:
                out[key] = stack(vals)
            for nd in nodes:
                del nd[key]
        return out

    return rec(layers)


def _concat_weights(parts):
    """Concatenate weight matrices along N (out_features).

    Supports dense arrays and QuantizedTensors of identical format/K —
    every plane and metadata plane concatenates along the lane axis, so
    one fused kernel invocation replaces several (the per-pallas-call
    fixed overhead is ~10-20us; fusing QKV and W1|W3 removes 3 of 7
    launches per layer)."""
    from ..quant.codec_jax import QuantizedTensor
    first = parts[0]
    if isinstance(first, QuantizedTensor):
        if not all(isinstance(p, QuantizedTensor)
                   and p.format == first.format
                   and p.shape[-2] == first.shape[-2] for p in parts):
            return None
        planes = {k: jnp.concatenate([p.planes[k] for p in parts], axis=-1)
                  for k in first.planes}
        scale = jnp.concatenate([p.scale for p in parts], axis=-1)
        base = (None if first.base is None else
                jnp.concatenate([p.base for p in parts], axis=-1))
        n = sum(int(p.shape[-1]) for p in parts)
        return QuantizedTensor(first.format,
                               tuple(first.shape[:-1]) + (n,),
                               planes, scale, base)
    from ..quant.codec_jax import Int8MXUTensor
    if isinstance(first, Int8MXUTensor):
        if not all(isinstance(p, Int8MXUTensor)
                   and p.shape[-2] == first.shape[-2] for p in parts):
            return None
        n = sum(int(p.shape[-1]) for p in parts)
        return Int8MXUTensor(tuple(first.shape[:-1]) + (n,),
                             jnp.concatenate([p.data for p in parts],
                                             axis=-1),
                             jnp.concatenate([p.scale for p in parts],
                                             axis=-1))
    if any(hasattr(p, "qt") for p in parts):  # delta tensors: skip
        return None
    if not all(hasattr(p, "ndim") and p.ndim == first.ndim
               and p.shape[0] == first.shape[0] for p in parts):
        return None
    return jnp.concatenate(parts, axis=-1)


def fuse_layer_weights(layers: list) -> list:
    """Fuse wq|wk|wv -> qkv (qkv_format=1 order) and w1|w3 -> w1n3 per
    layer (incl. MoE experts/shared).  Returns a NEW layer list; layers
    that can't fuse stay unchanged.  Callers must set spec.qkv_format=1
    when the attention fusion applies."""
    out = []
    for layer in layers:
        layer = dict(layer)
        attn = dict(layer.get("attn", {}))
        if all(k in attn for k in ("wq", "wk", "wv")) and \
                not any(k + "_b" in attn for k in ("wq", "wk", "wv")):
            fused = _concat_weights([attn["wq"], attn["wk"], attn["wv"]])
            if fused is not None:
                for k in ("wq", "wk", "wv"):
                    attn.pop(k)
                attn["qkv"] = fused
        layer["attn"] = attn

        def fuse_ffn(blk):
            blk = dict(blk)
            if "w1" in blk and "w3" in blk and "w1_b" not in blk \
                    and "w3_b" not in blk:
                fused = _concat_weights([blk["w1"], blk["w3"]])
                if fused is not None:
                    blk.pop("w1"), blk.pop("w3")
                    blk["w1n3"] = fused
            return blk

        if "ffn" in layer:
            layer["ffn"] = fuse_ffn(layer["ffn"])
        if "moe" in layer:
            moe = dict(layer["moe"])
            if "experts" in moe:
                moe["experts"] = [fuse_ffn(e) for e in moe["experts"]]
            if "experts_stacked" in moe:
                # _concat_weights is rank-generic: fusing the E-stacked
                # (E, K, N) leaves works the same as per-expert
                moe["experts_stacked"] = fuse_ffn(moe["experts_stacked"])
            if moe.get("shared"):
                moe["shared"] = fuse_ffn(moe["shared"])
            layer["moe"] = moe
        out.append(layer)
    return out


def split_layers(layers, h: int):
    """Split a layer collection into (first h as a list of per-layer
    pytrees, remaining stacked pytree).  Accepts a stacked pytree or a
    plain list.  Used by host-KV offload (runtime/host_offload.py)."""
    if isinstance(layers, list):
        prefix = layers[:h]
        suffix = stack_layers(layers[h:]) if layers[h:] else None
        return prefix, suffix
    # stacked: slice per-layer for the prefix, narrow the suffix
    prefix = [_index_layer(layers, i) for i in range(h)]

    def tail(v):
        if isinstance(v, dict):
            return {k: tail(x) for k, x in v.items()}
        if isinstance(v, list):
            return [tail(x) for x in v]
        from ..quant.codec_jax import GlobalQuantTensor, QuantizedTensor
        if isinstance(v, GlobalQuantTensor):
            return GlobalQuantTensor(v.kind,
                                     (v.shape[0] - h,) + tuple(v.shape[1:]),
                                     v.codes[h:], v.params[h:])
        if isinstance(v, QuantizedTensor):
            return QuantizedTensor(v.format, (v.shape[0] - h,) + tuple(v.shape[1:]),
                                   {k: p[h:] for k, p in v.planes.items()},
                                   v.scale[h:],
                                   None if v.base is None else v.base[h:])
        if hasattr(v, "data"):  # Int8MXUTensor
            from ..quant.codec_jax import Int8MXUTensor
            return Int8MXUTensor((v.shape[0] - h,) + tuple(v.shape[1:]),
                                 v.data[h:], v.scale[h:])
        return v[h:]

    return prefix, tail(layers)


def _index_layer(stacked, i):
    """Select layer i from a stacked layer pytree (inside scan)."""
    from ..quant.codec_jax import QuantizedTensor

    def sel(v):
        if isinstance(v, dict):
            return {k: sel(x) for k, x in v.items()}
        if isinstance(v, list):
            return [sel(x) for x in v]
        if hasattr(v, "qt"):  # QuantizedWithDelta
            from ..quant.delta import QuantizedWithDelta, DeltaTensor
            return QuantizedWithDelta(
                sel(v.qt), DeltaTensor(v.delta.idx[i], v.delta.val[i]))
        if hasattr(v, "kind"):  # GlobalQuantTensor
            from ..quant.codec_jax import GlobalQuantTensor
            return GlobalQuantTensor(v.kind, tuple(v.shape[1:]),
                                     v.codes[i], v.params[i])
        if isinstance(v, QuantizedTensor):
            return QuantizedTensor(v.format, tuple(v.shape[1:]),
                                   {k: p[i] for k, p in v.planes.items()},
                                   v.scale[i],
                                   None if v.base is None else v.base[i])
        if hasattr(v, "data"):  # Int8MXUTensor
            from ..quant.codec_jax import Int8MXUTensor
            return Int8MXUTensor(tuple(v.shape[1:]), v.data[i], v.scale[i])
        return v[i]

    return sel(stacked)


def decoder_forward_scan(spec: ModelSpec, params: dict, tokens, positions,
                         cache: Optional[KVCache] = None, *,
                         use_pallas: bool = True, input_embeds=None,
                         ring: Optional[dict] = None
                         ) -> Tuple[jax.Array, Optional[KVCache]]:
    """Decoder forward with lax.scan over stacked layers.

    params['layers'] must be a stacked pytree (see stack_layers).  This is
    the fast-compile path for deep models and the vehicle for layer-sharded
    (pipeline) parallelism: shard the stacked leading axis over the 'pp'
    mesh axis (parallel/sharding.py).

    ring: optional {'mesh', 'axis', 'kv_len'} — route prefill attention
    through sequence-parallel ring attention over that mesh axis."""
    from ..runtime.kv_cache import (layer_cache_slice, store_layer_cache)

    x = embed_tokens(spec, params, tokens, positions, input_embeds)
    x, cache = decoder_layers_scan(spec, params["layers"], x, positions,
                                   cache, use_pallas=use_pallas, ring=ring)
    logits = output_logits(spec, params, x, use_pallas=use_pallas)
    if cache is not None:
        cache = cache.with_length(cache.length + tokens.shape[1])
    return logits, cache


def decoder_layers_unrolled(spec: ModelSpec, stacked, x, positions,
                            cache: Optional[KVCache] = None, *,
                            use_pallas: bool = True,
                            tp_axis: Optional[str] = None):
    """Statically-unrolled layer loop over a STACKED pytree.

    For decode steps this beats lax.scan by ~25% on TPU: scan's xs/ys
    handling materializes a dynamic-slice copy of each layer's KV cache
    and restacks the updated copy every iteration, while static layer
    indices fuse into the attention reads and `.at[i].set` writes in
    place.  Compile time grows with depth, so prefill (fewer invocations
    per token) keeps the scan path.  Does NOT advance cache.length.

    Single-token decode on TPU routes attention through the fused Pallas
    kernel (kernels/attention.py): the full stacked cache goes straight to
    the kernel with the layer index, so no per-layer cache slice is ever
    copied in HBM."""
    is_list = isinstance(stacked, list)
    n_layers = len(stacked) if is_list else _stacked_layer_count(stacked)
    if cache is not None and use_pallas and x.shape[1] == 1 \
            and not is_list and tp_axis is None:
        # whole-model fused decode: ONE pallas call for all layers
        # (kernels/decode_step.py) — kills the per-layer launch + pipeline
        # ramp overhead that dominated the r2 decode step.  The engine's
        # first-decode probe disables this path process-wide if the
        # kernel fails to compile on the chip (mega_disabled()).
        from ..kernels.decode_step import (fused_decode_step,
                                           fused_step_preferred,
                                           mega_backend_ok)
        if mega_backend_ok() and fused_step_preferred(spec, stacked, cache,
                                                      x.shape[0]):
            return fused_decode_step(spec, stacked, x, positions, cache)
    from ..runtime.paged_kv import PagedKVCache
    paged = isinstance(cache, PagedKVCache)
    fused = False
    if cache is not None and use_pallas and x.shape[1] == 1 \
            and jax.default_backend() == "tpu":
        from ..kernels.attention import decode_attention_supported
        fused = decode_attention_supported(cache, spec, x.shape[1])
    for i in range(n_layers):
        lp = stacked[i] if is_list else _index_layer(stacked, i)
        if cache is None:
            lc = None
        elif fused or paged:
            # paged caches always flow whole (the page pool has no dense
            # per-layer slice); 'xla' routes attention through the
            # logical-read fallback when the kernel doesn't apply
            from ..runtime.kv_cache import layer_cache_fused
            lc = layer_cache_fused(cache, i)
            if paged and not fused:
                lc["xla"] = True
        else:
            lc = layer_cache_slice_static(cache, i)
        x, lc = decoder_layer(spec, lp, x, positions, lc,
                              use_pallas=use_pallas, tp_axis=tp_axis)
        if cache is not None:
            from ..runtime.kv_cache import store_layer_cache
            cache = store_layer_cache(cache, i, lc)
    return x, cache


def layer_cache_slice_static(cache: KVCache, i: int) -> dict:
    from ..runtime.kv_cache import layer_cache_slice
    return layer_cache_slice(cache, i)


def decoder_layers_chunk(spec: ModelSpec, stacked, x, positions, cache,
                         slot, start, *, use_pallas: bool = True):
    """Chunked-prefill layer loop: x is a (1, C) token chunk of one slot;
    K/V rows append to the MAIN cache at `start` and attention covers
    rows [0, start + C) with causal masking (kernels/attention.py
    chunk_attention; XLA fallback off-TPU).  Does NOT advance
    cache.length — the engine commits it when the prompt completes."""
    from ..kernels.attention import decode_attention_supported
    from ..runtime.kv_cache import store_layer_cache

    fused = (use_pallas and jax.default_backend() == "tpu"
             and decode_attention_supported(cache, spec, 1))
    is_list = isinstance(stacked, list)
    n_layers = len(stacked) if is_list else _stacked_layer_count(stacked)
    for i in range(n_layers):
        lp = stacked[i] if is_list else _index_layer(stacked, i)
        lc = {"cache": cache, "layer": i, "slot": slot,
              "chunk_start": start, "fused": fused}
        x, lc = decoder_layer(spec, lp, x, positions, lc,
                              use_pallas=use_pallas)
        cache = store_layer_cache(cache, i, lc)
    return x, cache


def _stacked_layer_count(stacked) -> int:
    if isinstance(stacked, dict):
        for v in stacked.values():
            n = _stacked_layer_count(v)
            if n:
                return n
        return 0
    if isinstance(stacked, list):
        for v in stacked:
            n = _stacked_layer_count(v)
            if n:
                return n
        return 0
    if hasattr(stacked, "qt"):
        return _stacked_layer_count(stacked.qt)
    from ..quant.codec_jax import QuantizedTensor as _QT
    if isinstance(stacked, _QT):
        return int(stacked.scale.shape[0])
    return int(stacked.shape[0])


def decoder_layers_scan(spec: ModelSpec, stacked, x, positions,
                        cache: Optional[KVCache] = None, *,
                        use_pallas: bool = True,
                        ring: Optional[dict] = None):
    """lax.scan over a stacked layer pytree (no embedding / logits).

    Also the entry point for partial-stack execution: host-KV-offload runs
    the leading layers outside and scans only the on-device suffix
    (runtime/host_offload.py).  Does NOT advance cache.length.

    Heterogeneous layer LISTS (e.g. DeepSeek-MoE's dense first layer
    cannot stack) fall back to the unrolled loop."""
    if isinstance(stacked, list):
        if ring is not None:
            raise ValueError("ring-attention prefill requires stacked "
                             "(homogeneous) layers")
        return decoder_layers_unrolled(spec, stacked, x, positions, cache,
                                       use_pallas=use_pallas)
    if cache is None:
        def body(h, lp):
            h, _ = decoder_layer(spec, lp, h, positions, None,
                                 use_pallas=use_pallas)
            return h, None

        x, _ = jax.lax.scan(body, x, stacked)
        return x, None

    lc_stacked = {
        "k": cache.k, "v": cache.v,
        "k_scale": cache.k_scale, "v_scale": cache.v_scale,
    }

    def body(h, xs):
        lp, lc = xs
        lc = dict(lc, start=cache.length, head_dim=cache.head_dim)
        if ring is not None:
            lc["ring"] = ring
        if lc["k_scale"] is None:
            lc.pop("k_scale"), lc.pop("v_scale")
        h, lc = decoder_layer(spec, lp, h, positions, lc,
                              use_pallas=use_pallas)
        out = {"k": lc["k"], "v": lc["v"],
               "k_scale": lc.get("k_scale"), "v_scale": lc.get("v_scale")}
        return h, out

    x, new_lc = jax.lax.scan(body, x, (stacked, lc_stacked))
    return x, KVCache(new_lc["k"], new_lc["v"], new_lc["k_scale"],
                      new_lc["v_scale"], cache.length,
                      head_dim=cache.head_dim)
