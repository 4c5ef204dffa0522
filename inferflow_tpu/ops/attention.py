"""Attention (XLA path): causal-prefix masked multi-head attention with GQA.

Mirrors the reference's per-query attention loop semantics —
KQ matmul with RepeatKV GQA replication, softmax with causal prefix mask,
then `V` contraction (inference_worker.cc:983-1332; fused-softmax mask in
kernels/unary_tensor_opr.h:460-536) — as one batched einsum program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def mha(q, k, v, *, q_positions, kv_len=None, kq_scale: float = 1.0,
        causal: bool = True, bias=None, logits_dtype=jnp.float32):
    """Batched multi-head attention.

    q: (B, Tq, Hq, D); k/v: (B, Tk, Hkv, D) — Hq must be a multiple of Hkv
    (GQA replication, reference TensorOpr::RepeatKV tensor_opr.h:43).
    q_positions: (B, Tq) absolute position of each query row (the causal mask
    admits key j iff j <= position, reference SoftMax prefix mask).
    kv_len: (B,) number of valid KV rows (rest masked).
    bias: optional (Hq, Tk) additive bias (e.g. ALiBi).
    """
    b, tq, hq, d = q.shape
    _, tk, hkv, _ = k.shape
    group = hq // hkv

    qf = q.astype(logits_dtype)
    kf = k.astype(logits_dtype)
    # (B, Hkv, group, Tq, Tk)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk",
                        qf.reshape(b, tq, hkv, group, d).transpose(0, 1, 2, 3, 4),
                        kf) * (1.0 / (d ** 0.5)) * kq_scale

    key_idx = jnp.arange(tk)[None, None, None, None, :]
    mask = jnp.ones((b, 1, 1, tq, tk), dtype=bool)
    if causal:
        qpos = q_positions[:, None, None, :, None]
        mask = key_idx <= qpos
    if kv_len is not None:
        mask = jnp.logical_and(mask, key_idx < kv_len[:, None, None, None, None])
    if bias is not None:
        bias5 = bias.reshape(1, hkv, group, 1, tk)
        scores = scores + bias5.astype(logits_dtype)
    scores = jnp.where(mask, scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v)
    return out.reshape(b, tq, hq, d)
