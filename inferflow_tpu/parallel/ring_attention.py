"""Ring attention: sequence-parallel attention over a mesh axis.

A fresh TPU-native design with NO reference counterpart (SURVEY §5: the
reference has no long-context machinery at all — its attention
materializes the full score matrix per query, kv tensors live on one
device).  Here the SEQUENCE axis is sharded over a mesh axis: each device
holds a Tq/P query block and a Tk/P key/value block, and K/V blocks rotate
around the ring (jax.lax.ppermute over ICI) while every device accumulates
its queries' online-softmax state.  Peak memory per device is
O(Tq*Tk/P^2) for scores and O(Tk/P) for KV — long contexts scale OUT with
the mesh instead of up with HBM.

Collectives ride XLA (shard_map + ppermute), the blockwise math is the
same online softmax as kernels/attention.py; the inner block product uses
the XLA einsum path so this composes with any head layout and runs on any
backend (the Pallas decode/chunk kernels stay the single-chip fast path).

Reference for the algorithm family: Ring Attention (Liu et al. 2023) /
blockwise attention — reimplemented from the math.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _block_attn(q, k, v, q_pos, k_pos, kv_valid, kq_scale, m, l, acc):
    """One online-softmax accumulation step.

    q: (B, Tq, Hq, D); k/v: (B, Tk, Hkv, D); q_pos: (B, Tq) absolute query
    positions; k_pos: (B, Tk) absolute key positions; kv_valid: (B, Tk)
    bool validity of each key row.  m/l/acc: running max / denominator /
    numerator in float32.
    """
    b, tq, hq, d = q.shape
    _, tk, hkv, _ = k.shape
    g = hq // hkv

    qf = q.astype(jnp.float32).reshape(b, tq, hkv, g, d)
    kf = k.astype(jnp.float32)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf)
    scores = scores * (1.0 / (d ** 0.5)) * kq_scale

    mask = (k_pos[:, None, None, None, :] <= q_pos[:, None, None, :, None])
    mask = jnp.logical_and(mask,
                           kv_valid[:, None, None, None, :])
    scores = jnp.where(mask, scores, NEG_INF)

    m_new = jnp.maximum(m, jnp.max(scores, axis=-1))  # (B,Hkv,G,Tq)
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(scores - m_new[..., None])
    # fully-masked blocks: p rows are exp(NEG_INF - m) = 0 — harmless
    l_new = alpha * l + jnp.sum(p, axis=-1)
    pv = jnp.einsum("bhgqk,bkhd->bhgqd", p, v.astype(jnp.float32))
    acc_new = alpha[..., None] * acc + pv
    return m_new, l_new, acc_new


def ring_attention(q, k, v, *, mesh: Mesh, axis_name: str = "sp",
                   q_positions=None, kv_len=None, kq_scale: float = 1.0):
    """Causal multi-head attention with the SEQUENCE axis sharded over
    `axis_name`.

    q: (B, Tq, Hq, D); k/v: (B, Tk, Hkv, D) with Tq == Tk (self-attention
    over one sequence; sharded along axis 1).  q_positions: optional
    (B, Tq) absolute positions (default arange).  kv_len: optional (B,)
    valid KV rows.  Returns (B, Tq, Hq, D) sharded like q.
    """
    b, t, hq, d = q.shape
    _, tk, hkv, _ = k.shape
    assert t == tk, "ring attention shards one sequence axis"
    n_dev = mesh.shape[axis_name]
    assert t % n_dev == 0, f"seq {t} must divide over {axis_name}={n_dev}"
    if q_positions is None:
        q_positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None],
                                       (b, t))
    if kv_len is None:
        kv_len = jnp.full((b,), t, jnp.int32)
    k_positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None],
                                   (b, t))

    seq = P(None, axis_name, None, None)
    pos_spec = P(None, axis_name)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(seq, seq, seq, pos_spec, pos_spec, P(None)),
        out_specs=seq, check_vma=False)
    def run(qb, kb, vb, qpos, kpos, klen):
        g = hq // hkv
        tq_l = qb.shape[1]
        m = jnp.full((b, hkv, g, tq_l), NEG_INF, jnp.float32)
        l = jnp.zeros((b, hkv, g, tq_l), jnp.float32)
        acc = jnp.zeros((b, hkv, g, tq_l, d), jnp.float32)

        def body(i, carry):
            m, l, acc, kb, vb, kpos = carry
            kv_valid = kpos < klen[:, None]
            m, l, acc = _block_attn(qb, kb, vb, qpos, kpos, kv_valid,
                                    kq_scale, m, l, acc)
            # rotate the KV block (and its positions) around the ring
            perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)
            kpos = jax.lax.ppermute(kpos, axis_name, perm)
            return m, l, acc, kb, vb, kpos

        m, l, acc, *_ = jax.lax.fori_loop(
            0, n_dev, body, (m, l, acc, kb, vb, kpos))
        out = acc / jnp.maximum(l, 1e-30)[..., None]  # (B,Hkv,G,Tq,D)
        out = out.transpose(0, 3, 1, 2, 4).reshape(b, tq_l, hq, d)
        return out.astype(q.dtype)

    qs = jax.device_put(q, NamedSharding(mesh, seq))
    ks = jax.device_put(k, NamedSharding(mesh, seq))
    vs = jax.device_put(v, NamedSharding(mesh, seq))
    qp = jax.device_put(q_positions, NamedSharding(mesh, pos_spec))
    kp = jax.device_put(k_positions, NamedSharding(mesh, pos_spec))
    kl = jax.device_put(kv_len, NamedSharding(mesh, P(None)))
    return run(qs, ks, vs, qp, kp, kl)
