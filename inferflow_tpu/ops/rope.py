"""Position embeddings: RoPE (two column orders, partial rotary), ALiBi,
sinusoidal (two frequency schemes x two column orders).

Reference: src/kernels/unary_tensor_opr.h:597-763 and
TensorOpr::PositionEmbedding dispatch (src/tensor/tensor_opr.cu).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope(x, positions, *, base: float = 10000.0, order: int = 1,
         rope_dim: int = -1):
    """Rotary position embedding over the last axis of x.

    x: (..., T, H, D) or (..., T, D); positions: (..., T) int32 absolute
    positions (the reference passes context_len + row as the position,
    inference_worker.cc:1587-1621).

    order=1: interleaved pairs (col, col+1), frequency index col//2
             (PosEmbedding_Rope_Std_Kernel, unary_tensor_opr.h:663-700) —
             the llama2.c / GPT-NeoX-interleaved convention.
    order=2: half-split pairs (col, col+rope_dim/2), frequency index col,
             pass-through beyond rope_dim (PosEmbedding_Rope_Order2_Kernel,
             :702-745) — the HF "rotate_half" convention w/ partial rotary.
    """
    d = x.shape[-1]
    rd = d if rope_dim is None or rope_dim <= 0 else rope_dim
    xf = x.astype(jnp.float32)
    pos = positions.astype(jnp.float32)
    # broadcast positions over trailing non-time axes
    extra = x.ndim - positions.ndim - 1
    pos = pos.reshape(pos.shape + (1,) * extra)  # (..., T, [1])

    half = rd // 2
    freq_idx = jnp.arange(half, dtype=jnp.float32)
    inv_freq = base ** (-2.0 * freq_idx / rd)  # theta_scale^i
    theta = pos[..., None] * inv_freq  # (..., T, [heads], half)
    cos, sin = jnp.cos(theta), jnp.sin(theta)

    if order == 1:
        xr = xf[..., :rd].reshape(xf.shape[:-1] + (half, 2))
        x0, x1 = xr[..., 0], xr[..., 1]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rot = jnp.stack([r0, r1], axis=-1).reshape(xf.shape[:-1] + (rd,))
    else:
        x0 = xf[..., :half]
        x1 = xf[..., half:rd]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rot = jnp.concatenate([r0, r1], axis=-1)
    if rd < d:
        rot = jnp.concatenate([rot, xf[..., rd:]], axis=-1)
    return rot.astype(x.dtype)


def alibi_slopes(n_heads: int) -> np.ndarray:
    """Per-head ALiBi slopes (PosEmbedding_Alibi_Std_Kernel,
    unary_tensor_opr.h:746-763)."""
    floor2 = 1 << int(np.floor(np.log2(n_heads)))
    m0 = 2.0 ** (-8.0 / floor2)
    m1 = 2.0 ** (-4.0 / floor2)
    slopes = np.empty(n_heads, dtype=np.float32)
    for h in range(n_heads):
        slopes[h] = m0 ** (h + 1) if h < floor2 else m1 ** (2 * (h - floor2) + 1)
    return slopes


def alibi_bias(n_heads: int, key_positions) -> jnp.ndarray:
    """Additive attention bias: slope[h] * key_position.

    The reference adds `col * m_k` to the KQ score matrix where col is the
    key index within the context (unary_tensor_opr.h:757-761).
    Returns (n_heads, len(key_positions))."""
    slopes = jnp.asarray(alibi_slopes(n_heads))
    return slopes[:, None] * key_positions.astype(jnp.float32)[None, :]


def sinusoidal_embedding(positions, dims: int, *, scheme: int = 2,
                         order: int = 2):
    """Additive sinusoidal position embedding table rows.

    scheme=1: freq = 10000^(-i / (dims/2 - 1))  (Sinusoidal1, :566-616)
    scheme=2: freq = 10000^(-2*i / dims)        (Sinusoidal2, :618-661)
    order=1 (std): sin at even columns, cos at odd (interleaved)
    order=2: sin in first half, cos in second half
    Returns (T, dims) float32 to add to the embedding rows.
    """
    pos = positions.astype(jnp.float32)[:, None]
    half = dims // 2
    i = jnp.arange(half, dtype=jnp.float32)
    if scheme == 1:
        inv_freq = 10000.0 ** (-i / (half - 1))
    else:
        exp_idx = i * 2.0 if order == 1 else i
        # Sinusoidal2_Std uses col (even col = 2*i); Order2 uses col directly
        inv_freq = 10000.0 ** (-2.0 * exp_idx / dims)
    theta = pos * inv_freq  # (T, half)
    sin, cos = jnp.sin(theta), jnp.cos(theta)
    if order == 1:
        emb = jnp.stack([sin, cos], axis=-1).reshape(pos.shape[0], dims)
    else:
        emb = jnp.concatenate([sin, cos], axis=-1)
    return emb
