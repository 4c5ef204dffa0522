"""KV cache: static-shape per-slot cache with optional 8-bit quantization.

TPU-native redesign of the reference's per-query per-layer KV tensors
(src/transformer/kv_cache.h:80, kv_cache.cc): instead of per-query
cudaMalloc'd buffers, one donated (L, B, S, H, D) array per K/V with
per-slot valid lengths, so the decode step is a single jitted program over
all slots.  Optional Q8 storage mirrors GpuLayerKVCache's quantize-on-set /
dequantize-on-get (kv_cache.cc:104-249) using the symmetric Q8_B32T2 codec.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..quant.codec_jax import quantize_q8_sym, dequantize_q8_sym

KV_BLOCK = 32


def kv_block_for(head_dim: int) -> int:
    """KV quant block: 32 (the reference's Q8_B32T2 capacity) or head_dim
    when heads are narrower than one block."""
    return KV_BLOCK if head_dim % KV_BLOCK == 0 else head_dim


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    """k/v: (L, B, S, H, D) bf16, or int8 codes + (L, B, S, H, D/32) f16 scales."""

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array]
    v_scale: Optional[jax.Array]
    length: jax.Array  # (B,) valid rows per slot

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale, self.length), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @classmethod
    def create(cls, layers: int, batch: int, max_len: int, kv_heads: int,
               head_dim: int, dtype=jnp.bfloat16, quantized: bool = False):
        shape = (layers, batch, max_len, kv_heads, head_dim)
        if quantized:
            blk = kv_block_for(head_dim)
            k = jnp.zeros(shape, dtype=jnp.int8)
            v = jnp.zeros(shape, dtype=jnp.int8)
            sshape = shape[:-1] + (head_dim // blk,)
            ks = jnp.zeros(sshape, dtype=jnp.float16)
            vs = jnp.zeros(sshape, dtype=jnp.float16)
            return cls(k, v, ks, vs, jnp.zeros((batch,), jnp.int32))
        k = jnp.zeros(shape, dtype=dtype)
        v = jnp.zeros(shape, dtype=dtype)
        return cls(k, v, None, None, jnp.zeros((batch,), jnp.int32))

    def update_layer(self, layer: int, k_new: jax.Array, v_new: jax.Array,
                     start: jax.Array) -> "KVCache":
        """Write (B, T, H, D) new K/V rows at per-slot offsets start (B,)."""

        blk = kv_block_for(self.k.shape[-1])

        def write(cache_l, new, scale_l):
            if self.quantized:
                codes, scales = quantize_q8_sym(new, blk)
                cache_l = _scatter_rows(cache_l, codes, start)
                scale_l = _scatter_rows(scale_l, scales, start)
                return cache_l, scale_l
            return _scatter_rows(cache_l, new.astype(cache_l.dtype), start), None

        k_l, ks_l = write(self.k[layer],
                          k_new, self.k_scale[layer] if self.quantized else None)
        v_l, vs_l = write(self.v[layer],
                          v_new, self.v_scale[layer] if self.quantized else None)
        k = self.k.at[layer].set(k_l)
        v = self.v.at[layer].set(v_l)
        ks = self.k_scale.at[layer].set(ks_l) if self.quantized else None
        vs = self.v_scale.at[layer].set(vs_l) if self.quantized else None
        return KVCache(k, v, ks, vs, self.length)

    def read_layer(self, layer: int, dtype=jnp.bfloat16):
        """Full (B, S, H, D) K/V for a layer, dequantized if needed."""
        if self.quantized:
            blk = kv_block_for(self.k.shape[-1])
            k = dequantize_q8_sym(self.k[layer], self.k_scale[layer],
                                  blk, dtype)
            v = dequantize_q8_sym(self.v[layer], self.v_scale[layer],
                                  blk, dtype)
            return k, v
        return self.k[layer].astype(dtype), self.v[layer].astype(dtype)

    def with_length(self, length: jax.Array) -> "KVCache":
        return KVCache(self.k, self.v, self.k_scale, self.v_scale, length)


def _scatter_rows(cache: jax.Array, new: jax.Array, start: jax.Array):
    """cache: (B, S, ...); new: (B, T, ...); start: (B,) -> per-slot
    dynamic_update_slice along the sequence axis."""

    def one(c, n, s):
        idx = (s,) + (0,) * (c.ndim - 1)
        return jax.lax.dynamic_update_slice(c, n, idx)

    return jax.vmap(one)(cache, new, start)


def layer_cache_slice(cache: KVCache, layer: int) -> dict:
    """Per-layer cache view used by the decoder layer functions."""
    lc = {"k": cache.k[layer], "v": cache.v[layer], "start": cache.length}
    if cache.quantized:
        lc["k_scale"] = cache.k_scale[layer]
        lc["v_scale"] = cache.v_scale[layer]
    return lc


def store_layer_cache(cache: KVCache, layer: int, lc: dict) -> KVCache:
    k = cache.k.at[layer].set(lc["k"])
    v = cache.v.at[layer].set(lc["v"])
    ks = cache.k_scale.at[layer].set(lc["k_scale"]) if cache.quantized else None
    vs = cache.v_scale.at[layer].set(lc["v_scale"]) if cache.quantized else None
    return KVCache(k, v, ks, vs, cache.length)


def update_layer_cache(lc: dict, k_new: jax.Array, v_new: jax.Array) -> dict:
    """Append (B, T, H, D) rows at lc['start']; quantizes if storage is int8."""
    quantized = "k_scale" in lc
    start = lc["start"]
    out = dict(lc)
    if quantized:
        blk = kv_block_for(k_new.shape[-1])
        kc, ks = quantize_q8_sym(k_new, blk)
        vc, vs = quantize_q8_sym(v_new, blk)
        out["k"] = _scatter_rows(lc["k"], kc, start)
        out["v"] = _scatter_rows(lc["v"], vc, start)
        out["k_scale"] = _scatter_rows(lc["k_scale"], ks, start)
        out["v_scale"] = _scatter_rows(lc["v_scale"], vs, start)
    else:
        out["k"] = _scatter_rows(lc["k"], k_new.astype(lc["k"].dtype), start)
        out["v"] = _scatter_rows(lc["v"], v_new.astype(lc["v"].dtype), start)
    return out


def read_layer_cache(lc: dict, dtype=jnp.bfloat16):
    if "k_scale" in lc:
        blk = kv_block_for(lc["k"].shape[-1])
        return (dequantize_q8_sym(lc["k"], lc["k_scale"], blk, dtype),
                dequantize_q8_sym(lc["v"], lc["v_scale"], blk, dtype))
    return lc["k"].astype(dtype), lc["v"].astype(dtype)
