"""KV cache: static-shape per-slot cache with optional 8-bit quantization.

TPU-native redesign of the reference's per-query per-layer KV tensors
(src/transformer/kv_cache.h:80, kv_cache.cc): instead of per-query
cudaMalloc'd buffers, one donated (L, B, H, S, D) array per K/V with
per-slot valid lengths, so the decode step is a single jitted program over
all slots.  Optional Q8 storage mirrors GpuLayerKVCache's quantize-on-set /
dequantize-on-get (kv_cache.cc:104-249) using the symmetric Q8_B32T2 codec.

Storage layout is (L, B, H, S, D) — heads OUTSIDE the sequence axis — so
the fused decode-attention kernel (kernels/attention.py) streams clean
(seq_block, head_dim) tiles per head with the layer index prefetched; the
XLA helpers below transpose to the (B, S, H, D) convention at the API
boundary, so model code never sees the storage order.
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


def kv_pack_for(head_dim: int) -> int:
    """Sequence pack factor for narrow heads: D < 128 packs pf = 128/D
    consecutive sequence rows into one 128-lane storage row so the fused
    decode kernel can DMA full-lane tiles (a (ts, 64) HBM slice is not
    DMA-able).  The K/V code arrays stay logically (.., S, D) — the packed
    view is a free reshape — but the quant SCALES are stored pre-packed:
    (L, B, H, pf*C, S/pf) with row par*C + c holding block c of sequence
    positions with t % pf == par."""
    if head_dim < 128 and 128 % head_dim == 0:
        return 128 // head_dim
    return 1


def _pack_scales(new: jax.Array, pf: int) -> jax.Array:
    """(B, H, T, C) per-row scales -> packed (B, H, pf*C, T/pf).
    Requires T % pf == 0 (callers pad)."""
    b, h, t, c = new.shape
    x = new.reshape(b, h, t // pf, pf, c)
    return x.transpose(0, 1, 3, 4, 2).reshape(b, h, pf * c, t // pf)


def _unpack_scales(phys: jax.Array, pf: int) -> jax.Array:
    """packed (B, H, pf*C, S/pf) -> (B, H, S, C)."""
    b, h, r, s2 = phys.shape
    c = r // pf
    x = phys.reshape(b, h, pf, c, s2)
    return x.transpose(0, 1, 4, 2, 3).reshape(b, h, s2 * pf, c)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    """k/v: (L, B, H, S, D) bf16, or int8 codes + (L, B, H, S, D/32) f16
    scales."""

    k: jax.Array
    v: jax.Array
    # scales are stored TRANSPOSED, (L, B, H, D/blk, S): the fused decode
    # kernel DMAs a (D/blk, seq_block) tile per step — a (seq_block, D/blk)
    # tile would put 2-8 elements on the lane axis, which Mosaic cannot
    # slice out of a tiled HBM memref
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
        return self.k.shape[3]

    @classmethod
    def create(cls, layers: int, batch: int, max_len: int, kv_heads: int,
               head_dim: int, dtype=jnp.bfloat16, quantized: bool = False):
        shape = (layers, batch, kv_heads, max_len, head_dim)
        if quantized:
            blk = kv_block_for(head_dim)
            pf = kv_pack_for(head_dim)
            if max_len % pf:
                raise ValueError(f"max_len {max_len} must divide by the "
                                 f"seq pack factor {pf} for D={head_dim}")
            k = jnp.zeros(shape, dtype=jnp.int8)
            v = jnp.zeros(shape, dtype=jnp.int8)
            sshape = (layers, batch, kv_heads, pf * (head_dim // blk),
                      max_len // pf)
            ks = jnp.zeros(sshape, dtype=jnp.float16)
            vs = jnp.zeros(sshape, dtype=jnp.float16)
            return cls(k, v, ks, vs, jnp.zeros((batch,), jnp.int32))
        k = jnp.zeros(shape, dtype=dtype)
        v = jnp.zeros(shape, dtype=dtype)
        return cls(k, v, None, None, jnp.zeros((batch,), jnp.int32))

    def update_layer(self, layer, k_new: jax.Array, v_new: jax.Array,
                     start: jax.Array) -> "KVCache":
        """Write (B, T, H, D) new K/V rows at per-slot offsets start (B,).
        `layer` may be a traced scalar (dynamic_update_slice handles it)."""

        d = self.k.shape[-1]
        blk = kv_block_for(d)
        pf = kv_pack_for(d)
        k_t = k_new.transpose(0, 2, 1, 3)  # (B, H, T, D)
        v_t = v_new.transpose(0, 2, 1, 3)

        def write(cache_all, new, scale_all):
            if self.quantized:
                codes, scales = quantize_q8_sym(new, blk)
                cache_all = _scatter_layer_rows(cache_all, codes, layer,
                                                start)
                scale_all = _scatter_scale_layer(scale_all, scales, layer,
                                                 start, pf)
                return cache_all, scale_all
            return _scatter_layer_rows(
                cache_all, new.astype(cache_all.dtype), layer, start), None

        k, ks = write(self.k, k_t, self.k_scale)
        v, vs = write(self.v, v_t, self.v_scale)
        return KVCache(k, v, ks, vs, self.length)

    def update_layer_slot(self, layer, slot, k_new: jax.Array,
                          v_new: jax.Array, start) -> "KVCache":
        """Write (1, T, H, D) rows for ONE slot at seq offset `start`
        (chunked prefill: layer/slot/start may all be traced scalars).
        For quantized caches with narrow heads, start must be a multiple
        of the pack factor (chunk sizes are)."""
        d = self.k.shape[-1]
        blk = kv_block_for(d)
        pf = kv_pack_for(d)
        k_t = k_new.transpose(0, 2, 1, 3)  # (1, H, T, D)
        v_t = v_new.transpose(0, 2, 1, 3)

        def write(cache_all, new, scale_all):
            if self.quantized:
                codes, scales = quantize_q8_sym(new, blk)
                cache_all = jax.lax.dynamic_update_slice(
                    cache_all, codes[None].astype(cache_all.dtype),
                    (layer, slot, 0, start, 0))
                t = scales.shape[2]
                pad = (-t) % pf
                if pad:
                    scales = jnp.pad(scales,
                                     ((0, 0), (0, 0), (0, pad), (0, 0)))
                packed = _pack_scales(scales, pf)  # (1, H, pf*C, T/pf)
                scale_all = jax.lax.dynamic_update_slice(
                    scale_all, packed[None].astype(scale_all.dtype),
                    (layer, slot, 0, 0, start // pf))
                return cache_all, scale_all
            cache_all = jax.lax.dynamic_update_slice(
                cache_all, new[None].astype(cache_all.dtype),
                (layer, slot, 0, start, 0))
            return cache_all, None

        k, ks = write(self.k, k_t, self.k_scale)
        v, vs = write(self.v, v_t, self.v_scale)
        return KVCache(k, v, ks, vs, self.length)

    def read_layer(self, layer: int, dtype=jnp.bfloat16):
        """Full (B, S, H, D) K/V for a layer, dequantized if needed."""
        if self.quantized:
            d = self.k.shape[-1]
            blk = kv_block_for(d)
            pf = kv_pack_for(d)
            ks = _unpack_scales(self.k_scale[layer], pf)  # (B,H,S,C)
            vs = _unpack_scales(self.v_scale[layer], pf)
            k = dequantize_q8_sym(self.k[layer], ks, blk, dtype)
            v = dequantize_q8_sym(self.v[layer], vs, blk, dtype)
        else:
            k = self.k[layer].astype(dtype)
            v = self.v[layer].astype(dtype)
        return k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)

    def with_length(self, length: jax.Array) -> "KVCache":
        return KVCache(self.k, self.v, self.k_scale, self.v_scale, length)


def _scatter_layer_rows(cache: jax.Array, new: jax.Array, layer,
                        start: jax.Array):
    """cache: (L, B, H, S, ...); new: (B, H, T, ...); start: (B,) ->
    per-slot dynamic_update_slice along the sequence axis of one layer.

    Written as a static python loop over slots: vmapping over the cache's
    slot axis (axis 1) makes XLA physically TRANSPOSE the whole cache to
    batch-major and back on every call — ~2 full-cache copies per layer
    per step (measured: the dominant decode cost at long contexts)."""
    for b in range(new.shape[0]):
        upd = new[b][None, None].astype(cache.dtype)  # (1, 1, H, T, ...)
        idx = (layer, b, 0, start[b]) + (0,) * (cache.ndim - 4)
        cache = jax.lax.dynamic_update_slice(cache, upd, idx)
    return cache


def _scatter_scale_layer(scale_all: jax.Array, new: jax.Array, layer,
                         start: jax.Array, pf: int):
    """scale_all: (L, B, H, pf*C, S/pf) packed; new: (B, H, T, C) per-row
    scales at per-slot seq offsets start (B,).

    T == 1 (decode): the row lands at packed row (start%pf)*C + c, column
    start//pf.  T > 1 (prefill/encoder one-shot): requires start % pf == 0
    (always true — those appends start at 0); T is zero-padded to a pf
    multiple (the padded columns cover positions beyond the valid length).
    """
    b, h, t, c = new.shape
    if t == 1:
        for bb in range(b):
            upd = new[bb].transpose(0, 2, 1)[None, None]  # (1,1,H,C,1)
            idx = (layer, bb, 0, (start[bb] % pf) * c, start[bb] // pf)
            scale_all = jax.lax.dynamic_update_slice(
                scale_all, upd.astype(scale_all.dtype), idx)
        return scale_all
    pad = (-t) % pf
    if pad:
        new = jnp.pad(new, ((0, 0), (0, 0), (0, pad), (0, 0)))
    packed = _pack_scales(new, pf)  # (B, H, pf*C, T/pf)
    for bb in range(b):
        idx = (layer, bb, 0, 0, start[bb] // pf)
        scale_all = jax.lax.dynamic_update_slice(
            scale_all, packed[bb][None, None].astype(scale_all.dtype), idx)
    return scale_all


def _scatter_rows(cache: jax.Array, new: jax.Array, start: jax.Array):
    """cache: (B, S, ...); new: (B, T, ...); start: (B,) -> per-slot
    dynamic_update_slice along the sequence axis."""

    def one(c, n, s):
        idx = (s,) + (0,) * (c.ndim - 1)
        return jax.lax.dynamic_update_slice(c, n, idx)

    return jax.vmap(one)(cache, new, start)


def layer_cache_slice(cache: KVCache, layer: int) -> dict:
    """Per-layer cache view used by the decoder layer functions.
    Slices carry the storage layout (B, H, S, D); the read/update helpers
    below convert to/from the model's (B, T, H, D) convention."""
    lc = {"k": cache.k[layer], "v": cache.v[layer], "start": cache.length}
    if cache.quantized:
        lc["k_scale"] = cache.k_scale[layer]
        lc["v_scale"] = cache.v_scale[layer]
    return lc


def layer_cache_fused(cache: KVCache, layer) -> dict:
    """Layer 'view' for the fused decode path: the FULL stacked cache plus
    a layer index — no per-layer slice is ever materialized (the Pallas
    kernel indexes HBM directly via scalar prefetch)."""
    return {"cache": cache, "layer": layer, "start": cache.length}


def store_layer_cache(cache: KVCache, layer: int, lc: dict) -> KVCache:
    if "cache" in lc:  # fused path: already the full cache
        return lc["cache"]
    k = cache.k.at[layer].set(lc["k"])
    v = cache.v.at[layer].set(lc["v"])
    ks = cache.k_scale.at[layer].set(lc["k_scale"]) if cache.quantized else None
    vs = cache.v_scale.at[layer].set(lc["v_scale"]) if cache.quantized else None
    return KVCache(k, v, ks, vs, cache.length)


def update_layer_cache(lc: dict, k_new: jax.Array, v_new: jax.Array) -> dict:
    """Append (B, T, H, D) rows at lc['start']; quantizes if storage is
    int8.  For fused views, delegates to KVCache.update_layer."""
    if "cache" in lc:
        cache = lc["cache"].update_layer(lc["layer"], k_new, v_new,
                                         lc["start"])
        return dict(lc, cache=cache)
    quantized = "k_scale" in lc
    start = lc["start"]
    out = dict(lc)
    kt = k_new.transpose(0, 2, 1, 3)  # (B, H, T, D)
    vt = v_new.transpose(0, 2, 1, 3)

    def scat(cache, new):
        def one(c, n, s):
            idx = (0, s) + (0,) * (c.ndim - 2)
            return jax.lax.dynamic_update_slice(c, n.astype(c.dtype), idx)
        return jax.vmap(one)(cache, new, start)

    if quantized:
        d = k_new.shape[-1]
        blk = kv_block_for(d)
        pf = kv_pack_for(d)
        kc, ks = quantize_q8_sym(kt, blk)
        vc, vs = quantize_q8_sym(vt, blk)
        out["k"] = scat(lc["k"], kc)
        out["v"] = scat(lc["v"], vc)
        # add a leading length-1 layer axis to reuse the packed scatter
        out["k_scale"] = _scatter_scale_layer(lc["k_scale"][None], ks, 0,
                                              start, pf)[0]
        out["v_scale"] = _scatter_scale_layer(lc["v_scale"][None], vs, 0,
                                              start, pf)[0]
    else:
        out["k"] = scat(lc["k"], kt)
        out["v"] = scat(lc["v"], vt)
    return out


def read_layer_cache(lc: dict, dtype=jnp.bfloat16):
    """Full (B, S, H, D) K/V from a layer view (XLA attention path)."""
    if "cache" in lc:
        return lc["cache"].read_layer(lc["layer"], dtype)
    if "k_scale" in lc:
        d = lc["k"].shape[-1]
        blk = kv_block_for(d)
        pf = kv_pack_for(d)
        k = dequantize_q8_sym(lc["k"], _unpack_scales(lc["k_scale"], pf),
                              blk, dtype)
        v = dequantize_q8_sym(lc["v"], _unpack_scales(lc["v_scale"], pf),
                              blk, dtype)
    else:
        k = lc["k"].astype(dtype)
        v = lc["v"].astype(dtype)
    return k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
