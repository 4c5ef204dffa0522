"""KV cache: static-shape per-slot cache with optional 8-bit quantization.

TPU-native redesign of the reference's per-query per-layer KV tensors
(src/transformer/kv_cache.h:80, kv_cache.cc): instead of per-query
cudaMalloc'd buffers, one donated cache array per K/V with per-slot valid
lengths, so the decode step is a single jitted program over all slots.
Optional Q8 storage mirrors GpuLayerKVCache's quantize-on-set /
dequantize-on-get (kv_cache.cc:104-249) using the symmetric Q8_B32T2 codec.

Physical storage (both K/V codes and scales) is SEQUENCE-PACKED with heads
outside the sequence axis:

    k/v:     (L, B, H, S/pf, D*pf)   pf = 128/D for D < 128, else 1
    scales:  (L, B, H, pf*C, S/pf)   C = D/blk, row par*C + c = block c of
                                     positions with t % pf == par

Two reasons, both load-bearing:
  - the fused attention kernels (kernels/attention.py) DMA (seq_block,
    128) tiles directly from HBM — a (ts, 64) slice of a tiled memref is
    not DMA-able;
  - a 128-lane minor dim keeps XLA on the default row-major layout.  With
    D=64 minor, XLA layout-assigns the int8 cache S-minor for lane
    utilization while the Pallas custom calls demand row-major — four
    full-cache layout-conversion copies per LAYER per step (measured:
    +8.5 ms/step at ctx 4096 on a 22-layer model).

The helpers below expose the model-facing (B, S, H, D) / (B, T, H, D)
conventions, so model code never sees the packed order.
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
    """Sequence pack factor: D < 128 packs pf = 128/D consecutive sequence
    rows into one 128-lane storage row."""
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


def _pack_rows(new: jax.Array, pf: int) -> jax.Array:
    """(B, H, T, D) rows -> packed (B, H, T/pf, D*pf) (free reshape;
    requires T % pf == 0)."""
    b, h, t, d = new.shape
    return new.reshape(b, h, t // pf, d * pf)


def _rmw_rows(arr: jax.Array, new: jax.Array, start, pf: int, d: int):
    """General packed write: arr (H, S/pf, D*pf); new (H, T, D) logical
    rows at traced seq offset `start` (ANY alignment).  Reads the covering
    packed region, overlays in logical space, writes back."""
    h, t, _ = new.shape
    s2 = arr.shape[1]
    nrows = min((t + 2 * pf - 2) // pf + 1, s2)
    r0 = jnp.minimum(start // pf, s2 - nrows)
    region = jax.lax.dynamic_slice(arr, (0, r0, 0),
                                   (h, nrows, arr.shape[2]))
    logical = region.reshape(h, nrows * pf, d)
    logical = jax.lax.dynamic_update_slice(
        logical, new.astype(logical.dtype), (0, start - r0 * pf, 0))
    return jax.lax.dynamic_update_slice(
        arr, logical.reshape(h, nrows, arr.shape[2]), (0, r0, 0))


def _rmw_scales(arr: jax.Array, new: jax.Array, start, pf: int):
    """General packed scale write: arr (H, pf*C, S/pf); new (H, T, C)
    per-row scales at traced offset `start` (any alignment)."""
    h, t, c = new.shape
    s2 = arr.shape[2]
    nrows = min((t + 2 * pf - 2) // pf + 1, s2)
    r0 = jnp.minimum(start // pf, s2 - nrows)
    region = jax.lax.dynamic_slice(arr, (0, 0, r0), (h, pf * c, nrows))
    # (H, pf*C, R) -> logical (H, R*pf, C)
    logical = region.reshape(h, pf, c, nrows).transpose(0, 3, 1, 2)
    logical = logical.reshape(h, nrows * pf, c)
    logical = jax.lax.dynamic_update_slice(
        logical, new.astype(logical.dtype), (0, start - r0 * pf, 0))
    region2 = logical.reshape(h, nrows, pf, c).transpose(0, 2, 3, 1)
    return jax.lax.dynamic_update_slice(
        arr, region2.reshape(h, pf * c, nrows), (0, 0, r0))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    """See module docstring for the physical layouts."""

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array]
    v_scale: Optional[jax.Array]
    length: jax.Array  # (B,) valid rows per slot
    head_dim: int = 0  # logical D (static aux: packed shape is ambiguous)

    def tree_flatten(self):
        return ((self.k, self.v, self.k_scale, self.v_scale, self.length),
                self.head_dim)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, head_dim=aux)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def pf(self) -> int:
        return kv_pack_for(self.head_dim)

    @property
    def max_len(self) -> int:
        return self.k.shape[3] * self.pf

    def _logical_k(self, arr, layer):
        """One layer's packed (B, H, S/pf, D*pf) -> logical (B, H, S, D)."""
        b, h, s2, dp = arr.shape[-4:]
        return arr[layer].reshape(b, h, s2 * self.pf, self.head_dim)

    @classmethod
    def create(cls, layers: int, batch: int, max_len: int, kv_heads: int,
               head_dim: int, dtype=jnp.bfloat16, quantized: bool = False):
        pf = kv_pack_for(head_dim)
        if max_len % pf:
            raise ValueError(f"max_len {max_len} must divide by the "
                             f"seq pack factor {pf} for D={head_dim}")
        shape = (layers, batch, kv_heads, max_len // pf, head_dim * pf)
        length = jnp.zeros((batch,), jnp.int32)
        if quantized:
            blk = kv_block_for(head_dim)
            k = jnp.zeros(shape, dtype=jnp.int8)
            v = jnp.zeros(shape, dtype=jnp.int8)
            sshape = (layers, batch, kv_heads, pf * (head_dim // blk),
                      max_len // pf)
            ks = jnp.zeros(sshape, dtype=jnp.float16)
            vs = jnp.zeros(sshape, dtype=jnp.float16)
            return cls(k, v, ks, vs, length, head_dim=head_dim)
        k = jnp.zeros(shape, dtype=dtype)
        v = jnp.zeros(shape, dtype=dtype)
        return cls(k, v, None, None, length, head_dim=head_dim)

    def update_layer(self, layer, k_new: jax.Array, v_new: jax.Array,
                     start: jax.Array) -> "KVCache":
        """Write (B, T, H, D) new K/V rows at per-slot offsets start (B,).
        `layer` may be a traced scalar."""
        d = self.head_dim
        blk = kv_block_for(d)
        pf = self.pf
        k_t = k_new.transpose(0, 2, 1, 3)  # (B, H, T, D)
        v_t = v_new.transpose(0, 2, 1, 3)

        def write(cache_all, new, scale_all):
            if self.quantized:
                codes, scales = quantize_q8_sym(new, blk)
                cache_all = _scatter_layer_rows(cache_all, codes, layer,
                                                start, pf, d)
                scale_all = _scatter_scale_layer(scale_all, scales, layer,
                                                 start, pf)
                return cache_all, scale_all
            return _scatter_layer_rows(
                cache_all, new.astype(cache_all.dtype), layer, start, pf,
                d), None

        k, ks = write(self.k, k_t, self.k_scale)
        v, vs = write(self.v, v_t, self.v_scale)
        return KVCache(k, v, ks, vs, self.length, head_dim=d)

    def update_layer_slot(self, layer, slot, k_new: jax.Array,
                          v_new: jax.Array, start) -> "KVCache":
        """Write (1, T, H, D) rows for ONE slot at seq offset `start`
        (chunked prefill; layer/slot/start may be traced).  start must be
        a multiple of the pack factor (chunk sizes are)."""
        d = self.head_dim
        blk = kv_block_for(d)
        pf = self.pf
        k_t = k_new.transpose(0, 2, 1, 3)  # (1, H, T, D)
        v_t = v_new.transpose(0, 2, 1, 3)

        def write(cache_all, new, scale_all):
            t = new.shape[2]
            pad = (-t) % pf
            if self.quantized:
                codes, scales = quantize_q8_sym(new, blk)
                if pad:
                    codes = jnp.pad(codes, ((0, 0), (0, 0), (0, pad),
                                            (0, 0)))
                    scales = jnp.pad(scales, ((0, 0), (0, 0), (0, pad),
                                              (0, 0)))
                cache_all = jax.lax.dynamic_update_slice(
                    cache_all, _pack_rows(codes, pf)[None].astype(
                        cache_all.dtype),
                    (layer, slot, 0, start // pf, 0))
                packed = _pack_scales(scales, pf)
                scale_all = jax.lax.dynamic_update_slice(
                    scale_all, packed[None].astype(scale_all.dtype),
                    (layer, slot, 0, 0, start // pf))
                return cache_all, scale_all
            if pad:
                new = jnp.pad(new, ((0, 0), (0, 0), (0, pad), (0, 0)))
            cache_all = jax.lax.dynamic_update_slice(
                cache_all, _pack_rows(new, pf)[None].astype(
                    cache_all.dtype),
                (layer, slot, 0, start // pf, 0))
            return cache_all, None

        k, ks = write(self.k, k_t, self.k_scale)
        v, vs = write(self.v, v_t, self.v_scale)
        return KVCache(k, v, ks, vs, self.length, head_dim=d)

    def read_layer(self, layer: int, dtype=jnp.bfloat16):
        """Full (B, S, H, D) K/V for a layer, dequantized if needed."""
        d = self.head_dim
        if self.quantized:
            blk = kv_block_for(d)
            pf = self.pf
            ks = _unpack_scales(self.k_scale[layer], pf)  # (B,H,S,C)
            vs = _unpack_scales(self.v_scale[layer], pf)
            k = dequantize_q8_sym(self._logical_k(self.k, layer), ks, blk,
                                  dtype)
            v = dequantize_q8_sym(self._logical_k(self.v, layer), vs, blk,
                                  dtype)
        else:
            k = self._logical_k(self.k, layer).astype(dtype)
            v = self._logical_k(self.v, layer).astype(dtype)
        return k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)

    def with_length(self, length: jax.Array) -> "KVCache":
        return KVCache(self.k, self.v, self.k_scale, self.v_scale, length,
                       head_dim=self.head_dim)


def _scatter_layer_rows(cache: jax.Array, new: jax.Array, layer,
                        start: jax.Array, pf: int, d: int):
    """cache: packed (L, B, H, S/pf, D*pf); new: (B, H, T, D); start: (B,)
    -> per-slot writes at packed row start//pf, lane (start%pf)*D.

    Static python loop over slots: vmapping over the cache's slot axis
    makes XLA physically transpose the whole cache per call."""
    b, h, t, _ = new.shape
    for bb in range(b):
        if t == 1:
            idx = (layer, bb, 0, start[bb] // pf,
                   (start[bb] % pf) * d)
            cache = jax.lax.dynamic_update_slice(
                cache, new[bb][None, None].astype(cache.dtype), idx)
        elif pf == 1:
            idx = (layer, bb, 0, start[bb], 0)
            cache = jax.lax.dynamic_update_slice(
                cache, new[bb][None, None].astype(cache.dtype), idx)
        else:
            # arbitrary-alignment packed write (e.g. speculative chunks):
            # read-modify-write only the covering packed region
            s2, dp = cache.shape[3], cache.shape[4]
            nrows = min((t + 2 * pf - 2) // pf + 1, s2)
            r0 = jnp.minimum(start[bb] // pf, s2 - nrows)
            region = jax.lax.dynamic_slice(
                cache, (layer, bb, 0, r0, 0), (1, 1, h, nrows, dp))[0, 0]
            logical = region.reshape(h, nrows * pf, d)
            logical = jax.lax.dynamic_update_slice(
                logical, new[bb].astype(logical.dtype),
                (0, start[bb] - r0 * pf, 0))
            cache = jax.lax.dynamic_update_slice(
                cache, logical.reshape(h, nrows, dp)[None, None].astype(
                    cache.dtype), (layer, bb, 0, r0, 0))
    return cache


def _scatter_scale_layer(scale_all: jax.Array, new: jax.Array, layer,
                         start: jax.Array, pf: int):
    """scale_all: (L, B, H, pf*C, S/pf) packed; new: (B, H, T, C) per-row
    scales at per-slot seq offsets start (B,).

    T == 1 (decode): the row lands at packed row (start%pf)*C + c, column
    start//pf.  T > 1 (prefill/encoder one-shot): requires start % pf == 0
    (those appends start at 0); T is zero-padded to a pf multiple."""
    b, h, t, c = new.shape
    if t == 1:
        for bb in range(b):
            upd = new[bb].transpose(0, 2, 1)[None, None]  # (1,1,H,C,1)
            idx = (layer, bb, 0, (start[bb] % pf) * c, start[bb] // pf)
            scale_all = jax.lax.dynamic_update_slice(
                scale_all, upd.astype(scale_all.dtype), idx)
        return scale_all
    if pf == 1:
        packed = _pack_scales(new, pf)  # (B, H, C, T)
        for bb in range(b):
            idx = (layer, bb, 0, 0, start[bb])
            scale_all = jax.lax.dynamic_update_slice(
                scale_all, packed[bb][None, None].astype(scale_all.dtype),
                idx)
        return scale_all
    s2 = scale_all.shape[4]
    nrows = min((t + 2 * pf - 2) // pf + 1, s2)
    for bb in range(b):
        r0 = jnp.minimum(start[bb] // pf, s2 - nrows)
        region = jax.lax.dynamic_slice(
            scale_all, (layer, bb, 0, 0, r0),
            (1, 1, h, pf * c, nrows))[0, 0]
        logical = region.reshape(h, pf, c, nrows).transpose(0, 3, 1, 2)
        logical = logical.reshape(h, nrows * pf, c)
        logical = jax.lax.dynamic_update_slice(
            logical, new[bb].astype(logical.dtype),
            (0, start[bb] - r0 * pf, 0))
        region2 = logical.reshape(h, nrows, pf, c).transpose(0, 2, 3, 1)
        scale_all = jax.lax.dynamic_update_slice(
            scale_all, region2.reshape(h, pf * c, nrows)[None, None].astype(
                scale_all.dtype), (layer, bb, 0, 0, r0))
    return scale_all


def append_rows_all_layers(cache: KVCache, k_new: jax.Array,
                           v_new: jax.Array, start: jax.Array) -> KVCache:
    """Append ONE decode row per slot for ALL layers at once.

    k_new/v_new: (L, B, H, D) (the fused whole-model decode kernel's
    per-layer K/V outputs, kernels/decode_step.py); start: (B,) per-slot
    seq offsets.  Replaces L per-layer dynamic_update_slice chains with
    four whole-cache scatters after the single fused kernel call."""
    l, b, h, d = k_new.shape
    pf = cache.pf
    blk = kv_block_for(d)

    def scat_codes(cache_all, codes):
        # cache_all (L, B, H, S/pf, D*pf); codes (L, B, H, D) int8
        def one(c, n, s):
            # c (L, H, S/pf, D*pf); n (L, H, D)
            return jax.lax.dynamic_update_slice(
                c, n[:, :, None, :].astype(c.dtype),
                (0, 0, s // pf, (s % pf) * d))
        return jax.vmap(one, in_axes=(1, 1, 0), out_axes=1)(
            cache_all, codes, start)

    def scat_scales(scale_all, sc):
        # scale_all (L, B, H, pf*C, S/pf); sc (L, B, H, C)
        c = sc.shape[-1]

        def one(a, n, s):
            # a (L, H, pf*C, S/pf); n (L, H, C)
            return jax.lax.dynamic_update_slice(
                a, n[:, :, :, None].astype(a.dtype),
                (0, 0, (s % pf) * c, s // pf))
        return jax.vmap(one, in_axes=(1, 1, 0), out_axes=1)(
            scale_all, sc, start)

    if cache.quantized:
        kc, ks = quantize_q8_sym(k_new, blk)
        vc, vs = quantize_q8_sym(v_new, blk)
        return KVCache(scat_codes(cache.k, kc), scat_codes(cache.v, vc),
                       scat_scales(cache.k_scale, ks),
                       scat_scales(cache.v_scale, vs),
                       cache.length, head_dim=cache.head_dim)
    return KVCache(scat_codes(cache.k, k_new), scat_codes(cache.v, v_new),
                   None, None, cache.length, head_dim=cache.head_dim)


def _scatter_rows(cache: jax.Array, new: jax.Array, start: jax.Array):
    """cache: (B, S, ...); new: (B, T, ...); start: (B,) -> per-slot
    dynamic_update_slice along the sequence axis."""

    def one(c, n, s):
        idx = (s,) + (0,) * (c.ndim - 1)
        return jax.lax.dynamic_update_slice(c, n, idx)

    return jax.vmap(one)(cache, new, start)


def layer_cache_slice(cache: KVCache, layer: int) -> dict:
    """Per-layer cache view used by the decoder layer functions.
    Slices carry the PACKED storage layout; the read/update helpers
    convert to/from the model's (B, T, H, D) convention."""
    lc = {"k": cache.k[layer], "v": cache.v[layer], "start": cache.length,
          "head_dim": cache.head_dim}
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
    return KVCache(k, v, ks, vs, cache.length, head_dim=cache.head_dim)


def update_layer_cache(lc: dict, k_new: jax.Array, v_new: jax.Array) -> dict:
    """Append (B, T, H, D) rows at lc['start']; quantizes if storage is
    int8.  For fused views, delegates to KVCache.update_layer."""
    if "cache" in lc:
        cache = lc["cache"].update_layer(lc["layer"], k_new, v_new,
                                         lc["start"])
        return dict(lc, cache=cache)
    quantized = "k_scale" in lc
    start = lc["start"]
    d = lc["head_dim"]
    pf = kv_pack_for(d)
    out = dict(lc)
    kt = k_new.transpose(0, 2, 1, 3)  # (B, H, T, D)
    vt = v_new.transpose(0, 2, 1, 3)

    def scat(cache, new):
        # cache packed (B, H, S/pf, D*pf); new (B, H, T, D)
        b, h, t, _ = new.shape
        if t == 1:
            def one(c, n, s):
                return jax.lax.dynamic_update_slice(
                    c, n.astype(c.dtype), (0, s // pf, (s % pf) * d))
            return jax.vmap(one)(cache, new, start)
        if pf == 1:
            def one(c, n, s):
                return jax.lax.dynamic_update_slice(c, n.astype(c.dtype),
                                                    (0, s, 0))
            return jax.vmap(one)(cache, new, start)
        return jax.vmap(lambda c, n, s: _rmw_rows(c, n, s, pf, d))(
            cache, new, start)

    if quantized:
        blk = kv_block_for(d)
        kc, ks = quantize_q8_sym(kt, blk)
        vc, vs = quantize_q8_sym(vt, blk)
        out["k"] = scat(lc["k"], kc)
        out["v"] = scat(lc["v"], vc)
        t = kt.shape[2]
        if t > 1 and pf > 1:
            out["k_scale"] = jax.vmap(
                lambda a, n, s: _rmw_scales(a, n, s, pf))(
                    lc["k_scale"], ks, start)
            out["v_scale"] = jax.vmap(
                lambda a, n, s: _rmw_scales(a, n, s, pf))(
                    lc["v_scale"], vs, start)
        else:
            # add a leading length-1 layer axis to reuse the packed scatter
            out["k_scale"] = _scatter_scale_layer(lc["k_scale"][None], ks,
                                                  0, start, pf)[0]
            out["v_scale"] = _scatter_scale_layer(lc["v_scale"][None], vs,
                                                  0, start, pf)[0]
    else:
        out["k"] = scat(lc["k"], kt)
        out["v"] = scat(lc["v"], vt)
    return out


def read_layer_cache(lc: dict, dtype=jnp.bfloat16):
    """Full (B, S, H, D) K/V from a layer view (XLA attention path)."""
    if "cache" in lc:
        return lc["cache"].read_layer(lc["layer"], dtype)
    d = lc["head_dim"]
    pf = kv_pack_for(d)
    b, h, s2, dp = lc["k"].shape

    def unpack(arr):
        return arr.reshape(b, h, s2 * pf, d)

    if "k_scale" in lc:
        blk = kv_block_for(d)
        k = dequantize_q8_sym(unpack(lc["k"]),
                              _unpack_scales(lc["k_scale"], pf), blk,
                              dtype)
        v = dequantize_q8_sym(unpack(lc["v"]),
                              _unpack_scales(lc["v_scale"], pf), blk,
                              dtype)
    else:
        k = unpack(lc["k"]).astype(dtype)
        v = unpack(lc["v"]).astype(dtype)
    return k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
