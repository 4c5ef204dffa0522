"""Host-RAM KV-cache offload.

reference: `host_kv_cache_percent` splits KV-cache layers between device
and host RAM (src/transformer/kv_cache.cc:278-319 KVCache::Init layer
split; CpuLayerKVCache D2H/H2D copies :15-91).  TPU design: the first
`host_layers` decoder layers keep K/V in host numpy arrays; each engine
step runs those layers one-by-one (per-layer jitted program, context K/V
uploaded, new rows fetched back), then the remaining layers run in the
usual jitted scan with the on-device cache.

This trades step latency for HBM footprint exactly like the reference
trades VRAM — it is the capacity escape hatch for big-model/small-chip
configs (docs/34b40b_models_on_24gb_vram.md).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.spec import ModelSpec


@dataclasses.dataclass
class HostKVStore:
    """K/V for layers [0, h) in host RAM: (h, B, S, H, D) fp16."""

    k: np.ndarray
    v: np.ndarray

    @classmethod
    def create(cls, layers: int, batch: int, max_len: int, kv_heads: int,
               head_dim: int):
        shape = (layers, batch, max_len, kv_heads, head_dim)
        return cls(np.zeros(shape, np.float16), np.zeros(shape, np.float16))

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def append(self, layer: int, k_new: np.ndarray, v_new: np.ndarray,
               starts: np.ndarray, active: np.ndarray) -> None:
        """Write (B, T, H, D) rows at per-slot starts (host side)."""
        b, t = k_new.shape[:2]
        for i in range(b):
            if not active[i]:
                continue
            s = int(starts[i])
            e = min(s + t, self.max_len)
            self.k[layer, i, s:e] = k_new[i, : e - s]
            self.v[layer, i, s:e] = v_new[i, : e - s]


def host_layer_split(spec: ModelSpec, n_layers: int) -> int:
    """Number of leading layers whose KV lives in host RAM
    (kv_cache.cc:278-319: percent of layers, rounded)."""
    pct = max(0, min(100, spec.host_kv_cache_percent))
    return (n_layers * pct + 99) // 100 if pct else 0


def make_host_layer_fn(spec: ModelSpec, use_pallas: bool = True):
    """One decoder layer with externally-supplied KV context.

    Returns a jittable fn(layer_params, x, k_ctx, v_ctx, positions, start)
    -> (x_out, k_new, v_new); k_ctx/v_ctx are the (B, S, H, D) history
    uploaded from host (rows beyond start+T are masked in attention).
    k_new/v_new are the (B, T, H, D) rows this step appended, for the host
    store."""
    from ..models.decoder import decoder_layer

    def fn(lp, x, k_ctx, v_ctx, positions, start):
        from ..runtime.kv_cache import kv_pack_for
        t = x.shape[1]
        b, s, h, d = k_ctx.shape
        pf = kv_pack_for(d)
        # layer-cache storage is packed (B, H, S/pf, D*pf)
        lc = {"k": k_ctx.transpose(0, 2, 1, 3).reshape(b, h, s // pf,
                                                       d * pf),
              "v": v_ctx.transpose(0, 2, 1, 3).reshape(b, h, s // pf,
                                                       d * pf),
              "start": start, "head_dim": d}
        x, lc = decoder_layer(spec, lp, x, positions, lc,
                              use_pallas=use_pallas)

        def rows(buf, st):
            # buf: packed (H, S/pf, D*pf) for one slot -> the (T, H, D)
            # rows just written
            logical = buf.reshape(h, s, d)
            sl = jax.lax.dynamic_slice(logical, (0, st, 0), (h, t, d))
            return sl.transpose(1, 0, 2)

        k_new = jax.vmap(rows)(lc["k"], start)
        v_new = jax.vmap(rows)(lc["v"], start)
        return x, k_new, v_new

    return fn
