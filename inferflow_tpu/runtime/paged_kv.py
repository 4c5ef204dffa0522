"""Paged KV cache: a page pool + per-slot page tables.

The dense KVCache reserves max_context rows per slot; long-context
serving fragments HBM (8 slots x 32k ctx = the whole chip even when most
queries are short).  Here K/V live in a POOL of fixed-size pages and
each slot owns a page-id list, so HBM scales with the TOKENS IN FLIGHT,
not slots x max_context (the reference has no paging — its per-query
rows live in one dense cache, kv_cache.cc; this is the TPU-era design
the serving field converged on, applied to the repo's packed layout).

TPU-first sizing: one page = 128 PACKED rows (PAGE_S2) — exactly one
Mosaic-legal lane tile of the packed scale layout, so the paged decode
kernel (kernels/attention.py paged path) DMAs whole pages with static
full slices and the page table rides scalar prefetch.  Logical tokens
per page = 128 * pf (pf = 128/D packing for narrow heads).

The pool keeps the SAME packed per-layer layout as the dense cache:
  k/v:       (L, P, H, PAGE_S2, D*pf)
  k/v_scale: (L, P, H, pf*(D//blk), PAGE_S2)
One page id covers that page's rows across ALL layers (one allocation
per context chunk, vLLM-style block table).

Allocation policy (v1, engine-side): pages covering prompt_len +
max_new_tokens are reserved at prefill time; a query whose reservation
cannot be satisfied stays PREFILL-pending until pages free up.  This
trades a little pool headroom for never stalling mid-decode.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .kv_cache import (KVCache, kv_block_for, kv_pack_for, _rmw_rows,
                       _rmw_scales, _unpack_scales, dequantize_q8_sym,
                       quantize_q8_sym)

PAGE_S2 = 128  # packed storage rows per page (one lane tile)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PagedKVCache:
    """Drop-in for the decode-side KVCache protocol: update_layer /
    read_layer / length / with_length / quantized / head_dim."""

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array]
    v_scale: Optional[jax.Array]
    page_table: jax.Array  # (B, MAXP) int32 page ids (unassigned = 0)
    length: jax.Array      # (B,) valid rows per slot
    head_dim: int = 0

    def tree_flatten(self):
        return ((self.k, self.v, self.k_scale, self.v_scale,
                 self.page_table, self.length), self.head_dim)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, head_dim=aux)

    # -- protocol properties (mirror KVCache) ---------------------------
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
    def page_tokens(self) -> int:
        return PAGE_S2 * self.pf

    @property
    def num_pages(self) -> int:
        return self.k.shape[1]

    @property
    def max_pages_per_slot(self) -> int:
        return self.page_table.shape[1]

    @property
    def max_len(self) -> int:
        return self.max_pages_per_slot * self.page_tokens

    @classmethod
    def create(cls, layers: int, batch: int, max_len: int, kv_heads: int,
               head_dim: int, pool_tokens: int = 0, quantized: bool = True):
        pf = kv_pack_for(head_dim)
        pt = PAGE_S2 * pf
        maxp = -(-max_len // pt)
        if pool_tokens <= 0:
            pool_tokens = batch * max_len
        p = max(-(-pool_tokens // pt), 1)
        dp = head_dim * pf
        shape = (layers, p, kv_heads, PAGE_S2, dp)
        length = jnp.zeros((batch,), jnp.int32)
        table = jnp.zeros((batch, maxp), jnp.int32)
        if quantized:
            blk = kv_block_for(head_dim)
            sshape = (layers, p, kv_heads, pf * (head_dim // blk), PAGE_S2)
            return cls(jnp.zeros(shape, jnp.int8),
                       jnp.zeros(shape, jnp.int8),
                       jnp.zeros(sshape, jnp.float16),
                       jnp.zeros(sshape, jnp.float16),
                       table, length, head_dim=head_dim)
        return cls(jnp.zeros(shape, jnp.bfloat16),
                   jnp.zeros(shape, jnp.bfloat16), None, None,
                   table, length, head_dim=head_dim)

    def with_length(self, length) -> "PagedKVCache":
        return PagedKVCache(self.k, self.v, self.k_scale, self.v_scale,
                            self.page_table, length,
                            head_dim=self.head_dim)

    def with_page_row(self, slot: int, pids) -> "PagedKVCache":
        row = jnp.zeros((self.max_pages_per_slot,), jnp.int32)
        pids = jnp.asarray(pids, jnp.int32)
        row = jax.lax.dynamic_update_slice(row, pids, (0,))
        return PagedKVCache(self.k, self.v, self.k_scale, self.v_scale,
                            self.page_table.at[slot].set(row), self.length,
                            head_dim=self.head_dim)

    # -- decode append ---------------------------------------------------
    def update_layer(self, layer, k_new: jax.Array, v_new: jax.Array,
                     start: jax.Array) -> "PagedKVCache":
        """Append ONE (B, 1, H, D) row per slot into each slot's current
        page (pages are pre-reserved by the engine, so the page id at
        start // page_tokens is always valid)."""
        b, t, h, d = k_new.shape
        assert t == 1, "paged decode append is one row per step"
        blk = kv_block_for(d)
        pf = self.pf
        pt = self.page_tokens
        page_slot = start // pt
        pid = jnp.take_along_axis(self.page_table, page_slot[:, None],
                                  axis=1)[:, 0]
        off = start % pt
        k_t = k_new.transpose(0, 2, 1, 3)  # (B, H, 1, D)
        v_t = v_new.transpose(0, 2, 1, 3)

        if self.quantized:
            kc, ks = quantize_q8_sym(k_t, blk)
            vc, vs = quantize_q8_sym(v_t, blk)
        else:
            kc, vc, ks, vs = k_t, v_t, None, None

        def write(pool, rows, spool, srows):
            for bi in range(b):
                idx = (layer, pid[bi]) + (0,) * 3
                slab = jax.lax.dynamic_slice(
                    pool, idx, (1, 1) + pool.shape[2:])[0, 0]
                slab = _rmw_rows(slab, rows[bi].astype(slab.dtype),
                                 off[bi], pf, d)
                pool = jax.lax.dynamic_update_slice(
                    pool, slab[None, None], idx)
                if spool is not None:
                    sl = jax.lax.dynamic_slice(
                        spool, idx, (1, 1) + spool.shape[2:])[0, 0]
                    sl = _rmw_scales(sl, srows[bi].astype(sl.dtype),
                                     off[bi], pf)
                    spool = jax.lax.dynamic_update_slice(
                        spool, sl[None, None], idx)
            return pool, spool

        k, ksc = write(self.k, kc, self.k_scale, ks)
        v, vsc = write(self.v, vc, self.v_scale, vs)
        return PagedKVCache(k, v, ksc, vsc, self.page_table, self.length,
                            head_dim=self.head_dim)

    # -- logical read (XLA attention fallback / tests) -------------------
    def read_layer(self, layer, dtype=jnp.bfloat16):
        """(B, S, H, D) logical K/V where S = MAXP * page_tokens; rows of
        unassigned pages are garbage — callers mask by kv_len."""
        b, maxp = self.page_table.shape
        flat = self.page_table.reshape(-1)
        pf = self.pf
        d = self.head_dim

        def gather(pool):
            lp = jax.lax.dynamic_index_in_dim(pool, layer, 0, False)
            pages = jnp.take(lp, flat, axis=0)  # (B*MAXP, H, S2, dp)
            h = pages.shape[1]
            pg = pages.reshape(b, maxp, h, PAGE_S2, -1)
            return pg.transpose(0, 2, 1, 3, 4).reshape(
                b, h, maxp * PAGE_S2, -1)

        k2 = gather(self.k)  # (B, H, S/pf, D*pf)
        v2 = gather(self.v)
        bh = k2.shape[1]
        s = maxp * PAGE_S2 * pf

        def unpack(a):
            return a.reshape(b, bh, s, d)

        if self.quantized:
            def gscale(spool):
                lp = jax.lax.dynamic_index_in_dim(spool, layer, 0, False)
                pages = jnp.take(lp, flat, axis=0)
                pg = pages.reshape(b, maxp, bh, -1, PAGE_S2)
                # page-concat along the packed seq axis -> (B,H,pfC,S/pf)
                return pg.transpose(0, 2, 3, 1, 4).reshape(
                    b, bh, pg.shape[3], maxp * PAGE_S2)
            blk = kv_block_for(d)
            k = dequantize_q8_sym(unpack(k2),
                                  _unpack_scales(gscale(self.k_scale), pf),
                                  blk, dtype)
            v = dequantize_q8_sym(unpack(v2),
                                  _unpack_scales(gscale(self.v_scale), pf),
                                  blk, dtype)
        else:
            k = unpack(k2).astype(dtype)
            v = unpack(v2).astype(dtype)
        return k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)


def append_rows_all_layers_paged(pc: PagedKVCache, k_new: jax.Array,
                                 v_new: jax.Array,
                                 start: jax.Array) -> PagedKVCache:
    """Paged analog of kv_cache.append_rows_all_layers: append ONE decode
    row per slot for ALL layers after the fused whole-model kernel.

    k_new/v_new: (L, B, H, D); start: (B,) per-slot lengths.  Each slot's
    row lands in pool page page_table[b, start // page_tokens] (reserved
    by the engine at prefill; inactive slots write the page-0 sentinel,
    whose rows nothing ever reads).
    """
    l, b, h, d = k_new.shape
    pf = pc.pf
    blk = kv_block_for(d)
    pt_tok = pc.page_tokens
    pid = jnp.take_along_axis(pc.page_table, (start // pt_tok)[:, None],
                              axis=1)[:, 0]
    off = start % pt_tok
    row = off // pf   # packed row within the page
    sub = off % pf    # packed sub-position within the row

    if pc.quantized:
        kc, ks = quantize_q8_sym(k_new, blk)   # (L,B,H,D) i8, (L,B,H,C)
        vc, vs = quantize_q8_sym(v_new, blk)
    else:
        kc, vc, ks, vs = k_new, v_new, None, None

    def scat_codes(pool, codes):
        # pool (L, P, H, PAGE_S2, dp); codes (L, B, H, D)
        for bi in range(b):
            pool = jax.lax.dynamic_update_slice(
                pool, codes[:, bi][:, None, :, None, :].astype(pool.dtype),
                (0, pid[bi], 0, row[bi], sub[bi] * d))
        return pool

    def scat_scales(spool, sc):
        # spool (L, P, H, pf*C, PAGE_S2); sc (L, B, H, C)
        c = sc.shape[-1]
        for bi in range(b):
            spool = jax.lax.dynamic_update_slice(
                spool, sc[:, bi][:, None, :, :, None].astype(spool.dtype),
                (0, pid[bi], 0, sub[bi] * c, row[bi]))
        return spool

    k = scat_codes(pc.k, kc)
    v = scat_codes(pc.v, vc)
    ksc = vsc = None
    if pc.quantized:
        ksc = scat_scales(pc.k_scale, ks)
        vsc = scat_scales(pc.v_scale, vs)
    return PagedKVCache(k, v, ksc, vsc, pc.page_table, pc.length,
                        head_dim=pc.head_dim)


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("slot", "n_pages"))
def scatter_prefill_pages(pc: PagedKVCache, tmp: KVCache, pids, length,
                          *, slot: int, n_pages: int) -> PagedKVCache:
    """Copy a (1, bucket) dense prefill temp cache into `n_pages` pool
    pages (the paged analog of engine._scatter_cache).  pids: (n_pages,)
    int32; bucket must cover n_pages * page_tokens or the tail pages are
    filled from padded rows (masked by length downstream)."""
    pf = pc.pf
    s2 = tmp.k.shape[3]

    def copy(pool, src):
        # src (L, 1, H, s2, dp) dense temp; pool (L, P, H, PAGE_S2, dp)
        for j in range(n_pages):
            lo = j * PAGE_S2
            take = min(PAGE_S2, s2 - lo)
            if take <= 0:
                break
            chunk = src[:, 0, :, lo:lo + take]
            if take < PAGE_S2:
                pad = [(0, 0), (0, 0), (0, PAGE_S2 - take), (0, 0)]
                chunk = jnp.pad(chunk, pad)
            pool = jax.lax.dynamic_update_slice(
                pool, chunk[:, None].astype(pool.dtype),
                (0, pids[j], 0, 0, 0))
        return pool

    def copy_scale(spool, src):
        # src (L, 1, H, pfC, s2); pool (L, P, H, pfC, PAGE_S2)
        for j in range(n_pages):
            lo = j * PAGE_S2
            take = min(PAGE_S2, s2 - lo)
            if take <= 0:
                break
            chunk = src[:, 0, :, :, lo:lo + take]
            if take < PAGE_S2:
                chunk = jnp.pad(chunk, [(0, 0), (0, 0), (0, 0),
                                        (0, PAGE_S2 - take)])
            spool = jax.lax.dynamic_update_slice(
                spool, chunk[:, None].astype(spool.dtype),
                (0, pids[j], 0, 0, 0))
        return spool

    k = copy(pc.k, tmp.k)
    v = copy(pc.v, tmp.v)
    ks = vs = None
    if pc.quantized:
        ks = copy_scale(pc.k_scale, tmp.k_scale)
        vs = copy_scale(pc.v_scale, tmp.v_scale)
    length_new = pc.length.at[slot].set(length)
    return PagedKVCache(k, v, ks, vs, pc.page_table, length_new,
                        head_dim=pc.head_dim)
