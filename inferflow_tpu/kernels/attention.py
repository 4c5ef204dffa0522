"""Fused decode attention over the (quantized) KV cache.

TPU-native replacement for the reference's per-query decode attention loop
(reference: inference_worker.cc:1094-1332 CalculateProductKQ / fused causal
softmax kernels/unary_tensor_opr.h:460-536 / KV Q8 dequant-on-read
kv_cache.cc:104-249).  One Pallas kernel per decode step and layer:

  - Reads K/V directly from the full STACKED (L, B, H, S, D) cache buffer
    (kept in HBM; the layer index is a prefetched scalar) — no per-layer
    slice copy of the cache ever materializes.
  - The sequence loop runs INSIDE the kernel with a RUNTIME trip count
    ceil(len/TS) and double-buffered async DMA: decode cost scales with
    each slot's actual context length, not max_context_len, and there are
    no empty pipeline steps for skipped blocks (a grid-based variant
    measured ~10-20us of overhead per *skipped* block — the in-kernel
    loop removes that entirely).
  - Dequantizes Q8 codes against their f16 scales in VMEM tiles, so HBM
    traffic per step is the int8 cache bytes, not a dequantized bf16 copy.
  - Online softmax: scores never materialize beyond a (G, TS) VMEM tile
    (the XLA path builds a (B, H, Tq, S) f32 tensor).

Layout note: the cache stores (L, B, H, S, D) so each DMA streams a
contiguous (TS, D) tile; heads ride a parallel grid axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dequant_matmul import _decode_f16_bits

NEG_INF = -1e30


def _pick_ts(s: int) -> int:
    for ts in (512, 256, 128, 64, 32):
        if s % ts == 0:
            return ts
    return 0


def _pick_ts_lane(s: int) -> int:
    """Sequence tile for QUANTIZED caches, whose scale DMAs slice the
    LANE (trailing) dim of the packed (.., C, S/pf) scale arrays: Mosaic
    requires every lane-dim slice — even a full slice of a sub-128 dim,
    which the tiled layout pads to 128 — to be a multiple of 128.
    Packed seq dims below 128 (tiny max_context at narrow head dims)
    therefore take the XLA fallback (return 0)."""
    for ts in (512, 256, 128):
        if s % ts == 0:
            return ts
    return 0


def _pf(d: int) -> int:
    """Sequence pack factor (mirrors runtime.kv_cache.kv_pack_for): heads
    narrower than 128 lanes pack pf rows per 128-lane storage row."""
    if d < 128 and 128 % d == 0:
        return 128 // d
    return 1


def _make_kernel(g: int, ts: int, d: int, blk: int, pf: int,
                 quantized: bool, scale: float, full_ts: bool = False):
    n_bufs = 2

    def kernel(*refs):
        # meta_ref: [layer, len_0..len_{B-1}] (scalar prefetch).  The
        # trailing *_thru output refs are the cache arrays ALIASED to
        # their inputs (never written: the pass-through tells XLA the
        # kernel owns the buffers, so the per-layer update->attend chain
        # stays in place instead of defensively copying the whole cache
        # around every custom call — measured at ~0.4ms/layer at ctx 4k).
        if quantized:
            (meta_ref, q_ref, k_hbm, ks_hbm, v_hbm, vs_hbm, out_ref,
             k_buf, ks_buf, v_buf, vs_buf, acc_ref, sems) = refs
        else:
            (meta_ref, q_ref, k_hbm, v_hbm, out_ref,
             k_buf, v_buf, acc_ref, sems) = refs
        b = pl.program_id(0)
        h = pl.program_id(1)
        layer = meta_ref[0]
        length = meta_ref[1 + b]
        nb = pl.cdiv(length, ts * pf)  # packed-row blocks

        def dma(j, slot):
            # full_ts: ts covers the whole packed seq dim — a static full
            # slice (dynamic lane-dim slices below 128 have no legal
            # Mosaic tiling; _pick_ts_lane)
            ssl = (slice(None) if full_ts
                   else pl.ds(pl.multiple_of(j * ts, ts), ts))
            cps = [pltpu.make_async_copy(
                k_hbm.at[layer, b, h, ssl, :],
                k_buf.at[slot], sems.at[0, slot]),
                pltpu.make_async_copy(
                v_hbm.at[layer, b, h, ssl, :],
                v_buf.at[slot], sems.at[1, slot])]
            if quantized:
                # scales are stored transposed (.., D/blk, S): a clean
                # (C, ts) tile (an (ts, C) tile is un-DMA-able: C < lane)
                cps.append(pltpu.make_async_copy(
                    ks_hbm.at[layer, b, h, :, ssl],
                    ks_buf.at[slot], sems.at[2, slot]))
                cps.append(pltpu.make_async_copy(
                    vs_hbm.at[layer, b, h, :, ssl],
                    vs_buf.at[slot], sems.at[3, slot]))
            return cps

        for cp in dma(0, 0):
            cp.start()

        # q arrives pre-reshaped (B, H, g, D): this program's g-head group
        # is a clean block — no dynamic sublane slicing (Mosaic requires
        # 8-aligned starts, which h*g is not for MHA g=1)
        qf = q_ref[0, 0].astype(jnp.float32)  # (G, D)
        n_sub = d // blk if quantized else 1

        def body(j, carry):
            m_prev, l_prev, _ = carry
            slot = jax.lax.rem(j, n_bufs)
            next_slot = jax.lax.rem(j + 1, n_bufs)

            @pl.when(j + 1 < nb)
            def _():
                for cp in dma(j + 1, next_slot):
                    cp.start()

            for cp in dma(j, slot):
                cp.wait()

            kc = k_buf[slot]  # (TS, D*pf): pf seq rows per storage row
            vc = v_buf[slot]
            kf32 = kc.astype(jnp.float32)
            vf32 = vc.astype(jnp.float32)
            if quantized:
                ks = _decode_f16_bits(ks_buf[slot])  # (pf*C, TS) f32
                vs = _decode_f16_bits(vs_buf[slot])

            m_new, l_new = m_prev, l_prev
            # one online-softmax update per parity: seq position of packed
            # row r, parity par is (j*ts + r)*pf + par
            for par in range(pf):
                off = par * d
                if quantized:
                    # per-quant-block sub-dots keep the scale application
                    # EXACT (expanding scales with a one-hot MXU matmul
                    # loses ~0.2% to f32-on-MXU rounding):
                    #   scores = sum_c sc_k[par,c] * (q_c . k_{par,c}^T)
                    scores = jnp.zeros((g, ts), jnp.float32)
                    for c in range(n_sub):
                        part = jax.lax.dot_general(
                            qf[:, c * blk:(c + 1) * blk],
                            kf32[:, off + c * blk:off + (c + 1) * blk],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (G, TS)
                        row = par * n_sub + c
                        scores = scores + part * ks[row:row + 1, :]
                    scores = scores * scale
                else:
                    scores = jax.lax.dot_general(
                        qf, kf32[:, off:off + d],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                pos = (j * ts + jax.lax.broadcasted_iota(
                    jnp.int32, (g, ts), 1)) * pf + par
                scores = jnp.where(pos < length, scores, NEG_INF)

                m_cur = jnp.maximum(m_new, jnp.max(scores, axis=-1,
                                                   keepdims=True))
                alpha = jnp.exp(m_new - m_cur)
                p = jnp.exp(scores - m_cur)  # (G, TS)
                l_new = alpha * l_new + jnp.sum(p, axis=-1, keepdims=True)
                m_new = m_cur
                if quantized:
                    #   out_c = (p * sc_v[par,c]) . v_{par,c}
                    for c in range(n_sub):
                        row = par * n_sub + c
                        pc = p * vs[row:row + 1, :]
                        acc_ref[:, c * blk:(c + 1) * blk] = (
                            alpha * acc_ref[:, c * blk:(c + 1) * blk]
                            + jnp.dot(
                                pc,
                                vf32[:, off + c * blk:off + (c + 1) * blk],
                                preferred_element_type=jnp.float32))
                else:
                    acc_ref[:] = alpha * acc_ref[:] + jnp.dot(
                        p, vf32[:, off:off + d],
                        preferred_element_type=jnp.float32)
            return m_new, l_new, jnp.float32(0)

        acc_ref[:] = jnp.zeros_like(acc_ref)
        m0 = jnp.full((g, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((g, 1), jnp.float32)
        _, l_fin, _ = jax.lax.fori_loop(0, nb, body,
                                        (m0, l0, jnp.float32(0)))
        out_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_fin, 1e-30)).astype(
            out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("kq_scale", "interpret"))
def _decode_attention(meta, q, k, k_scale, v, v_scale, *,
                      kq_scale: float = 1.0, interpret: bool = False):
    """q: (B, Hq, D); k/v: PACKED (L, B, H, S/pf, D*pf) int8 or bf16
    (runtime.kv_cache physical layout); k_scale/v_scale:
    (L, B, H, pf*(D//blk), S/pf) f16-as-uint16 or None;
    meta: int32 (1 + B,) = [layer, per-slot kv length (incl. new row)].
    Returns (B, Hq, D) attention output in q.dtype.
    """
    bsz, hq, d = q.shape
    l, _, h, s_packed, dp = k.shape
    g = hq // h
    quantized = k_scale is not None
    pf = dp // d
    ts = min(_pick_ts_lane(s_packed) if quantized else _pick_ts(s_packed),
             512)
    blk = dp // k_scale.shape[-2] if quantized else 0
    scale = (1.0 / (d ** 0.5)) * kq_scale

    # (B, Hq, D) -> (B, H, g, D): the kv-head group becomes a block axis
    q4 = q.reshape(bsz, h, g, d)

    def qmap(b, hh, meta_ref):
        return (b, hh, 0, 0)

    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    in_specs = [pl.BlockSpec((1, 1, g, d), qmap, memory_space=pltpu.VMEM),
                hbm]
    inputs = [q4, k]
    if quantized:
        in_specs.append(hbm)
        inputs.append(k_scale)
    in_specs.append(hbm)
    inputs.append(v)
    if quantized:
        in_specs.append(hbm)
        inputs.append(v_scale)

    kv_dtype = k.dtype
    n_srows = pf * (d // blk) if quantized else 0
    scratch = [pltpu.VMEM((2, ts, d * pf), kv_dtype)]
    if quantized:
        scratch.append(pltpu.VMEM((2, n_srows, ts), jnp.uint16))
    scratch.append(pltpu.VMEM((2, ts, d * pf), kv_dtype))
    if quantized:
        scratch.append(pltpu.VMEM((2, n_srows, ts), jnp.uint16))
    scratch.append(pltpu.VMEM((g, d), jnp.float32))      # output accumulator
    scratch.append(pltpu.SemaphoreType.DMA((4, 2)))

    kernel = _make_kernel(g, ts, d, blk, pf, quantized, scale,
                          full_ts=(ts == s_packed))
    kv_bytes = 2 * bsz * h * s_packed * dp * k.dtype.itemsize
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, h),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, g, d), qmap,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * hq * s_packed * dp,
            bytes_accessed=kv_bytes + q.size * q.dtype.itemsize,
            transcendentals=bsz * hq * s_packed * pf,
        ),
        interpret=interpret,
    )(meta, *inputs)
    return out.reshape(bsz, hq, d)


def _make_paged_kernel(g: int, d: int, blk: int, pf: int, quantized: bool,
                       scale: float, bsz: int, maxp: int):
    """Paged variant of _make_kernel: the seq loop walks the slot's page
    table (scalar-prefetched) and DMAs WHOLE pool pages — one page is one
    128-packed-row lane tile, so every copy is a static full slice
    (runtime/paged_kv.py layout notes)."""
    n_bufs = 2
    ts = 128  # PAGE_S2

    def kernel(*refs):
        if quantized:
            (meta_ref, q_ref, k_hbm, ks_hbm, v_hbm, vs_hbm, out_ref,
             k_buf, ks_buf, v_buf, vs_buf, acc_ref, sems) = refs
        else:
            (meta_ref, q_ref, k_hbm, v_hbm, out_ref,
             k_buf, v_buf, acc_ref, sems) = refs
        b = pl.program_id(0)
        h = pl.program_id(1)
        layer = meta_ref[0]
        length = meta_ref[1 + b]
        nb = pl.cdiv(length, ts * pf)

        def dma(j, slot):
            pid = meta_ref[1 + bsz + b * maxp + j]
            cps = [pltpu.make_async_copy(
                k_hbm.at[layer, pid, h],
                k_buf.at[slot], sems.at[0, slot]),
                pltpu.make_async_copy(
                v_hbm.at[layer, pid, h],
                v_buf.at[slot], sems.at[1, slot])]
            if quantized:
                cps.append(pltpu.make_async_copy(
                    ks_hbm.at[layer, pid, h],
                    ks_buf.at[slot], sems.at[2, slot]))
                cps.append(pltpu.make_async_copy(
                    vs_hbm.at[layer, pid, h],
                    vs_buf.at[slot], sems.at[3, slot]))
            return cps

        for cp in dma(0, 0):
            cp.start()

        qf = q_ref[0, 0].astype(jnp.float32)  # (G, D)
        n_sub = d // blk if quantized else 1

        def body(j, carry):
            m_prev, l_prev, _ = carry
            slot = jax.lax.rem(j, n_bufs)
            next_slot = jax.lax.rem(j + 1, n_bufs)

            @pl.when(j + 1 < nb)
            def _():
                for cp in dma(j + 1, next_slot):
                    cp.start()

            for cp in dma(j, slot):
                cp.wait()

            kf32 = k_buf[slot].astype(jnp.float32)  # (TS, D*pf)
            vf32 = v_buf[slot].astype(jnp.float32)
            if quantized:
                ks = _decode_f16_bits(ks_buf[slot])  # (pf*C, TS)
                vs = _decode_f16_bits(vs_buf[slot])

            m_new, l_new = m_prev, l_prev
            for par in range(pf):
                off = par * d
                if quantized:
                    scores = jnp.zeros((g, ts), jnp.float32)
                    for c in range(n_sub):
                        part = jax.lax.dot_general(
                            qf[:, c * blk:(c + 1) * blk],
                            kf32[:, off + c * blk:off + (c + 1) * blk],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        row = par * n_sub + c
                        scores = scores + part * ks[row:row + 1, :]
                    scores = scores * scale
                else:
                    scores = jax.lax.dot_general(
                        qf, kf32[:, off:off + d],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                pos = (j * ts + jax.lax.broadcasted_iota(
                    jnp.int32, (g, ts), 1)) * pf + par
                scores = jnp.where(pos < length, scores, NEG_INF)

                m_cur = jnp.maximum(m_new, jnp.max(scores, axis=-1,
                                                   keepdims=True))
                alpha = jnp.exp(m_new - m_cur)
                p = jnp.exp(scores - m_cur)
                l_new = alpha * l_new + jnp.sum(p, axis=-1, keepdims=True)
                m_new = m_cur
                if quantized:
                    for c in range(n_sub):
                        row = par * n_sub + c
                        pc = p * vs[row:row + 1, :]
                        acc_ref[:, c * blk:(c + 1) * blk] = (
                            alpha * acc_ref[:, c * blk:(c + 1) * blk]
                            + jnp.dot(
                                pc,
                                vf32[:, off + c * blk:off + (c + 1) * blk],
                                preferred_element_type=jnp.float32))
                else:
                    acc_ref[:] = alpha * acc_ref[:] + jnp.dot(
                        p, vf32[:, off:off + d],
                        preferred_element_type=jnp.float32)
            return m_new, l_new, jnp.float32(0)

        acc_ref[:] = jnp.zeros_like(acc_ref)
        m0 = jnp.full((g, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((g, 1), jnp.float32)
        _, l_fin, _ = jax.lax.fori_loop(0, nb, body,
                                        (m0, l0, jnp.float32(0)))
        out_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_fin, 1e-30)).astype(
            out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("kq_scale", "interpret"))
def _paged_decode_attention(meta, q, k, k_scale, v, v_scale, *,
                            kq_scale: float = 1.0,
                            interpret: bool = False):
    """Paged pool layout (runtime/paged_kv.py): k/v (L, P, H, 128, D*pf);
    scales (L, P, H, pf*(D//blk), 128); meta: int32
    (1 + B + B*MAXP,) = [layer, lengths, page_table.ravel()]."""
    bsz, hq, d = q.shape
    l, p, h, ts, dp = k.shape
    g = hq // h
    quantized = k_scale is not None
    pf = dp // d
    blk = dp // k_scale.shape[-2] if quantized else 0
    scale = (1.0 / (d ** 0.5)) * kq_scale
    maxp = (int(meta.shape[0]) - 1 - bsz) // bsz

    q4 = q.reshape(bsz, h, g, d)

    def qmap(b, hh, meta_ref):
        return (b, hh, 0, 0)

    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    in_specs = [pl.BlockSpec((1, 1, g, d), qmap, memory_space=pltpu.VMEM),
                hbm]
    inputs = [q4, k]
    if quantized:
        in_specs.append(hbm)
        inputs.append(k_scale)
    in_specs.append(hbm)
    inputs.append(v)
    if quantized:
        in_specs.append(hbm)
        inputs.append(v_scale)

    kv_dtype = k.dtype
    n_srows = pf * (d // blk) if quantized else 0
    scratch = [pltpu.VMEM((2, ts, dp), kv_dtype)]
    if quantized:
        scratch.append(pltpu.VMEM((2, n_srows, ts), jnp.uint16))
    scratch.append(pltpu.VMEM((2, ts, dp), kv_dtype))
    if quantized:
        scratch.append(pltpu.VMEM((2, n_srows, ts), jnp.uint16))
    scratch.append(pltpu.VMEM((g, d), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((4, 2)))

    kernel = _make_paged_kernel(g, d, blk, pf, quantized, scale, bsz, maxp)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, h),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, g, d), qmap,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * hq * p * ts * dp // max(bsz, 1),
            bytes_accessed=2 * h * p * ts * dp * k.dtype.itemsize,
            transcendentals=bsz * hq * ts * pf,
        ),
        interpret=interpret,
    )(meta, *inputs)
    return out.reshape(bsz, hq, d)


def decode_attention(q, cache, layer, lengths, *, kq_scale: float = 1.0,
                     interpret: bool = False):
    """Fused decode attention for one layer.

    q: (B, 1, Hq, D); cache: runtime.kv_cache.KVCache with storage
    (L, B, H, S, D); layer: int scalar (traced is fine — one compiled
    kernel serves every layer); lengths: (B,) valid KV rows per slot
    (INCLUDING the rows just appended this step).
    Returns ((B, 1, Hq, D) attention output, the cache).
    """
    bsz = q.shape[0]
    ks = cache.k_scale
    vs = cache.v_scale
    if ks is not None and ks.dtype == jnp.float16:
        ks = jax.lax.bitcast_convert_type(ks, jnp.uint16)
        vs = jax.lax.bitcast_convert_type(vs, jnp.uint16)
    from ..runtime.paged_kv import PagedKVCache
    if isinstance(cache, PagedKVCache):
        meta = jnp.concatenate([
            jnp.asarray(layer, jnp.int32).reshape(1),
            jnp.asarray(lengths, jnp.int32).reshape(bsz),
            cache.page_table.reshape(-1).astype(jnp.int32)])
        out = _paged_decode_attention(meta, q[:, 0], cache.k, ks,
                                      cache.v, vs, kq_scale=kq_scale,
                                      interpret=interpret)
        return out[:, None], cache
    meta = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(lengths, jnp.int32).reshape(bsz)])
    out = _decode_attention(meta, q[:, 0], cache.k, ks, cache.v, vs,
                            kq_scale=kq_scale, interpret=interpret)
    return out[:, None], cache


def _make_chunk_kernel(c: int, g: int, ts: int, d: int, blk: int, pf: int,
                       quantized: bool, scale: float,
                       full_ts: bool = False):
    """Flash chunk attention: C query rows of ONE slot attend to that
    slot's cache rows [0, start + C) with per-row causal masking."""
    n_bufs = 2
    r_rows = c * g

    def kernel(*refs):
        # meta_ref: [layer, slot, start]; *_thru = aliased pass-through
        # cache outputs (see _make_kernel)
        if quantized:
            (meta_ref, q_ref, k_hbm, ks_hbm, v_hbm, vs_hbm, out_ref,
             k_buf, ks_buf, v_buf, vs_buf, acc_ref, sems) = refs
        else:
            (meta_ref, q_ref, k_hbm, v_hbm, out_ref,
             k_buf, v_buf, acc_ref, sems) = refs
        h = pl.program_id(0)
        layer = meta_ref[0]
        slot = meta_ref[1]
        start = meta_ref[2]
        length = start + c  # rows visible to the last chunk row
        nb = pl.cdiv(length, ts * pf)

        def dma(j, sl):
            ssl = (slice(None) if full_ts
                   else pl.ds(pl.multiple_of(j * ts, ts), ts))
            cps = [pltpu.make_async_copy(
                k_hbm.at[layer, slot, h, ssl, :],
                k_buf.at[sl], sems.at[0, sl]),
                pltpu.make_async_copy(
                v_hbm.at[layer, slot, h, ssl, :],
                v_buf.at[sl], sems.at[1, sl])]
            if quantized:
                cps.append(pltpu.make_async_copy(
                    ks_hbm.at[layer, slot, h, :, ssl],
                    ks_buf.at[sl], sems.at[2, sl]))
                cps.append(pltpu.make_async_copy(
                    vs_hbm.at[layer, slot, h, :, ssl],
                    vs_buf.at[sl], sems.at[3, sl]))
            return cps

        for cp in dma(0, 0):
            cp.start()

        # q arrives pre-arranged (H, C*g, D): this head's rows as a block
        qf = q_ref[0].astype(jnp.float32)  # (C*g, D)
        # per-row absolute position: start + row // g
        row_pos = start + jax.lax.broadcasted_iota(
            jnp.int32, (r_rows, ts), 0) // g
        n_sub = d // blk if quantized else 1

        def body(j, carry):
            m_prev, l_prev, _ = carry
            sl = jax.lax.rem(j, n_bufs)
            nxt = jax.lax.rem(j + 1, n_bufs)

            @pl.when(j + 1 < nb)
            def _():
                for cp in dma(j + 1, nxt):
                    cp.start()

            for cp in dma(j, sl):
                cp.wait()

            kf32 = k_buf[sl].astype(jnp.float32)  # (TS, D*pf)
            vf32 = v_buf[sl].astype(jnp.float32)
            if quantized:
                ks = _decode_f16_bits(ks_buf[sl])  # (pf*C', TS)
                vs = _decode_f16_bits(vs_buf[sl])

            m_new, l_new = m_prev, l_prev
            for par in range(pf):
                off = par * d
                if quantized:
                    scores = jnp.zeros((r_rows, ts), jnp.float32)
                    for cc in range(n_sub):
                        part = jax.lax.dot_general(
                            qf[:, cc * blk:(cc + 1) * blk],
                            kf32[:, off + cc * blk:off + (cc + 1) * blk],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        row = par * n_sub + cc
                        scores = scores + part * ks[row:row + 1, :]
                    scores = scores * scale
                else:
                    scores = jax.lax.dot_general(
                        qf, kf32[:, off:off + d],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                key_pos = (j * ts + jax.lax.broadcasted_iota(
                    jnp.int32, (r_rows, ts), 1)) * pf + par
                scores = jnp.where(key_pos <= row_pos, scores, NEG_INF)

                m_cur = jnp.maximum(m_new, jnp.max(scores, axis=-1,
                                                   keepdims=True))
                alpha = jnp.exp(m_new - m_cur)
                p = jnp.exp(scores - m_cur)
                l_new = alpha * l_new + jnp.sum(p, axis=-1, keepdims=True)
                m_new = m_cur
                if quantized:
                    for cc in range(n_sub):
                        row = par * n_sub + cc
                        pc = p * vs[row:row + 1, :]
                        acc_ref[:, cc * blk:(cc + 1) * blk] = (
                            alpha * acc_ref[:, cc * blk:(cc + 1) * blk]
                            + jnp.dot(
                                pc,
                                vf32[:, off + cc * blk:off + (cc + 1) * blk],
                                preferred_element_type=jnp.float32))
                else:
                    acc_ref[:] = alpha * acc_ref[:] + jnp.dot(
                        p, vf32[:, off:off + d],
                        preferred_element_type=jnp.float32)
            return m_new, l_new, jnp.float32(0)

        acc_ref[:] = jnp.zeros_like(acc_ref)
        m0 = jnp.full((r_rows, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((r_rows, 1), jnp.float32)
        _, l_fin, _ = jax.lax.fori_loop(0, nb, body,
                                        (m0, l0, jnp.float32(0)))
        out_ref[0] = (acc_ref[:] / jnp.maximum(l_fin, 1e-30)).astype(
            out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("kq_scale", "interpret"))
def _chunk_attention(meta, q, k, k_scale, v, v_scale, *,
                     kq_scale: float = 1.0, interpret: bool = False):
    """q: (C, Hq, D) one slot's chunk; cache arrays as in _decode_attention;
    meta: int32 (3,) = [layer, slot, start].  Returns (C, Hq, D)."""
    c, hq, d = q.shape
    l, bsz, h, s_packed, dp = k.shape
    g = hq // h
    quantized = k_scale is not None
    pf = dp // d
    ts = min(_pick_ts_lane(s_packed) if quantized else _pick_ts(s_packed),
             512)
    blk = dp // k_scale.shape[-2] if quantized else 0
    scale = (1.0 / (d ** 0.5)) * kq_scale

    # (C, Hq, D) -> (H, C*g, D): per-kv-head row groups as blocks
    q3 = q.reshape(c, h, g, d).transpose(1, 0, 2, 3).reshape(h, c * g, d)

    def qmap(hh, meta_ref):
        return (hh, 0, 0)

    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    in_specs = [pl.BlockSpec((1, c * g, d), qmap, memory_space=pltpu.VMEM),
                hbm]
    inputs = [q3, k]
    if quantized:
        in_specs.append(hbm)
        inputs.append(k_scale)
    in_specs.append(hbm)
    inputs.append(v)
    if quantized:
        in_specs.append(hbm)
        inputs.append(v_scale)

    kv_dtype = k.dtype
    n_srows = pf * (d // blk) if quantized else 0
    scratch = [pltpu.VMEM((2, ts, d * pf), kv_dtype)]
    if quantized:
        scratch.append(pltpu.VMEM((2, n_srows, ts), jnp.uint16))
    scratch.append(pltpu.VMEM((2, ts, d * pf), kv_dtype))
    if quantized:
        scratch.append(pltpu.VMEM((2, n_srows, ts), jnp.uint16))
    scratch.append(pltpu.VMEM((c * g, d), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((4, 2)))

    kernel = _make_chunk_kernel(c, g, ts, d, blk, pf, quantized, scale,
                                full_ts=(ts == s_packed))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(h,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, c * g, d), qmap,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((h, c * g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * c * hq * s_packed * dp,
            bytes_accessed=2 * h * s_packed * dp * k.dtype.itemsize,
            transcendentals=c * hq * s_packed * pf,
        ),
        interpret=interpret,
    )(meta, *inputs)
    return out.reshape(h, c, g, d).transpose(1, 0, 2, 3).reshape(
        c, hq, d)


def chunk_attention(q, cache, layer, slot, start, *, kq_scale: float = 1.0,
                    interpret: bool = False):
    """Flash chunk attention for one slot: q (1, C, Hq, D) attends to
    cache rows [0, start + C) of `slot` (the chunk's K/V must already be
    appended).  Returns ((1, C, Hq, D), the cache)."""
    meta = jnp.stack([jnp.asarray(layer, jnp.int32),
                      jnp.asarray(slot, jnp.int32),
                      jnp.asarray(start, jnp.int32)])
    ks = cache.k_scale
    vs = cache.v_scale
    if ks is not None and ks.dtype == jnp.float16:
        ks = jax.lax.bitcast_convert_type(ks, jnp.uint16)
        vs = jax.lax.bitcast_convert_type(vs, jnp.uint16)
    out = _chunk_attention(meta, q[0], cache.k, ks, cache.v, vs,
                           kq_scale=kq_scale, interpret=interpret)
    return out[None], cache


def decode_attention_supported(cache, spec, t: int) -> bool:
    """Whether the fused kernel applies: single-token decode, rope/none
    positions (ALiBi falls back to the XLA path), tileable seq length,
    head dim a power-of-two divisor/multiple of the 128-lane width.
    (Measured on the packed cache layout the fused path wins at EVERY
    context length — ~0.1ms per 22-layer pass at short lengths vs ~2.5ms
    for the XLA dequant+einsum path at S=1024.)"""
    if t != 1:
        return False
    if spec.pos_embedding_alg == "alibi":
        return False
    d = cache.head_dim
    if not (d in (128, 256) or (d < 128 and 128 % d == 0)):
        return False
    picker = _pick_ts_lane if cache.quantized else _pick_ts
    if picker(cache.k.shape[3]) == 0:
        return False
    return True
