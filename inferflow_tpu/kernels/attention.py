"""Fused decode attention over the (quantized) KV cache.

TPU-native replacement for the reference's per-query decode attention loop
(reference: inference_worker.cc:1094-1332 CalculateProductKQ / fused causal
softmax kernels/unary_tensor_opr.h:460-536 / KV Q8 dequant-on-read
kv_cache.cc:104-249).  One Pallas kernel per decode step and layer:

  - Reads K/V directly from the full STACKED (L, B, H, S, D) cache buffer
    with the layer index as a prefetched scalar — no per-layer slice copy
    of the cache ever materializes in HBM.
  - Dequantizes Q8 codes against their f16 scales inside the kernel (VMEM
    tiles), so HBM traffic per step is the int8 cache bytes, not a
    dequantized bf16 copy.
  - Online softmax over sequence blocks: scores never materialize beyond a
    (G, TS) VMEM tile (the XLA path builds a (B, H, Tq, S) f32 tensor).
  - Per-slot valid lengths come in as prefetched scalars; sequence blocks
    past a slot's length are SKIPPED: their index_map clamps to the last
    valid block (Pallas elides the DMA when the block index repeats) and
    the compute is predicated off — decode cost scales with the actual
    context, not max_context_len.

Layout note: the cache stores (L, B, H, S, D) so each grid step streams a
clean (TS, D) tile; heads ride a parallel grid axis.
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


def _make_kernel(g: int, ts: int, d: int, n_s: int, blk: int,
                 quantized: bool, scale: float):
    def kernel(*refs):
        # meta_ref: [layer, len_0..len_{B-1}] (scalar prefetch)
        if quantized:
            (meta_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref,
             m_ref, l_ref, acc_ref) = refs
        else:
            (meta_ref, q_ref, k_ref, v_ref, out_ref,
             m_ref, l_ref, acc_ref) = refs
        b = pl.program_id(0)
        s = pl.program_id(2)
        length = meta_ref[1 + b]

        @pl.when(s == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(s * ts < length)
        def _():
            kc = k_ref[0, 0, 0]  # (TS, D)
            vc = v_ref[0, 0, 0]
            if quantized:
                ks = _decode_f16_bits(ks_ref[0, 0, 0])  # (TS, D//blk)
                vs = _decode_f16_bits(vs_ref[0, 0, 0])
                # expand scales along lanes with a one-hot matmul (scale
                # col c covers lanes [c*blk, (c+1)*blk)); Mosaic has no
                # lane-axis element repeat, but a (TS, C)x(C, D) dot is
                # a trivially cheap MXU op
                cc = jax.lax.broadcasted_iota(jnp.int32, (d // blk, d), 0)
                dd = jax.lax.broadcasted_iota(jnp.int32, (d // blk, d), 1)
                expand = (dd // blk == cc).astype(jnp.float32)
                kf = kc.astype(jnp.float32) * jnp.dot(
                    ks, expand, preferred_element_type=jnp.float32)
                vf = vc.astype(jnp.float32) * jnp.dot(
                    vs, expand, preferred_element_type=jnp.float32)
            else:
                kf = kc.astype(jnp.float32)
                vf = vc.astype(jnp.float32)
            qf = q_ref[0].astype(jnp.float32)  # (G, D)
            scores = jax.lax.dot_general(
                qf, kf, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (G, TS)
            pos = s * ts + jax.lax.broadcasted_iota(jnp.int32, (g, ts), 1)
            scores = jnp.where(pos < length, scores, NEG_INF)

            m_prev = m_ref[:, :1]  # (G, 1)
            m_new = jnp.maximum(m_prev,
                                jnp.max(scores, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(scores - m_new)  # (G, TS)
            l_ref[:, :1] = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1,
                                                          keepdims=True)
            m_ref[:, :1] = m_new
            acc_ref[:] = alpha * acc_ref[:] + jnp.dot(
                p, vf, preferred_element_type=jnp.float32)

        @pl.when(s == n_s - 1)
        def _():
            out_ref[0] = (acc_ref[:] /
                          jnp.maximum(l_ref[:, :1], 1e-30)).astype(
                              out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("kq_scale", "interpret"))
def _decode_attention(meta, q, k, k_scale, v, v_scale, *,
                      kq_scale: float = 1.0, interpret: bool = False):
    """q: (B, Hq, D); k/v: (L, B, H, S, D) int8 or bf16;
    k_scale/v_scale: (L, B, H, S, D//blk) f16-as-uint16 or None;
    meta: int32 (1 + B,) = [layer, per-slot kv length (incl. new row)].
    Returns (B, Hq, D) attention output in q.dtype.
    """
    bsz, hq, d = q.shape
    l, _, h, s_max, _ = k.shape
    g = hq // h
    quantized = k_scale is not None
    ts = _pick_ts(s_max)
    n_s = s_max // ts
    blk = d // k_scale.shape[-1] if quantized else 0
    scale = (1.0 / (d ** 0.5)) * kq_scale

    def qmap(b, hh, s, meta_ref):
        return (b, hh, 0)

    def kvmap(b, hh, s, meta_ref):
        length = meta_ref[1 + b]
        last = jnp.maximum((length + ts - 1) // ts - 1, 0)
        return (meta_ref[0], b, hh, jnp.minimum(s, last), 0)

    def outmap(b, hh, s, meta_ref):
        return (b, hh, 0)

    in_specs = [
        pl.BlockSpec((1, g, d), qmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, ts, d), kvmap, memory_space=pltpu.VMEM),
    ]
    inputs = [q, k]
    if quantized:
        in_specs.append(pl.BlockSpec((1, 1, 1, ts, d // blk), kvmap,
                                     memory_space=pltpu.VMEM))
        inputs.append(k_scale)
    in_specs.append(pl.BlockSpec((1, 1, 1, ts, d), kvmap,
                                 memory_space=pltpu.VMEM))
    inputs.append(v)
    if quantized:
        in_specs.append(pl.BlockSpec((1, 1, 1, ts, d // blk), kvmap,
                                     memory_space=pltpu.VMEM))
        inputs.append(v_scale)

    kernel = _make_kernel(g, ts, d, n_s, blk, quantized, scale)
    kv_bytes = 2 * bsz * h * s_max * d * k.dtype.itemsize
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, h, n_s),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, g, d), outmap,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((g, 128), jnp.float32),  # running max
                pltpu.VMEM((g, 128), jnp.float32),  # running denom
                pltpu.VMEM((g, d), jnp.float32),    # output accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * hq * s_max * d,
            bytes_accessed=kv_bytes + q.size * q.dtype.itemsize,
            transcendentals=bsz * hq * s_max,
        ),
        interpret=interpret,
    )(meta, *inputs)
    return out


def decode_attention(q, cache, layer, lengths, *, kq_scale: float = 1.0,
                     interpret: bool = False):
    """Fused decode attention for one layer.

    q: (B, 1, Hq, D); cache: runtime.kv_cache.KVCache with storage
    (L, B, H, S, D); layer: int32 scalar (traced is fine — one compiled
    kernel serves every layer); lengths: (B,) valid KV rows per slot
    (INCLUDING the rows just appended this step).
    Returns (B, 1, Hq, D).
    """
    bsz = q.shape[0]
    meta = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(lengths, jnp.int32).reshape(bsz)])
    ks = cache.k_scale
    vs = cache.v_scale
    if ks is not None and ks.dtype == jnp.float16:
        ks = jax.lax.bitcast_convert_type(ks, jnp.uint16)
        vs = jax.lax.bitcast_convert_type(vs, jnp.uint16)
    out = _decode_attention(meta, q[:, 0], cache.k, ks, cache.v, vs,
                            kq_scale=kq_scale, interpret=interpret)
    return out[:, None]


def decode_attention_supported(cache, spec, t: int) -> bool:
    """Whether the fused kernel applies: single-token decode, rope/none
    positions (ALiBi falls back to the XLA path), tileable seq length."""
    if t != 1:
        return False
    if spec.pos_embedding_alg == "alibi":
        return False
    if _pick_ts(cache.max_len) == 0:
        return False
    d = cache.k.shape[-1]
    return d in (64, 128, 256)
