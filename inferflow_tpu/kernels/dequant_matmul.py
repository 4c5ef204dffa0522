"""Fused dequantize-matmul Pallas kernel for block-quantized weights.

TPU-native replacement for the reference's quantized GEMV/GEMM family
(reference: src/kernels/gemv.h:633-1711, gemm.h, tensor_mul.cu Gemv_AX
dispatch) — one kernel generic over every block format instead of one CUDA
kernel per packing.

Design (memory-bound decode is the target):
  - The packed bit-planes and fp16 scale/base planes stream HBM -> VMEM via
    the pallas pipeline; the weights are never materialized in HBM at full
    width, so HBM traffic per token is the *quantized* model size.
  - Unpacking runs on the VPU inside the tile: consecutive-layout planes are
    expanded with a sublane repeat + per-row shift (value k of a p-per-byte
    plane lives in byte k//p at bit (k%p)*bits), then planes are OR-combined
    into codes and dequantized against the block-repeated scale/base.
  - The MXU consumes the dequantized (TK, TN) tile against the (TM, TK)
    activation tile, accumulating in fp32 scratch across the K grid axis.
  - Q3H (3.5-bit) decodes its base-11 packed pairs into two half-K weight
    tiles (even/odd K positions) and takes two dots against pre-split
    even/odd activations, avoiding an in-kernel interleave
    (reference pair packing: src/common/quantization.h:809-926).

The public entry `quantized_matmul(x, qt)` pads/partitions shapes, falls
back to XLA dequant+matmul when the shape doesn't tile cleanly or when not
running on TPU, and is registered as the `linear()` fast path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.formats import QuantFormat, get_format
from ..quant.codec_jax import QuantizedTensor, dequantize

import os
# tile targets (tunable; see tools/kernel_bench.py sweeps)
_TK_TARGET = int(os.environ.get("INFERFLOW_TK_TARGET", "2048"))
_TN_TARGET = int(os.environ.get("INFERFLOW_TN_TARGET", "1024"))
# scale-multiply precision in the fast kernel: bf16 (fewer VPU ops) vs the
# f32 round-trip (A/B knob)
_BF16_SCALE = os.environ.get("INFERFLOW_KERNEL_BF16SCALE", "1") == "1"


def _unpack_plane(tile, bits: int, layout: str, block: int, tk: int, tn: int):
    """Expand a packed (tk/p, tn) byte tile to (tk, tn) int32 values."""
    p = 8 // bits
    mask = (1 << bits) - 1
    v = tile.astype(jnp.int32)
    if layout == "split_half":
        # ggml-style Q5_B32T1 nibbles: byte row r of block holds value r
        # (low nibble) and value r+block/2 (high nibble).
        half = block // 2
        b = v.reshape(tk // block, half, tn)
        lo = b & 0x0F
        hi = (b >> 4) & 0x0F
        return jnp.concatenate([lo, hi], axis=1).reshape(tk, tn)
    if p == 1:
        return v & mask
    rep = jnp.repeat(v, p, axis=0)  # (tk, tn): row k = byte k//p
    shifts = (jax.lax.broadcasted_iota(jnp.int32, (tk, tn), 0) % p) * bits
    return (rep >> shifts) & mask


def _combined_codes(fmt: QuantFormat, plane_tiles, k_vals: int, tn: int):
    codes = None
    shift = 0
    for spec, tile in zip(fmt.planes, plane_tiles):
        part = _unpack_plane(tile, spec.bits, spec.layout, fmt.block,
                             k_vals, tn)
        part = part << shift
        codes = part if codes is None else codes | part
        shift += spec.bits
    return codes


def _decode_f16_bits(u16):
    """f16 (as uint16 bits) -> f32, integer bit ops only.

    Mosaic has no f16 type, so fp16 scale/base planes travel as uint16 and
    are widened in-kernel (exact: f16 -> f32 is lossless).  Subnormals take
    the mant * 2^-24 path; inf/nan don't occur in quant metadata.
    """
    b = u16.astype(jnp.int32)
    exp = (b >> 10) & 0x1F
    mant = b & 0x3FF
    normal_bits = ((b & 0x8000) << 16) | ((exp + 112) << 23) | (mant << 13)
    normal = jax.lax.bitcast_convert_type(normal_bits, jnp.float32)
    sign = jnp.where((b & 0x8000) != 0, -1.0, 1.0).astype(jnp.float32)
    sub = sign * mant.astype(jnp.float32) * jnp.float32(2.0 ** -24)
    return jnp.where(exp == 0, sub, normal)


def _expand_meta(meta_tile, block_rows: int, reps: int):
    if meta_tile.dtype == jnp.uint16:
        vals = _decode_f16_bits(meta_tile)
    else:
        vals = meta_tile.astype(jnp.float32)
    return jnp.repeat(vals, reps, axis=0)


def _fast_eligible(fmt: QuantFormat) -> bool:
    """Formats eligible for the sub-plane-dot fast path: every non-pair
    format (Q8/Q6/Q5/Q4/Q3/Q2 families).  The dot is linear, so each
    bit-plane contributes its own dots with scale pre-multiplied by
    2^plane_shift: code = d + (m << s_m) + (h << s_h) implies
    w = d*sc + m*(sc<<s_m) + h*(sc<<s_h) + base.  Each of a plane's p
    sub-values per byte is extracted with one shift+mask (no sublane
    repeat / iota / big relayouts) and dotted against the matching
    k-strided activation slice — the VPU cost per weight drops from ~10
    vector ops to ~4, moving Q4 decode from ~60 to ~220 GB/s effective
    and Q8 to ~510 GB/s (near the streaming ceiling).

    Q3H's base-11 pair packing is non-linear and keeps the generic
    kernel."""
    return not fmt.pair_base11


def _x_subslices(x: jax.Array, fmt: QuantFormat, k: int):
    """Activation slices matching each (plane, sub-value) k-mapping.

    consecutive: byte i of a p-per-byte plane holds values i*p..i*p+p-1,
    so sub j covers global positions k % p == j.
    split_half (Q5_B32T1): within each block, low nibbles cover the first
    half, high nibbles the second (quantization.h:349-395)."""
    subs = []
    m = x.shape[0]
    for spec in fmt.planes:
        if spec.layout == "split_half":
            xr = x.reshape(m, k // fmt.block, fmt.block)
            half = fmt.block // 2
            subs.append(xr[:, :, :half].reshape(m, k // 2))
            subs.append(xr[:, :, half:].reshape(m, k // 2))
        else:
            p = 8 // spec.bits
            for j in range(p):
                subs.append(x[:, j::p])
    return subs


def _make_fast_kernel(fmt: QuantFormat, tm: int, tk: int, tn: int,
                      k_tiles: int, out_dtype, n_x: int,
                      upcast: bool = False):
    has_base = fmt.base_kind != "zero"
    n_planes = len(fmt.planes)

    def _dot(a, b):
        # interpret mode (CPU): this backend's DotThunk rejects bf16 x
        # bf16 -> f32, so upcast at the dot (bf16 rounding of the weights
        # is already applied; accumulation is f32 either way)
        if upcast:
            a, b = a.astype(jnp.float32), b.astype(jnp.float32)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def kernel(*refs):
        x_refs = refs[:n_x]
        plane_refs = refs[n_x:n_x + n_planes]
        scale_ref = refs[n_x + n_planes]
        base_ref = refs[n_x + n_planes + 1] if has_base else None
        out_ref = refs[n_x + n_planes + 1 + int(has_base)]
        acc_ref = refs[n_x + n_planes + 2 + int(has_base)]

        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        sc_small = _decode_f16_bits(scale_ref[:]) \
            if scale_ref.dtype == jnp.uint16 \
            else scale_ref[:].astype(jnp.float32)
        bs_small = None
        if has_base:
            bs_small = _decode_f16_bits(base_ref[:]) \
                if base_ref.dtype == jnp.uint16 \
                else base_ref[:].astype(jnp.float32)

        # VPU op budget per weight is the kernel's bottleneck (the MXU dot
        # is effectively free at decode shapes):
        #   - the HIGHEST sub-value needs no mask (upper bits are zero),
        #     the LOWEST no shift: ~1.5 ops/sub instead of 2
        #   - signed codes sign-extend with two arithmetic shifts instead
        #     of shift+mask+two-op sign fixup
        #   - codes convert int32 -> bf16 once and the scale multiply runs
        #     in bf16 (scales pre-converted per tile), dropping the
        #     f32-multiply + f32->bf16 round-trip
        xi = 0
        shift = 0
        sc_cache = {}
        for pi, spec in enumerate(fmt.planes):
            p = 8 // spec.bits
            bits = spec.bits
            mask = (1 << bits) - 1
            reps = fmt.block // p
            mult = float(1 << shift)
            if reps not in sc_cache:
                sc_cache[reps] = jnp.repeat(sc_small, reps, axis=0)
            sc = sc_cache[reps] * mult if shift else sc_cache[reps]
            if _BF16_SCALE:
                sc = sc.astype(jnp.bfloat16)
            # base folded into the FIRST plane's subs (they partition k)
            bs = None
            if has_base and pi == 0:
                bs = jnp.repeat(bs_small, reps, axis=0)
                if _BF16_SCALE:
                    bs = bs.astype(jnp.bfloat16)
            v = plane_refs[pi][:].astype(jnp.int32)
            if spec.layout == "split_half":
                sub_vals = [v & 0x0F, v >> 4]
            elif fmt.signed:
                # arithmetic-shift sign extension: place sub s at the top,
                # shift back down keeping the sign
                sub_vals = [(v << (32 - bits * (s + 1))) >> (32 - bits)
                            for s in range(p)]
            else:
                sub_vals = [v >> (bits * s) if s == p - 1
                            else ((v >> (bits * s)) & mask if s
                                  else v & mask)
                            for s in range(p)]
            for q in sub_vals:
                if _BF16_SCALE:
                    qb = q.astype(jnp.bfloat16)
                    w = qb * sc + bs if bs is not None else qb * sc
                else:
                    qf = q.astype(jnp.float32)
                    w = (qf * sc + bs if bs is not None
                         else qf * sc).astype(jnp.bfloat16)
                acc_ref[:] += _dot(x_refs[xi][:], w)
                xi += 1
            shift += spec.bits

        @pl.when(j == k_tiles - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_dtype)

    return kernel


def _make_kernel(fmt: QuantFormat, tm: int, tk: int, tn: int, k_tiles: int,
                 out_dtype, pair8: bool = False, upcast: bool = False):
    n_planes = 1 if pair8 else len(fmt.planes)
    has_base = fmt.base_kind != "zero"
    pair = fmt.pair_base11

    def _dot(a, b):
        if upcast:  # see _make_fast_kernel
            a, b = a.astype(jnp.float32), b.astype(jnp.float32)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def kernel(*refs):
        if pair:
            x_even_ref, x_odd_ref = refs[0], refs[1]
            plane_refs = refs[2:2 + n_planes]
            rest = refs[2 + n_planes:]
        else:
            x_ref = refs[0]
            plane_refs = refs[1:1 + n_planes]
            rest = refs[1 + n_planes:]
        scale_ref = rest[0]
        base_ref = rest[1] if has_base else None
        out_ref = rest[1 + int(has_base)]
        acc_ref = rest[2 + int(has_base)]

        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if pair:
            # base-11 pair codes over K/2 pair positions
            if pair8:
                # fast device layout: one byte per pair (repack_pair8)
                codes = plane_refs[0][:].astype(jnp.int32)
            else:
                codes = _combined_codes(fmt, [r[:] for r in plane_refs],
                                        tk // 2, tn)
            pf = codes.astype(jnp.float32)
            v1 = jnp.floor((pf + 0.5) * (1.0 / 11.0))  # exact for 0..120
            v0 = pf - 11.0 * v1
            reps = fmt.block // 2
            sc = _expand_meta(scale_ref[:], tk // fmt.block, reps)
            bs = _expand_meta(base_ref[:], tk // fmt.block, reps)
            w_even = (v0 * sc + bs).astype(jnp.bfloat16)
            w_odd = (v1 * sc + bs).astype(jnp.bfloat16)
            acc_ref[:] += _dot(x_even_ref[:], w_even)
            acc_ref[:] += _dot(x_odd_ref[:], w_odd)
        else:
            codes = _combined_codes(fmt, [r[:] for r in plane_refs], tk, tn)
            if fmt.signed:
                codes = codes - ((codes >> 7) << 8)  # int8 reinterpret
            q = codes.astype(jnp.float32)
            sc = _expand_meta(scale_ref[:], tk // fmt.block, fmt.block)
            if has_base:
                bs = _expand_meta(base_ref[:], tk // fmt.block, fmt.block)
                w = q * sc + bs
            else:
                w = q * sc
            acc_ref[:] += _dot(x_ref[:], w.astype(jnp.bfloat16))

        @pl.when(j == k_tiles - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_dtype)

    return kernel


def _make_i4_kernel(fmt: QuantFormat, tk: int, k_tiles: int, out_dtype,
                    upcast: bool = False):
    """Packed-int4 plane (device_layout='i4', codec_jax.repack_i4):
    'data_i4p' byte row r holds values 2r/2r+1 as signed code-8 nibbles;
    pltpu.bitcast reinterprets the (tk/2, tn) uint8 tile as (tk, tn)
    int4 rows in register.  Unpack is ONE convert; the +8 and the block
    base fold into a per-block additive term expanded alongside the
    scales: w = q*sc + (base + 8*sc)."""
    has_base = fmt.base_kind != "zero"

    def _dot(a, b):
        if upcast:  # see _make_fast_kernel
            a, b = a.astype(jnp.float32), b.astype(jnp.float32)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def kernel(*refs):
        x_ref, plane_ref, scale_ref = refs[0], refs[1], refs[2]
        base_ref = refs[3] if has_base else None
        out_ref = refs[3 + int(has_base)]
        acc_ref = refs[4 + int(has_base)]

        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        sc_small = _decode_f16_bits(scale_ref[:])  # (tk/blk, tn) f32
        fold_small = sc_small * 8.0
        if has_base:
            fold_small = fold_small + _decode_f16_bits(base_ref[:])
        reps = fmt.block
        sc = jnp.repeat(sc_small, reps, axis=0)
        fold = jnp.repeat(fold_small, reps, axis=0)
        q = pltpu.bitcast(plane_ref[:], jnp.int4).astype(jnp.float32)
        w = (q * sc + fold).astype(jnp.bfloat16)
        acc_ref[:] += _dot(x_ref[:], w)

        @pl.when(j == k_tiles - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_dtype)

    return kernel


def _pick_tile(dim: int, target: int, unit: int) -> Optional[int]:
    """Largest t <= target with unit | t and t | dim."""
    t = min(target, dim)
    t -= t % unit
    while t >= unit:
        if dim % t == 0:
            return t
        t -= unit
    return None


def _tk_unit(fmt: QuantFormat, pair8: bool = False,
             i4: bool = False) -> int:
    """K-tile granularity = lcm of every alignment constraint:

    - activation sub-slice width must be a 128 (lane) multiple:
      tk/p per plane sub-sampling p (fast path), tk/2 for pair formats
    - packed plane tile rows must be an 8 (sublane) multiple:
      tk/(per*p) where per=2 for pair-coded formats
    - scale/base tile rows must be an 8 multiple: tk/block
    """
    import math
    per = 2 if fmt.pair_base11 else 1
    units = [8 * fmt.block]  # scale/base rows
    if i4:
        # whole-x lane width + packed uint8 plane rows (tk/2 must be a
        # sublane multiple); no sub-slices
        units += [128, 16]
    elif pair8:
        units += [256, 8 * 2]  # x_even/x_odd widths; byte-per-pair rows
    elif fmt.pair_base11:
        units.append(256)  # x_even/x_odd widths (generic pair kernel)
        for spec in fmt.planes:
            p = 2 if spec.layout == "split_half" else 8 // spec.bits
            units.append(8 * per * p)
    else:
        for spec in fmt.planes:
            p = 2 if spec.layout == "split_half" else 8 // spec.bits
            units.append(128 * p)  # x sub-slice width
            units.append(8 * p)    # plane rows
    unit = 1
    for u in units:
        unit = math.lcm(unit, u)
    return unit


@functools.partial(jax.jit, static_argnames=("fmt_name", "k", "n",
                                              "plane_names", "interpret"))
def _pallas_matmul(x, planes_flat, scale, base, *, fmt_name: str, k: int,
                   n: int, plane_names, interpret: bool = False):
    fmt = get_format(fmt_name)
    m = x.shape[0]
    out_dtype = x.dtype

    tm = max(16, min(256, ((m + 15) // 16) * 16))
    pair8_layout = fmt.pair_base11 and "pair8" in plane_names
    i4_layout = "data_i4p" in plane_names
    # tk == k is always alignment-safe (every sub-slice is full-width)
    tk = _pick_tile(k, _TK_TARGET, _tk_unit(fmt, pair8_layout, i4_layout)) \
        or (k if k <= 8192 else None)
    tn = _pick_tile(n, _TN_TARGET, 128)
    m_pad = ((m + tm - 1) // tm) * tm
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    m_tiles, n_tiles, k_tiles = m_pad // tm, n // tn, k // tk

    planes = dict(zip(plane_names, planes_flat))

    in_specs = []
    inputs = []
    if i4_layout:
        kernel = _make_i4_kernel(fmt, tk, k_tiles, out_dtype,
                                 upcast=interpret)
        in_specs.append(pl.BlockSpec((tm, tk), lambda i, nn, j: (i, j),
                                     memory_space=pltpu.VMEM))
        inputs.append(x.astype(jnp.bfloat16))
        in_specs.append(pl.BlockSpec((tk // 2, tn), lambda i, nn, j: (j, nn),
                                     memory_space=pltpu.VMEM))
        inputs.append(planes["data_i4p"])
        meta_rows = tk // fmt.block
        meta_spec = pl.BlockSpec((meta_rows, tn), lambda i, nn, j: (j, nn),
                                 memory_space=pltpu.VMEM)

        def _meta4(a):
            if a.dtype == jnp.float16:
                return jax.lax.bitcast_convert_type(a, jnp.uint16)
            return a

        in_specs.append(meta_spec)
        inputs.append(_meta4(scale))
        if base is not None:
            in_specs.append(meta_spec)
            inputs.append(_meta4(base))
        bytes_in = sum(int(a.size) * a.dtype.itemsize for a in inputs)
        out = pl.pallas_call(
            kernel,
            grid=(m_tiles, n_tiles, k_tiles),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tm, tn), lambda i, nn, j: (i, nn),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * m_pad * n * k,
                bytes_accessed=bytes_in + m_pad * n * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*inputs)
        return out[:m] if m_pad != m else out
    if _fast_eligible(fmt):
        x_subs = _x_subslices(x.astype(jnp.bfloat16), fmt, k)
        kernel = _make_fast_kernel(fmt, tm, tk, tn, k_tiles, out_dtype,
                                   n_x=len(x_subs), upcast=interpret)
        for spec in fmt.planes:
            p = 8 // spec.bits
            n_subs = 2 if spec.layout == "split_half" else p
            spec_x = pl.BlockSpec((tm, tk // p), lambda i, nn, j: (i, j),
                                  memory_space=pltpu.VMEM)
            for _ in range(n_subs):
                in_specs.append(spec_x)
            for _ in range(n_subs):
                inputs.append(x_subs[len(inputs)])
        for spec in fmt.planes:
            p = 8 // spec.bits
            in_specs.append(pl.BlockSpec((tk // p, tn),
                                         lambda i, nn, j, p=p: (j, nn),
                                         memory_space=pltpu.VMEM))
            inputs.append(planes[spec.name])
        meta_rows = tk // fmt.block
        meta_spec = pl.BlockSpec((meta_rows, tn), lambda i, nn, j: (j, nn),
                                 memory_space=pltpu.VMEM)

        def _meta(a):
            if a.dtype == jnp.float16:
                return jax.lax.bitcast_convert_type(a, jnp.uint16)
            return a

        in_specs.append(meta_spec)
        inputs.append(_meta(scale))
        if base is not None:
            in_specs.append(meta_spec)
            inputs.append(_meta(base))
        bytes_in = sum(int(a.size) * a.dtype.itemsize for a in inputs)
        out = pl.pallas_call(
            kernel,
            grid=(m_tiles, n_tiles, k_tiles),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tm, tn), lambda i, nn, j: (i, nn),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * m_pad * n * k,
                bytes_accessed=bytes_in + m_pad * n * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*inputs)
        return out[:m] if m_pad != m else out

    pair8 = fmt.pair_base11 and "pair8" in planes
    kernel = _make_kernel(fmt, tm, tk, tn, k_tiles, out_dtype, pair8=pair8,
                          upcast=interpret)
    if fmt.pair_base11:
        x_even = x[:, 0::2]
        x_odd = x[:, 1::2]
        spec_x = pl.BlockSpec((tm, tk // 2), lambda i, nn, j: (i, j),
                              memory_space=pltpu.VMEM)
        in_specs += [spec_x, spec_x]
        inputs += [x_even.astype(jnp.bfloat16), x_odd.astype(jnp.bfloat16)]
        pair_div = 2
    else:
        in_specs.append(pl.BlockSpec((tm, tk), lambda i, nn, j: (i, j),
                                     memory_space=pltpu.VMEM))
        inputs.append(x.astype(jnp.bfloat16))
        pair_div = 1

    if pair8:
        in_specs.append(pl.BlockSpec((tk // 2, tn),
                                     lambda i, nn, j: (j, nn),
                                     memory_space=pltpu.VMEM))
        inputs.append(planes["pair8"])
    else:
        for spec in fmt.planes:
            p = 8 // spec.bits
            rows = tk // pair_div // p
            in_specs.append(pl.BlockSpec((rows, tn),
                                         lambda i, nn, j: (j, nn),
                                         memory_space=pltpu.VMEM))
            inputs.append(planes[spec.name])

    meta_rows = tk // fmt.block
    meta_spec = pl.BlockSpec((meta_rows, tn), lambda i, nn, j: (j, nn),
                             memory_space=pltpu.VMEM)

    def _meta(a):
        # Mosaic has no f16: ship fp16 metadata as uint16 bits
        if a.dtype == jnp.float16:
            return jax.lax.bitcast_convert_type(a, jnp.uint16)
        return a

    in_specs.append(meta_spec)
    inputs.append(_meta(scale))
    if base is not None:
        in_specs.append(meta_spec)
        inputs.append(_meta(base))

    bytes_in = sum(int(a.size) * a.dtype.itemsize for a in inputs)
    out = pl.pallas_call(
        kernel,
        grid=(m_tiles, n_tiles, k_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, nn, j: (i, nn),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=bytes_in + m_pad * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    return out[:m] if m_pad != m else out


def _tileable(fmt: QuantFormat, k: int, n: int,
              pair8: bool = False, i4: bool = False) -> bool:
    tk = _pick_tile(k, _TK_TARGET, _tk_unit(fmt, pair8, i4)) \
        or (k if k <= 8192 else None)
    return tk is not None and _pick_tile(n, _TN_TARGET, 128) is not None


def storage_k(qt: QuantizedTensor) -> int:
    """Stored K rows (>= logical K when the tensor was padded for tiling)."""
    fmt = get_format(qt.format)
    return int(qt.scale.shape[-2]) * fmt.block


def pad_weight_for_tpu(qt: QuantizedTensor) -> QuantizedTensor:
    """Pad a quantized tensor's K storage up to the kernel's K-tile unit.

    Awkward K values (e.g. llama2-7b's intermediate 11008 = 256*43) have no
    tile satisfying every alignment constraint, which forced the XLA
    dequantize fallback — materializing the full bf16 weight per step.
    Padding K to a multiple of the tile unit costs a few % extra HBM but
    keeps every matmul on the fused kernel.  Pad blocks carry scale=0 /
    base=0, so they dequantize to exact zeros and contribute nothing; the
    logical shape is unchanged (quantized_matmul zero-pads x to match).
    """
    fmt = get_format(qt.format)
    k, n = int(qt.shape[-2]), int(qt.shape[-1])
    pair8 = fmt.pair_base11 and "pair8" in qt.planes
    if _tileable(fmt, k, n, pair8):
        return qt
    unit = _tk_unit(fmt, pair8)
    k_s = storage_k(qt)
    target = ((k_s + unit - 1) // unit) * unit
    if target == k_s or not _tileable(fmt, target, n, pair8):
        return qt  # padding can't help (e.g. N untileable)

    def padk(arr, rows_per_k_num: int, rows_per_k_den: int):
        pad = (target - k_s) * rows_per_k_num // rows_per_k_den
        widths = [(0, 0)] * (arr.ndim - 2) + [(0, pad), (0, 0)]
        return jnp.pad(arr, widths)

    planes = {}
    for name, p in qt.planes.items():
        rows = int(p.shape[-2])
        planes[name] = padk(p, rows, k_s)
    scale = padk(qt.scale, 1, fmt.block)
    base = None if qt.base is None else padk(qt.base, 1, fmt.block)
    return QuantizedTensor(qt.format, qt.shape, planes, scale, base)


def quantized_matmul(x: jax.Array, qt: QuantizedTensor) -> jax.Array:
    """y = x @ dequant(qt); x: (..., K). Pallas on TPU, XLA fallback else."""
    fmt = get_format(qt.format)
    k, n = int(qt.shape[-2]), int(qt.shape[-1])
    k_s = storage_k(qt)
    lead = x.shape[:-1]
    pair8 = fmt.pair_base11 and "pair8" in qt.planes
    i4 = "data_i4p" in qt.planes
    use_pallas = (jax.default_backend() == "tpu"
                  and _tileable(fmt, k_s, n, pair8, i4))
    if not use_pallas:
        wd = dequantize(qt, x.dtype)
        if jax.default_backend() != "tpu":
            # CPU DotThunk rejects bf16 x bf16 -> f32 at gemv shapes
            return jnp.matmul(x.astype(jnp.float32),
                              wd.astype(jnp.float32)).astype(x.dtype)
        return jnp.matmul(x, wd, preferred_element_type=jnp.float32
                          ).astype(x.dtype)
    x2 = x.reshape(-1, k)
    if k_s != k:  # K-padded storage: pad activations with zeros to match
        x2 = jnp.pad(x2, ((0, 0), (0, k_s - k)))
    names = sorted(qt.planes)
    out = _pallas_matmul(x2, tuple(qt.planes[nm] for nm in names),
                         qt.scale, qt.base, fmt_name=qt.format, k=k_s, n=n,
                         plane_names=tuple(names))
    return out.reshape(lead + (n,))


def quantized_matmul_interpret(x: jax.Array, qt: QuantizedTensor) -> jax.Array:
    """Interpreter-mode kernel run (CPU correctness tests)."""
    fmt = get_format(qt.format)
    k, n = int(qt.shape[-2]), int(qt.shape[-1])
    k_s = storage_k(qt)
    if not _tileable(fmt, k_s, n,
                     fmt.pair_base11 and "pair8" in qt.planes,
                     "data_i4p" in qt.planes):
        wd = dequantize(qt, x.dtype)
        return jnp.matmul(x.astype(jnp.float32), wd.astype(jnp.float32)
                          ).astype(x.dtype)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k)
    if k_s != k:
        x2 = jnp.pad(x2, ((0, 0), (0, k_s - k)))
    names = sorted(qt.planes)
    out = _pallas_matmul(x2, tuple(qt.planes[nm] for nm in names),
                         qt.scale, qt.base, fmt_name=qt.format, k=k_s, n=n,
                         plane_names=tuple(names), interpret=True)
    return out.reshape(lead + (n,))


def register_default():
    from ..ops.linear import register_pallas_matmul
    register_pallas_matmul(quantized_matmul)
