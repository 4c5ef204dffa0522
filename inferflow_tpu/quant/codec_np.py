"""Bit-exact numpy reference codecs for every quantization format.

These mirror the quantize/dequantize math of the reference engine
(reference: src/common/quantization.h, quantization.cc) and serve as the
ground truth for the JAX/Pallas implementations.  Block semantics, rounding
modes, fp16 metadata encoding, and plane bit layouts are value-identical to
the reference; the storage layout is plane-separated (struct-of-arrays), see
formats.py.

A quantized 2-D tensor of logical shape (K, N), blocks along K:
  planes:  {'data': u8[K/p, N], 'data_m': ..., 'data_h': ...}
  scale:   f16[K/block, N]  (f32 for u8-meta formats, holding decoded values)
  base:    f16[K/block, N]  (absent for symmetric formats)
"""

from __future__ import annotations

import numpy as np

from .formats import FORMATS, QuantFormat, get_format


def _f16(x):
    return np.float16(x)


def _encode_scale_u8(scale):
    """EncodeScale/DecodeScale roundtrip (quantization.h:43-51)."""
    u8 = np.clip(np.trunc(scale * 1000.0 + 0.5), 0, 255).astype(np.uint8)
    return u8.astype(np.float32) / 1000.0


def _encode_base_u8(base):
    """EncodeBase/DecodeBase roundtrip (quantization.h:54-62)."""
    u8 = (np.trunc(base * 100.0 + 100.5).astype(np.int64) & 0xFF).astype(np.uint8)
    return u8.astype(np.float32) / 100.0 - 1.0


def _adjust_base(base):
    """AdjustBase (quantization.h:64-68)."""
    u8 = (np.trunc(base * 100.0 + 100.01).astype(np.int64) & 0xFF).astype(np.uint8)
    return u8.astype(np.float32) / 100.0 - 1.0


def pack_plane(values: np.ndarray, bits: int, layout: str = "consecutive",
               block: int = 0) -> np.ndarray:
    """Pack per-value (or per-pair) codes into bytes along axis 0.

    'consecutive': byte j holds values [j*p, (j+1)*p), low bits first — the
    ordering used by the reference's data/data_m/data_h members.
    'split_half': ggml-style Q5_B32T1 nibbles — within each block, byte i
    holds value i (low nibble) and value i + block/2 (high nibble)
    (quantization.h:349-395).
    """
    p = 8 // bits
    k, n = values.shape
    v = values.astype(np.uint16)
    if layout == "split_half":
        half = block // 2
        v = v.reshape(k // block, block, n)
        lo, hi = v[:, :half], v[:, half:]
        packed = (lo | (hi << 4)).reshape(k // 2, n)
        return packed.astype(np.uint8)
    v = v.reshape(k // p, p, n)
    out = np.zeros((k // p, n), dtype=np.uint16)
    for i in range(p):
        out |= v[:, i] << (i * bits)
    return out.astype(np.uint8)


def unpack_plane(packed: np.ndarray, bits: int, layout: str = "consecutive",
                 block: int = 0) -> np.ndarray:
    p = 8 // bits
    rows, n = packed.shape
    mask = (1 << bits) - 1
    if layout == "split_half":
        half = block // 2
        b = packed.reshape(rows * 2 // block, half, n)
        lo = b & 0x0F
        hi = b >> 4
        return np.concatenate([lo, hi], axis=1).reshape(rows * 2, n).astype(np.uint8)
    out = np.zeros((rows, p, n), dtype=np.uint8)
    for i in range(p):
        out[:, i] = (packed >> (i * bits)) & mask
    return out.reshape(rows * p, n)


def _codes_to_planes(codes: np.ndarray, fmt: QuantFormat) -> dict:
    planes = {}
    shift = 0
    for p in fmt.planes:
        part = (codes >> shift) & ((1 << p.bits) - 1)
        planes[p.name] = pack_plane(part, p.bits, p.layout, fmt.block)
        shift += p.bits
    return planes


def _planes_to_codes(planes: dict, fmt: QuantFormat, k: int) -> np.ndarray:
    codes = None
    shift = 0
    for p in fmt.planes:
        part = unpack_plane(planes[p.name], p.bits, p.layout, fmt.block)
        part = part.astype(np.int32) << shift
        codes = part if codes is None else codes | part
        shift += p.bits
    return codes


def quantize_np(x: np.ndarray, fmt_name: str) -> dict:
    """Quantize a (K, N) fp array; blocks along K (axis 0).

    Returns {'format', 'shape', 'planes', 'scale', 'base'}.
    Mirrors QuantizeRow_* of the reference (quantization.h) including the
    inv_scale-from-unrounded-fp32-scale detail and per-variant rounding.
    """
    fmt = get_format(fmt_name)
    k, n = x.shape
    if k % fmt.block != 0:
        raise ValueError(f"K={k} not a multiple of block={fmt.block} for {fmt.name}")
    xb = x.astype(np.float32).reshape(k // fmt.block, fmt.block, n)
    vmin = xb.min(axis=1)  # (nb, n)
    vmax = xb.max(axis=1)

    if fmt.base_kind == "zero":  # Q8_B32T2 symmetric
        m0 = np.maximum(np.abs(vmin), np.abs(vmax))
        scale = m0 / fmt.scale_div
        inv_scale = np.where(scale >= 1e-5, 1.0 / np.where(scale == 0, 1, scale), 0.0)
        scale_f16 = _f16(scale)
        qf = xb * inv_scale[:, None, :]
        q = np.trunc(qf + np.copysign(0.5, qf))  # C round(): half away from zero
        q = np.clip(q, -128, 127).astype(np.int32)
        codes = (q & 0xFF).astype(np.int32)  # store two's complement in planes
        planes = _codes_to_planes(codes.reshape(k, n), fmt)
        return {"format": fmt.name, "shape": (k, n), "planes": planes,
                "scale": scale_f16, "base": None}

    base_for_quant = vmin
    if fmt.adjust_base:
        base_for_quant = _adjust_base(vmin)

    scale = (vmax - base_for_quant) / fmt.scale_div
    inv_scale = np.where(scale >= 1e-5, 1.0 / np.where(scale == 0, 1, scale), 0.0)

    if fmt.base_kind == "mid":
        stored_base = base_for_quant + 0.5 * scale
    else:
        stored_base = base_for_quant

    if fmt.meta == "u8":
        scale_stored = _encode_scale_u8(scale)
        base_stored = _encode_base_u8(stored_base)
    else:
        scale_stored = _f16(scale)
        base_stored = _f16(stored_base)

    qf = (xb - base_for_quant[:, None, :]) * inv_scale[:, None, :]
    if fmt.rounding == "half_up":
        q = np.trunc(qf + 0.5)
    elif fmt.rounding == "trunc_eps":
        q = np.trunc(qf + 0.0001)
    else:
        q = np.trunc(qf + np.copysign(0.5, qf))
    if fmt.pair_base11:
        # Q3H clamps negatives to 0 explicitly (quantization.h:893-895)
        q = np.clip(q, 0, fmt.max_code)
    else:
        # The reference casts to uint32 before its max clamp, so a negative
        # offset (possible after AdjustBase) wraps huge and clamps to
        # max_code on the host quantize path (quantization.h:570-573,699-702).
        q = np.where(q < 0, fmt.max_code, np.minimum(q, fmt.max_code))
    q = q.astype(np.int32).reshape(k, n)

    if fmt.pair_base11:
        # Q3H: pack value pairs base-11 into 7-bit codes (quantization.h:855-926)
        q = q.reshape(k // 2, 2, n)
        pair = q[:, 0] + 11 * q[:, 1]  # (K/2, N), range [0, 120]
        planes = _codes_to_planes(pair, fmt)
    else:
        planes = _codes_to_planes(q, fmt)

    return {"format": fmt.name, "shape": (k, n), "planes": planes,
            "scale": scale_stored, "base": base_stored}


def repack_pair8(qt: dict) -> dict:
    """Re-pack a pair-coded (Q3H) tensor's three bit-planes into ONE
    byte-per-pair plane for the device (4.5 effective bits instead of 4.0,
    but the unpack collapses to a single byte load) — the wire format on
    disk keeps the 3.5-bit packing.  Bit content is identical."""
    fmt = get_format(qt["format"])
    if not fmt.pair_base11:
        return qt
    k, n = qt["shape"]
    pair = _planes_to_codes(qt["planes"], fmt, k // 2).astype(np.uint8)
    return dict(qt, planes={"pair8": pair})


def dequantize_np(qt: dict) -> np.ndarray:
    """Dequantize to float32. Mirrors DequantizeQ* (quantization.h)."""
    fmt = get_format(qt["format"])
    k, n = qt["shape"]
    scale = qt["scale"].astype(np.float32)  # (nb, n)

    if fmt.base_kind == "zero":
        codes = _planes_to_codes(qt["planes"], fmt, k)
        q = codes.astype(np.int32)
        q = np.where(q >= 128, q - 256, q)  # undo two's complement
        sc = np.repeat(scale, fmt.block, axis=0)
        return q.astype(np.float32) * sc

    base = qt["base"].astype(np.float32)
    if fmt.pair_base11:
        if "pair8" in qt["planes"]:
            pair = qt["planes"]["pair8"].astype(np.int32)
        else:
            pair = _planes_to_codes(qt["planes"], fmt, k // 2)  # (K/2, N)
        v0 = pair % 11
        v1 = pair // 11
        q = np.stack([v0, v1], axis=1).reshape(k, n)
    else:
        q = _planes_to_codes(qt["planes"], fmt, k)
    sc = np.repeat(scale, fmt.block, axis=0)
    bs = np.repeat(base, fmt.block, axis=0)
    return q.astype(np.float32) * sc + bs


def quantize_q8_linear_np(x: np.ndarray, z: float, scale1: float, scale2: float):
    """Whole-tensor 8-bit linear quant (quantization.cc:10-36)."""
    v = x.astype(np.float32)
    q_pos = np.minimum(127, np.trunc((v - z + scale1 / 2) / scale1)).astype(np.int64)
    q_neg = np.minimum(127, np.trunc((z - v + scale2 / 2) / scale2)).astype(np.int64)
    return np.where(v >= z, q_pos, 128 + q_neg).astype(np.uint8)


def dequantize_q8_linear_np(q: np.ndarray, z: float, scale1: float, scale2: float):
    qi = q.astype(np.int32)
    return np.where(qi >= 128, z - (qi - 128) * scale2, z + qi * scale1).astype(np.float32)


def quantize_q8_log_np(x: np.ndarray, base: float = 1.1, scale: int = 1000,
                       start: int = 10):
    """Whole-tensor 8-bit log quant (quantization.cc:63-91)."""
    v0 = x.astype(np.float32)
    sign = np.where(v0 >= 0, 1, -1)
    v = v0 * float(scale) * sign
    q_log = np.trunc(0.5 + start + np.log(np.maximum(v, 1e-30)) / np.log(base))
    q_lin = np.trunc(0.5 + v * start)
    q = np.where(v >= 0.99, q_log, q_lin)
    q = np.minimum(127, q).astype(np.int64)
    return (128 + q * sign).astype(np.uint8)


def dequantize_q8_log_np(q: np.ndarray, base: float = 1.1, scale: int = 1000,
                         start: int = 10):
    qi = q.astype(np.int32)
    sign = np.where(qi >= 128, 1, -1)
    num = np.where(qi >= 128, qi - 128, 128 - qi)
    v_log = np.power(base, (num - start).astype(np.float32)) / scale
    v_lin = num.astype(np.float32) / scale
    v = np.where(num >= start, v_log, v_lin)
    return (v * sign).astype(np.float32)
