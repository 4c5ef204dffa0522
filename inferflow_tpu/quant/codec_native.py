"""ctypes binding for the native C++ quantization codec.

The TPU analog of the reference's DeviceTensorBuilder quantize threads
(src/tensor/device_tensor_builder.cu): weight matrices are quantized by
native/quant_codec.cc (multithreaded C++) during load.  Falls back to
codec_np transparently when the shared library isn't built.

Build (done automatically on first use):
  g++ -O3 -std=c++17 -shared -fPIC -pthread native/quant_codec.cc \
      -o native/libquantcodec.so
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from .formats import get_format
from . import codec_np

# id order must match kFormats in native/quant_codec.cc
FMT_IDS = {
    "Q8_B32T1": 0, "Q8_B32T2": 1, "Q6_B64T1": 2, "Q5_B64T1": 3,
    "Q5_B32T1": 4, "Q4_B64T1": 5, "Q4_B32T1A": 6, "Q4_B32T1B": 7,
    "Q4_B32T2": 8, "Q4_B16": 9, "Q3H_B64T1": 10, "Q3_B32T1A": 11,
    "Q3_B32T1B": 12, "Q2_B32T1A": 13, "Q2_B32T1B": 14,
}

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libquantcodec.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "quant_codec.cc")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load_lib():
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.isfile(_LIB_PATH) or (
                    os.path.isfile(_SRC_PATH)
                    and os.path.getmtime(_SRC_PATH)
                    > os.path.getmtime(_LIB_PATH)):
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-pthread", _SRC_PATH, "-o", _LIB_PATH],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.quantize_f32.restype = ctypes.c_int
            lib.quantize_f32.argtypes = [
                ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int]
            for fn in ("f16_to_f32_buf", "bf16_to_f32_buf"):
                getattr(lib, fn).restype = None
                getattr(lib, fn).argtypes = [ctypes.c_void_p,
                                             ctypes.c_void_p,
                                             ctypes.c_int64]
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _build_failed = True
        return _lib


def native_available() -> bool:
    return _load_lib() is not None


def quantize_native(x: np.ndarray, fmt_name: str,
                    n_threads: int = 0) -> Optional[dict]:
    """Quantize (K, N) float array via the native codec; byte-identical to
    codec_np.quantize_np.  Returns None when the native lib is unavailable
    or the format is unsupported (caller falls back)."""
    fmt = get_format(fmt_name)
    fmt_id = FMT_IDS.get(fmt.name)
    lib = _load_lib()
    if lib is None or fmt_id is None:
        return None
    k, n = x.shape
    if k % fmt.block != 0:
        return None
    xf = np.ascontiguousarray(x, dtype=np.float32)
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)

    per = 2 if fmt.pair_base11 else 1
    planes = {}
    ptrs = {"data": None, "data_m": None, "data_h": None}
    for p in fmt.planes:
        vpb = 8 // p.bits
        rows = k // per // vpb
        arr = np.empty((rows, n), dtype=np.uint8)
        planes[p.name] = arr
        ptrs[p.name] = arr.ctypes.data_as(ctypes.c_void_p)
    nb = k // fmt.block
    if fmt.meta == "u8":
        scale = np.empty((nb, n), dtype=np.float32)
        base = np.empty((nb, n), dtype=np.float32)
    else:
        scale = np.empty((nb, n), dtype=np.uint16)
        base = (None if fmt.base_kind == "zero"
                else np.empty((nb, n), dtype=np.uint16))
    rc = lib.quantize_f32(
        fmt_id, xf.ctypes.data_as(ctypes.c_void_p), k, n,
        ptrs["data"], ptrs["data_m"], ptrs["data_h"],
        scale.ctypes.data_as(ctypes.c_void_p),
        base.ctypes.data_as(ctypes.c_void_p) if base is not None else None,
        n_threads)
    if rc != 0:
        return None
    if fmt.meta != "u8":
        scale = scale.view(np.float16)
        base = base.view(np.float16) if base is not None else None
    return {"format": fmt.name, "shape": (k, n), "planes": planes,
            "scale": scale, "base": base}


def quantize(x: np.ndarray, fmt_name: str, n_threads: int = 0) -> dict:
    """Native codec with codec_np fallback."""
    out = quantize_native(x, fmt_name, n_threads)
    if out is None:
        out = codec_np.quantize_np(x, fmt_name)
    return out
