"""Native C++ codec must be byte-identical to codec_np for every format."""

import numpy as np
import pytest

from inferflow_tpu.quant import codec_np
from inferflow_tpu.quant.codec_native import (quantize_native,
                                              native_available, FMT_IDS)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native codec unavailable (no g++?)")


@pytest.mark.parametrize("fmt", sorted(FMT_IDS))
def test_native_matches_numpy(fmt):
    rng = np.random.default_rng(abs(hash(fmt)) % (2 ** 31))
    from inferflow_tpu.quant.formats import get_format
    f = get_format(fmt)
    k, n = f.block * 4, 24
    x = rng.standard_normal((k, n)).astype(np.float16).astype(np.float32)
    if f.meta == "u8":
        x *= 0.25
    a = quantize_native(x, fmt)
    b = codec_np.quantize_np(x, fmt)
    assert a is not None
    for name, plane in b["planes"].items():
        np.testing.assert_array_equal(a["planes"][name], plane,
                                      err_msg=f"{fmt}.{name}")
    np.testing.assert_array_equal(
        np.asarray(a["scale"]).view(np.uint16)
        if a["scale"].dtype == np.float16 else a["scale"],
        np.asarray(b["scale"]).view(np.uint16)
        if b["scale"].dtype == np.float16 else b["scale"],
        err_msg=f"{fmt}.scale")
    if b["base"] is not None:
        np.testing.assert_allclose(
            np.asarray(a["base"], np.float32),
            np.asarray(b["base"], np.float32), atol=0,
            err_msg=f"{fmt}.base")


def test_native_dtype_helpers():
    from inferflow_tpu.quant.codec_native import _load_lib
    import ctypes
    lib = _load_lib()
    rng = np.random.default_rng(0)
    vals = rng.standard_normal(64).astype(np.float16)
    out = np.empty(64, np.float32)
    lib.f16_to_f32_buf(vals.ctypes.data_as(ctypes.c_void_p),
                       out.ctypes.data_as(ctypes.c_void_p), 64)
    np.testing.assert_array_equal(out, vals.astype(np.float32))

    f32 = rng.standard_normal(64).astype(np.float32)
    bf16 = (f32.view(np.uint32) >> 16).astype(np.uint16)
    lib.bf16_to_f32_buf(bf16.ctypes.data_as(ctypes.c_void_p),
                        out.ctypes.data_as(ctypes.c_void_p), 64)
    np.testing.assert_array_equal(out.view(np.uint32),
                                  bf16.astype(np.uint32) << 16)
