"""Fused dequant-matmul Pallas kernel vs the XLA dequant+matmul reference.

Runs the kernel in interpreter mode on CPU (the numerics path is identical
to the TPU compile; Mosaic lowering is exercised by bench/verify on real
hardware).  Mirrors the reference's kernel-vs-reference comparison
methodology (reference: src/tensor/tensor_util.h:76-89 Rmsd/NormRmsd).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inferflow_tpu.quant import codec_np
from inferflow_tpu.quant.codec_jax import QuantizedTensor, dequantize
from inferflow_tpu.kernels.dequant_matmul import quantized_matmul_interpret

FORMATS = ["Q8_B32T1", "Q8_B32T2", "Q6_B64T1", "Q5_B64T1", "Q5_B32T1",
           "Q4_B64T1", "Q4_B32T1A", "Q4_B32T1B", "Q4_B32T2", "Q4_B16",
           "Q3H_B64T1", "Q3_B32T1A", "Q2_B32T1A"]


def _norm_rmsd(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = np.sqrt(np.mean(a * a)) + np.sqrt(np.mean(b * b)) + 1e-12
    return np.sqrt(np.mean((a - b) ** 2)) / (denom / 2)


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("m", [1, 5])
def test_kernel_matches_xla_dequant(fmt, m, rng):
    k, n = 256, 256
    w = rng.standard_normal((k, n), dtype=np.float32).astype(np.float16)
    qt = QuantizedTensor.from_np(codec_np.quantize_np(w, fmt))

    x = rng.standard_normal((m, k), dtype=np.float32) * 0.2
    xj = jnp.asarray(x, jnp.bfloat16)

    ref = jnp.matmul(xj, dequantize(qt, jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    got = quantized_matmul_interpret(xj, qt)

    assert got.shape == (m, n)
    assert _norm_rmsd(got.astype(jnp.float32), ref) < 2e-2


def test_kernel_batched_leading_dims(rng):
    k, n = 128, 128
    w = rng.standard_normal((k, n), dtype=np.float32).astype(np.float16)
    qt = QuantizedTensor.from_np(codec_np.quantize_np(w, "Q4_B64T1"))
    x = jnp.asarray(rng.standard_normal((2, 3, k), dtype=np.float32),
                    jnp.bfloat16)
    got = quantized_matmul_interpret(x, qt)
    ref = jnp.matmul(x, dequantize(qt, jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    assert got.shape == (2, 3, n)
    assert _norm_rmsd(got.astype(jnp.float32), ref) < 2e-2


@pytest.mark.parametrize("m", [1, 5])
def test_i4_prefill_kernel_matches_xla_dequant(m, rng):
    """device_layout='i4' prefill path (_make_i4_kernel): the native-int4
    plane through the Pallas matmul vs XLA dequant."""
    from inferflow_tpu.quant.codec_jax import quantize, repack_i4
    from inferflow_tpu.kernels.dequant_matmul import pad_weight_for_tpu
    k, n = 256, 256
    w = jnp.asarray(rng.standard_normal((k, n), dtype=np.float32) * 0.1)
    qi = repack_i4(pad_weight_for_tpu(quantize(w, "Q4_B64T1")))
    assert "data_i4p" in qi.planes

    x = jnp.asarray(rng.standard_normal((m, k), dtype=np.float32) * 0.2,
                    jnp.bfloat16)
    ref = jnp.matmul(x.astype(jnp.float32),
                     dequantize(qi, jnp.float32))
    got = quantized_matmul_interpret(x, qi)
    assert got.shape == (m, n)
    assert _norm_rmsd(got.astype(jnp.float32), ref) < 2e-2
