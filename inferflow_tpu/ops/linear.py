"""Linear layer dispatch over dense or quantized weights.

The TPU analog of the reference's MatrixMultiplication dispatch
(inference_worker.cc:2364-2431): decode-shaped inputs hit the fused
dequant-matmul Pallas kernel (weights stay packed in HBM, dequantized in
VMEM tiles); otherwise we fall back to XLA dequant + matmul.  The fallback
is also the CPU/test path.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from ..quant.codec_jax import (GlobalQuantTensor, Int8MXUTensor,
                               QuantizedTensor, dequantize,
                               int8_rowwise_activations)

Weight = Union[jax.Array, QuantizedTensor, GlobalQuantTensor,
               Int8MXUTensor]

# toggled by runtime config / tests; pallas kernels register here
_PALLAS_MATMUL = None


def register_pallas_matmul(fn):
    global _PALLAS_MATMUL
    _PALLAS_MATMUL = fn


def linear(x: jax.Array, w: Weight, bias: Optional[jax.Array] = None,
           *, use_pallas: bool = True) -> jax.Array:
    """y = x @ w (+ bias). x: (..., K); w: (K, N) dense, QuantizedTensor,
    or QuantizedWithDelta (quantized + sparse outlier correction)."""
    from ..quant.delta import QuantizedWithDelta, apply_delta
    if isinstance(w, QuantizedWithDelta):
        y = linear(x, w.qt, None, use_pallas=use_pallas)
        y = y + apply_delta(x, w.delta)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y
    if isinstance(w, Int8MXUTensor):
        # int8 x int8 on the MXU (device_layout='i8mm'): quantize each
        # activation row symmetrically, integer matmul accumulating int32,
        # rescale by row*column scales (the factorized analog of the
        # reference's Gemv_AX8 block accumulate, gemv.h:1500-1711)
        xq, xs = int8_rowwise_activations(x)
        acc = jax.lax.dot_general(
            xq, w.data, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * xs * w.scale).astype(x.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y
    if isinstance(w, GlobalQuantTensor):
        # whole-tensor 8-bit (Q8_GL/Q8_LOG): capacity formats, XLA
        # dequant+matmul (the piecewise decode doesn't tile as cheaply as
        # the block formats; these are rarely the hot path)
        wd = w.dequantize(x.dtype)
        y = jnp.matmul(x, wd, preferred_element_type=jnp.float32
                       ).astype(x.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y
    if isinstance(w, QuantizedTensor):
        if use_pallas and _PALLAS_MATMUL is not None:
            y = _PALLAS_MATMUL(x, w)
        else:
            wd = dequantize(w, x.dtype)
            y = jnp.matmul(x, wd, preferred_element_type=jnp.float32)
            y = y.astype(x.dtype)
    else:
        y = jnp.matmul(x, w.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def weight_shape(w: Weight) -> tuple:
    return tuple(w.shape)
