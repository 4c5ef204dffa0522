"""Normalization ops (reference: src/kernels/unary_tensor_opr.h:69-320,
src/tensor/tensor_opr.cu:458-500).

All norms compute in float32 and cast back, matching the reference's
accumulate-in-double/float behavior closely enough for bf16 serving.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x, weight=None, bias=None, eps: float = 1e-5,
             multi_base: float = 0.0):
    """RMS norm with optional (multi_base + weight) scaling.

    multi_base mirrors the reference's `norm_base` (Gemma-style 1+w when
    multi_base=1; see Tensor_RmsNorm_Kernel, unary_tensor_opr.h:217-290).
    """
    xf = x.astype(jnp.float32)
    mean_sq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jnp.reciprocal(jnp.sqrt(mean_sq + eps))
    if weight is not None:
        y = y * (multi_base + weight.astype(jnp.float32))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def std_norm(x, weight=None, bias=None, eps: float = 1e-5,
             multi_base: float = 0.0):
    """LayerNorm (mean/variance), reference Tensor_StdNorm_Kernel."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        y = y * (multi_base + weight.astype(jnp.float32))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def linear_norm(x, scale: float = 0.0):
    """Scale-only 'norm'; scale<=1e-4 means sqrt(dim)
    (reference TensorOpr::LinearNorm, tensor_opr.cu:482-497)."""
    if scale <= 0.0001:
        scale = float(x.shape[-1]) ** 0.5
    return (x.astype(jnp.float32) * scale).astype(x.dtype)


NORM_FNS = {"rms": rms_norm, "std": std_norm, "linear": linear_norm}


def apply_norm(alg: str, x, weight=None, bias=None, eps: float = 1e-5,
               multi_base: float = 0.0):
    alg = alg.lower()
    if alg == "linear":
        return linear_norm(x)
    return NORM_FNS[alg](x, weight, bias, eps, multi_base)
