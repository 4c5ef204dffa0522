"""Activation functions incl. GLU variants
(reference: ActivationFn enum, src/tensor/tensor_common.h:55-67;
kernels src/kernels/unary_tensor_opr.h:538-595)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _gelu(x):
    return jax.nn.gelu(x, approximate=True)


def _elu(x):
    return jax.nn.elu(x)


ACT_FNS = {
    "sigmoid": jax.nn.sigmoid,
    "elu": _elu,
    "relu": lambda x: jnp.maximum(x, 0),
    "gelu": _gelu,
    "silu": _silu,
}


def activate(name: str, x, gate=None):
    """Apply activation; GLU variants compute act(x) * gate.

    The reference computes w1 -> activation, w3 -> gate, elementwise product
    (inference_worker.cc:1726-1903 FFN path with GLU_* functions).
    """
    name = name.lower()
    if name.startswith("glu_"):
        base = ACT_FNS[name[4:]]
        if gate is None:
            raise ValueError(f"{name} requires a gate input")
        return base(x) * gate
    y = ACT_FNS[name](x)
    if gate is not None:
        y = y * gate
    return y


def is_glu(name: str) -> bool:
    return name.lower().startswith("glu_")
