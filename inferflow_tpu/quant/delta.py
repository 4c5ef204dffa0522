"""Delta tensor: sparse outlier extraction for quantized weights.

reference: `delta_tensor_ratio` — weights beyond a soft min/max are moved
into a sparse matrix and the clamped remainder is quantized
(DeviceTensorBuilder::BuildDeltaTensor, device_tensor_builder.cu:482-540;
DeviceSparseMatrix, device_tensor.h:157-211; GemmSparse,
tensor_mul.h:56).  Clamping tightens every block's quantization range, and
the outliers re-enter exactly through the delta product.

TPU-native representation: instead of a CSR scatter (gather-hostile on
TPU), a FIXED number of outliers per output column n:
    idx: (n_out, N) int32   row index of each outlier (0 pad)
    val: (n_out, N) bf16    w - clamp(w) at that position (0 pad)
The contribution x @ delta becomes a static-shape gather + contraction:
    y[m, n] += sum_j x[m, idx[j, n]] * val[j, n].
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeltaTensor:
    idx: jax.Array  # (n_out, N) int32
    val: jax.Array  # (n_out, N) bf16

    def tree_flatten(self):
        return (self.idx, self.val), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def nbytes(self) -> int:
        return int(self.idx.size) * 4 + int(self.val.size) * 2


def extract_delta(w: np.ndarray, ratio: float,
                  min_outliers: int = 8) -> Tuple[np.ndarray, DeltaTensor]:
    """Split (K, N) weights into (clamped base, delta outliers).

    The soft threshold is the global (1 - ratio) |w| quantile
    (DeviceTensorUtil soft min/max with excluded outliers); per column we
    keep the n_out = max(min_outliers, ceil(2*ratio*K)) largest deltas —
    enough that columns at twice the average outlier density stay exact.
    """
    k, n = w.shape
    wf = np.asarray(w, np.float32)
    thr = np.quantile(np.abs(wf), 1.0 - ratio)
    base = np.clip(wf, -thr, thr)
    delta = wf - base  # nonzero only at outliers
    n_out = min(k, max(min_outliers, int(np.ceil(2.0 * ratio * k))))
    order = np.argsort(-np.abs(delta), axis=0)[:n_out]  # (n_out, N)
    vals = np.take_along_axis(delta, order, axis=0)
    return base.astype(w.dtype), DeltaTensor(
        jnp.asarray(order.astype(np.int32)),
        jnp.asarray(vals, jnp.bfloat16))


def apply_delta(x: jax.Array, delta: DeltaTensor) -> jax.Array:
    """y += x @ delta as a static gather+contract; x: (..., K)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    g = x2[:, delta.idx.reshape(-1)].reshape(
        x2.shape[0], *delta.idx.shape)  # (M, n_out, N)
    y = jnp.einsum("mjn,jn->mn", g.astype(jnp.float32),
                   delta.val.astype(jnp.float32))
    return y.reshape(lead + (delta.idx.shape[1],)).astype(x.dtype)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedWithDelta:
    """A quantized weight plus its sparse outlier correction
    (DeviceTensorEx = tensor + quant params + optional delta,
    device_tensor.h:213-220)."""

    qt: object  # QuantizedTensor
    delta: DeltaTensor

    def tree_flatten(self):
        return (self.qt, self.delta), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.qt.shape

    @property
    def nbytes(self):
        return self.qt.nbytes + self.delta.nbytes
