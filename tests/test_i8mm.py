"""int8 x int8 MXU path (device_layout='i8mm') — the TPU-native analog of
the reference's int8-activation Gemv_AX8 family (gemv.h:1500-1711,
dispatch tensor_mul.h:106-118; VERDICT r2 item 8).

Numerics: per-column weight scales x per-row activation scales factorize
the whole-K reduction, so the integer matmul accumulates exactly and the
only error sources are the two symmetric quantizations."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inferflow_tpu.ops.linear import linear
from inferflow_tpu.quant.codec_jax import (Int8MXUTensor, quantize,
                                           requantize_i8_colwise,
                                           int8_rowwise_activations)


def _norm_rmsd(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(b ** 2)) + 1e-12)


def test_i8mm_linear_accuracy(rng):
    k, n, b = 256, 192, 8
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    x = rng.standard_normal((b, k)).astype(np.float32)
    t = requantize_i8_colwise(jnp.asarray(w))
    assert isinstance(t, Int8MXUTensor)
    y = linear(jnp.asarray(x, jnp.bfloat16), t)
    ref = x @ w
    # int8 weights + int8 activations: ~1% relative error expected
    assert _norm_rmsd(y, ref) < 0.02


def test_i8mm_from_wire_format(rng):
    """Container built from a block-quantized tensor (the deployment path:
    load Q4 checkpoint -> requantize per-column int8)."""
    k, n = 256, 128
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    qt = quantize(jnp.asarray(w), "Q4_B64T1")
    t = requantize_i8_colwise(qt)
    x = rng.standard_normal((4, k)).astype(np.float32)
    y = linear(jnp.asarray(x, jnp.bfloat16), t)
    # must track the DEQUANTIZED wire-format weights (double-quant error
    # on top of Q4's own error)
    from inferflow_tpu.quant.codec_jax import dequantize
    ref = x @ np.asarray(dequantize(qt, jnp.float32))
    assert _norm_rmsd(y, ref) < 0.02


def test_i8mm_activation_quant_roundtrip(rng):
    x = rng.standard_normal((4, 64)).astype(np.float32)
    q, s = int8_rowwise_activations(jnp.asarray(x))
    back = np.asarray(q, np.float32) * np.asarray(s)
    assert _norm_rmsd(back, x) < 0.01


def test_i8mm_stack_index_fuse(rng):
    """Layer stacking / indexing / QKV fusion over the i8mm container."""
    from inferflow_tpu.models.decoder import (_index_layer,
                                              fuse_layer_weights,
                                              stack_layers)
    e = 64
    mk = lambda n: requantize_i8_colwise(
        jnp.asarray(rng.standard_normal((e, n)).astype(np.float32)))
    layers = []
    for _ in range(3):
        layers.append({
            "attn": {"pre_norm": jnp.ones((e,), jnp.bfloat16),
                     "wq": mk(e), "wk": mk(e), "wv": mk(e), "wo": mk(e)},
            "ffn": {"pre_norm": jnp.ones((e,), jnp.bfloat16),
                    "w1": mk(128), "w2": requantize_i8_colwise(
                        jnp.asarray(rng.standard_normal(
                            (128, e)).astype(np.float32))),
                    "w3": mk(128)},
        })
    fused = fuse_layer_weights(layers)
    assert all(isinstance(l["attn"]["qkv"], Int8MXUTensor) for l in fused)
    assert all(l["ffn"]["w1n3"].shape == (e, 256) for l in fused)
    stacked = stack_layers(fused)
    assert stacked["attn"]["qkv"].data.shape == (3, e, 3 * e)
    l1 = _index_layer(stacked, 1)
    np.testing.assert_array_equal(np.asarray(l1["attn"]["qkv"].data),
                                  np.asarray(fused[1]["attn"]["qkv"].data))


def test_i8mm_engine_generates(rng):
    """End-to-end: synthetic model with device_layout='i8mm' serves
    through the engine and nearly matches the wire-format engine's
    greedy output."""
    from inferflow_tpu.models.zoo import make_spec, make_synthetic_params
    from inferflow_tpu.runtime.engine import InferenceEngine
    from inferflow_tpu.sampling.strategies import SamplingOptions

    spec = make_spec("test-llama")
    spec.max_context_len = 64
    base = make_synthetic_params(spec, weight_format="Q8_B32T2", seed=3,
                                 stacked=True)
    spec2 = make_spec("test-llama")
    spec2.max_context_len = 64
    i8 = make_synthetic_params(spec2, weight_format="Q8_B32T2", seed=3,
                               stacked=True, device_layout="i8mm")
    a = InferenceEngine(spec, base, max_concurrent_queries=2).generate(
        [3, 5, 9], SamplingOptions(strategy="greedy"), max_new_tokens=6)
    b = InferenceEngine(spec2, i8, max_concurrent_queries=2).generate(
        [3, 5, 9], SamplingOptions(strategy="greedy"), max_new_tokens=6)
    assert len(b) == 6 and all(0 <= t < spec.hyper_params.vocab_size
                               for t in b)
    # same first tokens (random-weight argmax ties can flip the tail)
    assert a[:2] == b[:2], (a, b)
