"""Delta-tensor (sparse outlier) tests
(reference: BuildDeltaTensor, device_tensor_builder.cu:482-540)."""

import numpy as np
import pytest
import jax.numpy as jnp

from inferflow_tpu.quant.delta import (extract_delta, apply_delta,
                                       QuantizedWithDelta, DeltaTensor)
from inferflow_tpu.quant import codec_np
from inferflow_tpu.quant.codec_jax import QuantizedTensor, dequantize
from inferflow_tpu.ops.linear import linear


def test_extract_and_apply_exact(rng):
    k, n = 128, 64
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    # plant big outliers
    w[3, 5] = 4.0
    w[77, 20] = -3.0
    base, delta = extract_delta(w, ratio=0.01)
    # base is clamped: no value beyond the soft threshold
    thr = np.abs(base).max()
    assert thr < 3.0
    # base + delta reconstructs w exactly at the planted outliers
    x = rng.standard_normal((2, k)).astype(np.float32)
    y_full = x @ w
    y_split = x @ base + np.asarray(
        apply_delta(jnp.asarray(x), delta), np.float32)
    np.testing.assert_allclose(y_split, y_full, rtol=2e-2, atol=2e-2)


def test_delta_improves_quantization(rng):
    """Clamping outliers before quantization must reduce dequant error."""
    k, n = 256, 32
    w = (rng.standard_normal((k, n)) * 0.05).astype(np.float32)
    w[10, :] = 2.5  # a full row of outliers stretching every block range
    plain = codec_np.dequantize_np(codec_np.quantize_np(w, "Q4_B64T1"))
    base, delta = extract_delta(w, ratio=0.02)
    qt = codec_np.quantize_np(base.astype(np.float16), "Q4_B64T1")
    deq = codec_np.dequantize_np(qt)
    # reconstruct full weights: dequant(base) + delta
    dmat = np.zeros_like(w)
    idx = np.asarray(delta.idx)
    val = np.asarray(delta.val, np.float32)
    for j in range(idx.shape[0]):
        for col in range(n):
            dmat[idx[j, col], col] += val[j, col]
    err_plain = np.abs(plain - w).mean()
    err_delta = np.abs(deq + dmat - w).mean()
    assert err_delta < err_plain * 0.8, (err_plain, err_delta)


def test_linear_with_delta(rng):
    k, n = 128, 128
    w = (rng.standard_normal((k, n)) * 0.1).astype(np.float32)
    w[5, 7] = 5.0
    base, delta = extract_delta(w, ratio=0.01)
    qt = QuantizedTensor.from_np(
        codec_np.quantize_np(base.astype(np.float16), "Q8_B32T1"))
    wd = QuantizedWithDelta(qt, delta)
    x = jnp.asarray(rng.standard_normal((3, k)) * 0.2, jnp.bfloat16)
    y = linear(x, wd)
    ref = np.asarray(x, np.float32) @ w
    got = np.asarray(y, np.float32)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


def test_delta_in_model_loader(tmp_path, rng):
    from inferflow_tpu.loaders.safetensors import save_safetensors
    from inferflow_tpu.loaders.model_loader import load_model
    from inferflow_tpu.models.spec import ModelSpec
    import json

    E, I, V, L = 64, 128, 96, 1
    tensors = {"model.embed_tokens.weight":
               rng.standard_normal((V, E)).astype(np.float32),
               "model.norm.weight": np.ones(E, np.float32),
               "lm_head.weight":
               rng.standard_normal((V, E)).astype(np.float32) * 0.1}
    p = "model.layers.0"
    tensors[f"{p}.input_layernorm.weight"] = np.ones(E, np.float32)
    tensors[f"{p}.post_attention_layernorm.weight"] = np.ones(E, np.float32)
    for nm, shape in (("self_attn.q_proj", (E, E)),
                      ("self_attn.k_proj", (E, E)),
                      ("self_attn.v_proj", (E, E)),
                      ("self_attn.o_proj", (E, E)),
                      ("mlp.gate_proj", (I, E)), ("mlp.down_proj", (E, I)),
                      ("mlp.up_proj", (I, E))):
        tensors[f"{p}.{nm}.weight"] = (
            rng.standard_normal(shape).astype(np.float32) * 0.05)
    save_safetensors(str(tmp_path / "model.safetensors"), tensors)
    with open(tmp_path / "config.json", "w") as fh:
        json.dump({"model_type": "llama", "hidden_size": E,
                   "num_hidden_layers": L, "num_attention_heads": 4,
                   "intermediate_size": I, "vocab_size": V}, fh)
    spec = ModelSpec(model_files=["model.safetensors"],
                     model_file_format="safetensors",
                     device_weight_data_type="Q8_B32T1",
                     tensor_quant_threshold=0, delta_tensor_ratio=0.01)
    params = load_model(spec, str(tmp_path))
    assert isinstance(params["layers"][0]["attn"]["wq"], QuantizedWithDelta)
