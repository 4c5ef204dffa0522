"""Std format save/load roundtrip + study-mode/perf-stat utilities."""

import io
import os

import numpy as np
import pytest
import jax.numpy as jnp

from inferflow_tpu.models.zoo import make_spec, make_synthetic_params
from inferflow_tpu.models.decoder import decoder_forward
from inferflow_tpu.loaders.std_format import save_std, load_std
from inferflow_tpu.utils.tensor_util import (rmsd, norm_rmsd, compare,
                                             check_elements, tensor_to_json)
from inferflow_tpu.utils.study import StudyMode, PerfStat, perf_key


def test_std_roundtrip(tmp_path):
    spec = make_spec("test-tiny", layers=2, embd=64, heads=4, kv_heads=4,
                     inter=128, vocab=128)
    spec.tensor_quant_threshold = 0
    params = make_synthetic_params(spec, weight_format="Q4_B64T1",
                                   stacked=False)
    path = str(tmp_path / "model.std.safetensors")
    save_std(path, spec, params)
    spec2, params2 = load_std(path)
    assert spec2.hyper_params.decoder_layers == 2
    # zoo fuses qkv at build; the roundtrip must preserve it
    assert params2["layers"][0]["attn"]["qkv"].format == "Q4_B64T1"

    tokens = jnp.asarray([[3, 5, 9]], jnp.int32)
    pos = jnp.arange(3)[None, :]
    a, _ = decoder_forward(spec, params, tokens, pos, None)
    b, _ = decoder_forward(spec2, params2, tokens, pos, None)
    assert norm_rmsd(np.asarray(a), np.asarray(b)) < 1e-3


def test_std_roundtrip_delta(tmp_path):
    """QuantizedWithDelta params (delta_tensor_ratio > 0) must survive the
    Std container (ADVICE r1: previously crashed in the dense fallback)."""
    from inferflow_tpu.quant.delta import (extract_delta, QuantizedWithDelta,
                                           apply_delta)
    from inferflow_tpu.quant.codec_np import quantize_np
    from inferflow_tpu.quant.codec_jax import QuantizedTensor

    rng = np.random.default_rng(0)
    w = rng.normal(size=(128, 64)).astype(np.float32)
    w[7, 3] = 40.0  # an outlier for the delta to capture
    base, delta = extract_delta(w, 0.01)
    qt = QuantizedTensor.from_np(quantize_np(base, "Q4_B64T1"))
    qwd = QuantizedWithDelta(qt, delta)

    spec = make_spec("test-tiny", layers=1, embd=64, heads=4, kv_heads=4,
                     inter=128, vocab=128)
    params = {"layers": [{"attn": {"wq": qwd}}]}
    path = str(tmp_path / "delta.std.safetensors")
    save_std(path, spec, params)
    _, params2 = load_std(path)
    got = params2["layers"][0]["attn"]["wq"]
    assert isinstance(got, QuantizedWithDelta)
    np.testing.assert_array_equal(np.asarray(got.delta.idx),
                                  np.asarray(qwd.delta.idx))
    x = jnp.asarray(rng.normal(size=(2, 128)), jnp.bfloat16)
    a = np.asarray(apply_delta(x, qwd.delta), np.float32)
    b = np.asarray(apply_delta(x, got.delta), np.float32)
    np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-2)


def test_tensor_util():
    a = np.ones((4, 4), np.float32)
    b = a + 1e-5
    assert rmsd(a, a) == 0.0
    assert norm_rmsd(a, b) < 1e-4
    ok, cnt, mx = compare(a, b, atol=1e-3)
    assert ok and cnt == 0
    ok, cnt, _ = compare(a, a + 1.0, atol=1e-3)
    assert not ok and cnt == 16
    nan, inf = check_elements(np.array([1.0, np.nan, np.inf]))
    assert (nan, inf) == (1, 1)
    js = tensor_to_json(np.arange(100.0))
    assert "truncated" in js


def test_study_mode(tmp_path):
    path = str(tmp_path / "tensor_dump.txt")
    sm = StudyMode(enabled=True, show_tensors=True, path=path)
    sm.dump(10500, np.ones((2, 3)), layer=1, name="attn_out")
    sm.close()
    text = open(path).read()
    assert "(10500)" in text and "layer=1" in text and "mean=1" in text
    # disabled: no file side effects
    sm2 = StudyMode(enabled=False, path=str(tmp_path / "no.txt"))
    sm2.dump(1, np.ones(3))
    assert not os.path.exists(str(tmp_path / "no.txt"))


def test_perf_stat():
    ps = PerfStat(enabled=True)
    with ps.measure(perf_key(3, 11)):
        pass
    ps.add(perf_key(3, 12), 1.5)
    assert perf_key(3, 11) == 40011
    assert ps.time_map[40012] == 1.5
    out = ps.print_stat()
    assert "layer=3" in out and "phase=12" in out
    ps_off = PerfStat(enabled=False)
    with ps_off.measure(1):
        pass
    assert not ps_off.time_map
