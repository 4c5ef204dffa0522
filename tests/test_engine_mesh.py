"""Mesh-sharded serving engine: placement + output parity.

Runs only with >= 4 visible devices (the CPU suite forces an 8-device
virtual mesh; on the single-real-TPU image these skip and the driver's
__graft_entry__.dryrun_multichip covers them).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inferflow_tpu.models.zoo import make_spec, make_synthetic_params
from inferflow_tpu.runtime.engine import InferenceEngine
from inferflow_tpu.sampling.strategies import SamplingOptions
from inferflow_tpu.parallel.mesh import make_mesh, mesh_from_groups
from inferflow_tpu.config.engine_config import parse_device_groups

needs4 = pytest.mark.skipif(len(jax.devices()) < 4,
                            reason="needs >= 4 devices")


def _tiny(layers=2, heads=4):
    spec = make_spec("test-tiny", layers=layers, heads=heads, kv_heads=heads,
                     inter=128, vocab=128, embd=64)
    params = make_synthetic_params(spec, weight_format="Q8_B32T1",
                                   stacked=False)
    return spec, params


@needs4
def test_by_tensor_engine_matches_single():
    spec, params = _tiny()
    import copy
    ref = InferenceEngine(spec, copy.copy(params), max_concurrent_queries=2,
                          use_pallas=False)
    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    eng = InferenceEngine(spec, params, max_concurrent_queries=2,
                          use_pallas=False, mesh=mesh)
    # placement is real: a col-split weight's planes span both devices
    qkv = eng.params["layers"]["attn"]["qkv"]
    devs = {d for d in qkv.scale.sharding.device_set}
    assert len(devs) == 2
    p = [3, 17, 9]
    a = eng.generate(p, SamplingOptions(strategy="greedy"), max_new_tokens=6)
    b = ref.generate(p, SamplingOptions(strategy="greedy"), max_new_tokens=6)
    assert a == b


@needs4
def test_mesh_engine_disables_pallas():
    """Weight-sharding meshes must force the XLA path: Pallas custom
    calls are not GSPMD-partitionable and would all-gather the sharded
    weights into every kernel call."""
    spec, params = _tiny()
    import copy
    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    eng = InferenceEngine(spec, copy.copy(params), max_concurrent_queries=2,
                          use_pallas=True, mesh=mesh)
    assert eng.use_pallas is False
    single = InferenceEngine(spec, params, max_concurrent_queries=2,
                             use_pallas=True)
    assert single.use_pallas is True


@needs4
def test_hybrid_groups_engine():
    """`devices = 0&1;2&3` drives a (pp=2, tp=2) mesh through the engine."""
    groups = parse_device_groups("0&1;2&3")
    mesh = mesh_from_groups(groups)
    assert mesh.devices.shape == (1, 2, 2)
    spec, params = _tiny(layers=2, heads=4)
    eng = InferenceEngine(spec, params, max_concurrent_queries=2,
                          use_pallas=False, mesh=mesh)
    out = eng.generate([5, 11], SamplingOptions(strategy="greedy"),
                       max_new_tokens=4)
    assert len(out) == 4
    # layer (pp) axis sharding is on the stacked leading dim
    wq = eng.params["layers"]["attn"]["qkv"]
    assert len(wq.scale.sharding.device_set) == 4


@needs4
def test_dp_batched_decode():
    spec, params = _tiny()
    mesh = make_mesh(jax.devices()[:2], dp=2, pp=1, tp=1)
    eng = InferenceEngine(spec, params, max_concurrent_queries=2,
                          use_pallas=False, mesh=mesh)
    q1 = eng.add_query([3, 5], SamplingOptions(strategy="greedy"))
    q2 = eng.add_query([7, 2], SamplingOptions(strategy="greedy"))
    assert q1 > 0 and q2 > 0
    for _ in range(4):
        eng.commit_inference_result(eng.infer())
    assert eng.query_tokens(q1) and eng.query_tokens(q2)


def test_mesh_from_groups_single_is_none():
    assert mesh_from_groups([[0]]) is None
    with pytest.raises(ValueError):
        mesh_from_groups([[0, 1], [2]])


@needs4
def test_mesh_chunked_prefill():
    """A long prompt prefills in chunks against the SHARDED cache."""
    spec, params = _tiny()
    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    eng = InferenceEngine(spec, params, max_concurrent_queries=2,
                          max_context_len=256, use_pallas=False, mesh=mesh)
    eng.prefill_chunk = 16
    rng = np.random.default_rng(7)
    prompt = [int(x) for x in rng.integers(1, 120, size=50)]
    out = eng.generate(prompt, SamplingOptions(strategy="greedy"),
                       max_new_tokens=4)
    assert len(out) == 4

    ref = InferenceEngine(spec, params, max_concurrent_queries=2,
                          max_context_len=256, use_pallas=False)
    ref.prefill_chunk = 16
    assert out == ref.generate(prompt, SamplingOptions(strategy="greedy"),
                               max_new_tokens=4)


def test_multihost_factors():
    from inferflow_tpu.parallel.mesh import (multihost_factors,
                                             make_multihost_mesh)
    assert multihost_factors(2, 8) == (2, 1, 8)       # v5e-16, tp-per-host
    assert multihost_factors(2, 8, tp=4) == (2, 2, 4)
    assert multihost_factors(1, 4) == (1, 1, 4)
    with pytest.raises(ValueError):
        multihost_factors(2, 8, tp=3)
    # single-process degenerate path builds a mesh over local devices
    mesh = make_multihost_mesh(tp=min(2, len(jax.devices())))
    assert mesh.axis_names == ("dp", "pp", "tp")


def test_mesh_validation_errors():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    spec, params = _tiny(layers=3, heads=4)  # 3 layers not divisible by pp=2
    mesh = make_mesh(jax.devices()[:2], dp=1, pp=2, tp=1)
    with pytest.raises(ValueError):
        InferenceEngine(spec, params, mesh=mesh)


@needs4
def test_tp_shardmap_layers_parity():
    """shard_map decode path (parallel/tp_step.py): the per-layer kernels
    run on LOCAL tp shards with psum after wo/w2 (VERDICT r3 item 6).
    Direct layer-stack parity vs decoder_layers_unrolled on the SAME
    repacked weights — the only expected difference is the bf16 psum
    reassociation (partial sums reduced in a different order)."""
    import dataclasses
    from inferflow_tpu.models.decoder import (decoder_layers_scan,
                                              decoder_layers_unrolled)
    from inferflow_tpu.runtime.kv_cache import KVCache
    from inferflow_tpu.parallel.tp_step import (prepare_tp_params,
                                                tp_decode_layers)

    spec = make_spec("test-llama")  # GQA: hq=8, hk=2
    spec.max_context_len = 512
    params = make_synthetic_params(spec, weight_format="Q4_B64T1",
                                   stacked=True)
    hp = spec.hyper_params
    stacked0 = prepare_tp_params(params["layers"], spec, 2)
    spec0 = dataclasses.replace(spec, qkv_format=0, w1n3_ranks=2)
    rng = np.random.default_rng(0)
    cache = KVCache.create(hp.decoder_layers, 2, 512, hp.kv_heads,
                           hp.head_dim, quantized=True)
    x0 = jnp.asarray(rng.standard_normal((2, 5, hp.embd_dims)) * 0.3,
                     jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(5)[None, :], (2, 5))
    _, cache = decoder_layers_scan(spec0, stacked0, x0, pos, cache,
                                   use_pallas=False)
    cache = cache.with_length(jnp.asarray([5, 3], jnp.int32))
    x = jnp.asarray(rng.standard_normal((2, 1, hp.embd_dims)) * 0.3,
                    jnp.bfloat16)
    ref_x, ref_c = decoder_layers_unrolled(
        spec0, stacked0, x, cache.length[:, None], cache, use_pallas=False)
    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    got_x, got_c = tp_decode_layers(spec0, stacked0, x, cache, mesh,
                                    use_pallas=True)

    a = np.asarray(ref_x, np.float32).ravel()
    b = np.asarray(got_x, np.float32).ravel()
    err = np.sqrt(((a - b) ** 2).mean()) / (np.sqrt((a * a).mean()) + 1e-9)
    assert err < 0.02, f"tp shard_map decode mismatch: norm_rmsd={err}"
    # appended KV rows must agree (same codec, local heads)
    for layer in (0, hp.decoder_layers - 1):
        kr, _ = ref_c.read_layer(layer, jnp.float32)
        kg, _ = got_c.read_layer(layer, jnp.float32)
        for slot, ln in enumerate([5, 3]):
            np.testing.assert_allclose(np.asarray(kg[slot, ln]),
                                       np.asarray(kr[slot, ln]),
                                       rtol=0.08, atol=0.08)


@needs4
def test_tp_shardmap_engine_generates():
    """The tp shard_map path engages through the ENGINE (qkv repacked to
    format 0, w1n3 to rank-major) and serves greedy decode end-to-end."""
    spec = make_spec("test-llama")
    spec.max_context_len = 512
    params = make_synthetic_params(spec, weight_format="Q4_B64T1",
                                   stacked=True)
    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    eng = InferenceEngine(spec, params, max_concurrent_queries=2,
                          max_context_len=512, use_pallas=True, mesh=mesh,
                          kv_cache_quantized=True)
    assert eng.tp_shardmap is True
    assert eng.spec.qkv_format == 0  # repacked for contiguous tp shards
    assert eng.spec.w1n3_ranks == 2
    out = eng.generate([3, 17, 9, 25], SamplingOptions(strategy="greedy"),
                       max_new_tokens=6)
    assert len(out) == 6


@needs4
def test_tp_shardmap_dp_combo():
    """(dp=2, tp=2) mesh: shard_map decode with slot-sharded batch."""
    spec = make_spec("test-llama")
    spec.max_context_len = 512
    params = make_synthetic_params(spec, weight_format="Q8_B32T2",
                                   stacked=True)
    mesh = make_mesh(jax.devices()[:4], dp=2, pp=1, tp=2)
    eng = InferenceEngine(spec, params, max_concurrent_queries=2,
                          max_context_len=512, use_pallas=True, mesh=mesh,
                          kv_cache_quantized=True)
    assert eng.tp_shardmap is True
    q1 = eng.add_query([3, 5], SamplingOptions(strategy="greedy"))
    q2 = eng.add_query([7, 2, 11], SamplingOptions(strategy="greedy"))
    for _ in range(5):
        eng.commit_inference_result(eng.infer())
    assert eng.query_tokens(q1) and eng.query_tokens(q2)


@needs4
def test_tp_shardmap_ineligible_falls_back():
    """pp>1 or MoE trees keep the GSPMD path (tp_shardmap off)."""
    spec, params = _tiny(layers=2, heads=4)
    mesh = make_mesh(jax.devices()[:4], dp=1, pp=2, tp=2)
    eng = InferenceEngine(spec, params, max_concurrent_queries=2,
                          use_pallas=True, mesh=mesh)
    assert eng.tp_shardmap is False
