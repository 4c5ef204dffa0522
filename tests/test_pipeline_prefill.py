"""Micro-batch pipelined prefill (parallel/pipeline.py) vs the serial
layer scan, on the virtual 8-device CPU mesh (pure-'pp')."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inferflow_tpu.models.zoo import make_spec, make_synthetic_params
from inferflow_tpu.models.decoder import decoder_layers_scan
from inferflow_tpu.parallel.mesh import make_mesh
from inferflow_tpu.parallel.sharding import shard_params, shard_kv_cache
from inferflow_tpu.parallel.pipeline import (pipelined_chunk_prefill,
                                             pipeline_min_context)
from inferflow_tpu.runtime.kv_cache import KVCache


def norm_rmsd(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    return np.sqrt(((a - b) ** 2).mean()) / (np.sqrt((b * b).mean()) + 1e-9)


@pytest.mark.parametrize("pp,prompt_len,chunk", [(4, 24, 8), (8, 16, 8)])
def test_pipeline_matches_serial_scan(pp, prompt_len, chunk):
    if len(jax.devices()) < pp:
        pytest.skip(f"needs {pp} devices")
    spec = make_spec("test-tiny", layers=pp * 2, heads=4, kv_heads=4,
                     embd=64, inter=128, vocab=64)
    params = make_synthetic_params(spec, weight_format="Q8_B32T1",
                                   stacked=True)
    hp = spec.hyper_params
    rng = np.random.default_rng(0)
    n_chunks = -(-prompt_len // chunk)
    t_pad = n_chunks * chunk
    emb = jnp.asarray(rng.standard_normal((1, t_pad, hp.embd_dims)) * 0.3,
                      jnp.bfloat16)

    # serial reference (unsharded, full causal scan over the real rows)
    cache_ref = KVCache.create(hp.decoder_layers, 1, t_pad, hp.kv_heads,
                               hp.head_dim, quantized=True)
    pos = jnp.arange(t_pad, dtype=jnp.int32)[None]
    ref_x, ref_cache = decoder_layers_scan(spec, params["layers"], emb,
                                           pos, cache_ref,
                                           use_pallas=False)

    mesh = make_mesh(jax.devices()[:pp], 1, pp, 1)
    sharded = shard_params(params, mesh)
    cache = KVCache.create(hp.decoder_layers, 1,
                           pipeline_min_context(prompt_len, chunk),
                           hp.kv_heads, hp.head_dim, quantized=True)
    cache = shard_kv_cache(cache, mesh)
    got_x, got_cache = pipelined_chunk_prefill(
        spec, sharded["layers"], emb, cache, prompt_len, chunk, mesh,
        use_pallas=False)

    err = norm_rmsd(np.asarray(got_x[:, :prompt_len], np.float32),
                    np.asarray(ref_x[:, :prompt_len], np.float32))
    assert err < 0.02, f"hidden mismatch: {err}"

    for layer in (0, hp.decoder_layers - 1):
        k_ref, v_ref = ref_cache.read_layer(layer, jnp.float32)
        k_got, v_got = got_cache.read_layer(layer, jnp.float32)
        kerr = norm_rmsd(np.asarray(k_got[0, :prompt_len]),
                         np.asarray(k_ref[0, :prompt_len]))
        verr = norm_rmsd(np.asarray(v_got[0, :prompt_len]),
                         np.asarray(v_ref[0, :prompt_len]))
        assert kerr < 0.02 and verr < 0.02, (layer, kerr, verr)


def test_engine_pipeline_prefill_parity():
    """ini `pipeline_prefill = true` + a pure-'pp' mesh: long prompts
    prefill through the pipeline; greedy output must match the
    single-device engine."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    import copy
    from inferflow_tpu.runtime.engine import InferenceEngine
    from inferflow_tpu.sampling.strategies import SamplingOptions
    spec = make_spec("test-tiny", layers=4, heads=4, kv_heads=4,
                     embd=64, inter=128, vocab=128)
    params = make_synthetic_params(spec, weight_format="Q8_B32T1",
                                   stacked=False)
    ref = InferenceEngine(spec, copy.copy(params), max_concurrent_queries=2,
                          max_context_len=64, use_pallas=False)
    mesh = make_mesh(jax.devices()[:4], 1, 4, 1)
    eng = InferenceEngine(spec, params, max_concurrent_queries=2,
                          max_context_len=64, use_pallas=False, mesh=mesh,
                          pipeline_prefill=True)
    ref.prefill_chunk = 8
    eng.prefill_chunk = 8
    prompt = [3 + (i % 40) for i in range(20)]  # > chunk: pipeline path
    a = eng.generate(prompt, SamplingOptions(strategy="greedy"),
                     max_new_tokens=5)
    b = ref.generate(prompt, SamplingOptions(strategy="greedy"),
                     max_new_tokens=5)
    assert a == b


def test_pipeline_rejects_mixed_mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    spec = make_spec("test-tiny", layers=4, heads=4, kv_heads=4,
                     embd=64, inter=128, vocab=64)
    params = make_synthetic_params(spec, weight_format="Q8_B32T1",
                                   stacked=True)
    mesh = make_mesh(jax.devices()[:4], 2, 2, 1)
    cache = KVCache.create(4, 1, 32, 4, 16, quantized=True)
    emb = jnp.zeros((1, 8, 64), jnp.bfloat16)
    with pytest.raises(ValueError, match="pure-'pp'"):
        pipelined_chunk_prefill(spec, params["layers"], emb, cache,
                                8, 8, mesh, use_pallas=False)
