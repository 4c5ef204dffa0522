"""Ring-attention prefill wired through the serving engine (VERDICT r2
item 4): `sequence_parallel = N` in the engine config routes whole-prompt
prefill through parallel/ring_attention.py over an 8-way 'sp' mesh axis,
and the decode steps that follow read the same KV cache.

Runs on the virtual 8-device CPU mesh (tests/conftest.py)."""

import numpy as np
import pytest
import jax

from inferflow_tpu.models.zoo import make_spec, make_synthetic_params
from inferflow_tpu.runtime.engine import InferenceEngine
from inferflow_tpu.sampling.strategies import SamplingOptions


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def model():
    spec = make_spec("stories15m")
    spec.max_context_len = 128
    params = make_synthetic_params(spec, weight_format=None, stacked=False)
    return spec, params


def _copy_params(params):
    return jax.tree_util.tree_map(lambda x: x, params)


def test_ring_prefill_matches_plain(model):
    spec, params = model
    prompt = list(range(3, 43))  # bucket 64, divisible by sp=8
    plain = InferenceEngine(spec, _copy_params(params),
                            max_concurrent_queries=2,
                            kv_cache_quantized=False)
    ring = InferenceEngine(spec, _copy_params(params),
                           max_concurrent_queries=2,
                           kv_cache_quantized=False,
                           sequence_parallel=8)
    assert ring.mesh is not None and "sp" in ring.mesh.axis_names
    opts = SamplingOptions(strategy="greedy")
    a = plain.generate(list(prompt), opts, max_new_tokens=8)
    b = ring.generate(list(prompt), opts, max_new_tokens=8)
    assert a == b, (a, b)


def test_ring_prefill_long_prompt_single_pass(model):
    """Prompts longer than prefill_chunk go through ONE ring pass, not the
    chunked path."""
    spec, params = model
    eng = InferenceEngine(spec, _copy_params(params),
                          max_concurrent_queries=2,
                          kv_cache_quantized=False, sequence_parallel=8)
    eng.prefill_chunk = 16  # would force chunking without ring mode
    prompt = list(range(3, 60))
    qid = eng.add_query(prompt, SamplingOptions(strategy="greedy"), 4)
    assert qid > 0
    res = eng.infer()  # one step must complete the whole prefill
    assert any(r.query_id == qid for r in res)


def test_ring_rejects_device_groups(model):
    spec, params = model
    from inferflow_tpu.parallel.mesh import make_mesh
    with pytest.raises(ValueError):
        InferenceEngine(spec, _copy_params(params),
                        mesh=make_mesh(jax.devices(), 1, 1, 8),
                        sequence_parallel=8)
