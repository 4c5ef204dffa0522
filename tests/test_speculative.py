"""Speculative decoding: greedy verification must reproduce plain target
greedy decoding regardless of the draft model."""

import numpy as np
import pytest
import jax.numpy as jnp

from inferflow_tpu.models.zoo import make_spec, make_synthetic_params
from inferflow_tpu.runtime.speculative import SpeculativeDecoder
from inferflow_tpu.runtime.engine import InferenceEngine
from inferflow_tpu.sampling.strategies import SamplingOptions


@pytest.fixture(scope="module")
def models():
    target_spec = make_spec("test-tiny", layers=2, heads=4, kv_heads=4,
                            embd=64, inter=128, vocab=128)
    target_spec.max_context_len = 128
    target = make_synthetic_params(target_spec, weight_format=None,
                                   stacked=False, seed=0)
    draft_spec = make_spec("test-tiny", layers=1, heads=4, kv_heads=4,
                          embd=64, inter=128, vocab=128)
    draft = make_synthetic_params(draft_spec, weight_format=None,
                                  stacked=False, seed=7)
    return target_spec, target, draft_spec, draft


def _agree(a, b, prefix=4):
    assert a[:prefix] == b[:prefix], (a, b)
    same = sum(x == y for x, y in zip(a, b))
    assert same >= min(len(a), len(b)) - 1, (a, b)


def test_speculative_matches_plain_greedy(models):
    target_spec, target, draft_spec, draft = models
    eng = InferenceEngine(target_spec, dict(target),
                          max_concurrent_queries=1, kv_cache_quantized=False)
    plain = eng.generate([3, 17, 9], SamplingOptions(strategy="greedy"),
                         max_new_tokens=8)

    sd = SpeculativeDecoder(target_spec, dict(target), draft_spec,
                            dict(draft), k=3, max_context=128)
    spec_out = sd.generate([3, 17, 9], max_new_tokens=8)
    _agree(spec_out[:8], plain)
    assert sd.stats["rounds"] > 0


def test_speculative_self_draft_accepts_everything(models):
    """Draft == target: every proposal must be accepted."""
    target_spec, target, _, _ = models
    sd = SpeculativeDecoder(target_spec, dict(target), target_spec,
                            dict(target), k=3, max_context=128)
    out = sd.generate([5, 6, 7], max_new_tokens=9)
    assert len(out) >= 6
    # perfect draft: acceptance rate 100% (bf16 tie flips may cost one)
    assert sd.stats["accepted"] >= sd.stats["proposed"] - 1, sd.stats
