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


# --- engine integration (runtime/spec_decode.py; VERDICT r2 item 9) ----

def test_engine_speculative_self_draft_acceptance_one(models):
    """draft == target through the BATCHING ENGINE: outputs identical to
    the plain engine and acceptance ~= 1.0 (the harness sanity gate)."""
    target_spec, target, _, _ = models
    plain = InferenceEngine(target_spec, dict(target),
                            max_concurrent_queries=2,
                            kv_cache_quantized=False)
    a = plain.generate([3, 17, 9], SamplingOptions(strategy="greedy"),
                       max_new_tokens=10)
    eng = InferenceEngine(target_spec, dict(target),
                          max_concurrent_queries=2,
                          kv_cache_quantized=False,
                          draft=(target_spec, dict(target)), draft_k=3)
    b = eng.generate([3, 17, 9], SamplingOptions(strategy="greedy"),
                     max_new_tokens=10)
    _agree(b, a)
    st = eng.spec_stats
    assert st["rounds"] > 0
    # perfect draft: near-total acceptance (bf16 tie flips may cost a few)
    assert st["accepted"] >= st["proposed"] - 2 * st["rounds"], st
    # multi-token rounds: far fewer rounds than tokens
    assert st["rounds"] < len(b), (st, len(b))


def test_engine_speculative_truncated_draft_greedy_identical(models):
    """A DIFFERENT draft model must not change greedy output — only
    speed.  Also exercises partial acceptance bookkeeping."""
    target_spec, target, draft_spec, draft = models
    plain = InferenceEngine(target_spec, dict(target),
                            max_concurrent_queries=2,
                            kv_cache_quantized=False)
    a = plain.generate([5, 6, 7], SamplingOptions(strategy="greedy"),
                       max_new_tokens=8)
    eng = InferenceEngine(target_spec, dict(target),
                          max_concurrent_queries=2,
                          kv_cache_quantized=False,
                          draft=(draft_spec, dict(draft)), draft_k=3)
    b = eng.generate([5, 6, 7], SamplingOptions(strategy="greedy"),
                     max_new_tokens=8)
    _agree(b, a)


def test_engine_speculative_two_concurrent_queries(models):
    """Two slots decode speculatively in the same rounds; each query's
    output matches its single-query run."""
    target_spec, target, draft_spec, draft = models

    def run_single(prompt):
        e = InferenceEngine(target_spec, dict(target),
                            max_concurrent_queries=2,
                            kv_cache_quantized=False)
        return e.generate(prompt, SamplingOptions(strategy="greedy"),
                          max_new_tokens=7)

    ref1 = run_single([3, 17, 9])
    ref2 = run_single([11, 2])

    eng = InferenceEngine(target_spec, dict(target),
                          max_concurrent_queries=2,
                          kv_cache_quantized=False,
                          draft=(draft_spec, dict(draft)), draft_k=3)
    q1 = eng.add_query([3, 17, 9], SamplingOptions(strategy="greedy"),
                       max_new_tokens=7)
    q2 = eng.add_query([11, 2], SamplingOptions(strategy="greedy"),
                       max_new_tokens=7)
    for _ in range(40):
        eng.commit_inference_result(eng.infer())
        if not eng.has_work():
            break
    _agree(eng.query_tokens(q1), ref1)
    _agree(eng.query_tokens(q2), ref2)
    assert eng.spec_stats["rounds"] > 0


def test_engine_speculative_non_greedy_falls_back(models):
    """Sampled (non-greedy) queries bypass the speculative path."""
    target_spec, target, draft_spec, draft = models
    eng = InferenceEngine(target_spec, dict(target),
                          max_concurrent_queries=2,
                          kv_cache_quantized=False,
                          draft=(draft_spec, dict(draft)), draft_k=3)
    out = eng.generate([3, 4, 5],
                       SamplingOptions(strategy="top_p", top_p=0.9, seed=1),
                       max_new_tokens=5)
    assert len(out) == 5
    assert eng.spec_stats["rounds"] == 0


def test_fused_round_matches_unfused(models):
    """generate_fused (ONE jitted dispatch per round, VERDICT r4 #8)
    must reproduce the reference host-loop implementation."""
    target_spec, target, draft_spec, draft = models
    sd1 = SpeculativeDecoder(target_spec, dict(target), draft_spec,
                             dict(draft), k=3, max_context=128)
    a = sd1.generate([3, 17, 9], max_new_tokens=10)
    sd2 = SpeculativeDecoder(target_spec, dict(target), draft_spec,
                             dict(draft), k=3, max_context=128)
    b = sd2.generate_fused([3, 17, 9], max_new_tokens=10)
    _agree(b, a)
    assert sd2.stats["rounds"] > 0
    # self-draft: fused path must accept (near-)everything too
    sd3 = SpeculativeDecoder(target_spec, dict(target), target_spec,
                             dict(target), k=3, max_context=128)
    out = sd3.generate_fused([5, 6, 7], max_new_tokens=9)
    assert len(out) >= 6
    assert sd3.stats["accepted"] >= sd3.stats["proposed"] - 1, sd3.stats
