"""Sampling strategy tests (reference surface: sampling_strategy.h:55-68)."""

import numpy as np
import pytest

from inferflow_tpu.sampling import (DecodingStrategies, SamplingOptions,
                                    get_strategy_id, STRATEGY_IDS)


def _logits(vocab=64, peak=7, seed=3):
    r = np.random.default_rng(seed)
    x = r.standard_normal(vocab).astype(np.float32)
    x[peak] += 8.0
    return x


def test_strategy_aliases():
    assert get_strategy_id("Greedy") == "greedy"
    assert get_strategy_id("sample.top_p") == "top_p"
    assert get_strategy_id("") == "top_p"
    with pytest.raises(KeyError):
        get_strategy_id("nope")


def test_greedy_picks_argmax():
    ds = DecodingStrategies()
    ds.begin_query(1, SamplingOptions(strategy="greedy"))
    assert ds.choose_token(1, _logits()) == 7


@pytest.mark.parametrize("sid", [s for s in STRATEGY_IDS if s != "greedy"])
def test_strategies_sample_plausibly(sid):
    """Every strategy must return the dominant token for a peaked
    distribution at low temperature, and be deterministic under a seed."""
    ds = DecodingStrategies()
    opts = SamplingOptions(strategy=sid, temperature=0.5, seed=42)
    ds.begin_query(1, opts)
    prev = [1, 2, 3, 1, 2]
    toks = [ds.choose_token(1, _logits(), prev) for _ in range(8)]
    assert all(t == 7 for t in toks), (sid, toks)

    ds2 = DecodingStrategies()
    ds2.begin_query(1, SamplingOptions(strategy=sid, temperature=1.5, seed=9))
    a = [ds2.choose_token(1, _logits(peak=3), prev) for _ in range(16)]
    ds3 = DecodingStrategies()
    ds3.begin_query(1, SamplingOptions(strategy=sid, temperature=1.5, seed=9))
    b = [ds3.choose_token(1, _logits(peak=3), prev) for _ in range(16)]
    assert a == b, sid


def test_top_p_truncates_tail():
    ds = DecodingStrategies()
    ds.begin_query(1, SamplingOptions(strategy="top_p", top_p=0.5, top_k=0,
                                      temperature=1.0, seed=1))
    x = np.full(100, -10.0, np.float32)
    x[0], x[1] = 5.0, 4.9  # two dominant tokens cover > 0.5 mass
    seen = {ds.choose_token(1, x) for _ in range(64)}
    assert seen <= {0, 1}


def test_fsd_penalizes_repetition():
    """With a repeating prefix, FSD must steer away from continuing the
    dominant n-gram when an alternative has comparable probability."""
    ds = DecodingStrategies()
    ds.begin_query(1, SamplingOptions(strategy="fsd", fsd_alpha=0.9,
                                      fsd_k=4, fsd_n=2, temperature=1.0))
    vocab = 16
    x = np.full(vocab, -10.0, np.float32)
    x[5], x[6] = 3.0, 2.9  # 5 slightly preferred over 6
    prev = [4, 5, 4, 5, 4]  # "4 -> 5" bigram everywhere; context = ...4
    tok = ds.choose_token(1, x, prev)
    assert tok == 6  # 5 penalized by the 4->5 bigram history


def test_eos_bypassing():
    ds = DecodingStrategies(eos_ids={2})
    ds.begin_query(1, SamplingOptions(strategy="greedy", eos_bypassing_max=2))
    x = np.zeros(8, np.float32)
    x[2], x[5] = 5.0, 4.0
    assert ds.choose_token(1, x) == 5  # first eos bypassed
    assert ds.choose_token(1, x) == 5  # second eos bypassed
    assert ds.choose_token(1, x) == 2  # budget exhausted

def test_inline_json_strategy_config():
    opts = SamplingOptions.from_strategy_string(
        '{"name": "top_k", "top_k": 3, "temperature": 0.7}')
    assert opts.strategy == "top_k" and opts.top_k == 3
    assert abs(opts.temperature - 0.7) < 1e-9


def test_mirostat_mu_adapts():
    ds = DecodingStrategies()
    ds.begin_query(1, SamplingOptions(strategy="mirostat", mirostat_tau=3.0,
                                      temperature=1.0, seed=5))
    st = ds._queries[1]
    mu0 = st.mirostat_mu
    for _ in range(10):
        ds.choose_token(1, _logits())
    assert st.mirostat_mu != mu0
