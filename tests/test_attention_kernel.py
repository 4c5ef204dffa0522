"""Fused decode-attention kernel vs the XLA einsum path (interpret mode).

Covers: quantized (Q8) and dense caches, GQA, per-slot lengths (block
skipping), layer indexing from the stacked buffer, kq_scale.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inferflow_tpu.runtime.kv_cache import KVCache
from inferflow_tpu.kernels.attention import (decode_attention, _pick_ts,
                                             decode_attention_supported)
from inferflow_tpu.ops.attention import mha


def _fill_cache(cache: KVCache, rng, lengths):
    """Write random K/V rows into every layer up to each slot's length."""
    l, b, h = cache.k.shape[:3]
    s, d = cache.max_len, cache.head_dim
    for layer in range(l):
        k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
        cache = cache.update_layer(layer, k, v, jnp.zeros((b,), jnp.int32))
    return cache.with_length(jnp.asarray(lengths, jnp.int32))


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("g", [1, 2])
def test_decode_attention_matches_mha(quantized, g):
    rng = np.random.default_rng(0)
    L, B, H, S, D = 3, 2, 2, 1024, 64
    HQ = H * g
    lengths = [5, 700]  # one short (block skip), one multi-block
    cache = KVCache.create(L, B, S, H, D, quantized=quantized)
    cache = _fill_cache(cache, rng, lengths)
    q = jnp.asarray(rng.standard_normal((B, 1, HQ, D)) * 0.3, jnp.bfloat16)

    for layer in [0, L - 1]:
        out, cache2 = decode_attention(q, cache, layer,
                                       jnp.asarray(lengths, jnp.int32),
                                       kq_scale=1.25, interpret=True)
        # pass-through cache must be bit-identical (aliased, unwritten)
        np.testing.assert_array_equal(np.asarray(cache2.k),
                                      np.asarray(cache.k))
        k_full, v_full = cache.read_layer(layer)
        # mha masks keys by position <= q_position and kv_len
        qpos = jnp.asarray([[l - 1] for l in lengths], jnp.int32)
        ref = mha(q, k_full, v_full, q_positions=qpos,
                  kv_len=jnp.asarray(lengths, jnp.int32), kq_scale=1.25)
        a = np.asarray(out, np.float32)
        b = np.asarray(ref, np.float32)
        np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)


def test_decode_attention_traced_layer():
    """A traced layer index must select the right layer's KV."""
    rng = np.random.default_rng(1)
    L, B, H, S, D = 2, 1, 2, 256, 64
    cache = KVCache.create(L, B, S, H, D, quantized=False)
    cache = _fill_cache(cache, rng, [10])
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)) * 0.3, jnp.bfloat16)
    lens = jnp.asarray([10], jnp.int32)

    out0, _ = decode_attention(q, cache, jnp.int32(0), lens,
                               interpret=True)
    out1, _ = decode_attention(q, cache, jnp.int32(1), lens,
                               interpret=True)
    k0, v0 = cache.read_layer(0)
    ref0 = mha(q, k0, v0, q_positions=jnp.asarray([[9]]), kv_len=lens)
    k1, v1 = cache.read_layer(1)
    ref1 = mha(q, k1, v1, q_positions=jnp.asarray([[9]]), kv_len=lens)
    np.testing.assert_allclose(np.asarray(out0, np.float32),
                               np.asarray(ref0, np.float32), rtol=0.05,
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(out1, np.float32),
                               np.asarray(ref1, np.float32), rtol=0.05,
                               atol=0.05)
    assert not np.allclose(np.asarray(out0, np.float32),
                           np.asarray(out1, np.float32))


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("g", [1, 2])
def test_chunk_attention_matches_mha(quantized, g):
    """Flash chunk attention (chunked prefill) vs the XLA einsum path."""
    from inferflow_tpu.kernels.attention import chunk_attention

    rng = np.random.default_rng(2)
    L, B, H, S, D, C = 2, 3, 2, 512, 64, 32
    HQ = H * g
    slot, start = 1, 64
    cache = KVCache.create(L, B, S, H, D, quantized=quantized)
    cache = _fill_cache(cache, rng, [start + C] * B)

    q = jnp.asarray(rng.standard_normal((1, C, HQ, D)) * 0.3, jnp.bfloat16)
    out, _ = chunk_attention(q, cache, 1, slot, start, kq_scale=0.9,
                             interpret=True)
    k_full, v_full = cache.read_layer(1)
    k_slot = k_full[slot:slot + 1]
    v_slot = v_full[slot:slot + 1]
    qpos = (start + jnp.arange(C))[None, :]
    ref = mha(q, k_slot, v_slot, q_positions=qpos,
              kv_len=jnp.asarray([start + C], jnp.int32), kq_scale=0.9)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=0.06,
                               atol=0.06)


def test_supported_gates():
    cache = KVCache.create(2, 1, 2048, 2, 64)

    class S:
        pos_embedding_alg = "rope"

    assert decode_attention_supported(cache, S(), 1)
    assert not decode_attention_supported(cache, S(), 4)  # prefill
    S2 = S()
    S2.pos_embedding_alg = "alibi"
    assert not decode_attention_supported(cache, S2, 1)
    small = KVCache.create(2, 1, 256, 2, 64)
    assert decode_attention_supported(small, S(), 1)
    assert _pick_ts(48) == 0  # non-tileable seq length -> XLA fallback
    assert _pick_ts(1024) == 512
    # QUANTIZED caches slice the scale arrays' lane dim: packed seq dims
    # below 128 have no legal Mosaic tiling -> XLA fallback
    tiny_q = KVCache.create(2, 1, 128, 2, 32, quantized=True)  # S/pf = 32
    assert not decode_attention_supported(tiny_q, S(), 1)
    ok_q = KVCache.create(2, 1, 512, 2, 32, quantized=True)  # S/pf = 128
    assert decode_attention_supported(ok_q, S(), 1)
