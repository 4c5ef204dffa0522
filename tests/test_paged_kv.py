"""Paged KV cache (runtime/paged_kv.py): pool/page-table parity vs the
dense cache, the paged decode-attention kernel, and the decoder routing.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inferflow_tpu.runtime.kv_cache import KVCache
from inferflow_tpu.runtime.paged_kv import (PAGE_S2, PagedKVCache,
                                            scatter_prefill_pages)


def norm_rmsd(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    return np.sqrt(((a - b) ** 2).mean()) / (np.sqrt((b * b).mean()) + 1e-9)


@pytest.mark.parametrize("d,quantized", [(128, True), (64, True),
                                         (128, False)])
def test_paged_update_read_matches_dense(d, quantized):
    """Appending the same rows row-by-row into dense and paged caches
    must read back identically (same codec, same packed layout), with
    the paged rows crossing page boundaries."""
    L, B, H = 2, 2, 2
    pf = 128 // d if d < 128 else 1
    page_tokens = PAGE_S2 * pf
    max_len = 3 * page_tokens  # 3 pages per slot
    dense = KVCache.create(L, B, max_len, H, d, quantized=quantized)
    paged = PagedKVCache.create(L, B, max_len, H, d,
                                pool_tokens=B * max_len,
                                quantized=quantized)
    # slot 0 -> pages [1, 2, 3]; slot 1 -> pages [4, 5, 6] (page 0 spare)
    paged = paged.with_page_row(0, np.array([1, 2, 3], np.int32))
    paged = paged.with_page_row(1, np.array([4, 5, 6], np.int32))

    rng = np.random.default_rng(0)
    n_rows = page_tokens + 3  # crosses the first page boundary
    for r in range(n_rows):
        k_new = jnp.asarray(rng.standard_normal((B, 1, H, d)) * 0.5,
                            jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, 1, H, d)) * 0.5,
                            jnp.float32)
        start = jnp.full((B,), r, jnp.int32)
        for layer in range(L):
            dense = dense.update_layer(layer, k_new + layer, v_new - layer,
                                       start)
            paged = paged.update_layer(layer, k_new + layer, v_new - layer,
                                       start)

    for layer in range(L):
        kd, vd = dense.read_layer(layer, jnp.float32)
        kp, vp = paged.read_layer(layer, jnp.float32)
        np.testing.assert_array_equal(np.asarray(kp[:, :n_rows]),
                                      np.asarray(kd[:, :n_rows]))
        np.testing.assert_array_equal(np.asarray(vp[:, :n_rows]),
                                      np.asarray(vd[:, :n_rows]))


def test_scatter_prefill_pages_matches_dense():
    """A dense (1, bucket) prefill temp cache scattered into pool pages
    reads back equal to the dense slot-scatter."""
    L, B, H, d = 2, 2, 2, 128
    max_len = 4 * PAGE_S2
    bucket = 2 * PAGE_S2 + 64  # padded to the page grid by the scatter
    rng = np.random.default_rng(1)
    tmp = KVCache.create(L, 1, 2 * PAGE_S2 + 128, H, d, quantized=True)
    length = 2 * PAGE_S2 + 40
    k_rows = jnp.asarray(rng.standard_normal((1, length, H, d)) * 0.5,
                         jnp.float32)
    v_rows = jnp.asarray(rng.standard_normal((1, length, H, d)) * 0.5,
                         jnp.float32)
    for layer in range(L):
        tmp = tmp.update_layer(layer, k_rows + layer, v_rows,
                               jnp.zeros((1,), jnp.int32))

    paged = PagedKVCache.create(L, B, max_len, H, d,
                                pool_tokens=B * max_len, quantized=True)
    pids = np.array([3, 1, 5], np.int32)  # deliberately non-contiguous
    paged = paged.with_page_row(1, np.concatenate([pids, [0]]).astype(
        np.int32))
    paged = scatter_prefill_pages(paged, tmp, jnp.asarray(pids),
                                  jnp.int32(length), slot=1, n_pages=3)
    assert int(paged.length[1]) == length

    for layer in range(L):
        kd, _ = tmp.read_layer(layer, jnp.float32)
        kp, _ = paged.read_layer(layer, jnp.float32)
        np.testing.assert_array_equal(np.asarray(kp[1, :length]),
                                      np.asarray(kd[0, :length]))


def test_paged_attention_kernel_interpret_parity():
    """The paged decode-attention kernel (interpret mode) vs the XLA
    logical-read path on the same paged cache."""
    from inferflow_tpu.kernels.attention import decode_attention
    from inferflow_tpu.ops.attention import mha

    L, B, H, d, g = 1, 2, 2, 128, 2
    max_len = 3 * PAGE_S2
    paged = PagedKVCache.create(L, B, max_len, H, d,
                                pool_tokens=B * max_len, quantized=True)
    paged = paged.with_page_row(0, np.array([2, 4, 1], np.int32))
    paged = paged.with_page_row(1, np.array([5, 3, 0], np.int32))
    rng = np.random.default_rng(2)
    lengths = [PAGE_S2 + 17, 2 * PAGE_S2 + 5]
    n = max(lengths)
    for r in range(n):
        k_new = jnp.asarray(rng.standard_normal((B, 1, H, d)) * 0.5,
                            jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, 1, H, d)) * 0.5,
                            jnp.float32)
        paged = paged.update_layer(0, k_new, v_new,
                                   jnp.full((B,), r, jnp.int32))
    paged = paged.with_length(jnp.asarray(lengths, jnp.int32))

    q = jnp.asarray(rng.standard_normal((B, 1, H * g, d)) * 0.3,
                    jnp.bfloat16)
    out, _ = decode_attention(q, paged, 0, paged.length,
                              kq_scale=0.9, interpret=True)

    k_full, v_full = paged.read_layer(0, jnp.float32)
    ref = mha(q.astype(jnp.float32), k_full, v_full,
              q_positions=(paged.length - 1)[:, None],
              kv_len=paged.length, kq_scale=0.9)
    err = norm_rmsd(out, ref)
    assert err < 0.02, f"paged kernel mismatch: norm_rmsd={err}"


def test_decoder_paged_matches_dense():
    """decoder_layers_unrolled over a paged cache (XLA fallback routing
    on CPU) matches the dense cache bit-for-bit when the paged logical
    S equals the dense max_context (one page per slot)."""
    from inferflow_tpu.models.zoo import make_spec, make_synthetic_params
    from inferflow_tpu.models.decoder import (decoder_layers_scan,
                                              decoder_layers_unrolled)

    spec = make_spec("test-llama")  # d=32 -> pf=4 -> page_tokens=512
    spec.max_context_len = 512
    params = make_synthetic_params(spec, weight_format="Q8_B32T2",
                                   stacked=True)
    hp = spec.hyper_params
    stacked = params["layers"]
    B = 2
    dense = KVCache.create(hp.decoder_layers, B, 512, hp.kv_heads,
                           hp.head_dim, quantized=True)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.standard_normal((B, 6, hp.embd_dims)) * 0.3,
                     jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(6)[None, :], (B, 6))
    _, dense = decoder_layers_scan(spec, stacked, x0, pos, dense,
                                   use_pallas=False)
    dense = dense.with_length(jnp.asarray([6, 4], jnp.int32))

    paged = PagedKVCache.create(hp.decoder_layers, B, 512, hp.kv_heads,
                                hp.head_dim, pool_tokens=B * 512,
                                quantized=True)
    paged = paged.with_page_row(0, np.array([0], np.int32))
    paged = paged.with_page_row(1, np.array([1], np.int32))
    # copy the dense prefill rows into the pages via per-slot temp views
    for slot in range(B):
        tmp = KVCache(dense.k[:, slot:slot + 1], dense.v[:, slot:slot + 1],
                      dense.k_scale[:, slot:slot + 1],
                      dense.v_scale[:, slot:slot + 1],
                      dense.length[slot:slot + 1],
                      head_dim=dense.head_dim)
        paged = scatter_prefill_pages(
            paged, tmp, jnp.asarray([slot], jnp.int32),
            dense.length[slot], slot=slot, n_pages=1)
    paged = paged.with_length(dense.length)

    x = jnp.asarray(rng.standard_normal((B, 1, hp.embd_dims)) * 0.3,
                    jnp.bfloat16)
    ref_x, _ = decoder_layers_unrolled(spec, stacked, x,
                                       dense.length[:, None], dense,
                                       use_pallas=False)
    got_x, got_c = decoder_layers_unrolled(spec, stacked, x,
                                           paged.length[:, None], paged,
                                           use_pallas=True)
    assert isinstance(got_c, PagedKVCache)
    err = norm_rmsd(got_x, ref_x)
    assert err < 0.01, f"paged decoder mismatch: norm_rmsd={err}"


def test_engine_paged_matches_dense():
    """End-to-end: the paged engine produces the same greedy tokens as
    the dense engine (one page per slot -> identical logical S, so the
    XLA attention programs match shape-for-shape on CPU)."""
    from inferflow_tpu.models.zoo import make_spec, make_synthetic_params
    from inferflow_tpu.runtime.engine import InferenceEngine
    from inferflow_tpu.sampling.strategies import SamplingOptions

    spec = make_spec("test-llama")  # d=32 -> page_tokens=512
    spec.max_context_len = 512
    params = make_synthetic_params(spec, weight_format="Q8_B32T2",
                                   stacked=True)
    dense = InferenceEngine(spec, dict(params), max_concurrent_queries=2,
                            max_context_len=512, kv_cache_quantized=True)
    paged = InferenceEngine(spec, dict(params), max_concurrent_queries=2,
                            max_context_len=512, kv_cache_quantized=True,
                            kv_cache_paging=True)
    assert isinstance(paged.cache, PagedKVCache)
    p = [3, 17, 9, 25, 4]
    opts = SamplingOptions(strategy="greedy")
    a = paged.generate(list(p), opts, max_new_tokens=6)
    b = dense.generate(list(p), opts, max_new_tokens=6)
    assert a == b
    # pages released on finish
    assert not paged._slot_pages
    assert len(paged._free_pages) == paged.cache.num_pages - 1


def test_engine_paged_admission_defers_until_pages_free():
    """Fragmentation win: a pool HALF the dense reservation serves more
    queries than it has room for at once — the third query defers while
    the pool is full and completes after a release (the dense cache
    would need slots x max_context up front)."""
    from inferflow_tpu.models.zoo import make_spec, make_synthetic_params
    from inferflow_tpu.runtime.engine import InferenceEngine
    from inferflow_tpu.sampling.strategies import SamplingOptions

    spec = make_spec("test-llama")
    spec.max_context_len = 512
    params = make_synthetic_params(spec, weight_format="Q8_B32T2",
                                   stacked=True)
    # 4 slots x 512 dense = 2048 tokens; pool = 3 pages (1536) of which
    # page 0 is reserved -> 2 usable pages, each query needs 1
    eng = InferenceEngine(spec, params, max_concurrent_queries=4,
                          max_context_len=512, kv_cache_quantized=True,
                          kv_cache_paging=True, kv_pool_tokens=1536)
    assert eng.cache.num_pages == 3
    opts = SamplingOptions(strategy="greedy")
    q1 = eng.add_query([3, 5, 7], opts, max_new_tokens=3)
    q2 = eng.add_query([2, 9], opts, max_new_tokens=3)
    q3 = eng.add_query([11, 4], opts, max_new_tokens=3)
    assert q1 > 0 and q2 > 0 and q3 > 0
    # two steps: q1+q2 prefill and decode; q3 must still be pending
    eng.commit_inference_result(eng.infer())
    eng.commit_inference_result(eng.infer())
    with eng._lock:
        pending = [q.query_id for q in eng.table.prefill_pending()]
    assert q3 in pending
    assert not eng._free_pages  # pool saturated
    for _ in range(12):
        eng.commit_inference_result(eng.infer())
        if not eng.has_work():
            break
    assert not eng.has_work()
    for q in (q1, q2, q3):
        assert len(eng.query_tokens(q)) >= 1
    assert len(eng._free_pages) == 2
