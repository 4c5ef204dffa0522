"""Whole-model fused decode step (kernels/decode_step.py) parity tests.

Interpret-mode run of the single-call mega-kernel vs the per-layer XLA
path on identical weights and caches (VERDICT r2 items 1-2)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from inferflow_tpu.models.zoo import make_spec, make_synthetic_params
from inferflow_tpu.models.decoder import (decoder_layers_scan,
                                          decoder_layers_unrolled)
from inferflow_tpu.runtime.kv_cache import KVCache


def norm_rmsd(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    denom = np.sqrt((b * b).mean()) + 1e-9
    return np.sqrt(((a - b) ** 2).mean()) / denom


@pytest.fixture(scope="module",
                params=["Q4_B64T1", "Q8_B32T2", "Q3H_B64T1"])
def model(request):
    spec = make_spec("test-llama")
    spec.max_context_len = 512
    params = make_synthetic_params(spec, weight_format=request.param,
                                   stacked=True)
    return spec, params


def _prefill(spec, params, bsz, lengths, max_len=512):
    """Prefill `lengths[b]` random tokens per slot via the XLA path."""
    hp = spec.hyper_params
    rng = np.random.default_rng(0)
    cache = KVCache.create(hp.decoder_layers, bsz, max_len, hp.kv_heads,
                           hp.head_dim, quantized=True)
    t = max(lengths)
    x = jnp.asarray(rng.standard_normal((bsz, t, hp.embd_dims)) * 0.3,
                    jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(t)[None, :], (bsz, t))
    _, cache = decoder_layers_scan(spec, params["layers"], x, pos, cache,
                                   use_pallas=False)
    # per-slot actual lengths (rows beyond length are garbage; masked)
    return cache.with_length(jnp.asarray(lengths, jnp.int32))


@pytest.mark.parametrize("bsz,lengths",
                         [(1, [7]), (2, [5, 33]),
                          (5, [3, 9, 4, 2, 6])])
def test_fused_step_matches_unrolled(model, bsz, lengths):
    spec, params = model
    hp = spec.hyper_params
    from inferflow_tpu.kernels.decode_step import (fused_decode_step,
                                                   fused_step_supported)
    stacked = params["layers"]
    cache = _prefill(spec, params, bsz, lengths)
    assert fused_step_supported(spec, stacked, cache, bsz)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((bsz, 1, hp.embd_dims)) * 0.3,
                    jnp.bfloat16)
    pos = cache.length[:, None]

    ref_x, ref_cache = decoder_layers_unrolled(
        spec, stacked, x, pos, cache, use_pallas=False)
    got_x, got_cache = fused_decode_step(spec, stacked, x, pos, cache,
                                         interpret=True)

    err = norm_rmsd(got_x, ref_x)
    assert err < 0.03, f"hidden-state mismatch: norm_rmsd={err}"

    # appended KV rows must match (same codec, same rope)
    for layer in (0, hp.decoder_layers - 1):
        k_ref, v_ref = ref_cache.read_layer(layer, jnp.float32)
        k_got, v_got = got_cache.read_layer(layer, jnp.float32)
        for b, ln in enumerate(lengths):
            np.testing.assert_allclose(
                np.asarray(k_got[b, ln]), np.asarray(k_ref[b, ln]),
                rtol=0.05, atol=0.05)
            np.testing.assert_allclose(
                np.asarray(v_got[b, ln]), np.asarray(v_ref[b, ln]),
                rtol=0.05, atol=0.05)


def test_fused_step_i8mm():
    """device_layout='i8mm' through the mega kernel: int8 weights with a
    per-column scale applied to the output tile.  Reference is the
    per-layer path (linear() quantizes ACTIVATIONS to int8 as well, so
    tolerance covers that extra quantization)."""
    spec = make_spec("test-llama")
    spec.max_context_len = 512
    params = make_synthetic_params(spec, weight_format="Q8_B32T2",
                                   stacked=True, device_layout="i8mm")
    hp = spec.hyper_params
    from inferflow_tpu.kernels.decode_step import (fused_decode_step,
                                                   fused_step_supported)
    from inferflow_tpu.quant.codec_jax import Int8MXUTensor
    stacked = params["layers"]
    assert isinstance(stacked["attn"]["qkv"], Int8MXUTensor)
    cache = _prefill(spec, params, 1, [9])
    assert fused_step_supported(spec, stacked, cache, 1)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 1, hp.embd_dims)) * 0.3,
                    jnp.bfloat16)
    pos = cache.length[:, None]
    ref_x, _ = decoder_layers_unrolled(spec, stacked, x, pos, cache,
                                       use_pallas=False)
    got_x, _ = fused_decode_step(spec, stacked, x, pos, cache,
                                 interpret=True)
    err = norm_rmsd(got_x, ref_x)
    assert err < 0.05, f"i8mm hidden-state mismatch: norm_rmsd={err}"


def test_fused_step_i4():
    """device_layout='i4': native-int4 plane (codes-8), +8 folded into the
    base dot.  Codec round-trip must be EXACT vs the byte-packed plane;
    mega-kernel parity vs the per-layer path like the other layouts."""
    from inferflow_tpu.quant.codec_jax import (quantize, dequantize,
                                               repack_i4)
    from inferflow_tpu.kernels.dequant_matmul import pad_weight_for_tpu
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((256, 128)) * 0.1, jnp.float32)
    qt = pad_weight_for_tpu(quantize(w, "Q4_B64T1"))
    qi = repack_i4(qt)
    assert "data_i4p" in qi.planes \
        and qi.planes["data_i4p"].dtype == jnp.uint8
    np.testing.assert_array_equal(
        np.asarray(dequantize(qi, jnp.float32)),
        np.asarray(dequantize(qt, jnp.float32)))

    spec = make_spec("test-llama")
    spec.max_context_len = 512
    params = make_synthetic_params(spec, weight_format="Q4_B64T1",
                                   stacked=True, device_layout="i4")
    hp = spec.hyper_params
    from inferflow_tpu.kernels.decode_step import (fused_decode_step,
                                                   fused_step_supported)
    stacked = params["layers"]
    assert "data_i4p" in stacked["attn"]["qkv"].planes
    cache = _prefill(spec, params, 1, [11])
    assert fused_step_supported(spec, stacked, cache, 1)

    x = jnp.asarray(rng.standard_normal((1, 1, hp.embd_dims)) * 0.3,
                    jnp.bfloat16)
    pos = cache.length[:, None]
    ref_x, _ = decoder_layers_unrolled(spec, stacked, x, pos, cache,
                                       use_pallas=False)
    got_x, _ = fused_decode_step(spec, stacked, x, pos, cache,
                                 interpret=True)
    err = norm_rmsd(got_x, ref_x)
    assert err < 0.03, f"i4 hidden-state mismatch: norm_rmsd={err}"


def test_fused_step_gating(model):
    """Unsupported shapes must be rejected, not miscomputed."""
    spec, params = model
    from inferflow_tpu.kernels.decode_step import fused_step_supported
    hp = spec.hyper_params
    cache = KVCache.create(hp.decoder_layers, 1, 512, hp.kv_heads,
                           hp.head_dim, quantized=True)
    assert fused_step_supported(spec, params["layers"], cache, 1)
    # unquantized cache -> no
    cache_f = KVCache.create(hp.decoder_layers, 1, 512, hp.kv_heads,
                             hp.head_dim, quantized=False)
    assert not fused_step_supported(spec, params["layers"], cache_f, 1)
    # batch too large -> no
    assert not fused_step_supported(spec, params["layers"], cache, 16)
    # list (heterogeneous) layers -> no
    assert not fused_step_supported(spec, [], cache, 1)


def test_fused_step_biases():
    """Per-matmul output biases (qwen-family fused qkv bias) through the
    mega kernel, parity vs the per-layer path."""
    spec = make_spec("test-llama")
    spec.max_context_len = 512
    params = make_synthetic_params(spec, weight_format="Q4_B64T1",
                                   stacked=True)
    hp = spec.hyper_params
    from inferflow_tpu.kernels.decode_step import (fused_decode_step,
                                                   fused_step_supported)
    stacked = {k: (dict(v) if isinstance(v, dict) else v)
               for k, v in params["layers"].items()}
    rng = np.random.default_rng(11)
    L = hp.decoder_layers
    nq = int(stacked["attn"]["qkv"].shape[-1])
    n2 = int(stacked["ffn"]["w2"].shape[-1])
    stacked["attn"]["qkv_b"] = jnp.asarray(
        rng.standard_normal((L, nq)) * 0.05, jnp.float32)
    stacked["ffn"]["w2_b"] = jnp.asarray(
        rng.standard_normal((L, n2)) * 0.05, jnp.float32)
    cache = _prefill(spec, dict(params, layers=stacked), 1, [13])
    assert fused_step_supported(spec, stacked, cache, 1)

    x = jnp.asarray(rng.standard_normal((1, 1, hp.embd_dims)) * 0.3,
                    jnp.bfloat16)
    pos = cache.length[:, None]
    ref_x, _ = decoder_layers_unrolled(spec, stacked, x, pos, cache,
                                       use_pallas=False)
    got_x, _ = fused_decode_step(spec, stacked, x, pos, cache,
                                 interpret=True)
    err = norm_rmsd(got_x, ref_x)
    assert err < 0.03, f"biased hidden-state mismatch: norm_rmsd={err}"


def test_fused_step_moe_routed():
    """Routed MoE FFN inside the mega kernel (Mixtral family): in-kernel
    gate + softmax + per-slot top-k + dynamic-expert weight DMA, parity
    vs the per-layer routed path."""
    # test-moe's default embd=64 is below the kernel's 128-lane minimum
    # output tile; real MoE models (Mixtral E=4096) are far above it
    spec = make_spec("test-moe", embd=128, inter=256)
    spec.max_context_len = 512
    params = make_synthetic_params(spec, weight_format="Q8_B32T2",
                                   stacked=True)
    hp = spec.hyper_params
    from inferflow_tpu.kernels.decode_step import (fused_decode_step,
                                                   fused_step_supported)
    stacked = params["layers"]
    assert "moe" in stacked and "experts_stacked" in stacked["moe"]
    rng = np.random.default_rng(5)
    for bsz, lengths in ((1, [9]), (2, [4, 21])):
        cache = _prefill(spec, params, bsz, lengths)
        assert fused_step_supported(spec, stacked, cache, bsz)
        x = jnp.asarray(rng.standard_normal((bsz, 1, hp.embd_dims)) * 0.3,
                        jnp.bfloat16)
        pos = cache.length[:, None]
        ref_x, _ = decoder_layers_unrolled(spec, stacked, x, pos, cache,
                                           use_pallas=False)
        got_x, _ = fused_decode_step(spec, stacked, x, pos, cache,
                                     interpret=True)
        err = norm_rmsd(got_x, ref_x)
        assert err < 0.03, f"moe b{bsz} mismatch: norm_rmsd={err}"


def _paged_from_dense(dense: KVCache):
    """Pool-paged cache with the SAME packed contents as a dense cache:
    page j of slot b <- dense packed rows [j*128, (j+1)*128)."""
    from inferflow_tpu.runtime.paged_kv import PagedKVCache, PAGE_S2
    L, B, H, S2, dp = dense.k.shape
    npg = S2 // PAGE_S2
    pc = PagedKVCache.create(
        L, B, S2 * dense.pf, H, dense.head_dim,
        pool_tokens=(B * npg + 1) * PAGE_S2 * dense.pf, quantized=True)
    k, v, ks, vs = pc.k, pc.v, pc.k_scale, pc.v_scale
    table = np.zeros((B, pc.max_pages_per_slot), np.int32)
    nxt = 1
    for b in range(B):
        for j in range(npg):
            pid = nxt
            nxt += 1
            table[b, j] = pid
            sl = slice(j * PAGE_S2, (j + 1) * PAGE_S2)
            k = k.at[:, pid].set(dense.k[:, b, :, sl, :])
            v = v.at[:, pid].set(dense.v[:, b, :, sl, :])
            ks = ks.at[:, pid].set(dense.k_scale[:, b, :, :, sl])
            vs = vs.at[:, pid].set(dense.v_scale[:, b, :, :, sl])
    return PagedKVCache(k, v, ks, vs, jnp.asarray(table), dense.length,
                        head_dim=dense.head_dim)


def test_fused_step_paged(model):
    """Mega kernel over the PAGED pool (VERDICT r4 #5): the page walk via
    the scalar-prefetched table must be BIT-identical to the dense tile
    walk (same packed codes, same kernel math), and the paged all-layers
    append must land the same rows."""
    spec, params = model
    hp = spec.hyper_params
    from inferflow_tpu.kernels.decode_step import (fused_decode_step,
                                                   fused_step_supported)
    stacked = params["layers"]
    bsz, lengths = 2, [5, 203]
    dense = _prefill(spec, params, bsz, lengths)
    paged = _paged_from_dense(dense)
    assert fused_step_supported(spec, stacked, paged, bsz)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((bsz, 1, hp.embd_dims)) * 0.3,
                    jnp.bfloat16)
    pos = dense.length[:, None]
    ref_x, ref_cache = fused_decode_step(spec, stacked, x, pos, dense,
                                         interpret=True)
    got_x, got_cache = fused_decode_step(spec, stacked, x, pos, paged,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(got_x, np.float32),
                                  np.asarray(ref_x, np.float32))

    # the appended row must read back identically from the pool
    for layer in (0, hp.decoder_layers - 1):
        k_ref, v_ref = ref_cache.read_layer(layer, jnp.float32)
        k_got, v_got = got_cache.read_layer(layer, jnp.float32)
        for b, ln in enumerate(lengths):
            np.testing.assert_array_equal(np.asarray(k_got[b, ln]),
                                          np.asarray(k_ref[b, ln]))
            np.testing.assert_array_equal(np.asarray(v_got[b, ln]),
                                          np.asarray(v_ref[b, ln]))


def test_fused_step_moe_i8mm():
    """Routed MoE with the int8-MXU container (the serving default now
    that auto resolves i8mm): expert-stacked (L, E, K, N) planes and
    (L, E, N) column scales through the mega kernel.  Guards the
    [..., None, :] scale reshape — the [:, None, :] form put E on the
    DMA-sliced axis and failed on-chip with a shape mismatch."""
    spec = make_spec("test-moe", embd=128, inter=256)
    spec.max_context_len = 512
    params = make_synthetic_params(spec, weight_format="Q8_B32T2",
                                   stacked=True, device_layout="i8mm")
    hp = spec.hyper_params
    from inferflow_tpu.kernels.decode_step import (fused_decode_step,
                                                   fused_step_supported)
    stacked = params["layers"]
    rng = np.random.default_rng(6)
    cache = _prefill(spec, params, 2, [4, 21])
    assert fused_step_supported(spec, stacked, cache, 2)
    x = jnp.asarray(rng.standard_normal((2, 1, hp.embd_dims)) * 0.3,
                    jnp.bfloat16)
    pos = cache.length[:, None]
    ref_x, _ = decoder_layers_unrolled(spec, stacked, x, pos, cache,
                                       use_pallas=False)
    got_x, _ = fused_decode_step(spec, stacked, x, pos, cache,
                                 interpret=True)
    err = norm_rmsd(got_x, ref_x)
    assert err < 0.05, f"moe-i8mm mismatch: norm_rmsd={err}"


def test_fused_step_i4_bf16_mode(monkeypatch):
    """INFERFLOW_I4_DOT=bf16 keeps the exact-activation unpack path
    alive (the default i4x8 path quantizes activations to int8)."""
    monkeypatch.setenv("INFERFLOW_I4_DOT", "bf16")
    test_fused_step_i4()
