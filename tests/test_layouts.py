"""Device-layout selection tests (ADVICE r4): layout_for_leaf mapping,
'mixed' end-to-end parity, and the guarantee that mixed trees reject the
fused mega kernel (wire-packed attention routes per-layer)."""

import numpy as np
import jax.numpy as jnp
import pytest

from inferflow_tpu.quant.codec_jax import (MIXED_CONTAINER_LEAVES,
                                           layout_for_leaf)
from inferflow_tpu.models.zoo import make_spec, make_synthetic_params


def test_layout_for_leaf_mapping():
    # FFN slots take the q8c container under 'mixed'
    for leaf in ("w1", "w2", "w3", "w1n3"):
        assert leaf in MIXED_CONTAINER_LEAVES
        assert layout_for_leaf("mixed", leaf) == "q8c"
    # attention, lm_head and the MoE gate stay on the wire layout
    for leaf in ("wq", "wk", "wv", "wo", "qkv", "lm_head", "gate"):
        assert layout_for_leaf("mixed", leaf) == "packed"
    # every other layout is uniform regardless of leaf
    for layout in ("", "packed", "q8c", "i8mm", "i4"):
        for leaf in ("w1", "qkv", "lm_head"):
            assert layout_for_leaf(layout, leaf) == layout


@pytest.fixture(scope="module")
def mixed_and_packed():
    spec = make_spec("test-llama")
    spec.max_context_len = 512
    mixed = make_synthetic_params(spec, weight_format="Q4_B64T1",
                                  stacked=True, device_layout="mixed")
    packed = make_synthetic_params(spec, weight_format="Q4_B64T1",
                                   stacked=True, device_layout="packed")
    return spec, mixed, packed


def test_mixed_builds_expected_containers(mixed_and_packed):
    spec, mixed, packed = mixed_and_packed
    layers = mixed["layers"]
    # attention stays on the wire format (sub-byte packed plane)
    assert layers["attn"]["qkv"].format == "Q4_B64T1"
    assert "data" in layers["attn"]["qkv"].planes
    # FFN re-encoded into the Q8_B32T2 container
    assert layers["ffn"]["w1n3"].format == "Q8_B32T2"
    assert layers["ffn"]["w2"].format == "Q8_B32T2"
    # lm_head stays wire
    assert mixed["lm_head"].format == "Q4_B64T1"


def test_mixed_decode_parity(mixed_and_packed):
    """Mixed-layout logits stay within the q8c double-quantization error
    of the all-wire model on the per-layer decode path."""
    from inferflow_tpu.models.decoder import decoder_forward_scan
    from inferflow_tpu.runtime.kv_cache import KVCache

    spec, mixed, packed = mixed_and_packed
    hp = spec.hyper_params
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(4, hp.vocab_size - 1, (1, 9)),
                       jnp.int32)
    pos = jnp.arange(9, dtype=jnp.int32)[None, :]

    outs = {}
    for name, params in (("mixed", mixed), ("packed", packed)):
        cache = KVCache.create(hp.decoder_layers, 1, 512, hp.kv_heads,
                               hp.head_dim, quantized=True)
        logits, _ = decoder_forward_scan(spec, params, toks, pos, cache)
        outs[name] = np.asarray(logits, np.float32)
    a, b = outs["mixed"].ravel(), outs["packed"].ravel()
    rmsd = np.sqrt(((a - b) ** 2).mean()) / (np.sqrt((b * b).mean()) + 1e-9)
    assert rmsd < 0.05, f"mixed vs packed logits norm_rmsd={rmsd}"


def test_mixed_rejects_fused_step(mixed_and_packed):
    """The mega kernel must not take a mixed tree: the wire-packed
    attention tensors make fused_step_preferred return False (stream
    unpack is VPU-bound in-kernel), so the engine routes per-layer."""
    from inferflow_tpu.kernels.decode_step import (fused_step_preferred,
                                                   fused_step_supported)
    from inferflow_tpu.runtime.kv_cache import KVCache

    spec, mixed, _ = mixed_and_packed
    hp = spec.hyper_params
    cache = KVCache.create(hp.decoder_layers, 1, 512, hp.kv_heads,
                           hp.head_dim, quantized=True)
    stacked = mixed["layers"]
    # capability may hold (Q4 is a supported in-kernel format)...
    assert fused_step_supported(spec, stacked, cache, 1)
    # ...but the measured routing must refuse wire-packed streams
    assert not fused_step_preferred(spec, stacked, cache, 1)
