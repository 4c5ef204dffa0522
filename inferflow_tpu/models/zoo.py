"""Synthetic model builder + named architecture configs.

Builds randomly-initialized models with real production shapes for
benchmarking and the driver's compile checks (no network egress: weights
are generated on device, layer by layer, and quantized in place).
Architecture shapes mirror the reference's model zoo entries
(/root/reference/data/models/*/model_spec.json).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.codec_jax import QuantizedTensor, quantize
from .spec import HyperParams, ModelSpec

CONFIGS = {
    # name: (layers, embd, heads, kv_heads, intermediate, vocab)
    "test-tiny": dict(layers=2, embd=64, heads=4, kv_heads=4, inter=128,
                      vocab=256),
    "stories15m": dict(layers=6, embd=288, heads=6, kv_heads=6, inter=768,
                       vocab=32000),
    "tinyllama-1.1b": dict(layers=22, embd=2048, heads=32, kv_heads=4,
                           inter=5632, vocab=32000),
    "llama2-7b": dict(layers=32, embd=4096, heads=32, kv_heads=32,
                      inter=11008, vocab=32000),
    "llama2-13b": dict(layers=40, embd=5120, heads=40, kv_heads=40,
                       inter=13824, vocab=32000),
    # Mixtral-8x7B-shaped MoE (reference config:
    # data/models/mixtral_8x7b_instruct_v0.1)
    "mixtral-8x7b": dict(layers=32, embd=4096, heads=32, kv_heads=8,
                         inter=14336, vocab=32000, experts=8, moe_top_k=2),
    "test-moe": dict(layers=2, embd=64, heads=4, kv_heads=4, inter=128,
                     vocab=256, experts=4, moe_top_k=2),
    # Mixtral layer geometry at a depth that fits one 16GB v5e chip at
    # 4-bit (~3.4GB): the on-chip routed-MoE decode bench —
    # INFERFLOW_BENCH_MODEL=mixtral-scaled — shows bytes/step ∝ top_k/E
    # without needing the full 32-layer model
    "mixtral-scaled": dict(layers=4, embd=4096, heads=32, kv_heads=8,
                           inter=14336, vocab=32000, experts=8,
                           moe_top_k=2),
    # GQA llama-shaped, large enough for the fused whole-model decode
    # kernel's tiling (kernels/decode_step.py: every matmul N % 128 == 0)
    "test-llama": dict(layers=3, embd=256, heads=8, kv_heads=2, inter=512,
                       vocab=512),
}


def make_spec(name: str, **overrides) -> ModelSpec:
    cfg = dict(CONFIGS[name])
    cfg.update({k: overrides.pop(k) for k in list(overrides)
                if k in ("layers", "embd", "heads", "kv_heads", "inter",
                         "vocab", "experts", "moe_top_k")})
    hp = HyperParams(vocab_size=cfg["vocab"], embd_dims=cfg["embd"],
                     decoder_layers=cfg["layers"], decoder_heads=cfg["heads"],
                     decoder_kv_heads=cfg["kv_heads"], hidden_dim=cfg["embd"],
                     decoder_intermediate_size=cfg["inter"],
                     experts=cfg.get("experts", 0),
                     moe_top_k=cfg.get("moe_top_k", 0))
    spec = ModelSpec(sid=name, hyper_params=hp, norm_alg="rms",
                     activation_fn="silu", pos_embedding_alg="rope",
                     qk_column_order=2, **overrides)
    return spec


def _maybe_quant(w, weight_format: Optional[str], device_layout: str = "",
                 leaf: str = ""):
    if weight_format in (None, "F16", "BF16", "F32"):
        return w.astype(jnp.bfloat16)
    if leaf:
        from ..quant.codec_jax import layout_for_leaf
        device_layout = layout_for_leaf(device_layout, leaf)
    from ..quant.formats import get_format
    if w.shape[0] % get_format(weight_format).block != 0:
        # K not a block multiple: keep dense (mirrors the loader's
        # small/odd-tensor exemption, network_builder.cc:1648-1652)
        return w.astype(jnp.bfloat16)
    from ..kernels.dequant_matmul import pad_weight_for_tpu
    qt = quantize(w, weight_format)
    if device_layout == "i8mm":
        from ..quant.codec_jax import requantize_i8_colwise
        return requantize_i8_colwise(qt)
    if device_layout == "q8c":
        from ..quant.codec_jax import requantize_q8_container
        qt = requantize_q8_container(qt)
    if device_layout == "i4":
        from ..quant.codec_jax import repack_i4
        return repack_i4(pad_weight_for_tpu(qt))
    return pad_weight_for_tpu(qt)


def make_synthetic_params(spec: ModelSpec, weight_format: Optional[str] = None,
                          seed: int = 0, stacked: bool = True,
                          device_layout: str = "") -> dict:
    """Random params, generated and quantized on device (layer-by-layer to
    bound host/HBM staging).

    For the stacked path, the layer-stacked buffers are PRE-ALLOCATED and
    filled per layer with donated writes: stacking afterwards needs one
    contiguous multi-GB allocation at the most fragmented moment, which
    fails on 10GB-class models even with free HBM."""
    if device_layout in ("", "auto") and weight_format:
        from ..quant.codec_jax import resolve_auto_layout
        device_layout = resolve_auto_layout(spec, weight_format)
    hp = spec.hyper_params
    E, I, V = hp.embd_dims, hp.decoder_intermediate_size, hp.vocab_size
    q_dim = hp.decoder_heads * hp.head_dim
    kv_dim = hp.kv_heads * hp.head_dim
    key = jax.random.PRNGKey(seed)

    def rand(key, k, n):
        scale = 0.5 / np.sqrt(k)
        return jax.random.normal(key, (k, n), dtype=jnp.float32) * scale

    @jax.jit
    def gen_layer(key):
        ks = jax.random.split(key, 7)
        return {
            "wq": rand(ks[0], E, q_dim), "wk": rand(ks[1], E, kv_dim),
            "wv": rand(ks[2], E, kv_dim), "wo": rand(ks[3], q_dim, E),
            "w1": rand(ks[4], E, I), "w2": rand(ks[5], I, E),
            "w3": rand(ks[6], E, I),
        }

    def build_layer(i):
        nonlocal key
        key, sub = jax.random.split(key)
        raw = gen_layer(sub)
        layer = {
            "attn": {"pre_norm": jnp.ones((E,), jnp.bfloat16),
                     **{k: _maybe_quant(raw[k], weight_format,
                                        device_layout, leaf=k)
                        for k in ("wq", "wk", "wv", "wo")}},
        }
        if hp.experts:
            key2, gk = jax.random.split(jax.random.fold_in(key, i))
            experts = []
            for e in range(hp.experts):
                key2, e1, e2, e3 = jax.random.split(key2, 4)
                experts.append({
                    "w1": _maybe_quant(rand(e1, E, I), weight_format,
                                       device_layout, leaf="w1"),
                    "w2": _maybe_quant(rand(e2, I, E), weight_format,
                                       device_layout, leaf="w2"),
                    "w3": _maybe_quant(rand(e3, E, I), weight_format,
                                       device_layout, leaf="w3")})
            layer["moe"] = {
                "pre_norm": jnp.ones((E,), jnp.bfloat16),
                "gate": rand(gk, E, hp.experts).astype(jnp.bfloat16),
                "experts": experts,
            }
        else:
            layer["ffn"] = {"pre_norm": jnp.ones((E,), jnp.bfloat16),
                            **{k: _maybe_quant(raw[k], weight_format,
                                               device_layout, leaf=k)
                               for k in ("w1", "w2", "w3")}}
        from .decoder import fuse_layer_weights, stack_moe_experts
        return stack_moe_experts(fuse_layer_weights([layer]))[0]

    from .decoder import stack_layers

    if not stacked:
        layers = [build_layer(i) for i in range(hp.decoder_layers)]
    else:
        first = build_layer(0)
        stacked_tree = _prealloc_stacked(first, hp.decoder_layers)
        stacked_tree = _fill_layer(stacked_tree, first, 0)
        del first
        for i in range(1, hp.decoder_layers):
            layer = build_layer(i)
            stacked_tree = _fill_layer(stacked_tree, layer, i)
            del layer
        layers = stacked_tree

    key, k1, k2 = jax.random.split(key, 3)
    emb = jax.random.normal(k1, (V, E), dtype=jnp.float32) * 0.02
    head = rand(k2, E, V)
    sample = layers if not stacked else None
    if (sample and all("qkv" in l["attn"] for l in sample)) or (
            stacked and isinstance(layers, dict)
            and "qkv" in layers.get("attn", {})):
        spec.qkv_format = 1
    params = {
        "dec_embeddings": emb.astype(jnp.bfloat16),
        "dec_output_norm": jnp.ones((E,), jnp.bfloat16),
        "lm_head": _maybe_quant(head, weight_format, device_layout,
                                leaf="lm_head"),
        "layers": layers,
    }
    return params


def _prealloc_stacked(layer: dict, n_layers: int):
    """Allocate a layer-stacked pytree of zeros shaped after one layer."""
    from ..quant.delta import QuantizedWithDelta, DeltaTensor

    def alloc(v):
        if isinstance(v, dict):
            return {k: alloc(x) for k, x in v.items()}
        if isinstance(v, list):
            return [alloc(x) for x in v]
        if isinstance(v, QuantizedWithDelta):
            return QuantizedWithDelta(
                alloc(v.qt),
                DeltaTensor(jnp.zeros((n_layers,) + v.delta.idx.shape,
                                      v.delta.idx.dtype),
                            jnp.zeros((n_layers,) + v.delta.val.shape,
                                      v.delta.val.dtype)))
        if isinstance(v, QuantizedTensor):
            planes = {k: jnp.zeros((n_layers,) + p.shape, p.dtype)
                      for k, p in v.planes.items()}
            return QuantizedTensor(v.format,
                                   (n_layers,) + tuple(v.shape), planes,
                                   jnp.zeros((n_layers,) + v.scale.shape,
                                             v.scale.dtype),
                                   None if v.base is None else
                                   jnp.zeros((n_layers,) + v.base.shape,
                                             v.base.dtype))
        if hasattr(v, "kind"):  # GlobalQuantTensor
            from ..quant.codec_jax import GlobalQuantTensor
            return GlobalQuantTensor(
                v.kind, (n_layers,) + tuple(v.shape),
                jnp.zeros((n_layers,) + v.codes.shape, v.codes.dtype),
                jnp.zeros((n_layers,) + v.params.shape, v.params.dtype))
        if hasattr(v, "data"):  # Int8MXUTensor
            from ..quant.codec_jax import Int8MXUTensor
            return Int8MXUTensor(
                (n_layers,) + tuple(v.shape),
                jnp.zeros((n_layers,) + v.data.shape, v.data.dtype),
                jnp.zeros((n_layers,) + v.scale.shape, v.scale.dtype))
        arr = jnp.asarray(v)
        return jnp.zeros((n_layers,) + arr.shape, arr.dtype)

    return alloc(layer)


import functools


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_leaf(stacked_arr, leaf_arr, i):
    return jax.lax.dynamic_update_slice(
        stacked_arr, leaf_arr[None].astype(stacked_arr.dtype),
        (i,) + (0,) * leaf_arr.ndim)


def _fill_layer(stacked_tree, layer: dict, i: int):
    """Write one layer's leaves into the stacked pytree (donated writes)."""
    from ..quant.delta import QuantizedWithDelta, DeltaTensor

    def fill(sv, lv):
        if isinstance(sv, dict):
            return {k: fill(sv[k], lv[k]) for k in sv}
        if isinstance(sv, list):
            return [fill(a, b) for a, b in zip(sv, lv)]
        if isinstance(sv, QuantizedWithDelta):
            return QuantizedWithDelta(
                fill(sv.qt, lv.qt),
                DeltaTensor(_set_leaf(sv.delta.idx, lv.delta.idx,
                                      jnp.int32(i)),
                            _set_leaf(sv.delta.val, lv.delta.val,
                                      jnp.int32(i))))
        if isinstance(sv, QuantizedTensor):
            planes = {k: _set_leaf(sv.planes[k], lv.planes[k],
                                   jnp.int32(i)) for k in sv.planes}
            scale = _set_leaf(sv.scale, lv.scale, jnp.int32(i))
            base = (None if sv.base is None
                    else _set_leaf(sv.base, lv.base, jnp.int32(i)))
            return QuantizedTensor(sv.format, sv.shape, planes, scale,
                                   base)
        if hasattr(sv, "kind"):
            from ..quant.codec_jax import GlobalQuantTensor
            return GlobalQuantTensor(
                sv.kind, sv.shape,
                _set_leaf(sv.codes, lv.codes, jnp.int32(i)),
                _set_leaf(sv.params, lv.params, jnp.int32(i)))
        if hasattr(sv, "data"):  # Int8MXUTensor
            from ..quant.codec_jax import Int8MXUTensor
            return Int8MXUTensor(
                sv.shape,
                _set_leaf(sv.data, lv.data, jnp.int32(i)),
                _set_leaf(sv.scale, lv.scale, jnp.int32(i)))
        return _set_leaf(sv, jnp.asarray(lv), jnp.int32(i))

    return fill(stacked_tree, layer)


def model_weight_bytes(params: dict) -> int:
    """Total bytes of all weights (quantized tensors count packed bytes)."""
    total = 0

    def visit(v):
        nonlocal total
        if isinstance(v, dict):
            for x in v.values():
                visit(x)
        elif isinstance(v, list):
            for x in v:
                visit(x)
        elif isinstance(v, QuantizedTensor):
            total += v.nbytes
        elif hasattr(v, "nbytes"):
            total += v.nbytes

    visit(params)
    return total
