"""Tensor-parallel decode inside shard_map: Pallas kernels on LOCAL shards.

The reference runs its quantized GEMV on every TP shard and all-reduces
after attention and FFN (inference_worker.cc:1381-1391 dispatch +
network_builder.cc:1373-1406 col/row split).  GSPMD cannot partition
Pallas custom calls — under a weight-sharding mesh it would all-gather
the weights into every kernel call — so round-3 mesh engines forced the
pure-XLA decode path.  This module is the round-4 route (VERDICT r3
item 6 / PLAN 9b): the decode layer stack runs INSIDE jax.shard_map,
where operands arrive as local shards, so the per-layer Pallas kernels
(fused decode attention, quantized dequant-matmul) apply UNCHANGED with
a head-scaled local spec; the two row-split matmul outputs (wo, w2)
psum over 'tp' exactly where the reference placed its all-reduces.

The fused-qkv column order is the one wrinkle: a contiguous tp shard of
the format-1 ([all Q | all K | all V]) N axis crosses the Q/K/V
boundaries.  The reference re-slices each of Q/K/V per rank
(network_builder.cc:1390-1398); here the weight is repacked ONCE at
engine init into the repo's existing qkv_format=0 layout (per-kv-group
[g q-heads | k | v], model.h:109 / tensor_opr.h:46) — a contiguous tp
shard of THAT axis is exactly hk/tp whole head groups, and the global
(GSPMD prefill) path keeps working because _split_qkv already
understands format 0.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from ..quant.codec_jax import QuantizedTensor, Int8MXUTensor
from .sharding import spec_for


def _group_interleave_cols(n_heads: int, n_kv: int, head_dim: int
                           ) -> np.ndarray:
    """Column permutation fused-QKV format 1 -> format 0: for each kv
    group i, [its g q-head cols | its k-head cols | its v-head cols]."""
    g = n_heads // n_kv
    qd = n_heads * head_dim
    kd = n_kv * head_dim
    idx = []
    for i in range(n_kv):
        idx.extend(range(i * g * head_dim, (i + 1) * g * head_dim))
        idx.extend(range(qd + i * head_dim, qd + (i + 1) * head_dim))
        idx.extend(range(qd + kd + i * head_dim, qd + kd + (i + 1) * head_dim))
    return np.asarray(idx, np.int32)


def _take_cols(w, idx):
    """Permute the N (last) axis of a weight of any supported container.
    Column permutations are exact for every quant container here: the
    quant groups run along K, so columns are independent."""
    take = lambda a: (None if a is None else jnp.take(a, idx, axis=-1))
    if isinstance(w, QuantizedTensor):
        return QuantizedTensor(w.format, w.shape,
                               {k: take(p) for k, p in w.planes.items()},
                               take(w.scale), take(w.base))
    if isinstance(w, Int8MXUTensor):
        return Int8MXUTensor(w.shape, take(w.data), take(w.scale))
    return take(w)


def tp_eligible(spec, stacked, tp: int) -> bool:
    """Whether the shard_map decode path applies (dense llama-family
    stacked tree, fused qkv, head counts divisible by tp, no biases on
    the row-split matmuls — a replicated bias would be psum'd tp times)."""
    if tp <= 1 or not isinstance(stacked, dict):
        return False
    if "moe" in stacked:  # top-k needs the full gate row; v1 is dense
        return False
    attn = stacked.get("attn", {})
    ffn = stacked.get("ffn", {})
    if "qkv" not in attn or "wo" not in attn:
        return False
    if "w1n3" not in ffn or "w2" not in ffn:
        return False
    if attn.get("wo_b") is not None or ffn.get("w2_b") is not None:
        return False
    hp = spec.hyper_params
    if hp.decoder_heads % tp or hp.kv_heads % tp:
        return False
    if spec.qkv_format not in (0, 1):
        return False
    for w in (attn["qkv"], attn["wo"], ffn["w1n3"], ffn["w2"]):
        if not isinstance(w, (QuantizedTensor, Int8MXUTensor, jax.Array)):
            return False
    # every split axis must still tile after the tp division
    def n_of(w):
        return int(w.shape[-1])
    if n_of(attn["qkv"]) % tp or n_of(ffn["w1n3"]) % (2 * tp):
        return False
    return True


def _rank_major_w1n3_cols(inter: int, tp: int) -> np.ndarray:
    """Column permutation fused [W1 | W3] -> rank-major [w1_r | w3_r]:
    a contiguous tp shard then holds a MATCHED gate/up pair."""
    fr = inter // tp
    idx = []
    for r in range(tp):
        idx.extend(range(r * fr, (r + 1) * fr))
        idx.extend(range(inter + r * fr, inter + (r + 1) * fr))
    return np.asarray(idx, np.int32)


def prepare_tp_params(stacked: dict, spec, tp: int) -> dict:
    """Repack the fused projections for contiguous tp column shards:
    qkv into the format-0 (group-interleaved) order, w1n3 into the
    rank-major [w1_r | w3_r] order.  Call BEFORE shard_params; the
    caller must then set spec.qkv_format = 0 and spec.w1n3_ranks = tp."""
    hp = spec.hyper_params
    out = dict(stacked)
    if spec.qkv_format != 0:
        idx = _group_interleave_cols(hp.decoder_heads, hp.kv_heads,
                                     hp.head_dim)
        attn = dict(stacked["attn"])
        attn["qkv"] = _take_cols(attn["qkv"], idx)
        if attn.get("qkv_b") is not None:
            attn["qkv_b"] = jnp.take(attn["qkv_b"], idx, axis=-1)
        out["attn"] = attn
    ffn = dict(stacked["ffn"])
    inter = int(ffn["w1n3"].shape[-1]) // 2
    idx = _rank_major_w1n3_cols(inter, tp)
    ffn["w1n3"] = _take_cols(ffn["w1n3"], idx)
    if ffn.get("w1n3_b") is not None:
        ffn["w1n3_b"] = jnp.take(ffn["w1n3_b"], idx, axis=-1)
    out["ffn"] = ffn
    return out


def _local_spec(spec, tp: int):
    """Head-scaled spec for the per-shard body: a local chunk of the
    repacked weights is a standard format-0 qkv / [w1_r | w3_r] pair."""
    hp = spec.hyper_params
    hp_l = dataclasses.replace(
        hp,
        decoder_heads=hp.decoder_heads // tp,
        decoder_kv_heads=hp.kv_heads // tp,
        hidden_dim=(hp.hidden_dim or hp.embd_dims) // tp)
    return dataclasses.replace(spec, hyper_params=hp_l, qkv_format=0,
                               w1n3_ranks=0)


def _layer_pspecs(tree: dict, extra: int = 0):
    """PartitionSpec tree for a stacked layer tree — tree-prefix form:
    one P per weight applies to every member of its quant container."""
    res = {}
    for name, v in tree.items():
        sub_extra = extra + (1 if name == "experts_stacked" else 0)
        if isinstance(v, dict):
            res[name] = _layer_pspecs(v, sub_extra)
        elif isinstance(v, list):
            res[name] = [_layer_pspecs(e, extra) for e in v]
        else:
            nd = len(v.shape) if hasattr(v, "shape") else v.ndim
            res[name] = spec_for(name, nd, True, extra)
    return res


def tp_decode_layers(spec, stacked, x, cache, mesh: Mesh, *,
                     use_pallas: bool = True):
    """One decode step's layer stack under ('dp','pp','tp') with pp=1:
    shard_map over the mesh, Pallas kernels per shard, psum over 'tp'
    after wo / w2 (models/decoder.py tp_axis).  x: (B, 1, E); returns
    (x, cache) like decoder_layers_unrolled.  Does NOT advance length."""
    from ..models.decoder import decoder_layers_unrolled
    from ..runtime.kv_cache import KVCache

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    tp = sizes.get("tp", 1)
    lspec = _local_spec(spec, tp)
    param_specs = _layer_pspecs(stacked)
    quantized = cache.quantized
    head_dim = cache.head_dim

    cdata = P("pp", "dp", "tp", None, None)
    x_spec = P("dp", None, None)

    def body(stacked_l, x_l, k, v, ks, vs, length):
        cache_l = KVCache(k, v, ks, vs, length, head_dim=head_dim)
        pos = cache_l.length[:, None]
        x_o, c_o = decoder_layers_unrolled(
            lspec, stacked_l, x_l, pos, cache_l, use_pallas=use_pallas,
            tp_axis="tp")
        return x_o, c_o.k, c_o.v, c_o.k_scale, c_o.v_scale

    if quantized:
        in_specs = (param_specs, x_spec, cdata, cdata, cdata, cdata,
                    P("dp"))
        out_specs = (x_spec, cdata, cdata, cdata, cdata)
        fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
        x, k, v, ks, vs = fn(stacked, x, cache.k, cache.v, cache.k_scale,
                             cache.v_scale, cache.length)
        return x, KVCache(k, v, ks, vs, cache.length, head_dim=head_dim)
    body_nq = lambda s, xx, k, v, ln: body(s, xx, k, v, None, None, ln)[:3]
    in_specs = (param_specs, x_spec, cdata, cdata, P("dp"))
    out_specs = (x_spec, cdata, cdata)
    fn = shard_map(body_nq, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    x, k, v = fn(stacked, x, cache.k, cache.v, cache.length)
    return x, KVCache(k, v, None, None, cache.length, head_dim=head_dim)
