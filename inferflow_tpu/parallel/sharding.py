"""Sharding recipes: PartitionSpecs per tensor role.

The TPU-native replacement for the reference's partition-by-tensor /
partition-by-layer machinery: the col/row split table of
network_builder.cc:1373-1406 (QKV/W1/W3 split BY_COL, WO/W2 split BY_ROW,
norms duplicated) becomes PartitionSpecs over the 'tp' mesh axis, so XLA
inserts the psum the reference hand-rolled with its phase barrier
(inference_worker.cc:2148-2335).  Layer partitioning becomes sharding of the
stacked-layer leading axis over 'pp'.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.codec_jax import QuantizedTensor

# canonical per-role specs for a layer-stacked param tree (leading axis = L)
COL_SPLIT = {"wq", "wk", "wv", "qkv", "w1", "w3", "w1n3", "gate"}
ROW_SPLIT = {"wo", "w2"}
COL_BIAS = {"wq_b", "wk_b", "wv_b", "qkv_b", "w1_b", "w3_b", "w1n3_b",
            "gate_b"}


def spec_for(name: str, ndim: int, stacked: bool, extra: int = 0) -> P:
    """PartitionSpec for a named weight inside a layer tree.

    extra: count of additional leading axes between 'pp' and the (K, N)
    weight dims (1 under an E-stacked 'experts_stacked' subtree)."""
    lead = (("pp",) if stacked else ()) + (None,) * extra
    if name in COL_SPLIT:
        return P(*lead, None, "tp")
    if name in ROW_SPLIT:
        return P(*lead, "tp", None)
    if name in COL_BIAS:
        return P(*lead, "tp")
    # norms / row-split biases / anything 1-D per layer: replicate over tp
    return P(*lead, *([None] * max(ndim - len(lead), 0)))


def shard_quantized(qt: QuantizedTensor, mesh: Mesh, pspec: P) -> QuantizedTensor:
    """Shard a QuantizedTensor's planes consistently with its logical spec.

    All planes and metadata share the (K-subsampled, N) structure, so the
    same PartitionSpec applies to every member.
    """
    sh = NamedSharding(mesh, pspec)
    planes = {k: jax.device_put(v, sh) for k, v in qt.planes.items()}
    scale = jax.device_put(qt.scale, sh)
    base = None if qt.base is None else jax.device_put(qt.base, sh)
    return QuantizedTensor(qt.format, qt.shape, planes, scale, base)


def shard_params(params: dict, mesh: Mesh, stacked: bool = True) -> dict:
    """Place a decoder param tree onto the mesh.

    Top-level: embeddings sharded over vocab on 'tp', lm_head over vocab on
    'tp', norms replicated.  Layer tree: see spec_for.
    """

    def put(x, pspec):
        if isinstance(x, QuantizedTensor):
            return shard_quantized(x, mesh, pspec)
        return jax.device_put(x, NamedSharding(mesh, pspec))

    out = {}
    for key, val in params.items():
        if key == "layers":
            continue
        if key == "dec_embeddings":
            out[key] = put(val, P("tp", None))
        elif key == "lm_head":
            out[key] = put(val, P(None, "tp"))
        elif key == "lm_head_b":
            out[key] = put(val, P("tp"))
        else:
            out[key] = put(val, P(*([None] * getattr(val, "ndim", 1))))

    def shard_layer_tree(tree, extra=0):
        res = {}
        for name, v in tree.items():
            sub_extra = extra + (1 if name == "experts_stacked" else 0)
            if isinstance(v, dict):
                res[name] = shard_layer_tree(v, sub_extra)
            elif isinstance(v, list):
                res[name] = [shard_layer_tree(e, extra) for e in v]
            else:
                nd = len(v.shape) if isinstance(v, QuantizedTensor) else v.ndim
                res[name] = put(v, spec_for(name, nd, stacked, extra))
        return res

    if stacked:
        out["layers"] = shard_layer_tree(params["layers"])
    else:
        out["layers"] = [shard_layer_tree(l) for l in params["layers"]]
    return out


def kv_cache_specs(quantized: bool):
    """PartitionSpecs for KVCache members (L,B,H,S,D): layers over 'pp',
    slots over 'dp', kv heads over 'tp'."""
    data = P("pp", "dp", "tp", None, None)
    return {
        "k": data, "v": data,
        "k_scale": data if quantized else None,
        "v_scale": data if quantized else None,
        "length": P("dp"),
    }


def shard_kv_cache(cache, mesh: Mesh):
    from ..runtime.kv_cache import KVCache
    specs = kv_cache_specs(cache.quantized)

    def put(x, spec):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, spec))

    return KVCache(put(cache.k, specs["k"]), put(cache.v, specs["v"]),
                   put(cache.k_scale, specs["k_scale"]),
                   put(cache.v_scale, specs["v_scale"]),
                   put(cache.length, specs["length"]),
                   head_dim=cache.head_dim)
