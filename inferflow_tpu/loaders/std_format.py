"""`Std` model format: save/load the engine's own params pytree.

reference: ModelWriter::Save writes the reference's internal Std format
(src/transformer/model_writer.{h,cc}); here the Std container is one
safetensors file holding dense tensors and quantized plane/scale/base
arrays keyed by slot path, plus a JSON manifest of shapes/formats and the
ModelSpec — so a quantized model reloads without re-running the codec.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Tuple

import numpy as np

from ..models.spec import HyperParams, ModelSpec
from ..quant.codec_jax import GlobalQuantTensor, QuantizedTensor
from ..quant.delta import DeltaTensor, QuantizedWithDelta
from .safetensors import SafetensorsFile, save_safetensors

MANIFEST_KEY = "__inferflow_manifest__"


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for key, val in tree.items():
            yield from _flatten(val, prefix + (str(key),))
    elif isinstance(tree, list):
        for i, val in enumerate(tree):
            yield from _flatten(val, prefix + (str(i),))
    elif tree is not None:
        yield ".".join(prefix), tree


def save_std(path: str, spec: ModelSpec, params: dict) -> None:
    tensors: Dict[str, np.ndarray] = {}
    manifest = {"spec": dataclasses.asdict(spec), "tensors": {}}
    for name, val in _flatten(params):
        if isinstance(val, QuantizedWithDelta):
            # inner quantized planes + the sparse outlier idx/val arrays
            # (the reference Std format has no delta analog; has_delta in
            # the manifest keeps the container self-describing)
            tensors[f"{name}:delta_idx"] = np.asarray(val.delta.idx)
            tensors[f"{name}:delta_val"] = np.asarray(val.delta.val)
            val = val.qt
            has_delta = True
        else:
            has_delta = False
        if isinstance(val, GlobalQuantTensor):
            manifest["tensors"][name] = {
                "kind": "global_quant", "gq_kind": val.kind,
                "shape": [int(s) for s in val.shape]}
            tensors[f"{name}:codes"] = np.asarray(val.codes)
            tensors[f"{name}:params"] = np.asarray(val.params)
            continue
        if isinstance(val, QuantizedTensor):
            manifest["tensors"][name] = {
                "kind": "quant", "format": val.format,
                "shape": [int(s) for s in val.shape],
                "planes": sorted(val.planes),
                "has_base": val.base is not None,
                "has_delta": has_delta,
            }
            for pname, plane in val.planes.items():
                tensors[f"{name}:{pname}"] = np.asarray(plane)
            tensors[f"{name}:scale"] = np.asarray(val.scale)
            if val.base is not None:
                tensors[f"{name}:base"] = np.asarray(val.base)
        else:
            arr = np.asarray(val)
            if arr.dtype == np.dtype("bfloat16") if hasattr(np, "bfloat16") \
                    else False:
                arr = arr.astype(np.float32)
            manifest["tensors"][name] = {"kind": "dense"}
            tensors[name] = arr
    # bf16 jax arrays -> store as f16 (value-preserving for weights range)
    for key, arr in list(tensors.items()):
        if arr.dtype not in (np.float16, np.float32, np.int8, np.uint8,
                             np.int32, np.int64):
            tensors[key] = arr.astype(np.float32)
    save_safetensors(path, tensors,
                     {MANIFEST_KEY: json.dumps(manifest)})


def _set_path(tree, path_parts, value):
    node = tree
    for i, part in enumerate(path_parts[:-1]):
        key = int(part) if part.isdigit() else part
        nxt = path_parts[i + 1]
        if isinstance(key, int):
            while len(node) <= key:
                node.append([] if nxt.isdigit() else {})
            node = node[key]
        else:
            if key not in node:
                node[key] = [] if nxt.isdigit() else {}
            node = node[key]
    last = path_parts[-1]
    key = int(last) if last.isdigit() else last
    if isinstance(key, int):
        while len(node) <= key:
            node.append(None)
        node[key] = value
    else:
        node[key] = value


def load_std(path: str) -> Tuple[ModelSpec, dict]:
    import jax.numpy as jnp

    sf = SafetensorsFile(path)
    try:
        manifest = json.loads(sf.metadata[MANIFEST_KEY])
        spec_data = manifest["spec"]
        hp = HyperParams(**spec_data.pop("hyper_params"))
        known = {f.name for f in dataclasses.fields(ModelSpec)}
        spec = ModelSpec(hyper_params=hp,
                         **{k: v for k, v in spec_data.items() if k in known
                            and k != "hyper_params"})
        params: dict = {}
        for name, info in manifest["tensors"].items():
            parts = name.split(".")
            if info["kind"] == "global_quant":
                val = GlobalQuantTensor(
                    info["gq_kind"], tuple(info["shape"]),
                    jnp.asarray(sf.tensor(f"{name}:codes")),
                    jnp.asarray(sf.tensor(f"{name}:params")))
                _set_path(params, parts, val)
                continue
            if info["kind"] == "quant":
                planes = {p: jnp.asarray(sf.tensor(f"{name}:{p}"))
                          for p in info["planes"]}
                scale = jnp.asarray(sf.tensor(f"{name}:scale"))
                base = (jnp.asarray(sf.tensor(f"{name}:base"))
                        if info["has_base"] else None)
                val = QuantizedTensor(info["format"], tuple(info["shape"]),
                                      planes, scale, base)
                if info.get("has_delta"):
                    val = QuantizedWithDelta(val, DeltaTensor(
                        jnp.asarray(sf.tensor(f"{name}:delta_idx")),
                        jnp.asarray(np.asarray(
                            sf.tensor(f"{name}:delta_val"), np.float32),
                            jnp.bfloat16)))
            else:
                arr = sf.tensor(name)
                val = jnp.asarray(np.asarray(arr, np.float32), jnp.bfloat16)
            _set_path(params, parts, val)
        return spec, params
    finally:
        sf.close()
