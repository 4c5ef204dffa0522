"""Checkpoint -> params pytree orchestrator.

reference: ModelReader::Load + NetworkBuilder (src/transformer/
model_reader.cc:19-191, network_builder.cc): detect the checkpoint format,
stream tensors, canonicalize names, transpose to the TPU (K, N) convention,
and quantize weight matrices into the configured block format while
loading (the analog of eager device building + DeviceTensorBuilder's
quantize-and-upload pipeline, device_tensor_builder.cu).

Per-tensor dtype overrides (`device_weight_data_types`), the
`tensor_quant_threshold` small-tensor exemption
(network_builder.cc:1648-1652), and tied lm_head are honored.
"""

from __future__ import annotations

import concurrent.futures as _fut
import os
import re
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.network_structure import NameMapper
from ..models.spec import ModelSpec
from ..quant import codec_np
from ..quant.codec_jax import QuantizedTensor
from ..quant.formats import is_quantized
from .gguf import GGUFFile
from .hf_config import load_hf_config
from .pickle_reader import load_torch_checkpoint
from .safetensors import SafetensorsFile, resolve_index

# slot leaf names eligible for weight quantization (the reference's
# LayerTensorId weight matrices; norms/biases/embeddings stay dense)
_QUANTIZABLE = {"wq", "wk", "wv", "wo", "qkv", "w1", "w2", "w3", "w1n3",
                "lm_head", "gate", "mlm_transform"}


def detect_format(path: str) -> str:
    low = path.lower()
    if low.endswith((".safetensors",)) or low.endswith(".safetensors.index.json"):
        return "safetensors"
    if low.endswith(".gguf"):
        return "gguf"
    if low.endswith((".bin", ".pt", ".pth")) and "tokenizer" not in low:
        # .bin is ambiguous (torch pickle vs llama2.c): sniff the magic —
        # torch checkpoints are zip (PK..) or a bare pickle stream (\x80),
        # llama2.c starts with 7 raw int32 hyperparams (model_reader.cc:3248)
        try:
            with open(path, "rb") as fh:
                magic = fh.read(2)
            if magic[:2] in (b"PK", b"\x80\x02", b"\x80\x04", b"\x80\x05") \
                    or magic[:1] == b"\x80":
                return "pickle"
            if low.endswith(".bin"):
                return "llama2.c"
            return "pickle"
        except OSError:
            if re.search(r"(stories|llama2)[^/]*\.bin$", low):
                return "llama2.c"
            return "pickle"
    if low.endswith(".index.json"):
        return "safetensors" if "safetensors" in low else "pickle"
    return "unknown"


def iter_checkpoint_tensors(files, fmt: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Stream (name, np array) from checkpoint file(s) of a given format."""
    for path in files:
        if fmt == "safetensors":
            for shard in resolve_index(path):
                sf = SafetensorsFile(shard)
                try:
                    for name in sf.names():
                        yield name, sf.tensor(name)
                finally:
                    sf.close()
        elif fmt == "pickle":
            if path.endswith(".index.json"):
                import json as _json
                with open(path) as fh:
                    idx = _json.load(fh)
                base = os.path.dirname(path)
                for shard in sorted(set(idx.get("weight_map", {}).values())):
                    for kv in load_torch_checkpoint(
                            os.path.join(base, shard)).items():
                        yield kv
            else:
                for kv in load_torch_checkpoint(path).items():
                    yield kv
        elif fmt == "gguf":
            gf = GGUFFile(path)
            try:
                for name in gf.names():
                    yield name, gf.tensor(name)
            finally:
                gf.close()
        elif fmt == "ggml":
            from .ggml import GGMLFile
            gf = GGMLFile(path)
            try:
                for name in gf.names():
                    yield name, gf.tensor(name)
            finally:
                gf.close()
        else:
            raise ValueError(f"unsupported model file format: {fmt}")


def _weight_dtype_for(spec: ModelSpec, leaf: str, shape) -> Optional[str]:
    """Element type for a weight slot: per-tensor override, global default,
    and the small-tensor quant exemption."""
    from ..quant.formats import GLOBAL_TYPES
    et = spec.device_weight_data_types.get(leaf, spec.device_weight_data_type)
    if not (is_quantized(et) or et.upper() in GLOBAL_TYPES):
        return None
    if len(shape) != 2:
        return None
    if shape[0] * shape[1] < spec.tensor_quant_threshold:
        return None
    return et


def _prepare_tensor(spec: ModelSpec, path: tuple, arr: np.ndarray,
                    transpose: bool):
    leaf = path[-1]
    if arr.ndim == 2 and transpose:
        arr = np.ascontiguousarray(arr.T)
    if leaf == "lm_head" and arr.ndim == 2 \
            and (spec.normalize_lm_head
                 or getattr(spec, "_normalize_lm_head_at_load", False)):
        # Baichuan2: L2-normalize each vocab unit of the head at LOAD time,
        # before quantization (the reference normalizes the fp16/fp32 host
        # tensor in BuildHostNetwork, network_builder.cc:439-444) — this is
        # what makes normalize_lm_head compose with quantized heads.  After
        # transpose the head is (E, V): one vocab unit per column.
        f32 = arr.astype(np.float32)
        n = np.linalg.norm(f32, axis=0, keepdims=True)
        arr = (f32 / np.maximum(n, 1e-12)).astype(np.float32)
    et = _weight_dtype_for(spec, leaf, arr.shape) if leaf in _QUANTIZABLE \
        else None
    from ..quant.formats import GLOBAL_TYPES
    if et is not None and et.upper() in GLOBAL_TYPES:
        from ..quant.codec_jax import GlobalQuantTensor
        return GlobalQuantTensor.quantize_np(
            arr.astype(np.float16).astype(np.float32), et)
    if et is not None:
        k = arr.shape[0]
        from ..quant.formats import get_format
        blk = get_format(et).block
        if k % blk == 0:
            # native C++ codec (multithreaded), codec_np fallback
            from ..quant.codec_native import quantize as _quantize
            from ..kernels.dequant_matmul import pad_weight_for_tpu
            arr_f32 = arr.astype(np.float16).astype(np.float32)
            from ..quant.codec_jax import requantize_q8_container

            def _layout(qt):
                layout = spec.device_layout
                if layout in ("", "auto"):
                    # measured TPU default: sub-byte wire -> the q8c int8
                    # container when it fits HBM (codec_jax
                    # resolve_auto_layout; 'packed' forces the wire
                    # layout, 'i8mm' opts into int8 activations, 'mixed'
                    # upgrades only the FFN when full q8c won't fit)
                    from ..quant.codec_jax import resolve_auto_layout
                    layout = resolve_auto_layout(spec, et)
                from ..quant.codec_jax import layout_for_leaf
                layout = layout_for_leaf(layout, leaf)
                if layout == "i8mm":
                    from ..quant.codec_jax import requantize_i8_colwise
                    return requantize_i8_colwise(qt)
                if layout == "q8c":
                    qt = requantize_q8_container(qt)
                if layout == "i4":
                    from ..quant.codec_jax import repack_i4
                    return repack_i4(pad_weight_for_tpu(qt))
                return pad_weight_for_tpu(qt)

            if spec.delta_tensor_ratio > 0:
                # sparse outlier extraction before quantization
                # (BuildDeltaTensor, device_tensor_builder.cu:482-540)
                from ..quant.delta import extract_delta, QuantizedWithDelta
                base, delta = extract_delta(arr_f32,
                                            spec.delta_tensor_ratio)
                qt = _layout(QuantizedTensor.from_np(_quantize(base, et)))
                return QuantizedWithDelta(qt, delta)
            return _layout(QuantizedTensor.from_np(_quantize(arr_f32, et)))
    # dense: norms/biases in fp32-accumulating bf16; embeddings bf16
    return jnp.asarray(arr.astype(np.float32), jnp.bfloat16)


def _set_path(tree: dict, path: tuple, value) -> None:
    node = tree
    for i, key in enumerate(path[:-1]):
        nxt_key = path[i + 1]
        if isinstance(key, int):
            while len(node) <= key:
                node.append({} if not isinstance(nxt_key, int) else [])
            if node[key] == {} and isinstance(nxt_key, int):
                node[key] = []
            node = node[key]
        else:
            if key not in node:
                node[key] = [] if isinstance(nxt_key, int) else {}
            node = node[key]
    last = path[-1]
    if isinstance(last, int):
        while len(node) <= last:
            node.append(None)
        node[last] = value
    else:
        node[last] = value


def load_model(spec: ModelSpec, model_dir: Optional[str] = None,
               max_workers: int = 4) -> dict:
    """Load a checkpoint into the params pytree for models/decoder.py.

    The quantize step runs in a thread pool over streamed tensors — the
    TPU analog of the reference's 4 DeviceTensorBuilder threads
    (inference_engine.cc:1866)."""
    model_dir = model_dir or spec.dir
    spec = load_hf_config(spec, model_dir)
    files = [os.path.join(model_dir, f) if model_dir else f
             for f in spec.model_files]
    fmt = spec.model_file_format
    if fmt in ("", "unknown") and files:
        fmt = detect_format(files[0])

    if fmt == "llama2.c":
        from .llama2c import load_llama2c_checkpoint
        ck_spec, raw = load_llama2c_checkpoint(files[0])
        # adopt the checkpoint header's hyperparams (the ini/model_spec
        # doesn't carry shapes for llama2.c; model_reader.cc:3248 reads
        # them from the binary header)
        spec.hyper_params = ck_spec.hyper_params
        if spec.max_context_len <= 0:
            spec.max_context_len = ck_spec.max_context_len
        return finalize_params(spec, raw)

    mapper = NameMapper(spec.network_structure, spec.tensor_name_map,
                        spec.tensor_name_prefix)
    params: dict = {}
    unmapped = []

    def work(item):
        name, arr = item
        mapped = mapper.map_name(name)
        if mapped is None:
            return name, None, None
        path, transpose = mapped
        return name, path, _prepare_tensor(spec, path, arr, transpose)

    with _fut.ThreadPoolExecutor(max_workers=max_workers) as pool:
        for name, path, val in pool.map(
                work, iter_checkpoint_tensors(files, fmt)):
            if path is None:
                unmapped.append(name)
                continue
            _set_path(params, path, val)
    if unmapped:
        import logging
        logging.getLogger(__name__).warning(
            "unmapped checkpoint tensors: %s", unmapped[:20])
    if spec.normalize_lm_head and "lm_head" in params:
        # applied at load by _prepare_tensor; clear so output_logits
        # doesn't normalize a second time.  The private marker keeps a
        # SECOND load_model() with the same spec object normalizing at
        # load (clearing alone silently skipped it)
        spec.normalize_lm_head = False
        spec._normalize_lm_head_at_load = True
    return finalize_params(spec, params, unmapped=unmapped)


def finalize_params(spec: ModelSpec, params: dict, unmapped=None) -> dict:
    """Post-load fixups: jnp conversion, tied lm_head, hyperparam backfill,
    and model validation (the analog of CheckHostModel/CheckDeviceModel,
    network_builder.cc:1690-1790)."""
    hp = spec.hyper_params

    def to_jnp(v):
        if isinstance(v, np.ndarray):
            return jnp.asarray(v.astype(np.float32), jnp.bfloat16)
        return v

    params = jax.tree_util.tree_map(
        to_jnp, params, is_leaf=lambda x: isinstance(x, (np.ndarray,
                                                         QuantizedTensor)))

    emb_key = ("dec_embeddings" if "dec_embeddings" in params
               else "enc_embeddings")
    if emb_key in params:
        v, e = params[emb_key].shape
        if hp.vocab_size in (0, -1):
            hp.vocab_size = v
        if hp.embd_dims in (0, -1):
            hp.embd_dims = e
    layers = params.get("layers") or params.get("enc_layers") or []
    if hp.decoder_layers in (0, -1) and "layers" in params:
        hp.decoder_layers = len(params["layers"])
    if hp.encoder_layers in (0, -1) and "enc_layers" in params:
        hp.encoder_layers = len(params["enc_layers"])

    validate_params(spec, params)
    return params


def validate_params(spec: ModelSpec, params: dict) -> None:
    """Every expected tensor present with sane shapes
    (network_builder.cc CheckHostModel)."""
    hp = spec.hyper_params
    problems = []
    if "dec_embeddings" not in params and "enc_embeddings" not in params:
        problems.append("missing embeddings")
    for kind, count in (("layers", hp.decoder_layers or 0),
                        ("enc_layers", hp.encoder_layers or 0)):
        lst = params.get(kind)
        if lst is None:
            if count and kind == "layers" and spec.archetype != "encoder_only":
                problems.append(f"missing {kind}")
            continue
        if isinstance(lst, dict):
            continue  # stacked
        for i, layer in enumerate(lst):
            if layer is None:
                problems.append(f"{kind}[{i}] missing")
                continue
            attn = layer.get("attn", {})
            if not ("qkv" in attn or all(k in attn
                                         for k in ("wq", "wk", "wv"))):
                problems.append(f"{kind}[{i}] incomplete attention weights")
            if "wo" not in attn:
                problems.append(f"{kind}[{i}] missing wo")
            blk = layer.get("ffn") or layer.get("moe")
            if blk is None:
                problems.append(f"{kind}[{i}] missing ffn/moe")
    if problems:
        raise ValueError("model validation failed: " + "; ".join(problems[:8]))
