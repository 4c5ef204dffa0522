"""Checkpoint loader tests: safetensors, safe pickle, GGUF, name mapping.

torch is used ONLY here (test-side) to produce real pickle checkpoints for
the safe reader to parse; the library itself never imports torch/pickle.
"""

import io
import json
import os
import struct

import numpy as np
import pytest

from inferflow_tpu.loaders.safetensors import (SafetensorsFile,
                                               save_safetensors,
                                               resolve_index)
from inferflow_tpu.loaders.pickle_reader import (load_torch_checkpoint,
                                                 SafeUnpickler,
                                                 UnpicklingError)
from inferflow_tpu.loaders.gguf import GGUFFile
from inferflow_tpu.models.network_structure import NameMapper
from inferflow_tpu.models.spec import ModelSpec, HyperParams
from inferflow_tpu.loaders.hf_config import apply_hf_config


def test_safetensors_roundtrip(tmp_path, rng):
    path = str(tmp_path / "m.safetensors")
    tensors = {
        "a": rng.standard_normal((4, 8)).astype(np.float32),
        "b": rng.standard_normal((3,)).astype(np.float16),
        "c": (rng.standard_normal((2, 2)) * 10).astype(np.int32),
    }
    save_safetensors(path, tensors, {"format": "test"})
    sf = SafetensorsFile(path)
    assert sorted(sf.names()) == ["a", "b", "c"]
    for name, ref in tensors.items():
        np.testing.assert_array_equal(sf.tensor(name), ref)
    assert sf.metadata["format"] == "test"
    sf.close()


def test_safetensors_bf16(tmp_path):
    # hand-craft a bf16 tensor entry
    vals = np.array([1.0, -2.5, 0.5], np.float32)
    bf16 = (vals.view(np.uint32) >> 16).astype(np.uint16)
    header = {"x": {"dtype": "BF16", "shape": [3],
                    "data_offsets": [0, 6]}}
    hj = json.dumps(header).encode()
    path = str(tmp_path / "bf.safetensors")
    with open(path, "wb") as fh:
        fh.write(len(hj).to_bytes(8, "little"))
        fh.write(hj)
        fh.write(bf16.tobytes())
    sf = SafetensorsFile(path)
    np.testing.assert_array_equal(sf.tensor("x"), vals)
    sf.close()


def test_sharded_index(tmp_path, rng):
    a = rng.standard_normal((2, 2)).astype(np.float32)
    b = rng.standard_normal((2, 2)).astype(np.float32)
    save_safetensors(str(tmp_path / "s1.safetensors"), {"a": a})
    save_safetensors(str(tmp_path / "s2.safetensors"), {"b": b})
    idx = {"weight_map": {"a": "s1.safetensors", "b": "s2.safetensors"}}
    ipath = str(tmp_path / "model.safetensors.index.json")
    with open(ipath, "w") as fh:
        json.dump(idx, fh)
    shards = resolve_index(ipath)
    assert len(shards) == 2


def test_torch_zip_checkpoint(tmp_path, rng):
    torch = pytest.importorskip("torch")
    sd = {
        "model.layers.0.self_attn.q_proj.weight":
            torch.tensor(rng.standard_normal((8, 8)).astype(np.float32)),
        "model.embed_tokens.weight":
            torch.tensor(rng.standard_normal((16, 8)).astype(np.float16)),
        "scalar": torch.tensor(rng.standard_normal((4,)).astype(np.float32)),
    }
    path = str(tmp_path / "ckpt.bin")
    torch.save(sd, path)
    out = load_torch_checkpoint(path)
    assert sorted(out) == sorted(str(k) for k in sd)
    for name, ref in sd.items():
        np.testing.assert_array_equal(out[name], ref.numpy())


def test_torch_legacy_checkpoint(tmp_path, rng):
    torch = pytest.importorskip("torch")
    sd = {"w": torch.tensor(rng.standard_normal((4, 4)).astype(np.float32))}
    path = str(tmp_path / "legacy.bin")
    torch.save(sd, path, _use_new_zipfile_serialization=False)
    out = load_torch_checkpoint(path)
    np.testing.assert_array_equal(out["w"], sd["w"].numpy())


def test_pickle_rejects_code_execution():
    """A pickle invoking os.system must be REJECTED, not executed."""
    import pickle

    class Evil:
        def __reduce__(self):
            return (os.system, ("echo pwned",))

    payload = pickle.dumps(Evil())
    with pytest.raises(UnpicklingError):
        SafeUnpickler(io.BytesIO(payload)).load()


def _write_gguf(path, tensors, metadata):
    """Minimal GGUF v3 writer for tests."""
    def s(txt):
        b = txt.encode()
        return struct.pack("<Q", len(b)) + b

    buf = bytearray()
    buf += b"GGUF" + struct.pack("<I", 3)
    buf += struct.pack("<Q", len(tensors)) + struct.pack("<Q", len(metadata))
    for key, val in metadata.items():
        buf += s(key)
        if isinstance(val, str):
            buf += struct.pack("<I", 8) + s(val)
        elif isinstance(val, bool):
            buf += struct.pack("<I", 7) + struct.pack("<B", val)
        elif isinstance(val, int):
            buf += struct.pack("<I", 4) + struct.pack("<I", val)
        elif isinstance(val, float):
            buf += struct.pack("<I", 6) + struct.pack("<f", val)
        elif isinstance(val, list) and all(isinstance(x, str) for x in val):
            buf += struct.pack("<I", 9) + struct.pack("<I", 8)
            buf += struct.pack("<Q", len(val))
            for x in val:
                buf += s(x)
        else:
            raise ValueError(val)
    offsets = {}
    data = bytearray()
    for name, arr in tensors.items():
        pad = (-len(data)) % 32
        data += b"\0" * pad
        offsets[name] = len(data)
        data += arr.tobytes()
    for name, arr in tensors.items():
        buf += s(name)
        dims = list(reversed(arr.shape))  # ggml ne[] order
        buf += struct.pack("<I", len(dims))
        for d in dims:
            buf += struct.pack("<Q", d)
        ttype = 0 if arr.dtype == np.float32 else 1
        buf += struct.pack("<I", ttype) + struct.pack("<Q", offsets[name])
    pad = (-len(buf)) % 32
    buf += b"\0" * pad
    buf += data
    with open(path, "wb") as fh:
        fh.write(buf)


def test_gguf_roundtrip(tmp_path, rng):
    path = str(tmp_path / "m.gguf")
    t1 = rng.standard_normal((4, 8)).astype(np.float32)
    t2 = rng.standard_normal((2, 6)).astype(np.float16)
    _write_gguf(path, {"x": t1, "y": t2},
                {"general.alignment": 32,
                 "tokenizer.ggml.model": "llama",
                 "tokenizer.ggml.tokens": ["<s>", "</s>", "a"],
                 "tokenizer.ggml.bos_token_id": 0})
    gf = GGUFFile(path)
    np.testing.assert_array_equal(gf.tensor("x"), t1)
    np.testing.assert_array_equal(gf.tensor("y"), t2)
    v = gf.vocab()
    assert v["tokens"] == ["<s>", "</s>", "a"] and v["bos_id"] == 0
    gf.close()


def test_gguf_q8_dequant(tmp_path):
    """Q8_0 block: d (f16) + 32 int8; value = q * d."""
    d = np.float16(0.5)
    q = np.arange(-16, 16, dtype=np.int8)
    block = d.tobytes() + q.tobytes()
    # craft file with one Q8_0 tensor of 32 elems
    def s(txt):
        b = txt.encode()
        return struct.pack("<Q", len(b)) + b
    buf = bytearray()
    buf += b"GGUF" + struct.pack("<I", 3)
    buf += struct.pack("<Q", 1) + struct.pack("<Q", 0)
    buf += s("w") + struct.pack("<I", 1) + struct.pack("<Q", 32)
    buf += struct.pack("<I", 8) + struct.pack("<Q", 0)  # Q8_0 at offset 0
    pad = (-len(buf)) % 32
    buf += b"\0" * pad + block
    path = str(tmp_path / "q8.gguf")
    with open(path, "wb") as fh:
        fh.write(buf)
    gf = GGUFFile(path)
    got = gf.tensor("w")
    np.testing.assert_allclose(got, q.astype(np.float32) * 0.5)
    gf.close()


def test_name_mapper_llama():
    m = NameMapper("llama")
    path, t = m.map_name("model.layers.3.self_attn.q_proj.weight")
    assert path == ("layers", 3, "attn", "wq") and t
    path, t = m.map_name("model.layers.10.mlp.down_proj.weight")
    assert path == ("layers", 10, "ffn", "w2")
    path, t = m.map_name("model.embed_tokens.weight")
    assert path == ("dec_embeddings",) and not t
    path, t = m.map_name("lm_head.weight")
    assert path == ("lm_head",) and t
    assert m.map_name("rotary_emb.inv_freq") is None


def test_name_mapper_moe_and_overrides():
    m = NameMapper("sparse_moe")
    path, _ = m.map_name(
        "model.layers.2.block_sparse_moe.experts.5.w1.weight")
    assert path == ("layers", 2, "moe", "experts", 5, "w1")
    m2 = NameMapper("llama", spec_map={
        "weird.{i}.qproj.weight": "layers.{i}.attn.wq"})
    path, t = m2.map_name("weird.7.qproj.weight")
    assert path == ("layers", 7, "attn", "wq") and t


def test_name_mapper_families():
    m = NameMapper("falcon")
    path, _ = m.map_name("transformer.h.0.self_attention.query_key_value.weight")
    assert path == ("layers", 0, "attn", "qkv")
    m = NameMapper("gpt2")
    path, t = m.map_name("h.0.attn.c_attn.weight")
    assert path == ("layers", 0, "attn", "qkv") and not t  # Conv1D
    m = NameMapper("bert")
    path, _ = m.map_name("bert.encoder.layer.1.attention.self.query.weight")
    assert path == ("enc_layers", 1, "attn", "wq")
    m = NameMapper("encoder_decoder")
    path, _ = m.map_name("model.decoder.layers.2.encoder_attn.k_proj.weight")
    assert path == ("layers", 2, "cross_attn", "wk")


def test_hf_config_aliases():
    spec = ModelSpec(hyper_params=HyperParams(embd_dims=0))
    cfg = {"hidden_size": 512, "num_hidden_layers": 4,
           "num_attention_heads": 8, "num_key_value_heads": 2,
           "intermediate_size": 1024, "vocab_size": 1000,
           "rms_norm_eps": 1e-6, "rope_theta": 500000.0,
           "model_type": "llama", "hidden_act": "silu",
           "max_position_embeddings": 2048}
    spec = apply_hf_config(spec, cfg)
    hp = spec.hyper_params
    assert (hp.embd_dims, hp.decoder_layers, hp.decoder_heads,
            hp.decoder_kv_heads) == (512, 4, 8, 2)
    assert hp.decoder_intermediate_size == 1024
    assert spec.rope_theta == 500000.0 and spec.norm_eps == 1e-6
    assert hp.training_context_len == 2048


def test_load_model_gguf_end_to_end(tmp_path, rng):
    """GGUF with llama.cpp-native tensor names -> load_model (threaded
    quantize-on-load over mmap views; ADVICE r1: previously raised
    BufferError when the mmap closed under queued workers) -> forward."""
    import jax.numpy as jnp
    from inferflow_tpu.loaders.model_loader import load_model
    from inferflow_tpu.models.decoder import decoder_forward
    from inferflow_tpu.quant.codec_jax import QuantizedTensor

    E, I, V, L, H = 64, 128, 96, 2, 4
    tensors = {"token_embd.weight":
               rng.standard_normal((V, E)).astype(np.float32),
               "output_norm.weight": np.ones(E, np.float32),
               "output.weight":
               rng.standard_normal((V, E)).astype(np.float32) * 0.1}
    for i in range(L):
        p = f"blk.{i}"
        tensors[f"{p}.attn_norm.weight"] = np.ones(E, np.float32)
        tensors[f"{p}.ffn_norm.weight"] = np.ones(E, np.float32)
        for nm, shape in (("attn_q", (E, E)), ("attn_k", (E, E)),
                          ("attn_v", (E, E)), ("attn_output", (E, E)),
                          ("ffn_gate", (I, E)), ("ffn_down", (E, I)),
                          ("ffn_up", (I, E))):
            tensors[f"{p}.{nm}.weight"] = (
                rng.standard_normal(shape).astype(np.float32) * 0.05)
    path = str(tmp_path / "model.gguf")
    _write_gguf(path, tensors, {"general.alignment": 32})

    spec = ModelSpec(model_files=["model.gguf"],
                     model_file_format="gguf",
                     device_weight_data_type="Q8_B32T1",
                     tensor_quant_threshold=64 * 64)
    hp = spec.hyper_params
    hp.embd_dims, hp.decoder_layers, hp.decoder_heads = E, L, H
    hp.decoder_kv_heads, hp.decoder_intermediate_size = H, I
    hp.vocab_size = V
    params = load_model(spec, str(tmp_path))
    assert isinstance(params["layers"][0]["attn"]["wq"], QuantizedTensor)
    tokens = jnp.zeros((1, 4), jnp.int32)
    pos = jnp.arange(4)[None, :]
    logits, _ = decoder_forward(spec, params, tokens, pos, None)
    assert logits.shape == (1, 4, V)
    assert bool(jnp.isfinite(logits).all())


def test_load_model_end_to_end(tmp_path, rng):
    """safetensors llama checkpoint -> params -> decoder forward."""
    import jax.numpy as jnp
    from inferflow_tpu.loaders.model_loader import load_model
    from inferflow_tpu.models.decoder import decoder_forward

    E, I, V, L, H = 64, 128, 96, 2, 4
    tensors = {"model.embed_tokens.weight":
               rng.standard_normal((V, E)).astype(np.float32),
               "model.norm.weight": np.ones(E, np.float32),
               "lm_head.weight":
               rng.standard_normal((V, E)).astype(np.float32) * 0.1}
    for i in range(L):
        p = f"model.layers.{i}"
        tensors[f"{p}.input_layernorm.weight"] = np.ones(E, np.float32)
        tensors[f"{p}.post_attention_layernorm.weight"] = np.ones(E, np.float32)
        for nm, shape in (("self_attn.q_proj", (E, E)),
                          ("self_attn.k_proj", (E, E)),
                          ("self_attn.v_proj", (E, E)),
                          ("self_attn.o_proj", (E, E)),
                          ("mlp.gate_proj", (I, E)),
                          ("mlp.down_proj", (E, I)),
                          ("mlp.up_proj", (I, E))):
            tensors[f"{p}.{nm}.weight"] = (
                rng.standard_normal(shape).astype(np.float32) * 0.05)
    path = str(tmp_path / "model.safetensors")
    save_safetensors(path, tensors)
    with open(tmp_path / "config.json", "w") as fh:
        json.dump({"model_type": "llama", "hidden_size": E,
                   "num_hidden_layers": L, "num_attention_heads": H,
                   "intermediate_size": I, "vocab_size": V,
                   "rms_norm_eps": 1e-5}, fh)

    spec = ModelSpec(model_files=["model.safetensors"],
                     model_file_format="safetensors",
                     device_weight_data_type="Q8_B32T1",
                     tensor_quant_threshold=64 * 64)
    params = load_model(spec, str(tmp_path))
    from inferflow_tpu.quant.codec_jax import QuantizedTensor
    assert isinstance(params["layers"][0]["attn"]["wq"], QuantizedTensor)
    tokens = jnp.zeros((1, 4), jnp.int32)
    pos = jnp.arange(4)[None, :]
    logits, _ = decoder_forward(spec, params, tokens, pos, None)
    assert logits.shape == (1, 4, V)
    assert bool(jnp.isfinite(logits).all())
