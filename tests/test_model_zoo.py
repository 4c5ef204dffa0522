"""Model-zoo specs: every configs/models/*/model_spec.json must parse and
resolve a synthetic checkpoint of its family (names + shapes) through
load_model into a runnable forward (reference zoo: /root/reference/data/
models/* — config-file-driven model support, README.md:26-46)."""

import glob
import json
import os

import numpy as np
import pytest
import jax.numpy as jnp

from inferflow_tpu.config.model_spec import load_model_spec
from inferflow_tpu.loaders.model_loader import load_model
from inferflow_tpu.loaders.safetensors import save_safetensors
from inferflow_tpu.models.decoder import decoder_forward
from inferflow_tpu.models.encoder import encoder_forward, mlm_logits, \
    encdec_forward

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs",
                          "models")

E, HD, HEADS, KV, I, V, L = 64, 16, 4, 4, 128, 96, 2


def _r(rng, *shape):
    return (rng.standard_normal(shape) * 0.05).astype(np.float32)


def _llama_tensors(rng, biases=False, tied=False, moe=None, prefix="model."):
    t = {f"{prefix}embed_tokens.weight": _r(rng, V, E),
         f"{prefix}norm.weight": np.ones(E, np.float32)}
    if not tied:
        t["lm_head.weight"] = _r(rng, V, E)
    for i in range(L):
        p = f"{prefix}layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(E, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(E, np.float32)
        for nm, shape in (("q_proj", (HEADS * HD, E)),
                          ("k_proj", (KV * HD, E)),
                          ("v_proj", (KV * HD, E)),
                          ("o_proj", (E, HEADS * HD))):
            t[f"{p}.self_attn.{nm}.weight"] = _r(rng, *shape)
            if biases and nm != "o_proj":
                t[f"{p}.self_attn.{nm}.bias"] = _r(rng, shape[0])
        if moe == "mixtral":
            t[f"{p}.block_sparse_moe.gate.weight"] = _r(rng, 4, E)
            for j in range(4):
                q = f"{p}.block_sparse_moe.experts.{j}"
                t[f"{q}.w1.weight"] = _r(rng, I, E)
                t[f"{q}.w2.weight"] = _r(rng, E, I)
                t[f"{q}.w3.weight"] = _r(rng, I, E)
        elif moe == "deepseek" and i >= 1:
            t[f"{p}.mlp.gate.weight"] = _r(rng, 4, E)
            for j in range(4):
                q = f"{p}.mlp.experts.{j}"
                t[f"{q}.gate_proj.weight"] = _r(rng, I, E)
                t[f"{q}.down_proj.weight"] = _r(rng, E, I)
                t[f"{q}.up_proj.weight"] = _r(rng, I, E)
            t[f"{p}.mlp.shared_experts.gate_proj.weight"] = _r(rng, I, E)
            t[f"{p}.mlp.shared_experts.down_proj.weight"] = _r(rng, E, I)
            t[f"{p}.mlp.shared_experts.up_proj.weight"] = _r(rng, I, E)
        else:
            t[f"{p}.mlp.gate_proj.weight"] = _r(rng, I, E)
            t[f"{p}.mlp.down_proj.weight"] = _r(rng, E, I)
            t[f"{p}.mlp.up_proj.weight"] = _r(rng, I, E)
    return t


def _falcon_tensors(rng):
    g = HEADS // KV
    t = {"transformer.word_embeddings.weight": _r(rng, V, E),
         "transformer.ln_f.weight": np.ones(E, np.float32),
         "transformer.ln_f.bias": np.zeros(E, np.float32),
         "lm_head.weight": _r(rng, V, E)}
    for i in range(L):
        p = f"transformer.h.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(E, np.float32)
        t[f"{p}.input_layernorm.bias"] = np.zeros(E, np.float32)
        t[f"{p}.self_attention.query_key_value.weight"] = _r(
            rng, (g + 2) * KV * HD, E)
        t[f"{p}.self_attention.dense.weight"] = _r(rng, E, HEADS * HD)
        t[f"{p}.mlp.dense_h_to_4h.weight"] = _r(rng, I, E)
        t[f"{p}.mlp.dense_4h_to_h.weight"] = _r(rng, E, I)
    return t


def _bloom_tensors(rng):
    t = {"word_embeddings.weight": _r(rng, V, E),
         "word_embeddings_layernorm.weight": np.ones(E, np.float32),
         "word_embeddings_layernorm.bias": np.zeros(E, np.float32),
         "ln_f.weight": np.ones(E, np.float32),
         "ln_f.bias": np.zeros(E, np.float32)}
    for i in range(L):
        p = f"h.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(E, np.float32)
        t[f"{p}.input_layernorm.bias"] = np.zeros(E, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(E, np.float32)
        t[f"{p}.post_attention_layernorm.bias"] = np.zeros(E, np.float32)
        t[f"{p}.self_attention.query_key_value.weight"] = _r(rng, 3 * E, E)
        t[f"{p}.self_attention.query_key_value.bias"] = _r(rng, 3 * E)
        t[f"{p}.self_attention.dense.weight"] = _r(rng, E, E)
        t[f"{p}.self_attention.dense.bias"] = _r(rng, E)
        t[f"{p}.mlp.dense_h_to_4h.weight"] = _r(rng, I, E)
        t[f"{p}.mlp.dense_h_to_4h.bias"] = _r(rng, I)
        t[f"{p}.mlp.dense_4h_to_h.weight"] = _r(rng, E, I)
        t[f"{p}.mlp.dense_4h_to_h.bias"] = _r(rng, E)
    return t


def _phi_tensors(rng):
    t = {"model.embed_tokens.weight": _r(rng, V, E),
         "model.final_layernorm.weight": np.ones(E, np.float32),
         "model.final_layernorm.bias": np.zeros(E, np.float32),
         "lm_head.weight": _r(rng, V, E),
         "lm_head.bias": _r(rng, V)}
    for i in range(L):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(E, np.float32)
        t[f"{p}.input_layernorm.bias"] = np.zeros(E, np.float32)
        for nm, shape in (("q_proj", (E, E)), ("k_proj", (E, E)),
                          ("v_proj", (E, E)), ("dense", (E, E))):
            t[f"{p}.self_attn.{nm}.weight"] = _r(rng, *shape)
            t[f"{p}.self_attn.{nm}.bias"] = _r(rng, shape[0])
        t[f"{p}.mlp.fc1.weight"] = _r(rng, I, E)
        t[f"{p}.mlp.fc1.bias"] = _r(rng, I)
        t[f"{p}.mlp.fc2.weight"] = _r(rng, E, I)
        t[f"{p}.mlp.fc2.bias"] = _r(rng, E)
    return t


def _opt_tensors(rng):
    t = {"decoder.embed_tokens.weight": _r(rng, V, E),
         "decoder.embed_positions.weight": _r(rng, 66, E),
         "decoder.layer_norm.weight": np.ones(E, np.float32),
         "decoder.layer_norm.bias": np.zeros(E, np.float32),
         "lm_head.weight": _r(rng, V, E)}
    for i in range(L):
        p = f"decoder.layers.{i}"
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            t[f"{p}.self_attn.{nm}.weight"] = _r(rng, E, E)
            t[f"{p}.self_attn.{nm}.bias"] = _r(rng, E)
        t[f"{p}.self_attn_layer_norm.weight"] = np.ones(E, np.float32)
        t[f"{p}.self_attn_layer_norm.bias"] = np.zeros(E, np.float32)
        t[f"{p}.final_layer_norm.weight"] = np.ones(E, np.float32)
        t[f"{p}.final_layer_norm.bias"] = np.zeros(E, np.float32)
        t[f"{p}.fc1.weight"] = _r(rng, I, E)
        t[f"{p}.fc1.bias"] = _r(rng, I)
        t[f"{p}.fc2.weight"] = _r(rng, E, I)
        t[f"{p}.fc2.bias"] = _r(rng, E)
    return t


def _bert_tensors(rng):
    t = {"bert.embeddings.word_embeddings.weight": _r(rng, V, E),
         "bert.embeddings.position_embeddings.weight": _r(rng, 64, E),
         "bert.embeddings.token_type_embeddings.weight": _r(rng, 2, E),
         "bert.embeddings.LayerNorm.weight": np.ones(E, np.float32),
         "bert.embeddings.LayerNorm.bias": np.zeros(E, np.float32),
         "cls.predictions.transform.dense.weight": _r(rng, E, E),
         "cls.predictions.transform.dense.bias": _r(rng, E),
         "cls.predictions.transform.LayerNorm.weight": np.ones(
             E, np.float32),
         "cls.predictions.transform.LayerNorm.bias": np.zeros(
             E, np.float32),
         "cls.predictions.bias": _r(rng, V),
         "cls.predictions.decoder.weight": _r(rng, V, E)}
    for i in range(L):
        p = f"bert.encoder.layer.{i}"
        for nm in ("query", "key", "value"):
            t[f"{p}.attention.self.{nm}.weight"] = _r(rng, E, E)
            t[f"{p}.attention.self.{nm}.bias"] = _r(rng, E)
        t[f"{p}.attention.output.dense.weight"] = _r(rng, E, E)
        t[f"{p}.attention.output.dense.bias"] = _r(rng, E)
        t[f"{p}.attention.output.LayerNorm.weight"] = np.ones(E, np.float32)
        t[f"{p}.attention.output.LayerNorm.bias"] = np.zeros(E, np.float32)
        t[f"{p}.intermediate.dense.weight"] = _r(rng, I, E)
        t[f"{p}.intermediate.dense.bias"] = _r(rng, I)
        t[f"{p}.output.dense.weight"] = _r(rng, E, I)
        t[f"{p}.output.dense.bias"] = _r(rng, E)
        t[f"{p}.output.LayerNorm.weight"] = np.ones(E, np.float32)
        t[f"{p}.output.LayerNorm.bias"] = np.zeros(E, np.float32)
    return t


def _m2m_tensors(rng):
    t = {"model.shared.weight": _r(rng, V, E),
         "model.encoder.layer_norm.weight": np.ones(E, np.float32),
         "model.encoder.layer_norm.bias": np.zeros(E, np.float32),
         "model.decoder.layer_norm.weight": np.ones(E, np.float32),
         "model.decoder.layer_norm.bias": np.zeros(E, np.float32)}
    for side in ("encoder", "decoder"):
        for i in range(L):
            p = f"model.{side}.layers.{i}"
            for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
                t[f"{p}.self_attn.{nm}.weight"] = _r(rng, E, E)
                t[f"{p}.self_attn.{nm}.bias"] = _r(rng, E)
                if side == "decoder":
                    t[f"{p}.encoder_attn.{nm}.weight"] = _r(rng, E, E)
                    t[f"{p}.encoder_attn.{nm}.bias"] = _r(rng, E)
            t[f"{p}.self_attn_layer_norm.weight"] = np.ones(E, np.float32)
            t[f"{p}.self_attn_layer_norm.bias"] = np.zeros(E, np.float32)
            if side == "decoder":
                t[f"{p}.encoder_attn_layer_norm.weight"] = np.ones(
                    E, np.float32)
                t[f"{p}.encoder_attn_layer_norm.bias"] = np.zeros(
                    E, np.float32)
            t[f"{p}.final_layer_norm.weight"] = np.ones(E, np.float32)
            t[f"{p}.final_layer_norm.bias"] = np.zeros(E, np.float32)
            t[f"{p}.fc1.weight"] = _r(rng, I, E)
            t[f"{p}.fc1.bias"] = _r(rng, I)
            t[f"{p}.fc2.weight"] = _r(rng, E, I)
            t[f"{p}.fc2.bias"] = _r(rng, E)
    return t


def _baichuan_tensors(rng, prefix="model."):
    """W_pack fused QKV (MHA), untied normalized head (Baichuan2)."""
    t = {f"{prefix}embed_tokens.weight": _r(rng, V, E),
         f"{prefix}norm.weight": np.ones(E, np.float32),
         "lm_head.weight": _r(rng, V, E)}
    for i in range(L):
        p = f"{prefix}layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(E, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(E, np.float32)
        t[f"{p}.self_attn.W_pack.weight"] = _r(rng, 3 * E, E)
        t[f"{p}.self_attn.o_proj.weight"] = _r(rng, E, E)
        t[f"{p}.mlp.gate_proj.weight"] = _r(rng, I, E)
        t[f"{p}.mlp.down_proj.weight"] = _r(rng, E, I)
        t[f"{p}.mlp.up_proj.weight"] = _r(rng, I, E)
    return t


def _chatglm2_tensors(rng):
    """GLM block: fused QKV w/ bias (MQA 2 groups), packed-GLU w1n3."""
    glm_kv = 2
    qkv_rows = HEADS * HD + 2 * glm_kv * HD
    t = {"transformer.embedding.word_embeddings.weight": _r(rng, V, E),
         "transformer.encoder.final_layernorm.weight": np.ones(
             E, np.float32),
         "transformer.output_layer.weight": _r(rng, V, E)}
    for i in range(L):
        p = f"transformer.encoder.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(E, np.float32)
        t[f"{p}.self_attention.query_key_value.weight"] = _r(rng, qkv_rows, E)
        t[f"{p}.self_attention.query_key_value.bias"] = _r(rng, qkv_rows)
        t[f"{p}.self_attention.dense.weight"] = _r(rng, E, HEADS * HD)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(E, np.float32)
        t[f"{p}.mlp.dense_h_to_4h.weight"] = _r(rng, 2 * I, E)
        t[f"{p}.mlp.dense_4h_to_h.weight"] = _r(rng, E, I)
    return t


def _falcon40_tensors(rng):
    """Falcon-40B family: dual ln_attn/ln_mlp norms, parallel attention."""
    g = HEADS // KV
    t = {"transformer.word_embeddings.weight": _r(rng, V, E),
         "transformer.ln_f.weight": np.ones(E, np.float32),
         "transformer.ln_f.bias": np.zeros(E, np.float32),
         "lm_head.weight": _r(rng, V, E)}
    for i in range(L):
        p = f"transformer.h.{i}"
        t[f"{p}.ln_attn.weight"] = np.ones(E, np.float32)
        t[f"{p}.ln_attn.bias"] = np.zeros(E, np.float32)
        t[f"{p}.ln_mlp.weight"] = np.ones(E, np.float32)
        t[f"{p}.ln_mlp.bias"] = np.zeros(E, np.float32)
        t[f"{p}.self_attention.query_key_value.weight"] = _r(
            rng, (g + 2) * KV * HD, E)
        t[f"{p}.self_attention.dense.weight"] = _r(rng, E, HEADS * HD)
        t[f"{p}.mlp.dense_h_to_4h.weight"] = _r(rng, I, E)
        t[f"{p}.mlp.dense_4h_to_h.weight"] = _r(rng, E, I)
    return t


_LLAMA_CFG = {"model_type": "llama", "hidden_size": E,
              "num_hidden_layers": L, "num_attention_heads": HEADS,
              "num_key_value_heads": KV, "intermediate_size": I,
              "vocab_size": V, "rms_norm_eps": 1e-5}


# model name -> (tensor builder, config.json, forward kind)
ZOO = {
    "mistral_7b_instruct": (
        lambda rng: _llama_tensors(rng),
        {"model_type": "mistral", "hidden_size": E, "num_hidden_layers": L,
         "num_attention_heads": HEADS, "num_key_value_heads": KV,
         "intermediate_size": I, "vocab_size": V, "rms_norm_eps": 1e-5},
        "decoder"),
    "llama2_13b_chat": (
        lambda rng: _llama_tensors(rng),
        {"model_type": "llama", "hidden_size": E, "num_hidden_layers": L,
         "num_attention_heads": HEADS, "num_key_value_heads": KV,
         "intermediate_size": I, "vocab_size": V, "rms_norm_eps": 1e-5},
        "decoder"),
    "qwen1.5_7b_chat": (
        lambda rng: _llama_tensors(rng, biases=True),
        {"model_type": "qwen2", "hidden_size": E, "num_hidden_layers": L,
         "num_attention_heads": HEADS, "num_key_value_heads": KV,
         "intermediate_size": I, "vocab_size": V, "rms_norm_eps": 1e-5},
        "decoder"),
    "gemma_2b_it": (
        lambda rng: _llama_tensors(rng, tied=True),
        {"model_type": "llama", "hidden_size": E, "num_hidden_layers": L,
         "num_attention_heads": HEADS, "num_key_value_heads": KV,
         "intermediate_size": I, "vocab_size": V, "rms_norm_eps": 1e-6,
         "head_dim": HD},
        "decoder"),
    "mixtral_8x7b_instruct": (
        lambda rng: _llama_tensors(rng, moe="mixtral"),
        {"model_type": "mixtral", "hidden_size": E, "num_hidden_layers": L,
         "num_attention_heads": HEADS, "num_key_value_heads": KV,
         "intermediate_size": I, "vocab_size": V,
         "num_local_experts": 4, "num_experts_per_tok": 2},
        "decoder"),
    "deepseek_moe_16b_base": (
        lambda rng: _llama_tensors(rng, moe="deepseek"),
        {"model_type": "deepseek", "hidden_size": E, "num_hidden_layers": L,
         "num_attention_heads": HEADS, "num_key_value_heads": KV,
         "intermediate_size": I, "vocab_size": V,
         "n_routed_experts": 4, "num_experts_per_tok": 2,
         "n_shared_experts": 1, "first_k_dense_replace": 1,
         "norm_topk_prob": False},
        "decoder"),
    "falcon_7b_instruct": (
        _falcon_tensors,
        {"model_type": "falcon", "hidden_size": E, "num_hidden_layers": L,
         "num_attention_heads": HEADS, "n_head_kv": KV, "vocab_size": V,
         "parallel_attn": True, "ffn_dim": I},
        "decoder"),
    "bloomz_3b": (
        _bloom_tensors,
        {"model_type": "bloom", "n_embed": E, "n_layer": L, "n_head": HEADS,
         "vocab_size": V, "ffn_hidden_size": I},
        "decoder"),
    "phi_2": (
        _phi_tensors,
        {"model_type": "phi", "hidden_size": E, "num_hidden_layers": L,
         "num_attention_heads": HEADS, "intermediate_size": I,
         "vocab_size": V, "partial_rotary_factor": 0.5},
        "decoder"),
    "opt_350m": (
        _opt_tensors,
        {"model_type": "opt", "hidden_size": E, "num_hidden_layers": L,
         "num_attention_heads": HEADS, "ffn_dim": I, "vocab_size": V,
         "max_position_embeddings": 64},
        "decoder"),
    "bert_base_multilingual_cased": (
        _bert_tensors,
        {"model_type": "bert", "hidden_size": E, "num_hidden_layers": L,
         "num_attention_heads": HEADS, "intermediate_size": I,
         "vocab_size": V, "max_position_embeddings": 64},
        "encoder"),
    "facebook_m2m100_418m": (
        _m2m_tensors,
        {"model_type": "m2m_100", "d_model": E, "encoder_layers": L,
         "decoder_layers": L, "encoder_attention_heads": HEADS,
         "decoder_attention_heads": HEADS, "decoder_ffn_dim": I,
         "vocab_size": V},
        "encdec"),
    # --- round-3 zoo parity additions (VERDICT r2 item 6) ---
    "llama2_7b_chat_hf": (lambda rng: _llama_tensors(rng),
                          dict(_LLAMA_CFG), "decoder"),
    "fusellm_7b": (lambda rng: _llama_tensors(rng),
                   dict(_LLAMA_CFG), "decoder"),
    "open_llama_3b": (lambda rng: _llama_tensors(rng),
                      dict(_LLAMA_CFG), "decoder"),
    "internlm_chat_20b": (lambda rng: _llama_tensors(rng),
                          dict(_LLAMA_CFG, model_type="internlm"),
                          "decoder"),
    "orion_14b_chat": (lambda rng: _llama_tensors(rng),
                       dict(_LLAMA_CFG, model_type="orion"), "decoder"),
    "xverse_13b_chat": (lambda rng: _llama_tensors(rng),
                        dict(_LLAMA_CFG, model_type="xverse"), "decoder"),
    "aquila_chat2_34b": (lambda rng: _llama_tensors(rng),
                         dict(_LLAMA_CFG, model_type="aquila"), "decoder"),
    "yi_34b_chat": (lambda rng: _llama_tensors(rng),
                    dict(_LLAMA_CFG, model_type="yi"), "decoder"),
    "yi_6b_200k": (lambda rng: _llama_tensors(rng),
                   dict(_LLAMA_CFG, model_type="yi"), "decoder"),
    "qwen1.5_0.5b_chat": (lambda rng: _llama_tensors(rng, biases=True,
                                                     tied=True),
                          dict(_LLAMA_CFG, model_type="qwen2",
                               tie_word_embeddings=True), "decoder"),
    "minicpm_2b_dpo_bf16": (lambda rng: _llama_tensors(rng, tied=True),
                            dict(_LLAMA_CFG, model_type="minicpm",
                                 tie_word_embeddings=True), "decoder"),
    "baichuan2_7b_chat": (_baichuan_tensors,
                          dict(_LLAMA_CFG, model_type="baichuan",
                               num_key_value_heads=HEADS), "decoder"),
    "baichuan2_13b_chat": (_baichuan_tensors,
                           dict(_LLAMA_CFG, model_type="baichuan",
                                num_key_value_heads=HEADS), "decoder"),
    "chatglm2_6b": (_chatglm2_tensors,
                    {"model_type": "chatglm", "hidden_size": E,
                     "num_layers": L, "num_attention_heads": HEADS,
                     "multi_query_group_num": 2, "ffn_hidden_size": I,
                     "padded_vocab_size": V, "vocab_size": V,
                     "layernorm_epsilon": 1e-5}, "decoder"),
    "falcon_40b_instruct": (_falcon40_tensors,
                            {"model_type": "falcon", "hidden_size": E,
                             "num_hidden_layers": L,
                             "num_attention_heads": HEADS, "n_head_kv": KV,
                             "vocab_size": V, "parallel_attn": True,
                             "ffn_dim": I,
                             "new_decoder_architecture": True}, "decoder"),
    "opt_13b": (_opt_tensors,
                {"model_type": "opt", "hidden_size": E,
                 "num_hidden_layers": L, "num_attention_heads": HEADS,
                 "ffn_dim": I, "vocab_size": V,
                 "max_position_embeddings": 64}, "decoder"),
    "opt_iml_max_30b": (_opt_tensors,
                        {"model_type": "opt", "hidden_size": E,
                         "num_hidden_layers": L,
                         "num_attention_heads": HEADS, "ffn_dim": I,
                         "vocab_size": V,
                         "max_position_embeddings": 64}, "decoder"),
}


def _write_checkpoint(tmp_path, spec, tensors):
    """Write the synthetic checkpoint in the format the spec declares."""
    fmt = spec.model_file_format
    first = spec.model_files[0]
    if fmt == "safetensors":
        if first.endswith(".index.json"):
            shard = "model-00001-of-00001.safetensors"
            save_safetensors(str(tmp_path / shard), tensors)
            with open(tmp_path / first, "w") as fh:
                json.dump({"weight_map": {k: shard for k in tensors}}, fh)
        else:
            save_safetensors(str(tmp_path / first), tensors)
    elif fmt == "pickle":
        import torch
        td = {k: torch.from_numpy(v) for k, v in tensors.items()}
        if first.endswith(".index.json"):
            shard = "pytorch_model-00001-of-00001.bin"
            torch.save(td, str(tmp_path / shard))
            with open(tmp_path / first, "w") as fh:
                json.dump({"weight_map": {k: shard for k in tensors}}, fh)
        else:
            torch.save(td, str(tmp_path / first))
    else:
        pytest.skip(f"format {fmt} covered elsewhere")


@pytest.mark.parametrize("name", sorted(ZOO))
def test_zoo_spec_loads_and_runs(name, tmp_path):
    spec_path = os.path.join(CONFIG_DIR, name, "model_spec.json")
    assert os.path.isfile(spec_path), f"missing zoo spec for {name}"
    spec = load_model_spec(spec_path, sid=name)
    builder, config, kind = ZOO[name]
    rng = np.random.default_rng(hash(name) % 2**32)
    with open(tmp_path / (spec.config_file or "config.json"), "w") as fh:
        json.dump(config, fh)
    _write_checkpoint(tmp_path, spec, builder(rng))

    spec.device_weight_data_type = "Q8_B32T1"
    spec.tensor_quant_threshold = 10 ** 9  # keep tiny test weights dense
    if spec.hyper_params.experts:
        # spec files carry production expert counts; the synthetic
        # checkpoint is resized, let config.json fill them
        spec.hyper_params.experts = 0
        spec.hyper_params.moe_top_k = 0
    # production-scale spec constants don't fit the shrunken test shapes
    spec.hyper_params.vocab_size = 0
    spec.hyper_params.padded_vocab_size = 0
    if spec.rope_dim > HD:  # chatglm2's rope_dim=64 vs test head_dim
        spec.rope_dim = HD // 2
    params = load_model(spec, str(tmp_path))

    tokens = jnp.asarray([[3, 5, 9, 2]], jnp.int32)
    pos = jnp.arange(4)[None, :]
    if kind == "decoder":
        logits, _ = decoder_forward(spec, params, tokens, pos, None)
        assert logits.shape == (1, 4, V)
        # through the serving engine facade (slot cache + sampling)
        from inferflow_tpu.runtime.engine import InferenceEngine
        from inferflow_tpu.sampling.strategies import SamplingOptions
        eng = InferenceEngine(spec, params, max_concurrent_queries=2,
                              max_context_len=64, use_pallas=False)
        out = eng.generate([3, 5, 9], SamplingOptions(strategy="greedy"),
                           max_new_tokens=3)
        assert len(out) == 3 and all(0 <= t < V for t in out)
    elif kind == "encoder":
        hidden = encoder_forward(spec, params, tokens, pos)
        logits = mlm_logits(spec, params, hidden)
        assert logits.shape[-1] == V
    else:
        logits, _, _ = encdec_forward(spec, params, tokens, tokens)
        assert logits.shape == (1, 4, V)
    assert bool(jnp.isfinite(logits).all())


def test_normalize_lm_head_on_quantized_head(tmp_path):
    """Baichuan2's normalize_lm_head composes with a QUANTIZED head: the
    loader L2-normalizes the fp weights BEFORE quantization (reference
    network_builder.cc:439-444 normalizes the host tensor pre-upload),
    so logits match normalize-then-quantize within codec error."""
    from inferflow_tpu.quant.codec_jax import QuantizedTensor
    from inferflow_tpu.quant import codec_np

    spec_path = os.path.join(CONFIG_DIR, "baichuan2_7b_chat",
                             "model_spec.json")
    spec = load_model_spec(spec_path, sid="baichuan2_7b_chat")
    assert spec.normalize_lm_head
    rng = np.random.default_rng(7)
    tensors = _baichuan_tensors(rng)
    with open(tmp_path / "config.json", "w") as fh:
        json.dump(dict(_LLAMA_CFG, model_type="baichuan",
                       num_key_value_heads=HEADS), fh)
    _write_checkpoint(tmp_path, spec, tensors)

    spec.device_weight_data_type = "Q8_B32T2"
    spec.tensor_quant_threshold = 1  # quantize everything incl. the head
    params = load_model(spec, str(tmp_path))
    assert isinstance(params["lm_head"], QuantizedTensor)
    assert not spec.normalize_lm_head  # consumed at load

    # ground truth: normalize rows of the (V, E) checkpoint tensor, then
    # quantize->dequantize with the numpy codec
    w = tensors["lm_head.weight"].astype(np.float32)
    w = w / np.linalg.norm(w, axis=1, keepdims=True)
    wt = np.ascontiguousarray(w.T)  # (E, V)
    ref = codec_np.dequantize_np(codec_np.quantize_np(
        wt.astype(np.float16).astype(np.float32), "Q8_B32T2"))
    from inferflow_tpu.quant.codec_jax import dequantize as _dq
    got = np.asarray(_dq(params["lm_head"], jnp.float32))[:wt.shape[0]]
    assert np.allclose(got, ref, atol=2e-2), np.abs(got - ref).max()


def test_all_zoo_specs_parse():
    """Every shipped spec file parses (even families without a synthetic
    checkpoint harness here, e.g. llama2.c / GGUF — loaders covered by
    their own tests)."""
    specs = glob.glob(os.path.join(CONFIG_DIR, "*", "model_spec.json"))
    assert len(specs) >= 12
    for path in specs:
        spec = load_model_spec(path)
        assert spec.model_files or spec.model_file_format in ("unknown",)
