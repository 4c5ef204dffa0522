"""Config system tests: ini macros, model_spec.json, device groups,
prompt templates (reference: sslib config_data.h, inference_engine.cc
LoadConfig family)."""

import json
import os

import pytest

from inferflow_tpu.config import (ConfigData, load_model_spec,
                                  load_engine_config, parse_device_groups)
from inferflow_tpu.config.engine_config import (strategy_from_groups,
                                                expand_prompt_template)
from inferflow_tpu.models.network_structure import (canonical_to_slot,
                                                    NameMapper)

INI = """
[main]
http_port = 9090
global_model_dir = ${data_root_dir}models/
default_prompt_template = {query}{\\n}{res_prefix}

[transformer_engine]
models = demo
devices = 0&1;2&3
max_concurrent_queries = 5
; a comment
is_study_mode = false

[model.demo]
model_dir = ${global_model_dir}${model_name}/
model_specification_file = ${model_dir}model_spec.json
device_weight_data_type = Q4_B64T1
device_kv_cache_data_type = Q8
host_kv_cache_percent = 50
max_context_len = 4096
prompt_template = [INST]{query}[/INST]

[prompt_template.alpaca]
template = Below is an instruction.{\\n}{query}
"""

SPEC = {
    "config_file": "config.json",
    "model_files": ["model.safetensors"],
    "model_file_format": "safetensors",
    "tokenizer_files": ["tokenizer.json"],
    "tokenization_algorithm": "bpe",
    "network_structure": {
        "type": "transformer.decoder_only.sparse_moe",
        "normalization_function": "rms",
        "activation_function": "silu",
        "position_embedding": "rope",
        "qk_column_order": 2,
        "expert_count": 8,
        "moe_top_k": 2,
        "is_attn_post_as_residual": False,
        "tensor_name_prefix": "model.",
        "tensor_name_mapping": {
            "layers.{i}.block_sparse_moe.gate.weight":
                "dec.{i}.moe.gate.weight",
            "norm.weight": "dec.output_norm.weight",
        },
    },
}


def test_ini_macros(tmp_path):
    path = str(tmp_path / "svc.ini")
    with open(path, "w") as fh:
        fh.write(INI)
    cfg = ConfigData.load(path, {"data_root_dir": "/data/"})
    assert cfg.get_int("main", "http_port") == 9090
    assert cfg.get("main", "global_model_dir") == "/data/models/"
    got = cfg.get("model.demo", "model_dir", extra={"model_name": "demo"})
    assert got == "/data/models/demo/"
    assert cfg.get_int("transformer_engine", "max_concurrent_queries") == 5
    assert not cfg.get_bool("transformer_engine", "is_study_mode", True)


def test_device_groups():
    assert parse_device_groups("0&1;2&3") == [[0, 1], [2, 3]]
    assert parse_device_groups("0;1") == [[0], [1]]
    assert parse_device_groups("0&1&2&3") == [[0, 1, 2, 3]]
    assert strategy_from_groups([[0, 1], [2, 3]]) == "hybrid"
    assert strategy_from_groups([[0], [1]]) == "by_layer"
    assert strategy_from_groups([[0, 1]]) == "by_tensor"


def test_model_spec_json(tmp_path):
    path = str(tmp_path / "model_spec.json")
    with open(path, "w") as fh:
        json.dump(SPEC, fh)
    spec = load_model_spec(path, sid="mixtral")
    assert spec.model_file_format == "safetensors"
    assert spec.archetype == "decoder_only"
    assert spec.hyper_params.experts == 8
    assert spec.hyper_params.moe_top_k == 2
    assert not spec.is_attn_post_as_residual
    assert spec.qk_column_order == 2
    assert spec.tensor_name_prefix == "model."


def test_engine_config_end_to_end(tmp_path):
    model_dir = tmp_path / "models" / "demo"
    os.makedirs(model_dir)
    with open(model_dir / "model_spec.json", "w") as fh:
        json.dump(SPEC, fh)
    ini_path = str(tmp_path / "svc.ini")
    with open(ini_path, "w") as fh:
        fh.write(INI)
    ec = load_engine_config(ini_path, data_root_dir=str(tmp_path) + "/")
    assert ec.http_port == 9090
    assert ec.max_concurrent_queries == 5
    assert ec.multi_device_strategy == "hybrid"
    assert ec.device_groups == [[0, 1], [2, 3]]
    spec = ec.model
    assert spec.sid == "demo"
    assert spec.device_weight_data_type == "Q4_B64T1"
    assert spec.device_kv_cache_data_type == "Q8"
    assert spec.host_kv_cache_percent == 50
    assert spec.max_context_len == 4096
    assert spec.decoder_input_template == "[INST]{query}[/INST]"
    assert spec.hyper_params.experts == 8  # from model_spec.json
    assert "alpaca" in ec.prompt_templates


def test_prompt_template_expansion():
    out = expand_prompt_template(r"{bos}[INST]{query}[/INST]{\n}{res_prefix}",
                                 query="hi", res_prefix="Sure", bos="<s>")
    assert out == "<s>[INST]hi[/INST]\nSure"


def test_canonical_name_translation():
    assert canonical_to_slot("dec.token_embeddings.weight") == "dec_embeddings"
    assert canonical_to_slot("dec.{i}.self_attn.wq.weight") == \
        "layers.{i}.attn.wq"
    assert canonical_to_slot("dec.{i}.self_attn.pre_norm.bias") == \
        "layers.{i}.attn.pre_norm_b"
    assert canonical_to_slot("dec.{i}.moe.expert.{j}.w1.weight") == \
        "layers.{i}.moe.experts.{j}.w1"
    assert canonical_to_slot("dec.{i}.moe.shared_expert.w2.weight") == \
        "layers.{i}.moe.shared.w2"
    assert canonical_to_slot("enc.{i}.feed_forward.w1.bias") == \
        "enc_layers.{i}.ffn.w1_b"
    assert canonical_to_slot("dec.{i}.cross_attn.wk.weight") == \
        "layers.{i}.cross_attn.wk"


def test_spec_map_with_reference_canonical_names():
    """model_spec.json tensor_name_mapping with reference canonical values
    must resolve end-to-end (the mixtral spec's own entries)."""
    m = NameMapper("sparse_moe", spec_map={
        "layers.{i}.block_sparse_moe.gate.weight": "dec.{i}.moe.gate.weight",
        "norm.weight": "dec.output_norm.weight"})
    path, t = m.map_name("layers.3.block_sparse_moe.gate.weight")
    assert path == ("layers", 3, "moe", "gate") and t
    path, t = m.map_name("norm.weight")
    assert path == ("dec_output_norm",) and not t


def test_token_remap(tmp_path):
    """Token remap file redirects vocab ids at load
    (model_reader.cc LoadTokenRemapData + LoadVocabJson token_map)."""
    import json as _json
    from inferflow_tpu.tokenizer.loading import (load_token_remap,
                                                 load_tokenizer_json)
    tok_json = {"model": {"vocab": {"a": 0, "b": 1, "c": 2}, "merges": []}}
    tpath = str(tmp_path / "tokenizer.json")
    with open(tpath, "w") as fh:
        _json.dump(tok_json, fh)
    rpath = str(tmp_path / "remap.json")
    with open(rpath, "w") as fh:
        _json.dump({"0": 2, "1": 0, "2": 1}, fh)
    remap = load_token_remap(rpath)
    assert remap == {0: 2, 1: 0, 2: 1}
    v = load_tokenizer_json(tpath, 0, remap)
    assert v.token_str(2) == b"a" and v.token_str(0) == b"b"
    # two-column text form
    rpath2 = str(tmp_path / "remap.txt")
    with open(rpath2, "w") as fh:
        fh.write("0 1\n1 0\n")
    assert load_token_remap(rpath2) == {0: 1, 1: 0}


def test_template_token_id_escapes():
    """`{#id}` escapes splice literal token ids
    (inference_engine.cc BuildDecoderInput `{#id}` keys)."""
    from inferflow_tpu.tokenizer.vocab import Vocabulary
    from inferflow_tpu.tokenizer.tokenizer import Tokenizer
    from inferflow_tpu.tokenizer.loading import tokenize_with_escapes
    v = Vocabulary()
    v.add(b"<unk>"); v.add(b"<s>"); v.add(b"</s>")
    for b in range(256):
        v.add(b"<0x%02X>" % b, 0.0, 3)
    v.unk_id, v.bos_id, v.eos_id = 0, 1, 2
    v.find_byte_token_start()
    tk = Tokenizer(v, "bpe")
    toks = tokenize_with_escapes(tk, "{#5}A{#9}", add_bos=True)
    assert toks[0] == 1 and toks[1] == 5 and toks[-1] == 9
    assert len(toks) == 4  # bos, 5, 'A' byte, 9
