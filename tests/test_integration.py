"""Full-stack integration: ini config -> llama2.c checkpoint -> tokenizer
-> engine -> generation (the llm_inference smoke-test path of the
reference, bin/llm_inference.tiny.ini + data/models/llama2.c)."""

import json
import os
import struct

import numpy as np
import pytest

VOCAB = 32  # tiny byte-ish vocab
DIM, HIDDEN, LAYERS, HEADS = 48, 96, 2, 4


def _write_llama2c(path, rng):
    """Synthetic v0 llama2.c checkpoint (7-int header + f32 tensors)."""
    head_dim = DIM // HEADS
    seq_len = 64
    with open(path, "wb") as fh:
        fh.write(struct.pack("<7i", DIM, HIDDEN, LAYERS, HEADS, HEADS,
                             VOCAB, seq_len))

        def t(*shape):
            arr = (rng.standard_normal(shape) * 0.08).astype(np.float32)
            fh.write(arr.tobytes())

        t(VOCAB, DIM)
        for _ in range(LAYERS):
            t(DIM)
        for _ in range(LAYERS):
            t(DIM, DIM)
        for _ in range(LAYERS):
            t(DIM, DIM)
        for _ in range(LAYERS):
            t(DIM, DIM)
        for _ in range(LAYERS):
            t(DIM, DIM)
        for _ in range(LAYERS):
            t(DIM)
        for _ in range(LAYERS):
            t(HIDDEN, DIM)
        for _ in range(LAYERS):
            t(DIM, HIDDEN)
        for _ in range(LAYERS):
            t(HIDDEN, DIM)
        t(DIM)
        t(seq_len, head_dim)  # freq_cis (skipped by loader)


def _write_tokenizer_bin(path):
    toks = [b"<unk>", b"<s>", b"</s>"] + [bytes([65 + i])
                                          for i in range(VOCAB - 3)]
    with open(path, "wb") as fh:
        fh.write(struct.pack("<I", max(len(t) for t in toks)))
        for t in toks:
            fh.write(struct.pack("<f", 0.0))
            fh.write(struct.pack("<I", len(t)))
            fh.write(t)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("m")
    mdir = root / "models" / "tiny_story"
    os.makedirs(mdir)
    _write_llama2c(str(mdir / "model.bin"), rng)
    _write_tokenizer_bin(str(mdir / "tokenizer.bin"))
    with open(mdir / "model_spec.json", "w") as fh:
        json.dump({
            "model_files": ["model.bin"],
            "model_file_format": "llama2.c",
            "tokenizer_files": ["tokenizer.bin"],
            "tokenization_algorithm": "bpe",
            "network_structure": {
                "type": "transformer.llama",
                "normalization_function": "rms",
                "activation_function": "silu",
                "position_embedding": "rope",
                "qk_column_order": 0,
            },
        }, fh)
    ini = root / "svc.ini"
    with open(ini, "w") as fh:
        fh.write(f"""
[main]
http_port = 0

[transformer_engine]
models = tiny_story
devices = 0
max_concurrent_queries = 2

[model.tiny_story]
model_dir = {mdir}/
model_specification_file = {mdir}/model_spec.json
device_weight_data_type = F16
device_kv_cache_data_type = Q8
max_context_len = 64
""")
    return str(root), str(ini)


def test_from_config_generation(model_dir):
    root, ini = model_dir
    from inferflow_tpu.config import load_engine_config
    from inferflow_tpu.runtime.engine import InferenceEngine
    from inferflow_tpu.sampling.strategies import SamplingOptions

    ec = load_engine_config(ini)
    assert ec.model.sid == "tiny_story"
    eng = InferenceEngine.from_config(ec)
    assert eng.tokenizer is not None
    assert eng.spec.hyper_params.decoder_layers == LAYERS
    toks = eng.generate("ABC", SamplingOptions(strategy="greedy"),
                        max_new_tokens=5)
    assert len(toks) >= 1
    text = eng.tokenizer.decode(toks)
    assert isinstance(text, str)


def test_quantized_from_config(model_dir):
    root, ini = model_dir
    from inferflow_tpu.config import load_engine_config
    from inferflow_tpu.runtime.engine import InferenceEngine
    from inferflow_tpu.sampling.strategies import SamplingOptions

    ec = load_engine_config(ini)
    spec = ec.model
    spec.device_weight_data_type = "Q8_B32T1"
    spec.tensor_quant_threshold = 0
    eng_q = InferenceEngine.from_config(ec)
    ec2 = load_engine_config(ini)
    eng_f = InferenceEngine.from_config(ec2)
    a = eng_q.generate("ABC", SamplingOptions(strategy="greedy"),
                       max_new_tokens=4)
    b = eng_f.generate("ABC", SamplingOptions(strategy="greedy"),
                       max_new_tokens=4)
    # Q8 quantization noise may flip late tokens; first should agree
    assert a[0] == b[0]
