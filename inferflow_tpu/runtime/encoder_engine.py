"""Engines for encoder-only and encoder-decoder archetypes.

reference: the encoder / encoder-decoder serving paths of InferenceEngine
(inference_engine.cc:893-954): an encoder pass stores per-query encoder
outputs (UpdateEncoderEnd, query_state_table.cc:139-168), the decoder then
consumes them through cross-attention; encoder-only (BERT) samples at the
[MASK] position.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.encoder import encoder_forward, mlm_logits, encdec_forward
from ..models.spec import ModelSpec
from ..sampling.strategies import DecodingStrategies, SamplingOptions
from .kv_cache import KVCache


class EncoderOnlyEngine:
    """BERT-style serving: masked-token prediction / embeddings."""

    def __init__(self, spec: ModelSpec, params: dict, tokenizer=None,
                 vocab=None, use_pallas: bool = True):
        self.spec = spec
        self.params = params
        self.tokenizer = tokenizer
        self.vocab = vocab
        self._fwd = jax.jit(
            lambda p, t, pos, tt: encoder_forward(spec, p, t, pos, tt,
                                                  use_pallas=use_pallas))
        self._mlm = jax.jit(
            lambda p, h: mlm_logits(spec, p, h, use_pallas=use_pallas))

    def encode(self, tokens: Sequence[int]) -> np.ndarray:
        """Hidden states (T, E)."""
        t = jnp.asarray([list(tokens)], jnp.int32)
        pos = jnp.arange(t.shape[1], dtype=jnp.int32)[None, :]
        h = self._fwd(self.params, t, pos, None)
        return np.asarray(h[0], np.float32)

    def predict_masked(self, tokens: Sequence[int],
                       mask_id: Optional[int] = None) -> List[int]:
        """Predict the token at each [MASK] position
        (inference_engine.cc:939-954)."""
        if mask_id is None:
            mask_id = getattr(self.vocab, "mask_id", -1)
        toks = list(tokens)
        t = jnp.asarray([toks], jnp.int32)
        pos = jnp.arange(len(toks), dtype=jnp.int32)[None, :]
        h = self._fwd(self.params, t, pos, None)
        logits = np.asarray(self._mlm(self.params, h)[0], np.float32)
        out = []
        for i, tok in enumerate(toks):
            if tok == mask_id:
                out.append(int(logits[i].argmax()))
        return out


class EncDecEngine:
    """Encoder-decoder generation (m2m100/BART style): encoder runs once
    per query; decoder steps with self-attn KV cache + cross-attention
    over the cached encoder states."""

    def __init__(self, spec: ModelSpec, params: dict, tokenizer=None,
                 vocab=None, max_context_len: int = 0,
                 use_pallas: bool = True):
        self.spec = spec
        self.params = params
        self.tokenizer = tokenizer
        self.vocab = vocab
        hp = spec.hyper_params
        self.max_context_len = max_context_len or spec.max_context_len
        if self.max_context_len <= 0:
            self.max_context_len = 512
        self.strategies = DecodingStrategies(
            eos_ids={vocab.eos_id} if vocab else set())
        self._step = jax.jit(
            lambda p, et, dt, c, es, ckv: encdec_forward(
                spec, p, et, dt, cache=c, enc_states=es, cross_kvs=ckv,
                use_pallas=use_pallas))
        from ..models.encoder import compute_cross_kv
        self._cross_kv = jax.jit(
            lambda p, es: compute_cross_kv(spec, p["layers"], es,
                                           use_pallas=use_pallas))

    def generate(self, enc_tokens: Sequence[int],
                 bos_id: Optional[int] = None,
                 sampling: Optional[SamplingOptions] = None,
                 max_new_tokens: int = 64) -> List[int]:
        return list(self.generate_stream(enc_tokens, bos_id, sampling,
                                         max_new_tokens))

    def generate_stream(self, enc_tokens: Sequence[int],
                        bos_id: Optional[int] = None,
                        sampling: Optional[SamplingOptions] = None,
                        max_new_tokens: int = 64):
        """Yield generated token ids one at a time (the SSE path)."""
        hp = self.spec.hyper_params
        opts = sampling or SamplingOptions(strategy="greedy")
        self.strategies.begin_query(1, opts)
        if bos_id is None:
            bos_id = self.vocab.bos_id if self.vocab else 1
        eos = self.vocab.eos_id if self.vocab else -1

        et = jnp.asarray([list(enc_tokens)], jnp.int32)
        cache = KVCache.create(hp.decoder_layers, 1, self.max_context_len,
                               hp.kv_heads, hp.head_dim, quantized=False)
        out: List[int] = []
        cur = bos_id
        enc_states = None
        cross_kvs = None
        try:
            for _ in range(max_new_tokens):
                dt = jnp.asarray([[cur]], jnp.int32)
                logits, cache, enc_states = self._step(self.params, et, dt,
                                                       cache, enc_states,
                                                       cross_kvs)
                if cross_kvs is None:
                    cross_kvs = self._cross_kv(self.params, enc_states)
                row = np.asarray(logits[0, -1], np.float32)
                cur = self.strategies.choose_token(1, row, out)
                if cur == eos:
                    break
                out.append(cur)
                yield cur
        finally:
            self.strategies.end_query(1)
