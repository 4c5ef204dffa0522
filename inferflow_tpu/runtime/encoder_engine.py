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


class EncDecBatchEngine:
    """Continuous-batching encoder-decoder serving: same facade as
    InferenceEngine (add_query / infer / commit_inference_result), so the
    HTTP batching core serves m2m100/BART-style models with concurrent
    streaming queries (reference: all archetypes route through the same
    engine/QueryStateTable, inference_engine.cc:893-954; per-query
    encoder outputs via UpdateEncoderEnd, query_state_table.cc:139-168).

    Slot model: the encoder pass runs once per admitted query (the
    "prefill"), its cross-attention K/V are projected once
    (compute_cross_kv) and scattered into per-slot buffers; decode then
    batches every active slot per step with per-slot encoder lengths
    masking the padded cross K/V."""

    def __init__(self, spec: ModelSpec, params: dict,
                 max_concurrent_queries: int = 8,
                 max_context_len: int = 0, max_enc_len: int = 0,
                 tokenizer=None, vocab=None, use_pallas: bool = True,
                 kv_cache_quantized=None):
        from .query_state import QueryStateTable
        self.spec = spec
        self.params = params
        self.tokenizer = tokenizer
        self.vocab = vocab
        self.use_pallas = use_pallas
        hp = spec.hyper_params
        self.max_slots = max_concurrent_queries
        self.max_context_len = max_context_len or spec.max_context_len
        if self.max_context_len <= 0:
            self.max_context_len = 512
        self.max_enc_len = max_enc_len or self.max_context_len
        self.table = QueryStateTable(self.max_slots)
        if kv_cache_quantized is None:
            from ..quant.formats import is_quantized
            kv_cache_quantized = is_quantized(
                spec.device_kv_cache_data_type)
        self.cache = KVCache.create(hp.decoder_layers, self.max_slots,
                                    self.max_context_len, hp.kv_heads,
                                    hp.head_dim,
                                    quantized=kv_cache_quantized)
        n_heads = hp.decoder_heads
        head_dim = hp.embd_dims // n_heads if n_heads else hp.head_dim
        layers = params["layers"]
        self._has_cross = ["cross_attn" in lp for lp in layers]
        def z():
            # distinct buffers per layer/tensor: shared zeros would be
            # donated twice in the scatter jit
            return jnp.zeros((self.max_slots, self.max_enc_len, n_heads,
                              head_dim), jnp.bfloat16)

        self.cross_k = [z() if c else None for c in self._has_cross]
        self.cross_v = [z() if c else None for c in self._has_cross]
        self.enc_len = np.zeros((self.max_slots,), np.int32)
        eos_ids = set()
        if vocab is not None and getattr(vocab, "eos_id", -1) >= 0:
            eos_ids.add(vocab.eos_id)
        self.eos_ids = eos_ids
        self.strategies = DecodingStrategies(eos_ids=eos_ids)
        self._lock = __import__("threading").Lock()
        self.perf_stat = {}

        self._encode = jax.jit(self._encode_impl,
                               static_argnames=("bucket",))
        self._decode = jax.jit(self._decode_impl, donate_argnums=(2,))
        self._scatter = jax.jit(self._scatter_impl, donate_argnums=(0, 1))

    # -- jitted pieces ---------------------------------------------------
    def _encode_impl(self, params, tokens, length, *, bucket: int):
        pos = jnp.arange(bucket, dtype=jnp.int32)[None, :]
        enc_params = dict(params)
        if "enc_embeddings" not in enc_params:
            enc_params["enc_embeddings"] = enc_params["dec_embeddings"]
        enc_states = encoder_forward(self.spec, enc_params, tokens, pos,
                                     seq_len=length,
                                     use_pallas=self.use_pallas)
        from ..models.encoder import compute_cross_kv
        kvs = compute_cross_kv(self.spec, params["layers"], enc_states,
                               use_pallas=self.use_pallas)
        return kvs

    def _scatter_impl(self, cross_k, cross_v, new_kvs, slot):
        out_k, out_v = [], []
        for ck, cv, kv in zip(cross_k, cross_v, new_kvs):
            if ck is None:
                out_k.append(None)
                out_v.append(None)
                continue
            nk, nv = kv
            se = nk.shape[1]
            pad = self.max_enc_len - se
            nk = jnp.pad(nk.astype(ck.dtype), ((0, 0), (0, pad), (0, 0),
                                               (0, 0)))
            nv = jnp.pad(nv.astype(cv.dtype), ((0, 0), (0, pad), (0, 0),
                                               (0, 0)))
            out_k.append(jax.lax.dynamic_update_slice(
                ck, nk, (slot, 0, 0, 0)))
            out_v.append(jax.lax.dynamic_update_slice(
                cv, nv, (slot, 0, 0, 0)))
        return out_k, out_v

    def _decode_impl(self, params, tokens, cache, cross_k, cross_v,
                     enc_len, active):
        from ..models.encoder import encdec_embed_dec, encdec_decoder_layer
        from ..models.decoder import output_logits
        from .kv_cache import layer_cache_slice, store_layer_cache
        positions = cache.length[:, None]
        x = encdec_embed_dec(self.spec, params, tokens, positions)
        for i, lp in enumerate(params["layers"]):
            lc = layer_cache_slice(cache, i)
            ckv = ((cross_k[i], cross_v[i])
                   if self._has_cross[i] else None)
            x, lc = encdec_decoder_layer(self.spec, lp, x, positions, None,
                                         lc, cross_kv=ckv, enc_len=enc_len,
                                         use_pallas=self.use_pallas)
            cache = store_layer_cache(cache, i, lc)
        logits = output_logits(self.spec, params, x,
                               use_pallas=self.use_pallas)
        cache = cache.with_length(cache.length + active)
        return logits[:, -1, :], cache

    # -- facade ----------------------------------------------------------
    def add_query(self, prompt, sampling: Optional[SamplingOptions] = None,
                  max_new_tokens: int = 256) -> int:
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise ValueError("string query but no tokenizer")
            tokens = self.tokenizer.tokenize(prompt, add_bos=True)
        else:
            tokens = list(prompt)
        if not tokens or len(tokens) > self.max_enc_len:
            return -2
        with self._lock:
            qid = self.table.add(tokens, sampling, max_new_tokens)
        if qid > 0:
            self.strategies.begin_query(qid, sampling or SamplingOptions())
        return qid

    def infer(self):
        from .engine import InferenceResult, _bucket
        from .query_state import DECODING, QueryState
        results = []
        with self._lock:
            pending = self.table.prefill_pending()
        if pending:
            qs = pending[0]
            toks = qs.prompt_tokens
            bucket = _bucket(len(toks), hi=self.max_enc_len)
            padded = np.zeros((1, bucket), np.int32)
            padded[0, :len(toks)] = toks
            kvs = self._encode(self.params, jnp.asarray(padded),
                               jnp.asarray([len(toks)], jnp.int32),
                               bucket=bucket)
            self.cross_k, self.cross_v = self._scatter(
                self.cross_k, self.cross_v, kvs, jnp.int32(qs.slot))
            self.enc_len[qs.slot] = len(toks)
            # fresh decode state for a reused slot
            self.cache = self.cache.with_length(
                self.cache.length.at[qs.slot].set(0))
            qs.phase = DECODING
            qs.encoder_done = True

        with self._lock:
            decoding = list(self.table.decoding())
        if decoding:
            bos = getattr(self.vocab, "bos_id", 1) if self.vocab else 1
            if bos is None or bos < 0:
                bos = 1
            tokens = np.zeros((self.max_slots, 1), np.int32)
            active = np.zeros((self.max_slots,), np.int32)
            by_slot = {}
            for qs in decoding:
                tokens[qs.slot, 0] = (qs.generated[-1] if qs.generated
                                      else bos)
                active[qs.slot] = 1
                by_slot[qs.slot] = qs
            logits, self.cache = self._decode(
                self.params, jnp.asarray(tokens), self.cache,
                self.cross_k, self.cross_v, jnp.asarray(self.enc_len),
                jnp.asarray(active))
            rows = np.asarray(logits, np.float32)
            for slot, qs in by_slot.items():
                tok = self.strategies.choose_token(qs.query_id, rows[slot],
                                                   qs.generated)
                is_eos = tok in self.eos_ids
                saturated = (len(qs.generated) + 1 >= qs.max_new_tokens
                             or int(self.cache.length[slot])
                             >= self.max_context_len - 1)
                reason = "eos" if is_eos else (
                    "length" if saturated else "")
                results.append(InferenceResult(qs.query_id, [tok],
                                               is_eos or saturated, reason))
        return results

    def commit_inference_result(self, results) -> None:
        from .query_state import FINISHED
        with self._lock:
            for r in results:
                qs = self.table.get(r.query_id)
                if qs is None or qs.phase == FINISHED:
                    continue
                for t in r.next_tokens:
                    if t not in self.eos_ids:
                        qs.generated.append(t)
                if r.is_end:
                    self.table.finish(r.query_id, r.finish_reason)
                    self.strategies.end_query(r.query_id)

    def has_work(self) -> bool:
        with self._lock:
            return bool(self.table.active)

    def query_tokens(self, qid: int):
        qs = self.table.get(qid)
        return list(qs.generated) if qs else []

    def generate(self, enc_tokens, sampling=None, max_new_tokens: int = 64):
        from .query_state import FINISHED
        qid = self.add_query(enc_tokens, sampling, max_new_tokens)
        if qid < 0:
            raise RuntimeError(f"add_query failed: {qid}")
        while True:
            self.commit_inference_result(self.infer())
            qs = self.table.get(qid)
            if qs is None or qs.phase == FINISHED:
                break
        return self.query_tokens(qid)


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
