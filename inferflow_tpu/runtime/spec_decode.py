"""Speculative decoding inside the batching engine (PLAN 7 / VERDICT r2
item 9).

The standalone greedy spec-decoder (runtime/speculative.py) proved the
algorithm; this module runs it through InferenceEngine's slot machinery so
speculative rounds coexist with admission control, saturation, EOS
handling, and continuous batching:

  - a DraftWorker keeps a slot-parallel KV cache for the draft model,
    prefilled alongside the target's slots;
  - each engine decode step becomes one speculative ROUND for all greedy
    decode slots: the draft proposes k tokens per slot (k batched draft
    steps), the target scores all k+1 positions per slot in ONE (B, k+1)
    forward, and each slot commits its longest matching prefix plus the
    target's corrected token (1..k+1 tokens per slot per round);
  - greedy verification makes the output IDENTICAL to plain greedy
    decoding — the draft only changes speed.  draft==target therefore
    accepts everything (acceptance 1.0), the harness sanity check.

Per-slot cache-length invariant (both models): rows present == committed
tokens - 1 (the newest token's row is written by the step that consumes
it).  Rejected proposal rows are left beyond the committed length and are
overwritten before they can ever be read.

No reference counterpart (the reference decodes strictly one token per
query per Infer, inference_engine.cc:821-836).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.spec import ModelSpec


class DraftWorker:
    """Slot-parallel draft model: proposes k greedy tokens per slot."""

    def __init__(self, spec: ModelSpec, params: dict, max_slots: int,
                 max_context: int, use_pallas: bool, k: int = 4):
        from ..models.decoder import (fuse_layer_weights, stack_layers,
                                      stack_moe_experts)
        from .kv_cache import KVCache

        self.spec = spec
        if isinstance(params.get("layers"), list):
            # keep this prep in lockstep with InferenceEngine.__init__ —
            # a divergence (e.g. missing expert stacking) silently sends
            # the draft down a slower path
            layers = params["layers"]
            had_separate = all("wq" in l.get("attn", {}) for l in layers)
            layers = fuse_layer_weights(layers)
            layers = stack_moe_experts(layers)
            if had_separate and all("qkv" in l["attn"] for l in layers):
                self.spec = dataclasses.replace(spec, qkv_format=1)
            try:
                layers = stack_layers(layers)
            except ValueError:
                pass  # heterogeneous: the layer loops accept lists
            params = dict(params, layers=layers)
        self.params = params
        self.k = k
        self.use_pallas = use_pallas
        hp = self.spec.hyper_params
        self.cache = KVCache.create(hp.decoder_layers, max_slots,
                                    max_context, hp.kv_heads, hp.head_dim,
                                    quantized=False)
        self._chunk = jax.jit(self._chunk_impl, donate_argnums=(2,))

    def _chunk_impl(self, params, tokens, cache, advance):
        """tokens (B, T) at per-slot positions cache.length + arange(T);
        returns logits (B, T, V); per-slot length += advance."""
        from ..models.decoder import (decoder_layers_unrolled, embed_tokens,
                                      output_logits)
        positions = cache.length[:, None] + jnp.arange(
            tokens.shape[1], dtype=jnp.int32)[None, :]
        x = embed_tokens(self.spec, params, tokens, positions)
        x, cache = decoder_layers_unrolled(self.spec, params["layers"], x,
                                           positions, cache,
                                           use_pallas=self.use_pallas)
        logits = output_logits(self.spec, params, x,
                               use_pallas=self.use_pallas)
        cache = cache.with_length(cache.length + advance)
        return logits, cache

    def lengths(self) -> np.ndarray:
        return np.asarray(self.cache.length, np.int32).copy()

    def set_lengths(self, lengths: np.ndarray) -> None:
        self.cache = self.cache.with_length(
            jnp.asarray(lengths, jnp.int32))

    def prefill(self, slot: int, tokens: List[int]) -> None:
        """Consume a new query's prompt into the draft cache: a (1, T)
        forward into a temp cache, scattered into the slot — NOT a
        (max_slots, T) batch (which paid max_slots x the prefill FLOPs
        and wrote garbage rows into every other slot)."""
        from .engine import _scatter_cache, _bucket
        from .kv_cache import KVCache
        hp = self.spec.hyper_params
        bucket = _bucket(len(tokens), hi=self.cache.max_len)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :len(tokens)] = tokens
        tmp = KVCache.create(hp.decoder_layers, 1, bucket, hp.kv_heads,
                             hp.head_dim, quantized=False)
        _, tmp = self._chunk(self.params, jnp.asarray(padded), tmp,
                             jnp.asarray([len(tokens)], jnp.int32))
        self.cache = _scatter_cache(self.cache, tmp, jnp.int32(slot),
                                    jnp.int32(len(tokens)))

    def propose(self, pending: List[List[int]], active: np.ndarray
                ) -> np.ndarray:
        """One proposal phase: catch up on `pending` committed tokens per
        slot, then extend k-1 greedy steps.  Returns (B, k) proposals."""
        b = self.cache.length.shape[0]
        k = self.k
        t0 = max((len(p) for p in pending), default=1)
        chunk = np.zeros((b, t0), np.int32)
        adv = np.zeros((b,), np.int32)
        for i, p in enumerate(pending):
            if active[i] and p:
                chunk[i, :len(p)] = p
                adv[i] = len(p)
        logits, self.cache = self._chunk(self.params, jnp.asarray(chunk),
                                         self.cache, jnp.asarray(adv))
        rows = np.asarray(logits, np.float32)
        proposals = np.zeros((b, k), np.int32)
        cur = np.zeros((b, 1), np.int32)
        for i in range(b):
            if active[i]:
                cur[i, 0] = rows[i, max(adv[i] - 1, 0)].argmax()
        proposals[:, 0] = cur[:, 0]
        for j in range(1, k):
            logits, self.cache = self._chunk(
                self.params, jnp.asarray(cur), self.cache,
                jnp.asarray(active.astype(np.int32)))
            rows = np.asarray(logits, np.float32)[:, 0]
            cur = rows.argmax(axis=-1).astype(np.int32)[:, None]
            proposals[:, j] = cur[:, 0]
        return proposals


def speculative_round(engine, decoding: list) -> list:
    """One speculative decode round over the engine's decoding slots.
    Returns the engine's InferenceResult list (1..k+1 tokens per query).
    Caller guarantees every slot uses greedy sampling."""
    from .engine import InferenceResult

    draft: DraftWorker = engine.draft
    k = draft.k
    b = engine.max_slots
    active = np.zeros((b,), np.int32)
    by_slot = {}
    pending: List[List[int]] = [[] for _ in range(b)]
    d_lens = draft.lengths()
    for qs in decoding:
        active[qs.slot] = 1
        by_slot[qs.slot] = qs
        seq = qs.prompt_tokens + qs.generated
        pending[qs.slot] = seq[d_lens[qs.slot]:]
        assert pending[qs.slot], (d_lens[qs.slot], len(seq))

    proposals = draft.propose(pending, active)

    # target verifies [last_token | proposals] in one (B, k+1) forward
    chunk = np.zeros((b, k + 1), np.int32)
    for slot, qs in by_slot.items():
        seq = qs.prompt_tokens + qs.generated
        chunk[slot, 0] = seq[-1]
        chunk[slot, 1:] = proposals[slot]
    # advance is computed AFTER acceptance; run verify with advance 0 and
    # commit lengths on the host (cheap: with_length is metadata-only)
    logits, engine.cache = engine._verify_step(
        engine.params, engine._place_batch(chunk),
        engine._gather_embeds(chunk), engine.cache,
        engine._place_batch(np.zeros((b,), np.int32)))
    greedy = np.asarray(logits, np.float32).argmax(axis=-1)  # (B, k+1)

    results = []
    t_lens = np.asarray(engine.cache.length, np.int32).copy()
    d_new = draft.lengths()
    for slot, qs in by_slot.items():
        acc = 0
        while acc < k and proposals[slot, acc] == greedy[slot, acc]:
            acc += 1
        new_tokens = list(proposals[slot, :acc]) + [int(greedy[slot, acc])]
        engine.spec_stats["proposed"] += k
        engine.spec_stats["accepted"] += acc
        engine.spec_stats["rounds"] += 1

        # truncate at EOS / length saturation
        emit = []
        is_end = False
        reason = ""
        room = qs.max_new_tokens - len(qs.generated)
        for t in new_tokens:
            emit.append(int(t))
            if t in engine.eos_ids:
                is_end, reason = True, "eos"
                break
            if len(emit) >= room or \
                    qs.context_len + len(emit) >= engine.max_context_len:
                is_end, reason = True, "length"
                break
        committed = len(emit)
        # rows now valid = old rows + committed (the newest emitted
        # token's row is written by the step that consumes it) — same
        # invariant as one-token decode, which does length += 1
        t_lens[slot] += committed
        seq_len = qs.context_len + committed  # committed tokens incl. new
        # draft rows valid for the committed prefix: it consumed
        # len(pending) catch-up tokens + k-1 of its own proposals
        d_new[slot] = min(seq_len - 1,
                          d_lens[slot] + len(pending[slot]) + k - 1)
        engine._lengths[slot] = int(t_lens[slot])
        results.append(InferenceResult(qs.query_id, emit, is_end, reason))
    engine.cache = engine.cache.with_length(jnp.asarray(t_lens))
    draft.set_lengths(d_new)
    return results
