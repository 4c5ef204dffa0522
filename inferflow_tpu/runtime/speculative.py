"""Speculative decoding: draft-model proposal + single-pass verification.

A capability beyond the reference engine (PLAN.md): a small draft model
proposes `k` tokens autoregressively; the target model scores all k+1
positions in ONE forward (the cost of one decode step plus marginal
bandwidth), and the longest draft prefix matching the target's greedy
choices is accepted, plus one corrected token.  Greedy verification
guarantees the output is IDENTICAL to plain target greedy decoding —
the draft only changes speed, never content.

KV-cache handling: proposed rows are appended optimistically; on
rejection the valid length simply doesn't advance past the accepted
prefix, so stale rows are overwritten by the next round (the cache is
masked by per-slot length everywhere).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import (decoder_layers_unrolled, embed_tokens,
                              fuse_layer_weights, output_logits,
                              stack_layers)
from ..models.spec import ModelSpec
from .kv_cache import KVCache


class _Model:
    """One (spec, params) with jitted chunked-decode steps."""

    def __init__(self, spec: ModelSpec, params: dict, max_context: int,
                 use_pallas: bool = True):
        import dataclasses
        self.spec = spec
        if isinstance(params.get("layers"), list):
            layers = params["layers"]
            had_separate = all("wq" in l.get("attn", {}) for l in layers)
            layers = fuse_layer_weights(layers)
            if had_separate and all("qkv" in l["attn"] for l in layers):
                self.spec = dataclasses.replace(spec, qkv_format=1)
            params = dict(params, layers=stack_layers(layers))
        self.params = params
        self.use_pallas = use_pallas
        hp = spec.hyper_params
        self.cache = KVCache.create(hp.decoder_layers, 1, max_context,
                                    hp.kv_heads, hp.head_dim,
                                    quantized=False)
        self._step = jax.jit(self._step_impl, donate_argnums=(2,),
                             static_argnames=("advance",))

    def _step_impl(self, params, tokens, cache, *, advance: int):
        """tokens (1, T) at positions cache.length..+T-1; returns logits
        (1, T, V); cache.length advances by `advance` (<= T)."""
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

    def run(self, tokens: Sequence[int], advance: int) -> np.ndarray:
        t = jnp.asarray([list(tokens)], jnp.int32)
        logits, self.cache = self._step(self.params, t, self.cache,
                                        advance=advance)
        return np.asarray(logits[0], np.float32)

    def set_length(self, n: int) -> None:
        self.cache = self.cache.with_length(
            jnp.full_like(self.cache.length, n))

    def reset(self) -> None:
        self.set_length(0)


class SpeculativeDecoder:
    """Greedy speculative decoding over a (target, draft) model pair."""

    def __init__(self, target_spec: ModelSpec, target_params: dict,
                 draft_spec: ModelSpec, draft_params: dict,
                 k: int = 4, max_context: int = 512,
                 use_pallas: bool = True):
        self.k = k
        self.max_context = max_context
        self.target = _Model(target_spec, target_params, max_context,
                             use_pallas)
        self.draft = _Model(draft_spec, draft_params, max_context,
                            use_pallas)
        self.stats = {"proposed": 0, "accepted": 0, "rounds": 0}

    def generate(self, prompt: Sequence[int], max_new_tokens: int = 64,
                 eos_id: int = -1) -> List[int]:
        prompt = list(prompt)
        self.target.reset()
        self.draft.reset()
        # prefill both; target's last-position logits give the first token
        t_logits = self.target.run(prompt, advance=len(prompt))
        self.draft.run(prompt, advance=len(prompt))
        out = [int(t_logits[-1].argmax())]
        pos = len(prompt)

        while len(out) < max_new_tokens and out[-1] != eos_id \
                and pos + len(out) + self.k + 1 < self.max_context:
            # 1) draft proposes k tokens from the current suffix
            proposal: List[int] = []
            # feed the draft everything it hasn't seen yet
            seen = int(np.asarray(self.draft.cache.length)[0])
            pending = (prompt + out)[seen:]
            cur = pending
            for _ in range(self.k):
                d_logits = self.draft.run(cur, advance=len(cur))
                nxt = int(d_logits[-1].argmax())
                proposal.append(nxt)
                cur = [nxt]
            # rewind the draft past the speculative tokens (keep the part
            # covering the committed sequence)
            self.draft.set_length(len(prompt) + len(out))

            # 2) target scores last-accepted + proposal in one pass
            chunk = [out[-1]] + proposal
            t_logits = self.target.run(chunk, advance=0)
            greedy = t_logits.argmax(axis=-1)  # (k+1,)

            # 3) accept the longest matching prefix, plus the corrected
            #    next token from the target
            accepted = 0
            while accepted < self.k and proposal[accepted] == int(
                    greedy[accepted]):
                accepted += 1
            new_tokens = proposal[:accepted] + [int(greedy[accepted])]
            self.stats["proposed"] += self.k
            self.stats["accepted"] += accepted
            self.stats["rounds"] += 1

            # target cache: keep rows for the accepted tokens (chunk wrote
            # rows for out[-1] + proposal at pos..)
            new_len = len(prompt) + len(out) + accepted
            self.target.set_length(new_len)
            for tok in new_tokens:
                out.append(tok)
                if tok == eos_id or len(out) >= max_new_tokens:
                    break
        if eos_id >= 0 and eos_id in out:
            out = out[: out.index(eos_id) + 1]
        return out
