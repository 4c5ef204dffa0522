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

    # -- fused round: one dispatch per propose+verify round ---------------
    def _round_impl(self, tparams, dparams, tcache, dcache, catchup,
                    n_catch, last_tok):
        """One speculative round as ONE jitted program (VERDICT r4 #8:
        the unfused loop paid k draft dispatches + 1 verify + 2 length
        updates PER ROUND through the axon tunnel at ~1-50 ms each —
        that, not compute, is why the r4 gate row showed 0.24x wall).

        catchup: (1, k+1) committed tokens the draft hasn't seen (the
        previous round's accepted+corrected tokens), padded; n_catch of
        them valid.  last_tok: (1, 1) newest committed token.  Returns
        (proposal (k,), greedy (k+1,), accepted scalar, new caches) —
        the host fetches the three small arrays in one round trip.
        """
        k = self.k
        dspec, tspec = self.draft.spec, self.target.spec

        def dstep(cache, toks, advance):
            positions = cache.length[:, None] + jnp.arange(
                toks.shape[1], dtype=jnp.int32)[None, :]
            x = embed_tokens(dspec, dparams, toks, positions)
            x, cache = decoder_layers_unrolled(
                dspec, dparams["layers"], x, positions, cache,
                use_pallas=self.draft.use_pallas)
            logits = output_logits(dspec, dparams, x,
                                   use_pallas=self.draft.use_pallas)
            return logits, cache.with_length(cache.length + advance)

        # 1) draft catch-up on the committed tokens (padded width k+1;
        #    rows past n_catch are garbage at positions the next writes
        #    overwrite before any length-masked read can see them).  The
        #    logits at the last VALID position give the FIRST proposal —
        #    the committed suffix is consumed exactly once, like the
        #    unfused loop's run(pending) step.
        logits_c, dcache = dstep(dcache, catchup, n_catch)
        row0 = jax.lax.dynamic_index_in_dim(logits_c[0], n_catch - 1, 0,
                                            keepdims=False)
        p0 = jnp.argmax(row0).astype(jnp.int32)

        # 2) draft proposes the remaining k-1 tokens, one scan step each
        def dbody(carry, _):
            tok, cache = carry
            logits, cache = dstep(cache, tok, jnp.int32(1))
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return (nxt[:, None], cache), nxt[0]

        (_, dcache), rest = jax.lax.scan(
            dbody, (p0[None, None], dcache), None, length=k - 1)
        proposal = jnp.concatenate([p0[None], rest])

        # rewind the draft to the committed prefix (the catch-up advance
        # was already the dynamic n_catch; only the k-1 proposal steps
        # are speculative — their stale rows are overwritten next round)
        dcache = dcache.with_length(dcache.length - (k - 1))

        # 3) target scores last committed + proposal in one pass
        chunk = jnp.concatenate([last_tok, proposal[None, :]], axis=1)
        tpos = tcache.length[:, None] + jnp.arange(
            k + 1, dtype=jnp.int32)[None, :]
        x = embed_tokens(tspec, tparams, chunk, tpos)
        x, tcache = decoder_layers_unrolled(
            tspec, tparams["layers"], x, tpos, tcache,
            use_pallas=self.target.use_pallas)
        t_logits = output_logits(tspec, tparams, x,
                                 use_pallas=self.target.use_pallas)
        greedy = jnp.argmax(t_logits[0], axis=-1).astype(jnp.int32)

        # 4) longest matching prefix
        match = (proposal == greedy[:k]).astype(jnp.int32)
        accepted = jnp.sum(jnp.cumprod(match))
        tcache = tcache.with_length(tcache.length + 1 + accepted)
        return proposal, greedy, accepted, tcache, dcache

    def generate_fused(self, prompt: Sequence[int],
                       max_new_tokens: int = 64,
                       eos_id: int = -1) -> List[int]:
        """generate() with one dispatch + one small fetch per round."""
        k = self.k
        prompt = list(prompt)
        self.target.reset()
        self.draft.reset()
        t_logits = self.target.run(prompt, advance=len(prompt))
        self.draft.run(prompt, advance=len(prompt))
        out = [int(t_logits[-1].argmax())]

        if not hasattr(self, "_round"):
            self._round = jax.jit(self._round_impl,
                                  donate_argnums=(2, 3))

        # first catch-up: the draft has seen the prompt but not out[0]
        catch = [out[0]]
        while len(out) < max_new_tokens and out[-1] != eos_id \
                and len(prompt) + len(out) + k + 1 < self.max_context:
            pad = catch + [0] * (k + 1 - len(catch))
            proposal, greedy, accepted, self.target.cache, \
                self.draft.cache = self._round(
                    self.target.params, self.draft.params,
                    self.target.cache, self.draft.cache,
                    jnp.asarray([pad], jnp.int32),
                    jnp.int32(len(catch)),
                    jnp.asarray([[out[-1]]], jnp.int32))
            proposal = np.asarray(proposal)
            greedy = np.asarray(greedy)
            accepted = int(accepted)
            self.stats["proposed"] += k
            self.stats["accepted"] += accepted
            self.stats["rounds"] += 1
            new_tokens = [int(t) for t in proposal[:accepted]] \
                + [int(greedy[accepted])]
            catch = []
            for tok in new_tokens:
                out.append(tok)
                catch.append(tok)
                if tok == eos_id or len(out) >= max_new_tokens:
                    break
        if eos_id >= 0 and eos_id in out:
            out = out[: out.index(eos_id) + 1]
        return out
