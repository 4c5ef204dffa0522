"""Benchmark: quantized decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/s", "vs_baseline": N}

Model: TinyLlama-1.1B-shaped decoder, 4-bit (Q4_B64T1) weights, Q8 KV cache,
batch-1 greedy decode (the reference's headline protocol is batch-1 decode
tokens/sec, llm_inference.cc:454-457; BASELINE.md targets tokens/sec/chip at
4-bit decode).

vs_baseline = fraction of memory-bandwidth speed-of-light for this chip and
model (BASELINE.md north star: >=0.8 on the dequant-matmul loop):
  SOL tokens/s = measured_streaming_BW / quantized_weight_bytes_per_token.
The chip's streaming bandwidth is CALIBRATED at runtime with a chained
decode-shaped matmul (the remote-tunnel runtime here has ~50ms fixed sync
overhead and an async dispatch pipeline, so all timings are slope-based over
two chained run lengths with a real host fetch at the end).

Env knobs: INFERFLOW_BENCH_MODEL (zoo name), INFERFLOW_BENCH_QUANT,
INFERFLOW_BENCH_CTX, INFERFLOW_BENCH_BATCH.
"""

import functools
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# Persistent compilation cache: the whole-model fused decode step is a
# large Mosaic kernel whose XLA+Mosaic compile is minutes on the real
# chip; caching makes every bench run after the first start fast.
# Per-user location: a world-shared /tmp dir could be pre-owned (or its
# cached executables poisoned) by another user (ADVICE r3).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 os.path.expanduser(
                                     "~/.cache/inferflow_jax")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _timed_chain(fn, state, iters):
    """Run fn chained `iters` times; time until a real host fetch lands.
    The state is copied first so donating step functions can't invalidate
    the caller's buffers between chains."""
    state = jax.tree_util.tree_map(jnp.copy, state)
    t0 = time.time()
    s = state
    for _ in range(iters):
        s = fn(s)
    leaf = jax.tree_util.tree_leaves(s)[0]
    np.asarray(leaf)  # force completion through the tunnel
    return time.time() - t0


def slope_time(fn, state, lo=16, hi=64, samples=3):
    """Per-iteration seconds, with fixed dispatch/sync overhead removed.
    Min over several slope samples: the shared chip's timesharing makes a
    single slope swing ~2-3x."""
    _timed_chain(fn, state, 2)  # warm
    best = float("inf")
    for _ in range(samples):
        t_lo = _timed_chain(fn, state, lo)
        t_hi = _timed_chain(fn, state, hi)
        best = min(best, max((t_hi - t_lo) / (hi - lo), 1e-9))
    return best


def calibrate_bandwidth_gbps() -> float:
    """Streaming HBM read bandwidth via a chained big-array reduce.

    NOTE: must use REAL (random) data — XLA recognizes constant-foldable
    arrays (jnp.full) and skips the memory traffic entirely."""
    big = jax.jit(lambda key: jax.random.normal(key, (16384, 16384),
                                                jnp.bfloat16)
                  )(jax.random.PRNGKey(0))
    big.block_until_ready()

    @jax.jit
    def step(big, s):
        return (big.sum() * 1e-9 + s[0]).reshape(1).astype(jnp.bfloat16)

    # Re-sample implausible calibrations: a tunnel hiccup can collapse
    # the two chain timings and hit the slope floor, reporting absurd
    # bandwidth (observed: 5e8 GB/s -> vs_baseline 0.0, and a 1630 GB/s
    # sample -> SOL deflated 2x).  v5e HBM peaks ~819 GB/s and historic
    # tunnel calibrations span 550-1030; accept [300, 1100], otherwise
    # retry and fall back to the nominal spec value with a stderr note.
    for _ in range(3):
        per_iter = slope_time(lambda s: step(big, s),
                              jnp.zeros((1,), jnp.bfloat16))
        bw = big.nbytes / per_iter / 1e9
        if 300.0 <= bw <= 1100.0:
            return bw
    print(f"# bandwidth calibration implausible ({bw:.0f} GB/s); "
          "using nominal 819", file=sys.stderr)
    return 819.0


def main():
    from inferflow_tpu.models.zoo import (make_spec, make_synthetic_params,
                                          model_weight_bytes)
    from inferflow_tpu.models.decoder import decoder_forward_scan
    from inferflow_tpu.runtime.kv_cache import KVCache

    model_name = os.environ.get("INFERFLOW_BENCH_MODEL", "tinyllama-1.1b")
    quant = os.environ.get("INFERFLOW_BENCH_QUANT", "Q4_B64T1")
    ctx = int(os.environ.get("INFERFLOW_BENCH_CTX", "1024"))
    batch = int(os.environ.get("INFERFLOW_BENCH_BATCH", "1"))
    layout = os.environ.get("INFERFLOW_BENCH_LAYOUT", "")

    bw_gbps = calibrate_bandwidth_gbps()

    spec = make_spec(model_name)
    hp = spec.hyper_params
    t0 = time.time()
    params = make_synthetic_params(spec, weight_format=quant, stacked=True,
                                   device_layout=layout)
    build_s = time.time() - t0

    cache = KVCache.create(hp.decoder_layers, batch, ctx, hp.kv_heads,
                           hp.head_dim, quantized=True)

    from inferflow_tpu.models.decoder import (decoder_layers_unrolled,
                                              embed_tokens, output_logits)

    def make_decode_step():
        @functools.partial(jax.jit, donate_argnums=(1,))
        def decode_step_impl(params, state):
            tok, cache = state
            pos = cache.length[:, None]
            x = embed_tokens(spec, params, tok, pos)
            x, cache = decoder_layers_unrolled(spec, params["layers"], x,
                                               pos, cache)
            logits = output_logits(spec, params, x)
            cache = cache.with_length(cache.length + 1)
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            return nxt, cache

        return lambda state: decode_step_impl(params, state)

    decode_step = make_decode_step()

    def probe_compile(state):
        """Compile-probe the decode step; if the whole-model fused kernel
        (kernels/decode_step.py) fails to build on this chip, fall back to
        the per-layer path rather than failing the bench outright."""
        nonlocal decode_step
        probe = jax.tree_util.tree_map(jnp.copy, state)
        try:
            out = decode_step(probe)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        except Exception as e:  # noqa: BLE001 — any compile/runtime error
            if os.environ.get("INFERFLOW_MEGA", "1") != "1":
                raise
            head = " | ".join(str(e).splitlines()[:2])[:300]
            print(f"# fused decode step failed ({type(e).__name__}: "
                  f"{head}); falling back to per-layer path",
                  file=sys.stderr)
            os.environ["INFERFLOW_MEGA"] = "0"
            jax.clear_caches()
            decode_step = make_decode_step()

    mode = os.environ.get("INFERFLOW_BENCH_MODE", "decode")
    if mode == "speculative":
        # speculative decoding (draft + single-pass verify) vs plain greedy
        # wall-clock; output is provably identical to plain target greedy
        from inferflow_tpu.runtime.speculative import SpeculativeDecoder
        draft_name = os.environ.get("INFERFLOW_BENCH_DRAFT", "stories15m")
        if draft_name == "self":
            # draft == target: acceptance must be ~1.0 and the speedup
            # ~(accepted tokens per round) / (1 draft pass + 1 verify) —
            # the harness-level proof that speculative decoding's
            # mechanics pay off before any real-draft tuning (VERDICT r3
            # item 7).  Synthetic cross-model drafts accept ~0 because
            # random models never agree.
            draft_spec, draft_params = spec, params
        else:
            draft_spec = make_spec(draft_name,
                                   vocab=spec.hyper_params.vocab_size)
            draft_params = make_synthetic_params(draft_spec,
                                                 weight_format=quant,
                                                 stacked=True)
        sd = SpeculativeDecoder(spec, params, draft_spec, draft_params,
                                k=int(os.environ.get("INFERFLOW_SPEC_K",
                                                     "4")),
                                max_context=ctx)
        prompt = list(range(4, 20))
        n_new = 96
        # fused round (runtime/speculative.py generate_fused): ONE
        # dispatch + one small fetch per propose+verify round — the
        # unfused host loop paid k+3 tunnel round-trips per round and
        # could never beat 1x wall here (r4's 0.24x row).
        gen = (sd.generate_fused
               if os.environ.get("INFERFLOW_SPEC_FUSED", "1") == "1"
               else sd.generate)
        gen(prompt, max_new_tokens=8)  # warm
        sd.stats.update(proposed=0, accepted=0, rounds=0)
        t0 = time.time()
        out = gen(prompt, max_new_tokens=n_new)
        spec_s = time.time() - t0
        from inferflow_tpu.runtime.speculative import _Model
        plain = _Model(spec, dict(params), ctx)
        plain.reset()
        logits = plain.run(prompt, advance=len(prompt))
        cur = int(logits[-1].argmax())
        plain.run([cur], advance=1)  # warm
        plain.reset()
        t0 = time.time()
        logits = plain.run(prompt, advance=len(prompt))
        toks = [int(logits[-1].argmax())]
        for _ in range(n_new - 1):
            logits = plain.run([toks[-1]], advance=1)
            toks.append(int(logits[-1].argmax()))
        plain_s = time.time() - t0
        # exact greedy identity holds for peaked (real-model) logits; on
        # synthetic near-uniform logits argmax ties flip with matmul tile
        # shapes, so report agreement instead of asserting it
        n_cmp = min(len(out), len(toks))
        agree = sum(a == b for a, b in zip(out, toks)) / max(n_cmp, 1)
        acc = sd.stats["accepted"] / max(sd.stats["proposed"], 1)
        rounds = max(sd.stats["rounds"], 1)
        # The gate metric (VERDICT r3 item 7): TARGET forwards per token.
        # Plain greedy = 1/token; speculative = rounds/len(out).  With
        # draft == target, wall-clock can never beat 1x (the draft costs
        # as much as the target) — the step REDUCTION is the proof that
        # acceptance drives the win once the draft is cheaper.
        reduction = len(out) / rounds
        result = {
            "metric": f"speculative speedup ({model_name} + {draft_name} "
                      f"draft, {quant})",
            "value": round(plain_s / spec_s, 3), "unit": "x",
            "vs_baseline": round(acc, 3),
        }
        print(json.dumps(result))
        print(f"# spec {len(out)} tok in {spec_s:.2f}s vs plain "
              f"{len(toks)} in {plain_s:.2f}s; accept rate {acc:.2f}; "
              f"greedy agreement {agree:.2f}; target forwards cut "
              f"{reduction:.2f}x ({rounds} verify rounds for {len(out)} "
              f"tokens; wall-clock here is tunnel-dispatch-bound)",
              file=sys.stderr)
        return
    if mode == "prefill":
        # prompt-processing throughput: tokens/s over a 512-token prefill
        plen = int(os.environ.get("INFERFLOW_BENCH_PREFILL_LEN", "512"))
        prompt = jnp.zeros((1, plen), jnp.int32)
        ppos = jnp.broadcast_to(jnp.arange(plen)[None, :], (1, plen))

        @jax.jit
        def prefill(params, state):
            t, c = state
            logits, c = decoder_forward_scan(spec, params, t, ppos, c)
            c = c.with_length(jnp.zeros_like(c.length))  # reuse slot
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            return jnp.broadcast_to(nxt, t.shape), c

        cache0 = KVCache.create(hp.decoder_layers, 1, plen, hp.kv_heads,
                                hp.head_dim, quantized=True)
        per = slope_time(lambda s: prefill(params, s), (prompt, cache0),
                         lo=4, hi=16)
        tps = plen / per
        weight_bytes = model_weight_bytes(params)
        result = {
            "metric": f"prefill tokens/s ({model_name}, {quant} weights, "
                      f"len {plen})",
            "value": round(tps, 3), "unit": "tokens/s",
            "vs_baseline": round(per, 4),
        }
        print(json.dumps(result))
        print(f"# prefill {per*1e3:.2f} ms for {plen} tokens", file=sys.stderr)
        return

    # prefill a short prompt
    plen = 16
    prompt = jnp.zeros((batch, plen), jnp.int32)
    ppos = jnp.broadcast_to(jnp.arange(plen)[None, :], (batch, plen))
    logits, cache = jax.jit(
        lambda p, t, ps, c: decoder_forward_scan(spec, p, t, ps, c)
    )(params, prompt, ppos, cache)
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)

    paged = os.environ.get("INFERFLOW_BENCH_PAGED", "0") == "1"
    if paged:
        # decode against the page-pool cache (runtime/paged_kv.py):
        # fully-assigned page tables, dense prefill rows scattered in
        from inferflow_tpu.runtime.kv_cache import KVCache as _KV
        from inferflow_tpu.runtime.paged_kv import (PagedKVCache,
                                                    scatter_prefill_pages)
        pc = PagedKVCache.create(hp.decoder_layers, batch, ctx,
                                 hp.kv_heads, hp.head_dim, quantized=True)
        maxp = pc.max_pages_per_slot
        for b in range(batch):
            pc = pc.with_page_row(
                b, np.arange(b * maxp, (b + 1) * maxp, dtype=np.int32))
            tmp_b = _KV(cache.k[:, b:b + 1], cache.v[:, b:b + 1],
                        cache.k_scale[:, b:b + 1],
                        cache.v_scale[:, b:b + 1],
                        cache.length[b:b + 1], head_dim=cache.head_dim)
            pc = scatter_prefill_pages(
                pc, tmp_b,
                jnp.asarray(np.arange(b * maxp, b * maxp + 1, dtype=np.int32)),
                jnp.int32(plen), slot=b, n_pages=1)
        cache = pc.with_length(cache.length)

    probe_compile((tok, cache))
    per_step = slope_time(decode_step, (tok, cache), lo=16, hi=64)
    tps = batch / per_step

    weight_bytes = model_weight_bytes(params)
    # Routed MoE streams only top_k/E of the expert bytes per decode
    # step (in-kernel routing), so speed-of-light for the STEP counts
    # the routed bytes — a whole-model denominator made the first
    # on-chip mega-MoE row read vs_baseline 2.5 (nonsense as a
    # fraction).  The full container must still FIT; only the per-step
    # stream is k/E.
    moe_desc = ""
    layers_tree = params.get("layers")
    if isinstance(layers_tree, dict) and "moe" in layers_tree:
        exp_b = sum(
            int(a.size) * a.dtype.itemsize
            for a in jax.tree_util.tree_leaves(
                layers_tree["moe"]["experts_stacked"]))
        top_k = hp.moe_top_k or 2
        n_exp = max(hp.experts, 1)
        weight_bytes = weight_bytes - exp_b + exp_b * top_k // n_exp
        moe_desc = f", routed {top_k}/{n_exp} SOL"
    sol_tps = bw_gbps * 1e9 / weight_bytes
    eff_layout = layout
    if not eff_layout:
        from inferflow_tpu.quant.codec_jax import resolve_auto_layout
        auto = resolve_auto_layout(spec, quant)
        eff_layout = f"{auto} auto" if auto else ""
    ldesc = f", {eff_layout} layout" if eff_layout else ""
    kvdesc = "paged Q8 KV" if paged else "Q8 KV"
    result = {
        "metric": f"decode tokens/s ({model_name}, {quant} weights{ldesc}, "
                  f"{kvdesc}, batch {batch}, ctx {ctx}{moe_desc})",
        "value": round(tps, 3),
        "unit": "tokens/s",
        "vs_baseline": round(tps / (sol_tps * batch), 4),
    }
    print(json.dumps(result))
    print(f"# weight_bytes={weight_bytes/1e9:.2f}GB measured_bw={bw_gbps:.0f}GB/s "
          f"sol={sol_tps:.1f}tok/s build={build_s:.1f}s "
          f"step={per_step*1000:.2f}ms device={jax.devices()[0].device_kind}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
