"""Same-run decode-path A/B on the real chip.

Cross-run comparisons on this time-shared chip swing 2-3x and the
bandwidth calibration itself swings 550-1030 GB/s, so path/layout
decisions (PLAN item 3, VERDICT r3 item 4) are made HERE: one process,
one calibration, every config timed back-to-back with min-of-3 slopes.

Rows: step ms, tokens/s, HBM bytes for that layout, and the fraction of
the same-run DMA speed-of-light those bytes imply.

Usage:
  python tools/ab_decode.py                       # default matrix
  INFERFLOW_AB_CTX=4096 python tools/ab_decode.py
  INFERFLOW_AB_MODEL=llama2-7b INFERFLOW_AB_CONFIGS=mega-q4,perlayer-q4 \
      python tools/ab_decode.py
"""

import functools
import gc
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/inferflow_jax"))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, wire format, device layout, mega on)  — 'packed' forces the
# wire layout (the TPU auto default converts sub-byte wire to q8c);
# mega rows set INFERFLOW_MEGA=2 to force the kernel past the measured
# routing preference (decode_step.fused_step_preferred)
ALL_CONFIGS = {
    "mega-q4": ("Q4_B64T1", "packed", True),
    "perlayer-q4": ("Q4_B64T1", "packed", False),
    "mega-i4": ("Q4_B64T1", "i4", True),
    "mega-i8mm": ("Q8_B32T2", "i8mm", True),
    "mega-q8": ("Q8_B32T2", "", True),
    "perlayer-q8": ("Q8_B32T2", "", False),
    "mega-q3h": ("Q3H_B64T1", "packed", True),
    "perlayer-q3h": ("Q3H_B64T1", "packed", False),
    "mega-q8c": ("Q4_B64T1", "q8c", True),
    "perlayer-q8c": ("Q4_B64T1", "q8c", False),
    "perlayer-i8mm": ("Q8_B32T2", "i8mm", False),
    # the 13B-on-16GB candidates (ADVICE r4: 'mixed' was never measured)
    "perlayer-mixed": ("Q4_B64T1", "mixed", False),
    "perlayer-i4": ("Q4_B64T1", "i4", False),
}


def main():
    from bench import calibrate_bandwidth_gbps, slope_time
    from inferflow_tpu.models.zoo import (make_spec, make_synthetic_params,
                                          model_weight_bytes)
    from inferflow_tpu.models.decoder import (decoder_forward_scan,
                                              decoder_layers_unrolled,
                                              embed_tokens, output_logits)
    from inferflow_tpu.runtime.kv_cache import KVCache

    model_name = os.environ.get("INFERFLOW_AB_MODEL", "tinyllama-1.1b")
    ctx = int(os.environ.get("INFERFLOW_AB_CTX", "1024"))
    batch = int(os.environ.get("INFERFLOW_AB_BATCH", "1"))
    # mega-i4 is excluded by default: int4 arrays cannot cross the jit
    # boundary on the axon runtime (device_put recursion; see
    # tools/mosaic_gate.py) — add it explicitly on runtimes that can
    names = os.environ.get(
        "INFERFLOW_AB_CONFIGS",
        "mega-q4,perlayer-q4,mega-i8mm,mega-q8c,mega-q3h").split(",")

    bw_gbps = calibrate_bandwidth_gbps()
    print(f"# {model_name} ctx={ctx} batch={batch} "
          f"calibrated_bw={bw_gbps:.0f}GB/s", flush=True)

    spec = make_spec(model_name)
    hp = spec.hyper_params
    rows = []
    for name in names:
        fmt, layout, mega = ALL_CONFIGS[name]
        os.environ["INFERFLOW_MEGA"] = "2" if mega else "0"
        t0 = time.time()
        params = make_synthetic_params(spec, weight_format=fmt,
                                       stacked=True, device_layout=layout)
        build_s = time.time() - t0
        cache = KVCache.create(hp.decoder_layers, batch, ctx, hp.kv_heads,
                               hp.head_dim, quantized=True)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step_impl(params, state):
            tok, cache = state
            pos = cache.length[:, None]
            x = embed_tokens(spec, params, tok, pos)
            x, cache = decoder_layers_unrolled(spec, params["layers"], x,
                                               pos, cache)
            logits = output_logits(spec, params, x)
            cache = cache.with_length(cache.length + 1)
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            return nxt, cache

        # short prefill so attention covers real rows
        plen = 16
        prompt = jnp.zeros((batch, plen), jnp.int32)
        ppos = jnp.broadcast_to(jnp.arange(plen)[None, :], (batch, plen))
        logits, cache = jax.jit(
            lambda p, t, ps, c: decoder_forward_scan(spec, p, t, ps, c)
        )(params, prompt, ppos, cache)
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)

        t0 = time.time()
        per = slope_time(lambda s: step_impl(params, s), (tok, cache),
                         lo=16, hi=64)
        bytes_ = model_weight_bytes(params)
        sol = bytes_ / (bw_gbps * 1e9)  # seconds at pure-DMA SOL
        row = {"config": name, "step_ms": round(per * 1e3, 3),
               "tok_s": round(batch / per, 1),
               "weight_gb": round(bytes_ / 1e9, 3),
               "sol_frac": round(sol / per, 3),
               "build_s": round(build_s, 1),
               "compile_s": round(time.time() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        del params, cache, tok, logits
        jax.clear_caches()
        gc.collect()

    best = max(rows, key=lambda r: r["tok_s"])
    print(f"# best: {best['config']} {best['tok_s']} tok/s "
          f"({best['sol_frac']} of same-run DMA SOL)")


if __name__ == "__main__":
    main()
