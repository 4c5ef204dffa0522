"""Measure fused-decode-step compile time vs model geometry.

VERDICT r4 item 9: the ~30-minute compile cliff that keeps 7B MHA /
13B / Mixtral off the fused path is gated by empirical env-var budgets
(INFERFLOW_MEGA_TILE_BUDGET / _HEAD_BUDGET) whose driver was never
isolated.  This sweep times `jax.jit(...).lower()` and `.compile()`
separately for a geometry grid (kv heads, width, FFN K, batch, MoE)
through the chipless remote compiler, so the budgets can be recalibrated
from a measured curve instead of folklore.

Each point runs in a SUBPROCESS with a fresh (disabled) compilation
cache and a hard timeout, so a pathological point cannot poison the
sweep or hit the persistent cache.

Usage:
  python tools/compile_curve.py                  # run the default grid
  python tools/compile_curve.py --only h32-e4096 # one point
  python tools/compile_curve.py --timeout 2400   # per-point cap (s)
  python tools/compile_curve.py --point <spec>   # internal: one point
"""

import argparse
import json
import os
import subprocess
import sys
import time

GRID = {
    # name: (heads, kv_heads, embd, inter, batch, experts, top_k)
    # --- kv-head scaling at d=128, inter=2*embd (MHA) ---
    "h4-e512":    (4, 4, 512, 1024, 1, 0, 0),
    "h8-e1024":   (8, 8, 1024, 2048, 1, 0, 0),
    "h16-e2048":  (16, 16, 2048, 4096, 1, 0, 0),
    "h32-e4096":  (32, 32, 4096, 8192, 1, 0, 0),
    # --- true 7B geometry (adds the K=11008 w2) ---
    "7b-shape":   (32, 32, 4096, 11008, 1, 0, 0),
    # --- GQA: same width, few kv heads ---
    "h32-kv8-e4096": (32, 8, 4096, 8192, 1, 0, 0),
    "h32-kv4-e4096": (32, 4, 4096, 8192, 1, 0, 0),
    # --- FFN K scaling at small heads ---
    "h4-i4096":   (4, 4, 512, 4096, 1, 0, 0),
    "h4-i11008":  (4, 4, 512, 11008, 1, 0, 0),
    # --- batch scaling at small geometry ---
    "h4-e512-b4": (4, 4, 512, 1024, 4, 0, 0),
    "h4-e512-b8": (4, 4, 512, 1024, 8, 0, 0),
    # --- d=64 pack factor ---
    "h8-d64":     (8, 8, 512, 1024, 1, 0, 0),
    # --- routed MoE ---
    "moe8-h4":    (4, 4, 512, 1024, 1, 8, 2),
    "moe8-h4-b4": (4, 4, 512, 1024, 4, 8, 2),
    # --- 13B geometry (d=128, hk=40) ---
    "13b-shape":  (40, 40, 5120, 13824, 1, 0, 0),
    # --- mixtral geometry, 2 layers ---
    "mixtral-shape": (32, 8, 4096, 14336, 1, 8, 2),
}


def run_point(name: str, fmt: str, layout: str) -> None:
    """Subprocess entry: compile one grid point and print a JSON line."""
    # fresh, throwaway compilation cache: we want TRUE compile times
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from inferflow_tpu.models.zoo import make_spec, make_synthetic_params
    from inferflow_tpu.runtime.kv_cache import KVCache
    from inferflow_tpu.kernels.decode_step import (fused_decode_step,
                                                   fused_step_supported)

    h, hk, e, inter, bsz, n_exp, top_k = GRID[name]
    spec = make_spec("test-llama", layers=2, embd=e, heads=h, kv_heads=hk,
                     inter=inter, vocab=512, experts=n_exp,
                     moe_top_k=top_k)
    ctx = 512
    spec.max_context_len = ctx
    t0 = time.time()
    params = make_synthetic_params(spec, weight_format=fmt, stacked=True,
                                   device_layout=layout)
    build_s = time.time() - t0
    hp = spec.hyper_params
    cache = KVCache.create(hp.decoder_layers, bsz, ctx, hp.kv_heads,
                           hp.head_dim, quantized=True)
    cache = cache.with_length(jnp.asarray([7] * bsz, jnp.int32))
    stacked = params["layers"]
    if not fused_step_supported(spec, stacked, cache, bsz):
        print(json.dumps({"point": name, "error": "not eligible"}))
        return
    x = jnp.zeros((bsz, 1, hp.embd_dims), jnp.bfloat16)
    pos = cache.length[:, None]

    def f(x, cache):
        return fused_decode_step(spec, stacked, x, pos, cache)

    t0 = time.time()
    lowered = jax.jit(f).lower(x, cache)
    lower_s = time.time() - t0
    t0 = time.time()
    lowered.compile()
    compile_s = time.time() - t0
    print(json.dumps({
        "point": name, "heads": h, "kv_heads": hk, "embd": e,
        "inter": inter, "batch": bsz, "experts": n_exp,
        "build_s": round(build_s, 1), "lower_s": round(lower_s, 1),
        "compile_s": round(compile_s, 1),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--fmt", default="Q8_B32T2")
    ap.add_argument("--layout", default="")
    ap.add_argument("--point", default="", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.point:
        run_point(args.point, args.fmt, args.layout)
        return 0

    names = [n for n in GRID
             if not args.only or n in set(args.only.split(","))]
    for name in names:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--point", name,
             "--fmt", args.fmt, "--layout", args.layout],
            capture_output=True, text=True, timeout=None if not args.timeout
            else args.timeout + 120,
        )
        out = proc.stdout.strip().splitlines()
        line = out[-1] if out else ""
        if proc.returncode != 0 or not line.startswith("{"):
            err = (proc.stderr or "").strip().splitlines()
            print(json.dumps({"point": name, "error": "subprocess failed",
                              "rc": proc.returncode,
                              "wall_s": round(time.time() - t0, 1),
                              "tail": err[-3:]}), flush=True)
        else:
            print(line, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
