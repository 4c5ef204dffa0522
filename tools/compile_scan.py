"""Compile-time-vs-shape scan for the fused decode step (VERDICT r4 #9).

The tile/head budgets in fused_step_preferred are empirical: a 7B-MHA
mega compile exceeded the ~30-min remote-compiler pipe even after every
unroll became a lax.fori_loop, and the residual driver was never
isolated.  This tool measures the compile-time curve directly so the
budgets become DERIVED limits.

Design notes:
- Weights are ABSTRACT (jax.ShapeDtypeStruct leaves inside the
  QuantizedTensor pytree): `.lower()` only needs avals, so a 13B-scale
  point costs no HBM and no weight building.
- `.lower()` (local StableHLO) and `.compile()` (XLA + Mosaic through the
  chipless remote compiler) are timed separately, and the StableHLO
  module byte size is recorded: if module size is flat while compile time
  grows, the cliff is in Mosaic/XLA scaling, not program size.
- Each point runs under a hard wall-clock cap (SIGALRM) so one cliff
  point cannot eat the scan.

Usage:
  python tools/compile_scan.py                   # default axis sweep
  python tools/compile_scan.py --points hk32-d64,e4096-d128
  python tools/compile_scan.py --cap 900         # per-point seconds
Output: one JSON line per point -> append to docs/COMPILE_SCAN.jsonl
"""

import argparse
import json
import os
import signal
import sys
import time

# a PRIVATE cache dir: the scan must measure cold compiles
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/inferflow_scan_cache"

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inferflow_tpu.quant.codec_jax import Int8MXUTensor, QuantizedTensor


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def abstract_stacked(L, E, hq, hk, d, I, layout="q8c", n_exp=0):
    """Layer-stacked weight pytree with ShapeDtypeStruct leaves, matching
    models/zoo.make_synthetic_params(stacked=True) for the given layout."""
    qdim, kvdim = hq * d, hk * d
    nq = qdim + 2 * kvdim

    def qt(k, n, lead=(L,)):
        if layout == "i8mm":
            return Int8MXUTensor(lead + (k, n),
                                 _sds(lead + (k, n), jnp.int8),
                                 _sds(lead + (n,), jnp.float32))
        if layout == "i4":
            return QuantizedTensor(
                "Q4_B64T1", lead + (k, n),
                {"data_i4p": _sds(lead + (k // 2, n), jnp.uint8)},
                _sds(lead + (k // 64, n), jnp.float16),
                _sds(lead + (k // 64, n), jnp.float16))
        if layout == "q4":
            return QuantizedTensor(
                "Q4_B64T1", lead + (k, n),
                {"data": _sds(lead + (k // 2, n), jnp.uint8)},
                _sds(lead + (k // 64, n), jnp.float16),
                _sds(lead + (k // 64, n), jnp.float16))
        # q8c: Q8_B32T2 container
        return QuantizedTensor(
            "Q8_B32T2", lead + (k, n),
            {"data": _sds(lead + (k, n), jnp.uint8)},
            _sds(lead + (k // 32, n), jnp.float16), None)

    tree = {"attn": {"pre_norm": _sds((L, E), jnp.bfloat16),
                     "qkv": qt(E, nq), "wo": qt(qdim, E)}}
    if n_exp:
        tree["moe"] = {
            "pre_norm": _sds((L, E), jnp.bfloat16),
            "gate": _sds((L, E, n_exp), jnp.bfloat16),
            "experts_stacked": {"w1n3": qt(E, 2 * I, (L, n_exp)),
                                "w2": qt(I, E, (L, n_exp))},
        }
    else:
        tree["ffn"] = {"pre_norm": _sds((L, E), jnp.bfloat16),
                       "w1n3": qt(E, 2 * I), "w2": qt(I, E)}
    return tree


def scan_point(name, *, L=2, E=2048, hq=32, hk=4, d=None, I=5632, ctx=512,
               bsz=1, layout="q8c", n_exp=0, top_k=2, cap=1500):
    from inferflow_tpu.models.spec import HyperParams, ModelSpec
    from inferflow_tpu.runtime.kv_cache import KVCache
    from inferflow_tpu.kernels import decode_step as ds

    d = d or E // hq
    hp = HyperParams(vocab_size=256, embd_dims=E, decoder_layers=L,
                     decoder_heads=hq, decoder_kv_heads=hk,
                     hidden_dim=hq * d,
                     decoder_intermediate_size=I, experts=n_exp,
                     moe_top_k=top_k if n_exp else 0)
    spec = ModelSpec(sid=name, hyper_params=hp, norm_alg="rms",
                     activation_fn="silu", pos_embedding_alg="rope",
                     qk_column_order=2, qkv_format=1)
    stacked = abstract_stacked(L, E, hq, hk, d, I, layout, n_exp)

    cache = KVCache.create(L, bsz, ctx, hk, d, quantized=True)
    cache_abs = jax.tree_util.tree_map(
        lambda a: _sds(a.shape, a.dtype), cache)
    if not ds.fused_step_supported(spec, stacked, cache, bsz):
        return {"point": name, "error": "not eligible"}
    x = _sds((bsz, 1, E), jnp.bfloat16)
    pos = jnp.zeros((bsz, 1), jnp.int32)

    def f(stacked, x, cache):
        return ds.fused_decode_step(spec, stacked, x, pos, cache)

    row = {"point": name, "L": L, "E": E, "hq": hq, "hk": hk, "d": d,
           "I": I, "ctx": ctx, "bsz": bsz, "layout": layout,
           "n_exp": n_exp}
    t0 = time.time()
    lowered = jax.jit(f).lower(stacked, x, cache_abs)
    row["lower_s"] = round(time.time() - t0, 1)
    txt = lowered.as_text()
    row["stablehlo_bytes"] = len(txt)

    def on_alarm(sig, frame):
        raise TimeoutError(f"compile exceeded {cap}s")

    old = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(cap)
    t0 = time.time()
    try:
        lowered.compile()
        row["compile_s"] = round(time.time() - t0, 1)
    except TimeoutError:
        row["compile_s"] = None
        row["timeout_s"] = cap
    except Exception as e:  # noqa: BLE001 — record, keep scanning
        row["compile_s"] = None
        row["error"] = f"{type(e).__name__}: {str(e)[:200]}"
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    return row


# One axis at a time from the known-good tinyllama-class point toward the
# known-cliff 7B point (E=4096/hq=32/hk=32/d=128/I=11008).
POINTS = {
    # baseline (tinyllama dims, ~2 min measured r4)
    "base":          dict(),
    # layer count: the grid dim should NOT matter
    "L22":           dict(L=22),
    # kv head sweep at tinyllama dims (head fori says this should be flat)
    "hk8":           dict(hk=8),
    "hk16":          dict(hk=16),
    "hk32-d64":      dict(hk=32),
    # head_dim 64 -> 128 (changes n_sub, packing factor pf)
    "d128":          dict(E=4096, hq=32, hk=4, d=128),
    # embedding/ffn width
    "e4096-d64":     dict(E=4096, hq=64, hk=4, d=64),
    "i11008":        dict(I=11008),
    # combined 7B-minus-heads
    "e4096-i11008":  dict(E=4096, hq=32, hk=4, d=128, I=11008),
    # the known cliff: full 7B MHA
    "7b-mha":        dict(E=4096, hq=32, hk=32, d=128, I=11008),
    # 13B MHA
    "13b-mha":       dict(E=5120, hq=40, hk=40, d=128, I=13824),
    # batch axis
    "b4":            dict(bsz=4),
    "b8":            dict(bsz=8),
    # context (ts/s_packed axis)
    "ctx4096":       dict(ctx=4096),
    # mixtral-shaped routed MoE
    "moe-mixtral":   dict(E=4096, hq=32, hk=8, d=128, I=14336, n_exp=8),
    # device layouts at 7B-shape
    "7b-mha-i8mm":   dict(E=4096, hq=32, hk=32, d=128, I=11008,
                          layout="i8mm"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="")
    ap.add_argument("--cap", type=int, default=1500)
    ap.add_argument("--out", default="docs/COMPILE_SCAN.jsonl")
    args = ap.parse_args()

    names = args.points.split(",") if args.points else list(POINTS)
    for name in names:
        kw = dict(POINTS[name])
        kw.setdefault("cap", args.cap)
        try:
            row = scan_point(name, **kw)
        except Exception as e:  # noqa: BLE001
            row = {"point": name,
                   "error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(json.dumps(row), flush=True)
        if args.out:
            with open(args.out, "a") as fh:
                fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
