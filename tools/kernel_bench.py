#!/usr/bin/env python
"""Real-TPU kernel parity + bandwidth harness (the verify-flow gate).

For each quant format: run the fused dequant-matmul Pallas kernel on the
actual chip against the XLA dequantize+matmul reference (norm_rmsd bound,
methodology of reference tensor_util.h:76-89), and measure effective HBM
bandwidth (packed bytes / kernel time) with the slope protocol
(.claude/skills/verify/SKILL.md pitfalls).

Also covers the fused attention kernels (decode + chunk) vs the XLA path.

Usage:  python tools/kernel_bench.py [--formats Q4,Q3H] [--k 8192] [--n 8192]
        [--skip-perf] [--attention]
Exit code != 0 on any parity failure — the driver can gate on it.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEFAULT_FORMATS = ["Q8_B32T1", "Q8_B32T2", "Q6_B64T1", "Q5_B64T1",
                   "Q5_B32T1", "Q4_B64T1", "Q4_B32T1A", "Q4_B32T2",
                   "Q4_B16", "Q3H_B64T1", "Q3_B32T1A", "Q2_B32T1A"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--formats", default="")
    ap.add_argument("--k", type=int, default=8192)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--skip-perf", action="store_true")
    ap.add_argument("--attention", action="store_true",
                    help="also check the fused attention kernels")
    ap.add_argument("--i8mm", action="store_true",
                    help="also measure the int8 x int8 MXU path "
                    "(device_layout='i8mm'): parity vs f32 matmul and "
                    "effective GB/s of int8-weight streaming")
    ap.add_argument("--mega", action="store_true",
                    help="whole-model fused decode step "
                    "(kernels/decode_step.py) vs the per-layer path: "
                    "on-chip parity + ms/step at ctx 64/512/4096")
    ap.add_argument("--mega-model", default="tinyllama-1.1b")
    ap.add_argument("--mega-quant", default="Q4_B64T1")
    ap.add_argument("--mega-layout", default="",
                    help="device layout for --mega: '', 'i4', 'q8c', 'i8mm'")
    ap.add_argument("--inner-chain", action="store_true",
                    help="measure IN-JIT per-call cost: slope between 4 "
                    "and 16 kernel invocations inside one jit (requires "
                    "square K==N)")
    ap.add_argument("--tol", type=float, default=2e-2,
                    help="norm_rmsd bound vs the XLA dequant reference")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from inferflow_tpu.quant.codec_jax import quantize, dequantize
    from inferflow_tpu.kernels.dequant_matmul import (quantized_matmul,
                                                      pad_weight_for_tpu)
    from inferflow_tpu.utils.tensor_util import norm_rmsd

    if jax.default_backend() != "tpu":
        sys.exit("kernel_bench must run on the real TPU (JAX_PLATFORMS=axon)")

    formats = ([f.strip() for f in args.formats.split(",") if f.strip()]
               or DEFAULT_FORMATS)
    k, n, m = args.k, args.n, args.m
    key = jax.random.PRNGKey(0)
    kw, kx = jax.random.split(key)
    w = jax.random.normal(kw, (k, n), jnp.float32) * 0.05
    x = jax.random.normal(kx, (m, k), jnp.bfloat16) * 0.3

    failures = 0
    for fmt in formats:
        qt = pad_weight_for_tpu(quantize(w, fmt))
        y_kernel = np.asarray(quantized_matmul(x, qt), np.float32)
        wd = dequantize(qt, jnp.float32)
        y_ref = np.asarray(
            jnp.matmul(x.astype(jnp.float32), wd), np.float32)
        err = norm_rmsd(y_kernel, y_ref)
        ok = err < args.tol
        failures += 0 if ok else 1

        line = f"{fmt:11s} parity norm_rmsd={err:.5f} {'OK' if ok else 'FAIL'}"
        if args.inner_chain and not args.skip_perf:
            assert k == n, "--inner-chain needs square K==N"

            def make_rep(r):
                @jax.jit
                def rep(xs):
                    for _ in range(r):
                        y = quantized_matmul(xs, qt)
                        xs = (jnp.tanh(y) * 0.5 + xs * 0.75).astype(
                            x.dtype)
                    return xs
                return rep

            f4, f16 = make_rep(4), make_rep(16)
            def run(f, outer):
                ss = x
                t0 = time.time()
                for _ in range(outer):
                    ss = f(ss)
                np.asarray(ss[0, :2])
                return time.time() - t0
            run(f4, 2); run(f16, 2)
            # min over samples: the shared chip's timesharing noise makes
            # single slopes swing 3x
            per = min(max((run(f16, 8) - run(f4, 8)) / (8 * 12), 1e-9)
                      for _ in range(3))
            packed = qt.nbytes
            line += (f"  in-jit {packed / per / 1e9:7.1f} GB/s "
                     f"({per*1e3:.3f} ms/call)")
            print(line, flush=True)
            continue
        if not args.skip_perf:
            packed = qt.nbytes

            @jax.jit
            def step(xs):
                y = quantized_matmul(xs, qt)
                # keep the chain dependent with VALUES THAT EVOLVE —
                # a fixed-point chain measured as ~0 ms/step through the
                # async tunnel
                return (jnp.tanh(y[:, :k]) * 0.5
                        + xs * 0.75).astype(x.dtype)

            s = x
            for _ in range(3):
                s = step(s)
            np.asarray(s[0, :2])

            def chain(it):
                t0 = time.time()
                ss = x
                for _ in range(it):
                    ss = step(ss)
                np.asarray(ss[0, :2])
                return time.time() - t0

            # long chains: the tunnel carries ~±20 ms of noise per sample,
            # so the two chain lengths must differ by >> that in compute
            t_lo, t_hi = chain(32), chain(256)
            per = max((t_hi - t_lo) / 224, 1e-9)
            line += f"  {packed / per / 1e9:7.1f} GB/s  ({per*1e3:.2f} ms)"
        print(line, flush=True)

    if args.i8mm:
        # int8 weights on the MXU integer path (VERDICT r2 item 8): the
        # weight stream is 1 byte/value with NO VPU unpack, so if XLA's
        # int8 dot keeps the MXU fed this should run at full HBM rate —
        # 2x the bytes of Q4 but ~2-3x the effective rate of the
        # VPU-unpack-bound sub-byte kernels
        from inferflow_tpu.ops.linear import linear
        from inferflow_tpu.quant.codec_jax import requantize_i8_colwise
        t = requantize_i8_colwise(w)
        y = np.asarray(linear(x, t), np.float32)
        ref = np.asarray(jnp.matmul(x.astype(jnp.float32),
                                    w.astype(jnp.float32)), np.float32)
        err = norm_rmsd(y, ref)
        ok = err < args.tol
        failures += 0 if ok else 1
        line = f"{'i8mm':11s} parity norm_rmsd={err:.5f} {'OK' if ok else 'FAIL'}"
        if not args.skip_perf:
            assert k == n, "--i8mm perf needs square K==N"

            @jax.jit
            def step8(xs):
                y = linear(xs, t)
                return (jnp.tanh(y[:, :k]) * 0.5 + xs * 0.75).astype(x.dtype)

            s = x
            for _ in range(3):
                s = step8(s)
            np.asarray(s[0, :2])

            def chain8(it):
                t0 = time.time()
                ss = x
                for _ in range(it):
                    ss = step8(ss)
                np.asarray(ss[0, :2])
                return time.time() - t0

            per = min(max((chain8(256) - chain8(32)) / 224, 1e-9)
                      for _ in range(3))
            line += (f"  {t.data.nbytes / per / 1e9:7.1f} GB/s "
                     f"({per*1e3:.2f} ms)")
        print(line, flush=True)

    if args.mega:
        # whole-model fused decode step vs the per-layer path (VERDICT r2
        # items 1-2 "done" criteria: parity + timing at several context
        # lengths, demonstrating the per-call serialization win)
        import dataclasses as _dc
        from inferflow_tpu.models.zoo import make_spec, make_synthetic_params
        from inferflow_tpu.models.decoder import decoder_layers_unrolled
        from inferflow_tpu.runtime.kv_cache import KVCache
        from inferflow_tpu.kernels.decode_step import (fused_decode_step,
                                                       fused_step_supported)

        spec = make_spec(args.mega_model)
        hp = spec.hyper_params
        params = make_synthetic_params(spec, weight_format=args.mega_quant,
                                       stacked=True,
                                       device_layout=args.mega_layout)
        stacked = params["layers"]
        rng = np.random.default_rng(2)

        def filled_cache(ctx, length):
            """Random-filled quantized cache: both paths read the SAME
            rows, so logical consistency of the fill doesn't matter."""
            c = KVCache.create(hp.decoder_layers, 1, ctx, hp.kv_heads,
                               hp.head_dim, quantized=True)
            def rnd_i8(a):
                return jnp.asarray(rng.integers(-127, 128, a.shape),
                                   jnp.int8)
            def rnd_sc(a):
                return jnp.asarray(
                    rng.uniform(0.004, 0.012, a.shape), a.dtype)
            return _dc.replace(
                c, k=rnd_i8(c.k), v=rnd_i8(c.v),
                k_scale=rnd_sc(c.k_scale), v_scale=rnd_sc(c.v_scale),
                length=jnp.asarray([length], jnp.int32))

        cache0 = filled_cache(512, 33)
        assert fused_step_supported(spec, stacked, cache0, 1), \
            "model not mega-eligible"
        xin = jnp.asarray(rng.standard_normal((1, 1, hp.embd_dims)) * 0.3,
                          jnp.bfloat16)

        @jax.jit
        def fused_once(x, cache):
            return fused_decode_step(spec, stacked, x,
                                     cache.length[:, None], cache)

        @jax.jit
        def layered_once(x, cache):
            os.environ["INFERFLOW_MEGA"] = "0"
            try:
                return decoder_layers_unrolled(spec, stacked, x,
                                               cache.length[:, None], cache)
            finally:
                os.environ["INFERFLOW_MEGA"] = "1"

        for ln in (33, 500):
            cache = filled_cache(512, ln)
            xf, cf = fused_once(xin, cache)
            xr, cr = layered_once(xin, cache)
            err = norm_rmsd(np.asarray(xf, np.float32),
                            np.asarray(xr, np.float32))
            ok = err < args.tol
            failures += 0 if ok else 1
            kf, vf = cf.read_layer(hp.decoder_layers - 1, jnp.float32)
            kr, vr = cr.read_layer(hp.decoder_layers - 1, jnp.float32)
            kerr = norm_rmsd(np.asarray(kf[0, ln]), np.asarray(kr[0, ln]))
            ok2 = kerr < args.tol
            failures += 0 if ok2 else 1
            print(f"mega parity len={ln:5d}  x norm_rmsd={err:.5f} "
                  f"{'OK' if ok else 'FAIL'}  kv_row={kerr:.5f} "
                  f"{'OK' if ok2 else 'FAIL'}", flush=True)

        if not args.skip_perf:
            for ctx in (64, 512, 4096):
                cache = filled_cache(ctx, ctx - 1)
                ln0 = cache.length

                def make_step(once):
                    @jax.jit
                    def step(x, cache):
                        x2, c2 = once(x, cache)
                        # pin length so appends overwrite one row: static
                        # shapes, constant attention cost at this ctx
                        return x2.astype(jnp.bfloat16), c2.with_length(ln0)
                    return step

                rows = []
                for nm, once in (("fused", fused_once),
                                 ("layered", layered_once)):
                    step = make_step(once)
                    def chain(it):
                        xx, cc = xin, cache
                        t0 = time.time()
                        for _ in range(it):
                            xx, cc = step(xx, cc)
                        np.asarray(xx[0, 0, :2])
                        return time.time() - t0
                    chain(4)
                    per = min(max((chain(64) - chain(16)) / 48, 1e-9)
                              for _ in range(3))
                    rows.append((nm, per))
                f_ms = rows[0][1] * 1e3
                l_ms = rows[1][1] * 1e3
                print(f"mega timing ctx={ctx:5d}  fused {f_ms:7.3f} ms/step"
                      f"  layered {l_ms:7.3f} ms/step  "
                      f"speedup {l_ms / max(f_ms, 1e-9):5.2f}x", flush=True)

    if args.attention:
        from inferflow_tpu.runtime.kv_cache import KVCache
        from inferflow_tpu.kernels.attention import (decode_attention,
                                                     chunk_attention)
        from inferflow_tpu.ops.attention import mha
        rng = np.random.default_rng(0)
        for D, name in ((128, "decode D=128"), (64, "decode D=64 pf=2")):
            L, B, H, S = 2, 2, 4, 1024
            cache = KVCache.create(L, B, S, H, D, quantized=True)
            for layer in range(L):
                kk = jnp.asarray(rng.standard_normal((B, S, H, D)),
                                 jnp.float32)
                vv = jnp.asarray(rng.standard_normal((B, S, H, D)),
                                 jnp.float32)
                cache = cache.update_layer(layer, kk, vv,
                                           jnp.zeros((B,), jnp.int32))
            lengths = [97, 1024]
            cache = cache.with_length(jnp.asarray(lengths, jnp.int32))
            q = jnp.asarray(rng.standard_normal((B, 1, H, D)) * 0.3,
                            jnp.bfloat16)
            lens = jnp.asarray(lengths, jnp.int32)
            out, _ = decode_attention(q, cache, jnp.int32(1), lens)
            kf, vf = cache.read_layer(1)
            qpos = jnp.asarray([[v - 1] for v in lengths], jnp.int32)
            ref = mha(q, kf, vf, q_positions=qpos, kv_len=lens)
            err = norm_rmsd(np.asarray(out, np.float32),
                            np.asarray(ref, np.float32))
            ok = err < args.tol
            failures += 0 if ok else 1
            print(f"attention {name}: norm_rmsd={err:.5f} "
                  f"{'OK' if ok else 'FAIL'}", flush=True)

    if failures:
        sys.exit(f"{failures} parity FAILURES")
    print("all parities OK")


if __name__ == "__main__":
    main()
