"""Experiment: per-weight unpack cost alternatives for the decode matmul.

Measures GB/s of *packed* weight bytes for several in-kernel dequant-dot
strategies at a large shape (amortizes launch overhead) and at a tinyllama
per-layer shape. Informs the mega-kernel inner loop design (VERDICT r2
items 1 and 8).

Strategies:
  a. current Q4 fast path (2 sub-dots, shift/mask/convert/fma)   [baseline]
  b. int4 native: codes stored as jnp.int4, Mosaic converts to bf16
  c. scale-after-dot: per-block batched dots on raw codes, scale applied
     to (blocks, N) partial sums (VPU work ~independent of block size)
  d. int8 container codes, bf16 convert + scale FMA (q8c-like)
  e. int8 container codes + int8 activations, int8xint8 MXU dot, f32
     rescale after (the TPU-native Gemv_AX8; reference gemv.h:1500-1711)

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/.axon_site python tools/exp_unpack.py
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def slope_time(fn, *args, lo=8, hi=32, samples=3):
    """fn(*args, carry) -> array; carry chains data-dependence."""
    def chain(n):
        carry = jnp.zeros((1,), jnp.float32)
        t0 = time.time()
        for _ in range(n):
            out = fn(*args, carry)
            carry = out.ravel()[:1] * 0.0
        np.asarray(carry)
        return time.time() - t0
    chain(2)
    best = float("inf")
    for _ in range(samples):
        a = chain(lo); b = chain(hi)
        best = min(best, max((b - a) / (hi - lo), 1e-9))
    return best


def mk_inputs(k, n, key):
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (8, k), jnp.bfloat16)  # tm=8 row block
    codes8 = jax.random.randint(k2, (k, n), -127, 127, jnp.int32).astype(jnp.int8)
    packed4 = jax.random.randint(k2, (k // 2, n), 0, 255, jnp.int32).astype(jnp.uint8)
    scale = (jax.random.uniform(k3, (k // 64, n), jnp.float32) * 0.01
             ).astype(jnp.bfloat16)
    return x, codes8, packed4, scale


# ---------------------------------------------------------------- strategy a
def run_a(x, packed4, scale, k, n, tn):
    kt = k  # single K tile
    def kernel(x0_ref, x1_ref, p_ref, s_ref, o_ref):
        sc = jnp.repeat(s_ref[:].astype(jnp.float32), 32, axis=0
                        ).astype(jnp.bfloat16)
        v = p_ref[:].astype(jnp.int32)
        lo = (v & 0xF).astype(jnp.bfloat16)
        hi = (v >> 4).astype(jnp.bfloat16)
        acc = jnp.dot(x0_ref[:], lo * sc, preferred_element_type=jnp.float32)
        acc += jnp.dot(x1_ref[:], hi * sc, preferred_element_type=jnp.float32)
        o_ref[:] = acc

    x0 = x[:, 0::2]
    x1 = x[:, 1::2]
    return pl.pallas_call(
        kernel,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((8, kt // 2), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kt // 2), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt // 2, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt // 64, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x0, x1, packed4, scale)


# ---------------------------------------------------------------- strategy b
def run_b(x, codes4, scale, k, n, tn):
    def kernel(x_ref, c_ref, s_ref, o_ref):
        sc = jnp.repeat(s_ref[:].astype(jnp.float32), 64, axis=0
                        ).astype(jnp.bfloat16)
        w = c_ref[:].astype(jnp.bfloat16) * sc
        o_ref[:] = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((8, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 64, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, codes4, scale)


# ---------------------------------------------------------------- strategy c
def run_c(x, packed4, scale, k, n, tn, blk=512):
    """Raw-code dots per K-superblock; scale applied after the dot.
    Superblock = `blk` K values (8 quant blocks of 64): scale must be
    constant within a superblock for exactness, so this measures the
    SPEED shape only (numerics handled by finer loop in real kernel)."""
    nb = k // blk
    def kernel(x0_ref, x1_ref, p_ref, s_ref, o_ref):
        acc = jnp.zeros((8, tn), jnp.float32)
        for b in range(nb):
            v = p_ref[pl.ds(b * blk // 2, blk // 2), :].astype(jnp.int32)
            lo = (v & 0xF).astype(jnp.bfloat16)
            hi = (v >> 4).astype(jnp.bfloat16)
            part = jnp.dot(x0_ref[:, b * blk // 2:(b + 1) * blk // 2], lo,
                           preferred_element_type=jnp.float32)
            part += jnp.dot(x1_ref[:, b * blk // 2:(b + 1) * blk // 2], hi,
                            preferred_element_type=jnp.float32)
            acc += part * s_ref[b * (blk // 64), :].astype(jnp.float32)
        o_ref[:] = acc

    x0 = x[:, 0::2]
    x1 = x[:, 1::2]
    return pl.pallas_call(
        kernel,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((8, k // 2), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k // 2), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 2, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 64, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x0, x1, packed4, scale)


# ---------------------------------------------------------------- strategy d
def run_d(x, codes8, scale, k, n, tn):
    def kernel(x_ref, c_ref, s_ref, o_ref):
        sc = jnp.repeat(s_ref[:].astype(jnp.float32), 64, axis=0
                        ).astype(jnp.bfloat16)
        w = c_ref[:].astype(jnp.bfloat16) * sc
        o_ref[:] = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((8, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 64, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, codes8, scale)


# ---------------------------------------------------------------- strategy e
def run_e(xq, codes8, colscale, k, n, tn):
    """int8 x int8 MXU; per-column weight scale applied to the int32 acc."""
    def kernel(x_ref, c_ref, s_ref, o_ref):
        acc = jax.lax.dot_general(
            x_ref[:], c_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[:] = acc.astype(jnp.float32) * s_ref[:].astype(jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((32, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((32, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(xq, codes8, colscale)


def inner_slope(make_call, feedback, x0, r_lo=2, r_hi=8, samples=3):
    """Chain the kernel INSIDE one jit (tunnel dispatch ~1ms would swamp
    sub-ms kernels otherwise; see tools/kernel_bench.py --inner-chain)."""
    def make_rep(r):
        @jax.jit
        def rep(xs):
            for _ in range(r):
                y = make_call(xs)
                xs = feedback(xs, y)
            return xs
        return rep
    f_lo, f_hi = make_rep(r_lo), make_rep(r_hi)
    def run(f, outer):
        ss = x0
        t0 = time.time()
        for _ in range(outer):
            ss = f(ss)
        np.asarray(jax.tree_util.tree_leaves(ss)[0].ravel()[:1])
        return time.time() - t0
    run(f_lo, 1); run(f_hi, 1)
    return min(max((run(f_hi, 6) - run(f_lo, 6)) / (6 * (r_hi - r_lo)),
                   1e-9) for _ in range(samples))


def main():
    import os
    shapes = [(4096, 4096), (2048, 5632)]
    if os.environ.get('EXP_SHAPE'):
        kk, nn = os.environ['EXP_SHAPE'].split('x'); shapes = [(int(kk), int(nn))]
    for k, n in shapes:
        key = jax.random.PRNGKey(0)
        x, codes8, packed4, scale = mk_inputs(k, n, key)
        tn = 256 if k >= 8192 else 512
        q4_bytes = packed4.size + scale.size * 2
        q8_bytes = codes8.size + scale.size * 2
        print(f"== K={k} N={n}  q4_packed={q4_bytes/1e6:.1f}MB "
              f"q8_packed={q8_bytes/1e6:.1f}MB", flush=True)

        def fb(xs, y):
            return (jnp.tanh(y[:, :k]) * 0.5 + xs * 0.75).astype(xs.dtype)

        t = inner_slope(lambda xs: run_a(xs, packed4, scale, k, n, tn), fb, x)
        print(f"  a current-q4-fastpath : {t*1e6:9.1f}us  {q4_bytes/t/1e9:7.1f} GB/s", flush=True)

        try:
            c8 = jax.random.randint(key, (k, n), -8, 7, jnp.int32).astype(jnp.int8)
            def call_b(xs):
                codes4 = c8.astype(jnp.int4)
                return run_b(xs, codes4, scale, k, n, tn)
            t = inner_slope(call_b, fb, x)
            print(f"  b int4-native         : {t*1e6:9.1f}us  {q4_bytes/t/1e9:7.1f} GB/s", flush=True)
        except Exception as e:
            print(f"  b int4-native         : FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

        t = inner_slope(lambda xs: run_c(xs, packed4, scale, k, n, tn), fb, x)
        print(f"  c scale-after-dot     : {t*1e6:9.1f}us  {q4_bytes/t/1e9:7.1f} GB/s", flush=True)

        t = inner_slope(lambda xs: run_d(xs, codes8, scale, k, n, tn), fb, x)
        print(f"  d int8-bf16-convert   : {t*1e6:9.1f}us  {q8_bytes/t/1e9:7.1f} GB/s", flush=True)

        xq = jax.random.randint(key, (32, k), -127, 127, jnp.int32).astype(jnp.int8)
        colscale = jnp.ones((1, n), jnp.bfloat16)
        def fbe(xs, y):
            return jnp.clip(xs + (y[:, :k] > 0).astype(jnp.int8), -127, 127)
        try:
            t = inner_slope(lambda xs: run_e(xs, codes8, colscale, k, n, tn),
                            fbe, xq)
            print(f"  e int8xint8-mxu       : {t*1e6:9.1f}us  {q8_bytes/t/1e9:7.1f} GB/s", flush=True)
        except Exception as e:
            print(f"  e int8xint8-mxu       : FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
