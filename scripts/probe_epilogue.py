"""Probe: does fusing the lrelu/add epilogue into a conv halve the conv
emitter's rate, and does an optimization_barrier between them recover it?

Round-4 xplane profile showed the serving forward's straggler fusions are
convolution+maximum_add epilogues at ~28 TFLOP/s vs the bare emitter's
~48 TFLOP/s on the same [B,512,512,64]x[3,3,64,64] shape. If the epilogue
is the cause, splitting it out costs one HBM round-trip of the activation
(33 MB bf16 at 819 GB/s = ~80 us) against ~1.6 ms of recovered conv time.

Usage: python scripts/probe_epilogue.py [--batch 8] [--iters 20]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dt = jnp.dtype(args.dtype)
    B, R, C = args.batch, args.res, args.ch
    x = jnp.asarray(np.random.randn(B, R, R, C), dt)
    w = jnp.asarray(np.random.randn(3, 3, C, C) * 0.05, dt)
    b = jnp.asarray(np.random.randn(C) * 0.05, dt)
    skip = jnp.asarray(np.random.randn(B, R, R, C), dt)
    flops = 2 * B * R * R * C * C * 9

    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def lrelu_add(y, s):
        y = y + b
        y = jnp.maximum(y, 0) + jnp.minimum(y, 0) * np.asarray(0.2, dt)
        return y * np.asarray(np.sqrt(2), dt) + s

    def bare(x, s):
        return conv(x, w)

    def fused(x, s):
        return lrelu_add(conv(x, w), s)

    def barriered(x, s):
        y = jax.lax.optimization_barrier(conv(x, w))
        return lrelu_add(y, s)

    def timed(fn):
        @jax.jit
        def loop(x, s):
            def body(i, acc):
                # carry a data dependence so iterations can't collapse
                return acc + fn(x + (acc * 0).astype(x.dtype), s).ravel()[0]
            return jax.lax.fori_loop(0, args.iters, body, jnp.zeros((), dt))

        float(loop(x, skip))
        t0 = time.perf_counter()
        float(loop(x, skip))
        return (time.perf_counter() - t0) / args.iters

    for name, fn in (("bare_conv", bare), ("fused_epilogue", fused),
                     ("barriered_epilogue", barriered)):
        dt_s = timed(fn)
        print(json.dumps({
            "variant": name, "ms": round(dt_s * 1e3, 3),
            "tflops": round(flops / dt_s / 1e12, 1),
            "shape": f"[{B},{R},{R},{C}]x[3,3,{C},{C}] {args.dtype}",
        }), flush=True)


if __name__ == "__main__":
    main()
