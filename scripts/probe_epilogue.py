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

    noise_tab = jnp.asarray(np.random.randn(R, R), dt)
    nstrength = jnp.asarray(0.1, dt)

    def full_epilogue(y, s):
        # The real style-block epilogue: noise-table add, bias, lrelu,
        # gain, conv_clamp (what the serving trace's slow fusions carry).
        y = y + noise_tab[None, :, :, None] * nstrength
        y = y + b
        y = jnp.maximum(y, 0) + jnp.minimum(y, 0) * np.asarray(0.2, dt)
        y = y * np.asarray(np.sqrt(2), dt)
        return jnp.clip(y, -256, 256) + s

    def fused_full(x, s):
        return full_epilogue(conv(x, w), s)

    def barriered_full(x, s):
        return full_epilogue(jax.lax.optimization_barrier(conv(x, w)), s)

    def hostile(fn):
        # Force a batch-second-minor ({3,0,2,1}-style) input layout like the
        # real serving program: materialize x as a transpose from [H,N,W,C].
        def run(x, s):
            xt = jax.lax.optimization_barrier(
                jnp.transpose(x, (1, 0, 2, 3)))  # [H,N,W,C] materialized
            return fn(jnp.transpose(xt, (1, 0, 2, 3)), s)

        return run

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

    # Input-side fusion (the modulated-conv pattern: x * styles feeding the
    # conv). The serving HLO shows these convs cost ~1.9x the clean ones in
    # the emitter's own estimate — input-fused elementwise work appears to
    # be re-applied per conv window.
    styles_vec = jnp.asarray(np.random.randn(B, C) * 0.1 + 1.0, dt)

    def input_fused(x, s):
        y = conv(x * styles_vec[:, None, None, :], w)
        return full_epilogue(y, s)

    def input_barriered(x, s):
        xs = jax.lax.optimization_barrier(x * styles_vec[:, None, None, :])
        return full_epilogue(conv(xs, w), s)

    # f32 weights converted in-fusion (the real program's params are fp32).
    w32 = w.astype(jnp.float32)

    def wconvert_fused(x, s):
        y = conv(x * styles_vec[:, None, None, :], w32.astype(dt))
        return full_epilogue(y, s)

    # Pre-padded input + VALID conv: the up-sampling path's pattern — the
    # FIR upsample (upfirdn2d) emits a [B,R+2,R+2,C] tensor carrying the
    # conv's halo, so the conv runs pad=0 on a spatially-misaligned input
    # (514 vs 512). The serving HLO's slow style-b512 convs all have this
    # shape (conv_general_dilated.84: bf16[32,514,514,128] -> pad=0).
    conv_valid = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def prepadded_full(x, s):
        xp = jax.lax.optimization_barrier(
            jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))))
        return full_epilogue(conv_valid(xp, w), s)

    # Conv + spatial instance-norm reduce fused (the SPADE pattern,
    # nn/layers.py:36-37): the serving HLO fuses the mean/var reduce over
    # (H, W) into the conv fusion (fused_computation.131) — suspect this
    # wrecks the emitter's schedule.
    def conv_instnorm(x, s, barrier):
        y = full_epilogue(conv(x, w), s)
        if barrier:
            y = jax.lax.optimization_barrier(y)
        m = jnp.mean(y.astype(jnp.float32), axis=(1, 2), keepdims=True)
        v = jnp.mean(jnp.square(y.astype(jnp.float32)), axis=(1, 2),
                     keepdims=True) - jnp.square(m)
        return ((y.astype(jnp.float32) - m)
                * jax.lax.rsqrt(v + 1e-5)).astype(dt)

    for name, fn in (("bare_conv", bare), ("fused_epilogue", fused),
                     ("barriered_epilogue", barriered),
                     ("fused_full", fused_full),
                     ("barriered_full", barriered_full),
                     ("input_fused", input_fused),
                     ("input_barriered", input_barriered),
                     ("wconvert_input_fused", wconvert_fused),
                     ("hostile_layout_fused_full", hostile(fused_full)),
                     ("hostile_layout_barriered", hostile(barriered_full)),
                     ("prepadded_valid_full", prepadded_full),
                     ("conv_instnorm_fused",
                      lambda x, s: conv_instnorm(x, s, False)),
                     ("conv_instnorm_barriered",
                      lambda x, s: conv_instnorm(x, s, True))):
        dt_s = timed(fn)
        print(json.dumps({
            "variant": name, "ms": round(dt_s * 1e3, 3),
            "tflops": round(flops / dt_s / 1e12, 1),
            "shape": f"[{B},{R},{R},{C}]x[3,3,{C},{C}] {args.dtype}",
        }), flush=True)


if __name__ == "__main__":
    main()
