"""Probe: 512² conv rate as a function of channel widths, and whether
zero-padding a 64-channel conv to 128 lanes recovers the fast emitter.

The round-5 serving trace shows, within ONE program at identical
{3,0,2,1:T(8,128)} layouts:
    64->128 conv @512²: 153 TFLOP/s      128->64: 100 TFLOP/s
    64->64 conv @512²:  20-28 TFLOP/s    (the entire serving gap)
and the HLO says the slow ones picked the EmitAllBatchInSublanes emitter
(estimated_cycles 46M) where others got
EmitAllInputFeaturePackedInSublanesOutputBatchInSublanes. A C=64 minor dim
is lane-padded to 128 in this layout anyway, so widening to an explicit
128 costs no HBM bytes — only MXU zero-FLOPs at a >=3x better rate.

Usage: python scripts/probe_chanpad.py [--batch 32]
"""

import argparse
import functools
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--emitters", action="store_true",
                    help="also print each variant's conv emitter choice")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dt = jnp.bfloat16
    B, R = args.batch, args.res
    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    noise_tab = jnp.asarray(np.random.randn(R, R), dt)

    def epi(y, b, s):
        y = y + noise_tab[None, :, :, None] * np.asarray(0.1, dt) + b
        y = jnp.maximum(y, 0) + jnp.minimum(y, 0) * np.asarray(0.2, dt)
        y = y * np.asarray(np.sqrt(2), dt)
        return jnp.clip(y, -256, 256) + s

    def run(name, ci, co, pad_in=0, pad_out=0, useful=(64, 64)):
        """Time conv(ci+pad_in -> co+pad_out) + epilogue; report the rate in
        USEFUL flops (the unpadded conv's) so variants are comparable."""
        CI, CO = ci + pad_in, co + pad_out
        x = jnp.asarray(np.random.randn(B, R, R, ci), dt)
        w = jnp.asarray(np.random.randn(3, 3, ci, co) * 0.05, dt)
        b = jnp.asarray(np.random.randn(co) * 0.05, dt)
        s = jnp.asarray(np.random.randn(B, R, R, co), dt)
        if pad_in:
            x = jnp.concatenate(
                [x, jnp.zeros((B, R, R, pad_in), dt)], axis=-1)
            w = jnp.concatenate(
                [w, jnp.zeros((3, 3, pad_in, co), dt)], axis=2)
        if pad_out:
            w = jnp.concatenate(
                [w, jnp.zeros((3, 3, CI, pad_out), dt)], axis=3)
            b = jnp.concatenate([b, jnp.zeros((pad_out,), dt)])
            s = jnp.concatenate(
                [s, jnp.zeros((B, R, R, pad_out), dt)], axis=-1)

        def fn(x, s):
            return epi(conv(x, w), b, s)

        @jax.jit
        def loop(x, s):
            def body(i, acc):
                return acc + fn(x + (acc * 0).astype(x.dtype), s).ravel()[0]
            return jax.lax.fori_loop(0, args.iters, body, jnp.zeros((), dt))

        if args.emitters:
            txt = loop.lower(x, s).compile().as_text()
            ems = sorted(set(re.findall(r'"emitter":"(\w+)"', txt)))
        else:
            ems = None
        float(loop(x, s))
        t0 = time.perf_counter()
        float(loop(x, s))
        dt_s = (time.perf_counter() - t0) / args.iters
        useful_flops = 2 * B * R * R * useful[0] * useful[1] * 9
        total_flops = 2 * B * R * R * CI * CO * 9
        rec = {"variant": name, "ms": round(dt_s * 1e3, 3),
               "useful_tflops": round(useful_flops / dt_s / 1e12, 1),
               "mxu_tflops": round(total_flops / dt_s / 1e12, 1)}
        if ems:
            rec["emitters"] = ems
        print(json.dumps(rec), flush=True)

    run("c64_c64", 64, 64)
    run("c64_c128", 64, 128, useful=(64, 128))
    run("c128_c64", 128, 64, useful=(128, 64))
    run("c128_c128", 128, 128, useful=(128, 128))
    run("c64_c64_padout", 64, 64, pad_out=64)
    run("c64_c64_padin", 64, 64, pad_in=64)
    run("c64_c64_padboth", 64, 64, pad_in=64, pad_out=64)


if __name__ == "__main__":
    main()
