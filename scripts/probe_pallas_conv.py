"""Parity + rate check for the Pallas 3x3 conv kernel vs lax conv.

Usage: python scripts/probe_pallas_conv.py [--batch 32] [--cin 64]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--cin", type=int, default=64)
    ap.add_argument("--cout", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--block-rows", type=int, default=16)
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pasta_tpu.ops.pallas_conv import conv3x3_same, conv3x3_valid

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, R, CI, CO = args.batch, args.res, args.cin, args.cout
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, R, R, CI), dt)
    w = jnp.asarray(rng.randn(3, 3, CI, CO) * 0.05, dt)

    if not args.skip_parity:
        got = np.asarray(conv3x3_same(
            x[:2], w, block_rows=args.block_rows).astype(jnp.float32))
        want = np.asarray(jax.lax.conv_general_dilated(
            x[:2].astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        err = np.max(np.abs(got - want)) / max(1e-6, np.max(np.abs(want)))
        print(json.dumps({"parity_rel_err": float(err)}), flush=True)
        assert err < 2e-2, err  # bf16 kernel vs f32 oracle

    flops = 2 * B * R * R * CI * CO * 9

    def timed(fn, *a):
        @jax.jit
        def loop(*a):
            def body(i, acc):
                xs = a[0] + (acc * 0).astype(a[0].dtype)
                return acc + fn(xs, *a[1:]).ravel()[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, args.iters, body, jnp.zeros((), jnp.float32))

        float(loop(*a))
        t0 = time.perf_counter()
        float(loop(*a))
        return (time.perf_counter() - t0) / args.iters

    t = timed(lambda xs: conv3x3_same(xs, w, block_rows=args.block_rows), x)
    print(json.dumps({"variant": f"pallas_same_rb{args.block_rows}",
                      "ms": round(t * 1e3, 3),
                      "tflops": round(flops / t / 1e12, 1)}), flush=True)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    t = timed(lambda xs: conv3x3_valid(xs, w, block_rows=args.block_rows), xp)
    print(json.dumps({"variant": f"pallas_valid_rb{args.block_rows}",
                      "ms": round(t * 1e3, 3),
                      "tflops": round(flops / t / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
