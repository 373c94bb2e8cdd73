"""Probe MXU GEMM rates at the conv-equivalent shapes.

The serving generator's 512px convs (3x3, 64ch) run at ~48 TFLOPs via
XLA's conv emitter. If a plain dot at the im2col-equivalent shape
([M, 9*Cin] @ [9*Cin, Cout]) runs ~2x faster, a Pallas conv kernel with
in-VMEM patch construction can claim that rate without the HBM cost of
materialized patches.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_ITERS = 50


def timed(fn, *args):
    @jax.jit
    def loop(*args):
        def body(i, acc):
            return acc + fn(acc, *args)

        return lax.fori_loop(0, N_ITERS, body, jnp.float32(0.0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / N_ITERS


def main():
    key = jax.random.PRNGKey(0)
    cases = [
        # (M, K, N) — im2col-equivalents of the hot convs
        (65536, 576, 64),    # 3x3 64->64 @512^2 (per 1/32 of batch 8)
        (65536, 1152, 64),   # 3x3 128->64
        (65536, 1152, 128),  # 3x3 128->128 @256^2
        (65536, 64, 64),     # per-tap accumulation variant
        (131072, 576, 64),
        (65536, 576, 128),   # would pairing two 64-out convs help
    ]
    for m, k, n in cases:
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(key, (k, n), jnp.bfloat16)

        def body(acc, a, b):
            aa = a + acc.astype(a.dtype)
            return jnp.mean(
                jnp.dot(aa, b, preferred_element_type=jnp.float32))

        t = timed(body, a, b)
        flops = 2 * m * k * n
        print(json.dumps({"m": m, "k": k, "n": n,
                          "ms": round(t * 1e3, 3),
                          "tflops": round(flops / t / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
