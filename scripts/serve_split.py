"""Split serving stage timing: assemble (warps) vs generator forward.

Times three loops on the chip, batch 8 fixtures:
  * assemble-only: assemble_inputs_device (cut/paste warps, erosion,
    compositing, input concat)
  * forward-only: generator apply on precomputed inputs
  * fused: assemble + forward (the bench main program)
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_ITERS = 20
BATCH = int(os.environ.get("PASTA_SPLIT_BATCH", "8"))


def timed_loop(fn, *args):
    @jax.jit
    def loop(*args):
        def body(i, acc):
            return acc + fn(acc, *args)

        return jax.lax.fori_loop(0, N_ITERS, body, 0.0)

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / N_ITERS


def main():
    from scripts.serve_ab import fixture_host_batch, perturb
    from pasta_tpu.models import Generator
    from pasta_tpu.serving import assemble_inputs_device, ingest_device

    g_bf16 = int(os.environ.get("PASTA_BENCH_G_BF16", "3"))
    warp_impl = os.environ.get("PASTA_BENCH_WARP", "auto")
    model = Generator(num_bf16_res=g_bf16)
    host_batch, tiled, cut_windowed = fixture_host_batch(BATCH)
    f32_batch = jax.block_until_ready(ingest_device(host_batch))

    def assemble(fb):
        return assemble_inputs_device(
            fb, "upper", tiled=tiled, warp_impl=warp_impl,
            cut_windowed=cut_windowed)

    inputs0 = jax.block_until_ready(jax.jit(assemble)(f32_batch))
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        **inputs0)

    def assemble_body(acc, fb):
        out = assemble(perturb(fb, acc))
        return sum(jnp.mean(v) for v in out.values() if v.size)

    def forward_body(acc, inp):
        img, finetune, parsing = model.apply(
            variables, noise_mode="const", **perturb(inp, acc))
        return jnp.mean(finetune)

    def fused_body(acc, fb):
        inp = assemble(perturb(fb, acc))
        img, finetune, parsing = model.apply(
            variables, noise_mode="const", **inp)
        return jnp.mean(finetune)

    for name, body, arg in (("assemble", assemble_body, f32_batch),
                            ("forward", forward_body, inputs0),
                            ("fused", fused_body, f32_batch)):
        t = timed_loop(body, arg)
        print(json.dumps({"stage": name, "batch": BATCH,
                          "g_bf16": g_bf16, "warp_impl": warp_impl,
                          "ms_per_batch": round(t * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
