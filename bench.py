"""Benchmark: 512px try-on generator inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json north star): 64 images/sec/chip @512px.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


BASELINE_IMAGES_PER_SEC = 64.0


def main():
    from pasta_tpu.models import Generator

    batch = 8
    res = 512
    model = Generator()
    rng = np.random.RandomState(0)
    f32 = lambda *s: jnp.asarray(rng.rand(*s).astype(np.float32))
    inputs = dict(
        z=jnp.zeros((batch, 0)),
        c=f32(batch, res // 4, res // 4, 45),
        retain=f32(batch, res, res, 6),
        pose=f32(batch, res, res, 5),
        denorm_upper_input=f32(batch, res, res, 3),
        denorm_lower_input=f32(batch, res, res, 3),
        denorm_upper_mask=jnp.asarray(rng.rand(batch, res, res, 1) > 0.5,
                                      jnp.float32),
        denorm_lower_mask=jnp.asarray(rng.rand(batch, res, res, 1) > 0.5,
                                      jnp.float32),
    )
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        **inputs)

    n_iters = 20

    # NOTE: over the axon tunnel block_until_ready does not synchronize —
    # only host fetches do. Loop on-device and fetch one scalar so timing
    # covers exactly n_iters forwards + one round-trip.
    @jax.jit
    def forward_loop(variables, inputs):
        def body(i, acc):
            img, finetune, parsing = model.apply(
                variables, noise_mode="const", **inputs)
            return acc + jnp.mean(finetune)

        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    float(forward_loop(variables, inputs))  # warmup / compile

    t0 = time.perf_counter()
    float(forward_loop(variables, inputs))
    dt = time.perf_counter() - t0

    images_per_sec = batch * n_iters / dt
    print(json.dumps({
        "metric": "tryon_512px_inference_throughput",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
