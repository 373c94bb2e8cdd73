"""Benchmark: end-to-end 512px try-on serving throughput on one chip.

Measures the full device-side program — on-device patch warps/erosion/
compositing + input assembly + generator forward (pasta_tpu.serving) — the
pipeline with no host round-trips (BASELINE.json north star). Falls back to
generator-only on random inputs if the fixture data is unavailable.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 64 images/sec/chip @512px.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_IMAGES_PER_SEC = 64.0
FIXTURES = "/root/reference/test_datas"
BATCH = 8
N_ITERS = 20


def _fixture_host_batch():
    from pasta_tpu.data import preprocess as pp
    from pasta_tpu.serving import host_prepare

    with open(os.path.join(FIXTURES, "test_pairs.txt")) as f:
        pairs = [line.split() for line in f if line.strip()][:BATCH]
    items = []
    for clothes_name, person_name in pairs:
        person = pp.load_person(FIXTURES, person_name)
        clothes = pp.load_person(FIXTURES, clothes_name,
                                 with_garment_parsing=True)
        items.append(host_prepare(person, clothes, "upper"))
    while len(items) < BATCH:
        items.append(items[-1])
    tiled = all(bool(it["tiles_fit"]) for it in items)
    batch = {k: jnp.asarray(np.stack([it[k] for it in items]))
             for k in items[0] if k != "tiles_fit"}
    return batch, tiled


def main():
    from pasta_tpu.models import Generator
    from pasta_tpu.serving import assemble_inputs_device

    model = Generator()
    use_fixtures = os.path.isdir(FIXTURES)

    if use_fixtures:
        host_batch, tiled = _fixture_host_batch()

        def single(variables, host_batch):
            inputs = assemble_inputs_device(host_batch, "upper", tiled=tiled)
            img, finetune, parsing = model.apply(
                variables, noise_mode="const", **inputs)
            return finetune

        example_args = (host_batch,)
        metric = "tryon_512px_serving_throughput"
    else:
        import __graft_entry__ as ge

        inputs = ge._example_inputs(BATCH, 512)

        def single(variables, inputs):
            img, finetune, parsing = model.apply(
                variables, noise_mode="const", **inputs)
            return finetune

        example_args = (inputs,)
        metric = "tryon_512px_inference_throughput"

    init_inputs = (
        assemble_inputs_device(example_args[0], "upper") if use_fixtures
        else example_args[0])
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        **init_inputs)

    # NOTE: over the axon tunnel block_until_ready does not synchronize —
    # loop on-device and fetch one scalar so timing covers N_ITERS programs.
    @jax.jit
    def loop(variables, args):
        def body(i, acc):
            return acc + jnp.mean(single(variables, *args))

        return jax.lax.fori_loop(0, N_ITERS, body, 0.0)

    float(loop(variables, example_args))  # warmup/compile
    t0 = time.perf_counter()
    float(loop(variables, example_args))
    dt = time.perf_counter() - t0

    images_per_sec = BATCH * N_ITERS / dt
    print(json.dumps({
        "metric": metric,
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
