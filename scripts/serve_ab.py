"""Serving A/B ladder on the live chip: one process, one device init.

Measures the two serving programs (ingest, warp+forward) across configs:
  * g_bf16 = 3 (round-3 default) vs 7 (all-bf16 generator)
  * batch 8 / 16 / 32 (serving batch is a free throughput knob)
  * warp_impl matmul vs gather (the round-3 redesign's A/B)

Prints one JSON line per config. Run solo; logs are the round-4 evidence
for README/BENCH. Reference hot loop being replaced:
/root/reference/training/dataset.py:1069-1085 (host cv2 warps per pair).
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

FIXTURES = "/root/reference/test_datas"
N_ITERS = 20


def fixture_host_batch(batch, cond="device"):
    from pasta_tpu.data import preprocess as pp
    from pasta_tpu.serving import host_prepare

    with open(os.path.join(FIXTURES, "test_pairs.txt")) as f:
        pairs = [line.split() for line in f if line.strip()][:batch]
    items = []
    for clothes_name, person_name in pairs:
        person = pp.load_person(
            FIXTURES, person_name,
            pose_raster="device" if cond == "device" else "host")
        clothes = pp.load_person(FIXTURES, clothes_name,
                                 with_garment_parsing=True)
        items.append(host_prepare(person, clothes, "upper", cond=cond))
    while len(items) < batch:
        items.append(items[len(items) % len(pairs)])
    tiled = all(bool(it["tiles_fit"]) for it in items)
    cut_windowed = tiled and all(bool(it["cut_fits"]) for it in items)
    out = {k: jnp.asarray(np.stack([it[k] for it in items]))
           for k in items[0] if k not in ("tiles_fit", "cut_fits")}
    return out, tiled, cut_windowed


def perturb(batch, acc):
    out = {}
    for k, v in batch.items():
        if jnp.issubdtype(v.dtype, jnp.floating) or v.dtype == jnp.uint8:
            out[k] = v + (acc * 0).astype(v.dtype)
        else:
            out[k] = v
    return out


def timed_loop(fn, *args):
    @jax.jit
    def loop(*args):
        def body(i, acc):
            return acc + fn(acc, *args)

        return jax.lax.fori_loop(0, N_ITERS, body, 0.0)

    float(loop(*args))  # warmup/compile
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / N_ITERS


def run_config(batch, g_bf16, warp_impl, cond="device"):
    from pasta_tpu.models import Generator
    from pasta_tpu.serving import assemble_inputs_device, ingest_device

    model = Generator(num_bf16_res=g_bf16)
    host_batch, tiled, cut_windowed = fixture_host_batch(batch, cond)

    def ingest_body(acc, hb):
        out = ingest_device(perturb(hb, acc))
        return sum(v.ravel()[0] for v in out.values()
                   if v.dtype == jnp.float32)

    f32_batch = jax.block_until_ready(ingest_device(host_batch))

    def main_body(acc, fb):
        inputs = assemble_inputs_device(
            perturb(fb, acc), "upper", tiled=tiled,
            warp_impl=warp_impl, cut_windowed=cut_windowed)
        img, finetune, parsing = model.apply(
            variables, noise_mode="const", **inputs)
        return jnp.mean(finetune)

    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        **assemble_inputs_device(f32_batch, "upper"))

    t_ingest = timed_loop(ingest_body, host_batch)
    t_main = timed_loop(main_body, f32_batch)
    ips = batch / (t_ingest + t_main)
    rec = {"batch": batch, "g_bf16": g_bf16, "warp_impl": warp_impl,
           "cond": cond, "ingest_ms": round(t_ingest * 1e3, 2),
           "warp_forward_ms": round(t_main * 1e3, 2),
           "images_per_sec_chip": round(ips, 2)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    configs = [
        (8, 3, "auto"),          # round-3 default (BENCH reproduction)
        (8, 7, "auto"),          # all-bf16 G
        (16, 7, "auto"),         # bigger batch
        (32, 7, "auto"),
        (8, 3, "gather"),        # warp A/B: the round-2 gather oracle
        (16, 3, "auto"),
    ]
    if len(sys.argv) > 1:
        # targeted ladder: each arg is batch,g_bf16,warp_impl
        configs = []
        for arg in sys.argv[1:]:
            b, g, w = arg.split(",")
            configs.append((int(b), int(g), w))
    t0 = time.time()
    jax.devices()  # pay init once, visibly
    print(f"# device init {time.time() - t0:.1f}s", flush=True)
    for batch, g_bf16, warp_impl in configs:
        try:
            run_config(batch, g_bf16, warp_impl)
        except Exception as e:  # noqa: BLE001 — record, continue ladder
            print(json.dumps({"batch": batch, "g_bf16": g_bf16,
                              "warp_impl": warp_impl,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
