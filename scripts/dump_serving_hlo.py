"""Dump the post-optimization HLO of the serving main program (assemble +
generator forward) to a text file for layout forensics.

Usage: python scripts/dump_serving_hlo.py [--batch 32] [--out /tmp/serve.hlo]
       [--split-forward]  (generator-only program, no assemble)
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default="/tmp/serve.hlo")
    ap.add_argument("--split-forward", action="store_true")
    ap.add_argument("--g-bf16-res", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    os.environ.setdefault("PASTA_BENCH_BATCH", str(args.batch))
    sys.path.insert(0, "/root/repo")
    import bench

    from pasta_tpu.models import Generator
    from pasta_tpu.serving import assemble_inputs_device, ingest_device

    model = Generator(num_bf16_res=args.g_bf16_res)
    host_batch, tiled, cut_windowed = bench._fixture_host_batch("device")
    f32_batch = ingest_device(host_batch)
    inputs = assemble_inputs_device(f32_batch, "upper")
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        **inputs)

    if args.split_forward:
        def fn(variables, inputs):
            img, ft, parsing = model.apply(
                variables, noise_mode="const", **inputs)
            return ft

        lowered = jax.jit(fn).lower(variables, inputs)
    else:
        def fn(variables, fb):
            inputs = assemble_inputs_device(
                fb, "upper", tiled=tiled, warp_impl="auto",
                cut_windowed=cut_windowed)
            img, ft, parsing = model.apply(
                variables, noise_mode="const", **inputs)
            return ft

        lowered = jax.jit(fn).lower(variables, f32_batch)

    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out} ({len(txt) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
