"""Capture a jax.profiler trace of the serving loop and print the top TPU ops.

Usage: python scripts/profile_serving.py [--iters 20] [--top 40]
Same post-processing as profile_step.py, pointed at the bench.py serving
program (assemble_inputs_device + generator forward over fixture inputs).
"""

import argparse
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trace-dir", default="/tmp/pasta_serve_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--production", action="store_true",
                    help="trace the exact production program (f32 params, "
                         "no perturb, one dispatch per batch) instead of "
                         "the perturbed fori_loop")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import bench

    from pasta_tpu.models import Generator
    from pasta_tpu.serving import assemble_inputs_device, ingest_device

    g_bf16 = int(os.environ.get("PASTA_BENCH_G_BF16", "3"))
    warp_impl = os.environ.get("PASTA_BENCH_WARP", "auto")
    model = Generator(num_bf16_res=g_bf16)
    host_batch, tiled, cut_windowed = bench._fixture_host_batch()
    # Stage split as in production/bench: ingest pins f32 layouts at a jit
    # boundary; profiling the fused single-program variant instead shows the
    # transposed-layout gather pathology (91 ms paste gathers).
    f32_batch = jax.block_until_ready(ingest_device(host_batch))

    def single(variables, fb):
        inputs = assemble_inputs_device(
            fb, "upper", tiled=tiled, warp_impl=warp_impl,
            cut_windowed=cut_windowed)
        img, finetune, parsing = model.apply(
            variables, noise_mode="const", **inputs)
        return finetune

    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        **assemble_inputs_device(f32_batch, "upper"))

    if args.production:
        # The perturbed fori_loop (below) defeats hoisting but turns the
        # gather operands into computed values, letting layout assignment
        # re-poison them — it measures a program production never runs.
        # Here: the f32 batch enters as PARAMETERS (pinned default layouts),
        # one dispatch per batch exactly like TryonPipeline.run_batch; the
        # trace records true per-op device times regardless of host overlap.
        run = jax.jit(single)
        print("warm:", float(np.asarray(run(variables, f32_batch)).mean()))
        iters = max(3, min(args.iters, 5))
        os.makedirs(args.trace_dir, exist_ok=True)
        jax.profiler.start_trace(args.trace_dir)
        outs = [run(variables, f32_batch) for _ in range(iters)]
        print("traced:", float(np.asarray(outs[-1]).mean()))
        jax.profiler.stop_trace()
        _print_op_profile(args.trace_dir, args.top, iters)
        return

    @jax.jit
    def loop(variables, fb):
        def body(i, acc):
            return acc + jnp.mean(single(
                variables, bench._perturb(fb, acc)))

        return jax.lax.fori_loop(0, args.iters, body, 0.0)

    print("warm:", float(loop(variables, f32_batch)))
    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    print("traced:", float(loop(variables, f32_batch)))
    jax.profiler.stop_trace()

    _print_op_profile(args.trace_dir, args.top, args.iters)


def _print_op_profile(trace_dir, top, iters):
    # The tensorboard_plugin_profile converter in this image is broken;
    # xplane_report parses the raw XSpace proto directly.
    import subprocess

    print(f"\n=== device op breakdown ({iters} iters traced) ===")
    for by in ("category", "op"):
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__),
                                     "xplane_report.py"),
                        trace_dir, "--top", str(top), "--by", by])


if __name__ == "__main__":
    main()
