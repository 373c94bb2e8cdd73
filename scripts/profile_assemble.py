"""Trace the assemble-only (warp) serving stage and print the op breakdown."""

import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scripts.serve_ab import fixture_host_batch, perturb
    from pasta_tpu.serving import assemble_inputs_device, ingest_device

    iters = int(os.environ.get("PASTA_PROF_ITERS", "20"))
    stage = os.environ.get("PASTA_PROF_STAGE", "assemble")
    warp_impl = os.environ.get("PASTA_BENCH_WARP", "auto")
    trace_dir = f"/tmp/pasta_{stage}_trace"

    host_batch, tiled, cut_windowed = fixture_host_batch(8)
    f32 = jax.block_until_ready(ingest_device(host_batch))

    def assemble(fb):
        return assemble_inputs_device(fb, "upper", tiled=tiled,
                                      warp_impl=warp_impl,
                                      cut_windowed=cut_windowed)

    if stage == "assemble":
        def body(acc, fb):
            out = assemble(perturb(fb, acc))
            return acc + sum(jnp.mean(v) for v in out.values() if v.size)

        arg = f32
    else:  # forward
        from pasta_tpu.models import Generator

        model = Generator(num_bf16_res=int(
            os.environ.get("PASTA_BENCH_G_BF16", "3")))
        inputs0 = jax.block_until_ready(jax.jit(assemble)(f32))
        variables = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0),
             "noise": jax.random.PRNGKey(1)}, **inputs0)

        def body(acc, inp):
            img, ft, parsing = model.apply(
                variables, noise_mode="const", **perturb(inp, acc))
            return acc + jnp.mean(ft)

        arg = inputs0

    @jax.jit
    def loop(a):
        return jax.lax.fori_loop(0, iters, lambda i, acc: body(acc, a), 0.0)

    print("warm:", float(loop(arg)))
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    print("traced:", float(loop(arg)))
    jax.profiler.stop_trace()

    import subprocess

    for by in ("category", "op"):
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__),
                                     "xplane_report.py"),
                        trace_dir, "--top", "25", "--by", by])


if __name__ == "__main__":
    main()
