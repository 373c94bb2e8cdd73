"""Capture a jax.profiler trace of train steps and print the top TPU ops.

Usage: python scripts/profile_step.py [--batch 4] [--steps 2] [bench flags]
Writes the trace under /tmp/pasta_trace and prints an op-level breakdown via
tensorboard_plugin_profile (no UI needed).
"""

import argparse
import glob
import os
import sys
import time

# tensorboard_plugin_profile ships pre-gencode _pb2 files that the installed
# protobuf rejects under the C++ backend; the pure-python backend accepts
# them (slower parse, fine for offline trace post-processing).
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--trace-dir", default="/tmp/pasta_trace")
    ap.add_argument("--d-bf16-res", type=int, default=3)
    ap.add_argument("--g-bf16-res", type=int, default=3)
    ap.add_argument("--no-ada", action="store_true")
    ap.add_argument("--no-noise", action="store_true")
    ap.add_argument("--rbg", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax

    if args.rbg:
        jax.config.update("jax_default_prng_impl", "rbg")
    from pasta_tpu.train.config import TrainConfig
    from pasta_tpu.train.state import init_state, example_batch
    from pasta_tpu.train.steps import make_train_step
    from pasta_tpu.losses.vgg import VGG19Features

    cfg = TrainConfig(
        resolution=512, batch_size=args.batch, data_axis_size=1,
        mbstd_group_size=min(4, args.batch), remat=True,
        d_num_bf16_res=args.d_bf16_res, g_num_bf16_res=args.g_bf16_res,
        r1_batch_shrink=2, use_ada=not args.no_ada,
        use_noise=not args.no_noise)
    vgg_params = VGG19Features().init(
        jax.random.PRNGKey(0), np.zeros((1, 512, 512, 3), np.float32))
    step = make_train_step(cfg, vgg_params=vgg_params)

    state = init_state(cfg, jax.random.PRNGKey(0))
    batch = {k: jax.numpy.asarray(v)
             for k, v in example_batch(cfg, np.random.RandomState(0)).items()}
    key = jax.random.PRNGKey(1)
    state, m = step(state, batch, key)        # compile
    print("warm:", float(m["d_loss"]))

    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.steps):
        state, m = step(state, batch, key)
    print("traced:", float(m["d_loss"]))
    jax.profiler.stop_trace()

    _print_op_profile(args.trace_dir, args.top)


def _print_op_profile(trace_dir, top):
    # tensorboard_plugin_profile's converter is broken in this image
    # (xspace_to_tools_data wrapper mismatch); xplane_report parses the
    # XSpace proto directly.
    import xplane_report

    xspace = xplane_report.load_xspace(trace_dir)
    print("\n=== top ops by self-time (xplane_report) ===")
    xplane_report.analyze(xspace, by="op", top=top)
    print("\n=== by category ===")
    xplane_report.analyze(xspace, by="category", top=12)


if __name__ == "__main__":
    main()
