"""Time 512px training steps on the attached TPU chip.

Usage:
  python scripts/bench_train.py --mode monolithic --batch 4 --steps 20
  python scripts/bench_train.py --mode decomposed --bwd-chunk 2 --steps 20

Reports per-step wall time for regular and R1 steps, plus sec/kimg at the
given batch size. This is the round-2 profiling harness behind VERDICT item
2 (512px training throughput).
"""

import argparse
import os
import sys
import time

import numpy as np

# NB: do NOT use PYTHONPATH for this — it breaks the axon TPU plugin's
# sitecustomize registration in this container.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="monolithic",
                    choices=["monolithic", "phases", "decomposed"])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--bwd-chunk", type=int, default=0)
    ap.add_argument("--r1-batch-shrink", type=int, default=1)
    ap.add_argument("--d-bf16-res", type=int, default=0)
    ap.add_argument("--g-bf16-res", type=int, default=0)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat-min-res", type=int, default=0)
    ap.add_argument("--no-spade-inner-remat", action="store_true")
    ap.add_argument("--no-d-remat", action="store_true")
    ap.add_argument("--no-vgg-remat", action="store_true")
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--no-noise", action="store_true",
                    help="use_noise=False (A/B: per-layer RNG cost)")
    ap.add_argument("--no-ada", action="store_true",
                    help="use_ada=False (A/B: augment pipe cost)")
    ap.add_argument("--rbg", action="store_true",
                    help="use the rbg PRNG (faster than threefry on TPU)")
    ap.add_argument("--skip-r1", action="store_true",
                    help="time plain steps only (halves A/B compile time)")
    ap.add_argument("--no-vgg", action="store_true")
    ap.add_argument("--reuse-g-fakes", action="store_true",
                    help="D/DP consume Gmain's fakes (skips the shared "
                         "no-grad G forward; classic-GAN semantics; "
                         "implies --no-strict-phase-noise)")
    ap.add_argument("--no-strict-phase-noise", action="store_true",
                    help="one shared no-grad G draw feeds the D/DP phases "
                         "(opt-in optimization; default is the reference's "
                         "fresh per-phase draws)")
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    args = ap.parse_args()

    import jax

    if args.rbg:
        jax.config.update("jax_default_prng_impl", "rbg")
    from pasta_tpu.train.config import TrainConfig
    from pasta_tpu.train.state import init_state, example_batch

    cfg_kw = dict(
        resolution=args.res,
        batch_size=args.batch,
        data_axis_size=1,
        mbstd_group_size=min(4, args.batch),
        step_mode=args.mode,
        bwd_chunk=args.bwd_chunk,
        r1_batch_shrink=args.r1_batch_shrink,
        d_num_bf16_res=args.d_bf16_res,
        g_num_bf16_res=args.g_bf16_res,
        remat=args.remat,
        remat_min_res=args.remat_min_res,
        spade_inner_remat=False if args.no_spade_inner_remat else None,
        d_remat=False if args.no_d_remat else None,
        vgg_remat=False if args.no_vgg_remat else None,
        grad_accum=args.grad_accum,
        use_noise=not args.no_noise,
        use_ada=not args.no_ada,
        reuse_g_fakes=args.reuse_g_fakes,
        strict_phase_noise=not (args.no_strict_phase_noise
                                or args.reuse_g_fakes),
    )
    cfg = TrainConfig(**cfg_kw)

    vgg_params = None
    if not args.no_vgg:
        # Random-weight VGG19: the perceptual loss costs the same FLOPs
        # whether weights are trained or random.
        from pasta_tpu.losses.vgg import VGG19Features

        vgg_params = VGG19Features().init(
            jax.random.PRNGKey(0),
            np.zeros((1, args.res, args.res, 3), np.float32))

    if args.mode == "decomposed":
        from pasta_tpu.train.decomposed import make_decomposed_steps
        step = make_decomposed_steps(cfg, vgg_params=vgg_params)
    elif args.mode == "phases":
        from pasta_tpu.train.steps import make_phase_steps
        step = make_phase_steps(cfg, vgg_params=vgg_params)
    else:
        from pasta_tpu.train.steps import make_train_step
        step = make_train_step(cfg, vgg_params=vgg_params)

    print(f"devices: {jax.devices()}")
    t0 = time.time()
    state = init_state(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(state.g_params)
    print(f"init: {time.time() - t0:.1f}s")

    batch = {k: jax.numpy.asarray(v)
             for k, v in example_batch(cfg, np.random.RandomState(0)).items()}
    key = jax.random.PRNGKey(1)

    # NOTE: over the axon tunnel block_until_ready does NOT synchronize —
    # all timings below force a real device fetch (float()) instead.
    def sync(m):
        return float(m["d_loss"])

    # compile both variants
    t0 = time.time()
    state, m = step(state, batch, key, do_r1_d=False, do_r1_dp=False)
    sync(m)
    print(f"compile+run plain: {time.time() - t0:.1f}s")
    if not args.skip_r1:
        t0 = time.time()
        state, m = step(state, batch, key, do_r1_d=True, do_r1_dp=True)
        sync(m)
        print(f"compile+run r1: {time.time() - t0:.1f}s")

    if args.trace:
        jax.profiler.start_trace(args.trace)

    # Per-call sync timing (upper bound: includes tunnel round-trip).
    times_plain, times_r1 = [], []
    for i in range(args.steps):
        do_r1 = (i % cfg.d_reg_interval) == 0 and not args.skip_r1
        t0 = time.time()
        state, m = step(state, batch, key, do_r1_d=do_r1, do_r1_dp=do_r1)
        sync(m)
        dt = time.time() - t0
        (times_r1 if do_r1 else times_plain).append(dt)

    # Pipelined timing (the real training loop's regime: steps are
    # dispatched back-to-back, metrics fetched once per tick — async
    # dispatch hides the per-call tunnel latency).
    t0 = time.time()
    for i in range(args.steps):
        do_r1 = (i % cfg.d_reg_interval) == 0 and not args.skip_r1
        state, m = step(state, batch, key, do_r1_d=do_r1, do_r1_dp=do_r1)
    sync(m)
    dt_pipe = (time.time() - t0) / args.steps

    if args.trace:
        jax.profiler.stop_trace()

    tp = float(np.median(times_plain)) if times_plain else float("nan")
    tr = float(np.median(times_r1)) if times_r1 else float("nan")
    amortized = (tp * (cfg.d_reg_interval - 1) + tr) / cfg.d_reg_interval
    print(f"median plain step (sync): {tp * 1e3:.0f} ms")
    print(f"median r1 step (sync):    {tr * 1e3:.0f} ms")
    print(f"amortized (sync): {amortized * 1e3:.0f} ms/step")
    print(f"pipelined: {dt_pipe * 1e3:.0f} ms/step "
          f"({dt_pipe / args.batch * 1e3:.0f} ms/img, "
          f"{dt_pipe / args.batch * 1e6 / 1e3:.1f} sec/kimg/chip, "
          f"{args.batch / dt_pipe:.2f} img/s/chip)")


if __name__ == "__main__":
    main()
