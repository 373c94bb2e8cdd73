"""A/B: ADA geometric-warp implementation (gather oracle vs TPU two-pass).

The two-pass warp (ops/affine_warp.py) composes two linear interpolations
(hat*hat softening) and clamps extreme parameter tails, so it is not
bit-identical to the gather oracle. This experiment certifies "equivalent
augmentation quality": run the same smoke training config N steps with each
implementation (identical seeds/data) and compare the ada_p controller and
loss trajectories.

Results are written as a small markdown table to stdout; paste into
ops/affine_warp.py's caveat note / ROADMAP.

Usage: python scripts/ada_ab_compare.py --steps 300 [--res 128 --batch 8]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(impl, steps, res, batch, report_every, channel_base=32768,
        cpu=False):
    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    from pasta_tpu.train.config import TrainConfig
    from pasta_tpu.train.state import init_state, example_batch
    from pasta_tpu.train.steps import make_train_step

    cfg = TrainConfig(
        resolution=res, batch_size=batch, data_axis_size=1,
        channel_base=channel_base, channel_max=min(512, channel_base // 4),
        mbstd_group_size=min(4, batch), remat=True,
        d_num_bf16_res=3, g_num_bf16_res=3, r1_batch_shrink=2,
        use_ada=True, ada_impl=impl,
        # fast ADA adaptation so the controller trajectory is informative
        # over a short run (reference --ada-kimg semantics)
        ada_interval=4, ada_kimg=10)
    step = make_train_step(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batches = [
        {k: jax.numpy.asarray(v)
         for k, v in example_batch(cfg, rng).items()}
        for _ in range(4)
    ]  # a little data variety, identical across impls
    rows = []
    t0 = time.time()
    for i in range(steps):
        key = jax.random.PRNGKey(1000 + i)  # identical key schedule per impl
        do_r1 = (i % cfg.d_reg_interval) == 0
        state, m = step(state, batches[i % len(batches)], key,
                        do_r1_d=do_r1, do_r1_dp=do_r1)
        if (i + 1) % report_every == 0 or i == steps - 1:
            rows.append({
                "step": i + 1,
                "ada_p": float(m["ada_p"]),
                "d_loss": float(m["d_loss"]),
                "g_loss": float(m["g_loss"]),
                "real_signs": float(m.get("real_signs", np.nan)),
            })
            print(f"[{impl}] step {i + 1}: ada_p {rows[-1]['ada_p']:.4f} "
                  f"d {rows[-1]['d_loss']:.3f} g {rows[-1]['g_loss']:.3f}",
                  flush=True)
    print(f"[{impl}] {steps} steps in {time.time() - t0:.0f}s", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--report-every", type=int, default=25)
    ap.add_argument("--channel-base", type=int, default=32768,
                    help="model width (use e.g. 2048 for a CPU-runnable "
                         "smoke model; the augment path is unaffected)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (twopass runs the Pallas "
                         "kernels in interpret mode)")
    args = ap.parse_args()

    results = {}
    for impl in ("gather", "twopass"):
        results[impl] = run(impl, args.steps, args.res, args.batch,
                            args.report_every,
                            channel_base=args.channel_base, cpu=args.cpu)

    print("\n| step | ada_p gather | ada_p twopass | d gather | d twopass "
          "| g gather | g twopass |")
    print("|---|---|---|---|---|---|---|")
    for a, b in zip(results["gather"], results["twopass"]):
        print(f"| {a['step']} | {a['ada_p']:.4f} | {b['ada_p']:.4f} "
              f"| {a['d_loss']:.3f} | {b['d_loss']:.3f} "
              f"| {a['g_loss']:.3f} | {b['g_loss']:.3f} |")

    pa = np.array([r["ada_p"] for r in results["gather"]])
    pb = np.array([r["ada_p"] for r in results["twopass"]])
    da = np.array([r["d_loss"] for r in results["gather"]])
    db = np.array([r["d_loss"] for r in results["twopass"]])
    print(f"\nmax |ada_p delta| = {np.max(np.abs(pa - pb)):.4f}  "
          f"(final {pa[-1]:.4f} vs {pb[-1]:.4f})")
    print(f"d_loss mean delta = {np.mean(da - db):+.4f} "
          f"(|mean| gather {np.mean(np.abs(da)):.3f})")


if __name__ == "__main__":
    main()
