"""Train-step FLOP/byte audit vs the measured conv-emitter rate.

Compiles the monolithic 512px train step (plain and R1 variants) and
prints XLA cost analysis — total FLOPs and HBM bytes — then the
speed-of-light step time at the conv-emitter rate measured by
scripts/probe_int8_conv.py (~44-48 TFLOP/s for this model's conv shapes
on the v5e) and at the bf16 MXU peak. Answers whether the ROADMAP's
>=10 img/s/chip target is reachable on this part or the measured
5.9 img/s is already near the wall.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--g-bf16-res", type=int, default=7)
    ap.add_argument("--d-bf16-res", type=int, default=7)
    ap.add_argument("--conv-rate-tflops", type=float, default=46.0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pasta_tpu.losses.vgg import VGG19Features
    from pasta_tpu.train.config import TrainConfig
    from pasta_tpu.train.state import init_state, example_batch
    from pasta_tpu.train.steps import make_train_step

    cfg = TrainConfig(
        resolution=512, batch_size=args.batch, data_axis_size=1,
        mbstd_group_size=min(4, args.batch), remat=True,
        g_num_bf16_res=args.g_bf16_res, d_num_bf16_res=args.d_bf16_res)
    vgg_params = VGG19Features().init(
        jax.random.PRNGKey(0), np.zeros((1, 512, 512, 3), np.float32))
    step = make_train_step(cfg, vgg_params=vgg_params)

    state = init_state(cfg, jax.random.PRNGKey(0))
    batch = {k: jax.numpy.asarray(v)
             for k, v in example_batch(cfg, np.random.RandomState(0)).items()}
    key = jax.random.PRNGKey(1)

    for name, kw in (("plain", dict(do_r1_d=False, do_r1_dp=False)),
                     ("r1", dict(do_r1_d=True, do_r1_dp=True))):
        lowered = step.lower(state, batch, key, **kw)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        gbytes = float(ca.get("bytes accessed", float("nan"))) / 1e9
        sol_conv = flops / (args.conv_rate_tflops * 1e12)
        sol_peak = flops / 197e12
        sol_hbm = gbytes / 819.0
        print(json.dumps({
            "variant": name, "batch": args.batch,
            "tflops_per_step": round(flops / 1e12, 2),
            "hbm_gb_per_step": round(gbytes, 1),
            "sol_at_conv_rate_ms": round(sol_conv * 1e3, 0),
            "sol_at_bf16_peak_ms": round(sol_peak * 1e3, 0),
            "sol_at_hbm_bw_ms": round(sol_hbm * 1e3, 0),
            "img_per_s_at_conv_rate": round(args.batch / sol_conv, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
