"""Training CLI — flag surface mirrors the reference train.py.

    python -m pasta_tpu.cli.train --outdir runs --data <dir> --cfg fashion \
        --batch 32 --l1weight 10 --vgg_weight 20 --mask_weight 30

The reference's --gpus maps to --devices (size of the 1-D data mesh).
--dry-run constructs the full config + models without training
(train.py:434,551-553). training_options.json is written like the reference
(train.py:558-559).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import re


def _strict_bool(s):
    """Boolean flag parser that rejects unknown spellings (the reference
    accepts e.g. --remat=true via click's BOOL; a lambda s=="True" would
    silently read it as False)."""
    low = str(s).strip().lower()
    if low in ("true", "1", "yes", "y"):
        return True
    if low in ("false", "0", "no", "n"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {s!r}")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--outdir", required=True)
    p.add_argument("--data", required=True,
                   help="dataset root (image/ keypoints/ parsing/ garment_parsing/)")
    p.add_argument("--mirror", type=int, default=0,
                   help="augment dataset with x-flips (reference "
                        "train.py:44 --mirror)")
    p.add_argument("--subset", type=int, default=None,
                   help="train with only N images (reference train.py:43)")
    p.add_argument("--cfg", default="fashion", choices=["fashion", "smoke"])
    p.add_argument("--devices", "--gpus", type=int, default=None, dest="devices")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--kimg", type=int, default=None)
    p.add_argument("--gamma", type=float, default=None)
    p.add_argument("--l1weight", type=float, default=10.0)
    p.add_argument("--vgg_weight", type=float, default=20.0)
    p.add_argument("--mask_weight", type=float, default=30.0)
    p.add_argument("--pl_weight", type=float, default=0.0)
    p.add_argument("--contextual_weight", type=float, default=0.0)
    p.add_argument("--use_noise_const_branch", type=_strict_bool,
                   default=True)
    p.add_argument("--aug", default="ada", choices=["ada", "noaug", "fixed"])
    p.add_argument("--p", type=float, default=0.0, help="fixed augment p")
    p.add_argument("--target", type=float, default=0.6)
    p.add_argument("--resume", default=None)
    p.add_argument("--vgg19", default=None,
                   help="torchvision-format vgg19 .pth/.npz for the VGG loss")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--snap", type=int, default=10, help="snapshot ticks")
    p.add_argument("--max-steps", type=int, default=None,
                   help="hard step cap (smoke/debug)")
    p.add_argument("--step-mode", default="monolithic",
                   choices=["monolithic", "phases", "decomposed"],
                   help="step compilation granularity; 'decomposed' for "
                        "toolchains that cannot compile the fused 512px step")
    # Performance knobs (reference fp16 policy train.py:196-197; remat is
    # TPU-specific — fits the monolithic 512px step in one chip's HBM).
    p.add_argument("--d-bf16-res", type=int, default=3,
                   help="top-N D resolutions in bf16 (reference ships 3)")
    p.add_argument("--g-bf16-res", type=int, default=0,
                   help="top-N G synthesis resolutions in bf16 compute")
    p.add_argument("--remat", type=_strict_bool, default=True,
                   help="rematerialize synthesis blocks in backward "
                        "(True/False; default matches TrainConfig.remat)")
    p.add_argument("--remat-min-res", type=int, default=0,
                   help="only remat G blocks at resolution >= this "
                        "(small-res blocks store ~0.5GB at batch 8 but "
                        "skip their backward recompute)")
    p.add_argument("--spade-inner-remat", type=_strict_bool, default=None,
                   help="remat SPADE norms inside resblocks (True needed "
                        "for batch-16 HBM; default follows --remat)")
    p.add_argument("--d-remat", type=_strict_bool, default=None,
                   help="remat discriminator forwards (default follows "
                        "--remat)")
    p.add_argument("--vgg-remat", type=_strict_bool, default=None,
                   help="remat the VGG loss forward (default follows "
                        "--remat; False stores ~1GB of pyramids at b8 "
                        "but skips the backward recompute)")
    p.add_argument("--reuse-g-fakes", type=_strict_bool, default=False,
                   help="D/parsing-D phases consume Gmain's stop-gradient "
                        "fakes instead of a fresh no-grad G forward "
                        "(classic-GAN semantics; ~8%% faster step; off = "
                        "reference parity; implies "
                        "--strict-phase-noise False)")
    p.add_argument("--strict-phase-noise", type=_strict_bool, default=True,
                   help="fresh per-phase generator draws for the D/DP "
                        "phases (reference parity, default); False shares "
                        "one no-grad draw (faster, same distribution)")
    p.add_argument("--ada-impl", default="auto",
                   choices=["auto", "twopass", "gather"],
                   help="ADA geometric warp: TPU-native two-pass or the "
                        "bit-parity gather (auto: twopass on TPU)")
    p.add_argument("--loader-impl", default="host",
                   choices=["host", "device"],
                   help="training data loader: 'device' runs per-sample "
                        "warps/rasters on the accelerator (host keeps "
                        "decode + scalar geometry only)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="microbatch accumulation rounds per step")
    # Multi-host bootstrap (replaces the reference's file:// NCCL rendezvous,
    # train.py:394-401): pass the coordinator on every process of a pod.
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (jax.distributed)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--trace", default=None,
                   help="write a jax.profiler trace of the first steps to DIR")
    # In-training metric evaluation (reference --metrics, train.py:477-484 +
    # the snapshot-time metric hook, training_loop_fullbody.py:738-748).
    p.add_argument("--metrics", default="none",
                   help="comma-separated in-training metrics "
                        "(fid,kid,fid_tryon) or 'none'; evaluated on a "
                        "held-out set excluded from training")
    p.add_argument("--metric-ticks", type=int, default=10,
                   help="evaluate metrics every N ticks")
    p.add_argument("--metric-items", type=int, default=None,
                   help="held-out set size for metrics (these items are "
                        "excluded from the training sampler); default "
                        "cfg.metric_items (512 — a sized FID protocol)")
    p.add_argument("--metric-cache", default="~/.cache/pasta_tpu/metrics",
                   help="disk cache dir for held-out real detector stats "
                        "(reference metric_utils.py:180-228 semantics); "
                        "'none' disables")
    p.add_argument("--inception", default=None,
                   help="inception detector weights (.pth/.npz) for metrics")
    p.add_argument("--tryon-grid", type=int, default=0, metavar="K",
                   help="save a KxK cross-pair try-on grid (thirds "
                        "composition) at every snapshot")
    p.add_argument("--dry-run", action="store_true")
    return p.parse_args(argv)


def build_config(args):
    import jax

    from ..train.config import TrainConfig, smoke_config

    n_dev = args.devices or len(jax.devices())
    if args.cfg == "smoke":
        cfg = smoke_config(n_dev)
    else:
        cfg = TrainConfig(data_axis_size=n_dev)
    updates = dict(
        l1_weight=args.l1weight,
        vgg_weight=args.vgg_weight,
        mask_weight=args.mask_weight,
        pl_weight=args.pl_weight,
        contextual_weight=args.contextual_weight,
        use_noise=args.use_noise_const_branch,
        ada_target=args.target,
        use_ada=args.aug != "noaug",
        augment_p_init=args.p if args.aug == "fixed" else 0.0,
        step_mode=args.step_mode,
        ada_impl=args.ada_impl,
        loader_impl=args.loader_impl,
        d_num_bf16_res=args.d_bf16_res,
        g_num_bf16_res=args.g_bf16_res,
        remat=args.remat,
        remat_min_res=args.remat_min_res,
        spade_inner_remat=args.spade_inner_remat,
        d_remat=args.d_remat,
        vgg_remat=args.vgg_remat,
        reuse_g_fakes=args.reuse_g_fakes,
        strict_phase_noise=(args.strict_phase_noise
                            and not args.reuse_g_fakes),
        grad_accum=args.grad_accum,
    )
    if args.batch is not None:
        updates["batch_size"] = args.batch
    if args.kimg is not None:
        updates["total_kimg"] = args.kimg
    if args.gamma is not None:
        updates["r1_gamma"] = args.gamma
    return dataclasses.replace(cfg, **updates)


def next_run_dir(outdir, desc):
    """NNNNN-<desc> auto-numbering (reference train.py:526-533)."""
    os.makedirs(outdir, exist_ok=True)
    prev = [re.match(r"^(\d+)-", d) for d in os.listdir(outdir)]
    prev_ids = [int(m.group(1)) for m in prev if m]
    run_id = max(prev_ids, default=-1) + 1
    run_dir = os.path.join(outdir, f"{run_id:05d}-{desc}")
    os.makedirs(run_dir)
    return run_dir


def load_vgg_params(path):
    if path is None:
        return None
    import numpy as np

    from ..losses.vgg import import_vgg19_torch_state

    if path.endswith(".npz"):
        data = np.load(path)
        state = {k: data[k] for k in data.files}
    else:
        import torch

        state = {k: v.numpy() for k, v in
                 torch.load(path, map_location="cpu").items()}
    return import_vgg19_torch_state(state)


def _warmup_collectives():
    """Create the cross-process collective context while processes are in
    lockstep (just after jax.distributed.initialize).

    The first collective's communicator rendezvous has a short timeout
    (30s for the CPU backend's gloo); the first *training-step* execution
    can be minutes apart across processes when compiles are slow, so the
    communicator must exist before then. One tiny all-reduce over all
    global devices does it.
    """
    import numpy as np
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("data",))
    local = np.ones((len(jax.local_devices()), 1), np.float32)
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local)
    total = jax.jit(
        lambda a: a.sum(), out_shardings=NamedSharding(mesh, P()))(x)
    np.testing.assert_allclose(float(total), len(devs))
    print(f"collective warmup OK across {len(devs)} devices "
          f"({jax.process_count()} processes)", flush=True)


def main(argv=None):
    args = parse_args(argv)
    if args.coordinator is not None:
        import jax

        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)
        if (args.num_processes or 1) > 1:
            _warmup_collectives()
    cfg = build_config(args)

    pid = args.process_id or 0
    if pid == 0:
        run_dir = next_run_dir(
            args.outdir, f"{args.cfg}-b{cfg.batch_size}-d{cfg.data_axis_size}")
    else:
        # Non-chief processes keep their own scratch dir (log.txt tee etc.);
        # process 0 owns the canonical run dir.
        run_dir = os.path.join(args.outdir, f"proc{pid}")
        os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "training_options.json"), "w") as f:
        json.dump({**dataclasses.asdict(cfg), "args": vars(args)}, f, indent=2)
    print(f"run dir: {run_dir}")
    print(json.dumps(dataclasses.asdict(cfg), indent=2))

    if args.dry_run:
        print("dry run: config OK, exiting")
        return

    from ..data.trainsets import TryonTrainDataset
    from ..train.loop import training_loop

    dataset = TryonTrainDataset(args.data, seed=args.seed,
                                resolution=cfg.resolution,
                                loader_impl=cfg.loader_impl,
                                max_size=args.subset,
                                xflip=bool(args.mirror),
                                random_seed=args.seed)
    print(f"dataset: {len(dataset)} images from {args.data}")
    vgg_params = load_vgg_params(args.vgg19)
    if cfg.vgg_weight > 0 and vgg_params is None:
        print("WARNING: vgg_weight > 0 but no --vgg19 weights; "
              "VGG loss disabled")

    eval_metrics = tuple(
        m for m in args.metrics.split(",") if m and m != "none")
    detector_params = None
    if eval_metrics:
        from ..metrics.metric_main import load_detector

        assert args.inception is not None, "--metrics needs --inception"
        detector_params = load_detector(args.inception)
    metric_cache = None if args.metric_cache in (None, "none") \
        else os.path.expanduser(args.metric_cache)
    loop_kwargs = dict(
        vgg_params=vgg_params, resume_path=args.resume,
        num_workers=args.workers, snapshot_ticks=args.snap, seed=args.seed,
        eval_metrics=eval_metrics, eval_ticks=args.metric_ticks,
        eval_items=args.metric_items, detector_params=detector_params,
        tryon_grid_k=args.tryon_grid, metric_cache_dir=metric_cache)
    if args.trace:
        import jax

        with jax.profiler.trace(args.trace):
            training_loop(cfg, dataset, run_dir,
                          total_steps=args.max_steps or 3, **loop_kwargs)
    else:
        training_loop(cfg, dataset, run_dir, total_steps=args.max_steps,
                      **loop_kwargs)


if __name__ == "__main__":
    main()
