"""FID/KID-delta gate vs torch reference outputs (BASELINE north star #2).

The published `network-snapshot-004408.pkl` is not in this container, so the
shared weights come from a seeded reference-source build — but unlike
fid_delta_synthetic.py this runs the FULL published-checkpoint path:

  1. build the torch reference GeneratorFull_v20 at the published config
     (channel_base 32768 / channel_max 512, training/networks.py:2345-2366)
     inside a persistence module (torch_utils/persistence.py) and write a
     reference-format network snapshot pickle
     (training_loop_fullbody.py:721-736 layout);
  2. import that pickle with io/legacy_pkl.load_reference_pickle_generator
     — byte-for-byte the code path the published checkpoint would take;
  3. run BOTH stacks (torch CPU reference, pasta_tpu jax) over the fixture
     pairs on identical host-preprocessed inputs (noise_mode=const);
  4. write both output folders, per-image max-abs deltas, and FID + KID
     between the folders with the framework's own metric stack.

No pretrained Inception ships here (zero egress): the detector is
seeded-random — a deterministic feature space in which a near-zero delta
still certifies output equivalence; with real detector weights
(--detector) this is the canonical FID.

Writes FID_DELTA.json into --outdir (and prints it).

Usage:
  python scripts/fid_delta_gate.py [--pairs 25] [--jax-cpu] \
      [--outdir /tmp/fid_gate] [--report FID_DELTA_r04.json]
"""

import argparse
import copy
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REFERENCE_ROOT = "/root/reference"


def build_reference_pickle(path, seed):
    """Seeded full-config reference snapshot in persistence format."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import pickle

    import torch

    if torch.version.cuda is None:
        torch.version.cuda = "0.0"
    cwd = os.getcwd()
    os.chdir(REFERENCE_ROOT)
    try:
        from training import networks as ref_networks
        from torch_utils import persistence

        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests"))
        from test_legacy_pickle import _SYNTH_LAYER_SRC

        src = persistence._module_to_src(ref_networks)
        mod = persistence._src_to_module(src + _SYNTH_LAYER_SRC)
    finally:
        os.chdir(cwd)

    for name, obj in list(vars(mod).items()):
        if (isinstance(obj, type) and issubclass(obj, torch.nn.Module)
                and obj.__module__ == mod.__name__
                and not persistence.is_persistent(obj)):
            setattr(mod, name, persistence.persistent_class(obj))

    torch.manual_seed(seed)
    G = mod.GeneratorFull_v20(
        z_dim=0, c_dim=512, w_dim=512, img_resolution=512, img_channels=3,
        mapping_kwargs=dict(num_layers=1),
        synthesis_kwargs=dict(channel_base=32768, channel_max=512,
                              num_fp16_res=0, conv_clamp=256,
                              use_noise=True)).eval()
    G_ema = copy.deepcopy(G)
    snapshot_data = dict(
        training_set_kwargs=dict(
            class_name="training.dataset.UvitonDatasetFull_512",
            path="/data", use_labels=False),
        G=G, G_ema=G_ema, D=None, D_parsing=None, augment_pipe=None)
    with open(path, "wb") as f:
        pickle.dump(snapshot_data, f)
    return G_ema


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=25)
    ap.add_argument("--outdir", default="/tmp/fid_gate")
    ap.add_argument("--jax-cpu", action="store_true",
                    help="run the jax side on CPU (bit-parity surface) "
                         "instead of the TPU (fast; ~3e-3 conv numerics)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--detector", default=None,
                    help="real inception weights (.npz/.pth); default "
                         "seeded-random (zero-egress container)")
    ap.add_argument("--report", default=None,
                    help="also write the JSON report to this path")
    ap.add_argument("--g-bf16-res", type=int, default=0,
                    help="run the jax generator's top-N blocks in bf16 "
                         "(the benched serving numerics; 0 = fp32 parity)")
    ap.add_argument("--serving", action="store_true",
                    help="jax side runs the PRODUCTION serving program "
                         "(device conditioning + matmul warps + on-device "
                         "assemble, bench.py's path) instead of the "
                         "host-preprocessed model.apply — certifies the "
                         "shipping numerics end to end")
    args = ap.parse_args()

    import jax

    if args.jax_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch
    import cv2

    os.makedirs(args.outdir, exist_ok=True)
    pkl_path = os.path.join(args.outdir, "network-snapshot-synthetic.pkl")
    print("building reference-format snapshot (full 512 config)...",
          flush=True)
    g_ref = build_reference_pickle(pkl_path, args.seed)
    print(f"wrote {pkl_path} ({os.path.getsize(pkl_path) / 1e6:.0f} MB)",
          flush=True)

    # --- import via the published-checkpoint path ---------------------------
    from pasta_tpu.io.legacy_pkl import load_reference_pickle_generator
    from pasta_tpu.models import Generator

    variables = load_reference_pickle_generator(pkl_path)
    model = Generator(num_bf16_res=args.g_bf16_res)

    # --- fixture pairs through OUR preprocessing ----------------------------
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_weight_import import nhwc

    from pasta_tpu.data.testsets import TryonPairDataset, to_model_inputs

    ds = TryonPairDataset(os.path.join(REFERENCE_ROOT, "test_datas"),
                          "test_pairs.txt", mode="upper")
    n_pairs = min(args.pairs, len(ds))

    @jax.jit
    def fwd_jax(variables, inputs):
        img, finetune, parsing = model.apply(
            variables, noise_mode="const", **inputs)
        return img, finetune, parsing

    serve_fwd = None
    if args.serving:
        # Production serving program: raw fixture planes -> device
        # conditioning -> uint8 ingest -> matmul warps/erosion -> assemble
        # -> generator forward (the exact program bench.py times).
        import functools

        from pasta_tpu.data import preprocess as pp
        from pasta_tpu.serving import (host_prepare, ingest_device,
                                       assemble_inputs_device)

        @functools.partial(jax.jit, static_argnames=("tiled", "windowed"))
        def _serve_run(variables, batch, tiled, windowed):
            inputs = assemble_inputs_device(
                ingest_device(batch), "upper", tiled=tiled,
                warp_impl="auto", cut_windowed=windowed)
            img, finetune, parsing = model.apply(
                variables, noise_mode="const", **inputs)
            return (img.astype(jnp.float32), finetune.astype(jnp.float32),
                    parsing.astype(jnp.float32))

        def serve_fwd(pair):
            clothes_name, person_name = pair
            root = os.path.join(REFERENCE_ROOT, "test_datas")
            person = pp.load_person(root, person_name, pose_raster="device")
            clothes = pp.load_person(root, clothes_name,
                                     with_garment_parsing=True)
            item = host_prepare(person, clothes, "upper", cond="device")
            tiled = bool(item["tiles_fit"])
            windowed = tiled and bool(item["cut_fits"])
            batch = {k: jnp.asarray(np.asarray(v)[None])
                     for k, v in item.items()
                     if k not in ("tiles_fit", "cut_fits")}
            return _serve_run(variables, batch, tiled, windowed)

    def fwd_ref(inputs):
        def t(x):
            a = np.asarray(x, np.float32)
            return torch.from_numpy(
                a.transpose(0, 3, 1, 2) if a.ndim == 4 else a)

        with torch.no_grad():
            img, finetune, parsing = g_ref(
                t(inputs["z"]), t(inputs["c"]), t(inputs["retain"]),
                t(inputs["pose"]), t(inputs["denorm_upper_input"]),
                t(inputs["denorm_lower_input"]),
                t(inputs["denorm_upper_mask"]),
                t(inputs["denorm_lower_mask"]), None, noise_mode="const")
        return (nhwc(img.numpy()), nhwc(finetune.numpy()),
                nhwc(parsing.numpy()))

    dir_j = os.path.join(args.outdir, "jax")
    dir_t = os.path.join(args.outdir, "torch")
    os.makedirs(dir_j, exist_ok=True)
    os.makedirs(dir_t, exist_ok=True)

    def save(d, i, img):
        u8 = np.clip((img + 1) * 127.5, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(d, f"{i:03d}.png"),
                    cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))

    raw_pairs = None
    if args.serving:
        with open(os.path.join(REFERENCE_ROOT, "test_datas",
                               "test_pairs.txt")) as f:
            raw_pairs = [ln.split() for ln in f if ln.strip()]

    per_image = []
    for i in range(n_pairs):
        inputs, _ = to_model_inputs([ds[i]])
        if serve_fwd is not None:
            img_j, ft_j, pp_j = (np.asarray(v)
                                 for v in serve_fwd(raw_pairs[i]))
        else:
            inputs_j = {k: jnp.asarray(v) for k, v in inputs.items()}
            img_j, ft_j, pp_j = (np.asarray(v)
                                 for v in fwd_jax(variables, inputs_j))
        img_t, ft_t, pp_t = fwd_ref(inputs)
        save(dir_j, i, ft_j[0])
        save(dir_t, i, ft_t[0])
        rec = dict(
            pair=i,
            max_abs_finetune=float(np.max(np.abs(ft_j - ft_t))),
            max_abs_img=float(np.max(np.abs(img_j - img_t))),
            parsing_flips=int(
                (pp_j.argmax(-1) != pp_t.argmax(-1)).sum()),
        )
        per_image.append(rec)
        print(f"pair {i}: max |ft delta| = {rec['max_abs_finetune']:.5f}  "
              f"max |img delta| = {rec['max_abs_img']:.5f}  "
              f"parsing flips = {rec['parsing_flips']}", flush=True)

    # --- FID + KID between the folders (framework metric stack) -------------
    from pasta_tpu.metrics.metric_main import DetectorRunner, calc_metric

    if args.detector:
        from pasta_tpu.metrics.metric_main import load_detector

        params = load_detector(args.detector)
        detector = os.path.basename(args.detector)
    else:
        from pasta_tpu.metrics.inception import random_inception_params

        params = random_inception_params(0)
        detector = "seeded-random (zero-egress)"
    runner = DetectorRunner(params, 4)
    fid = calc_metric("fid", runner, dir_t, dir_j)["results"]["fid"]
    kid = calc_metric("kid", runner, dir_t, dir_j)["results"]["kid"]

    report = dict(
        gate="FID delta vs torch reference outputs (BASELINE north star)",
        weights="seeded reference-source snapshot via persistence pickle "
                f"(published pkl absent; seed={args.seed}, full 512 config)",
        pickle_import_path="io/legacy_pkl.load_reference_pickle_generator",
        n_pairs=n_pairs, detector=detector,
        jax_backend="cpu" if args.jax_cpu else jax.devices()[0].platform,
        g_bf16_res=args.g_bf16_res,
        jax_path=("serving program (device cond + matmul warps + assemble)"
                  if args.serving else "host-preprocessed model.apply"),
        fid_delta=float(fid), kid_delta=float(kid),
        threshold=0.5, passed=bool(fid < 0.5),
        max_abs_finetune=max(r["max_abs_finetune"] for r in per_image),
        per_image=per_image,
    )
    out_json = os.path.join(args.outdir, "FID_DELTA.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "per_image"},
                     indent=2))


if __name__ == "__main__":
    main()
