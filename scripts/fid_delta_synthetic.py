"""FID-delta gate rehearsal with synthetic weights (BASELINE north star).

The published `network-snapshot-004408.pkl` is not available in this
container, so the "FID delta < 0.5 vs torch reference outputs" gate cannot
be run against the real checkpoint. This script runs the *entire rest of
the gate* end to end:

  1. build the torch reference GeneratorFull_v20 (with the reconstructed
     SynthesisLayer injected — the class is undefined in the reference
     repo, SURVEY.md §2.2) with a fixed seed;
  2. import its weights into the pasta_tpu Generator (io.torch_import —
     the exact path the published checkpoint would take via
     io/legacy_pkl.py);
  3. push all fixture pairs through OUR preprocessing (the inference CLI's
     host path) and run BOTH models on identical inputs (noise_mode=const);
  4. write both output folders and compute FID between them with the
     framework's own Inception/FID stack.

With the real checkpoint, only step 1's source changes (load the pickle
instead of seeding) — everything else is this code path.

Usage: python scripts/fid_delta_synthetic.py [--pairs 25] [--cpu]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REFERENCE_ROOT = "/root/reference"


def import_reference_networks():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import torch

    if torch.version.cuda is None:
        torch.version.cuda = "0.0"
    cwd = os.getcwd()
    os.chdir(REFERENCE_ROOT)
    try:
        from training import networks
    finally:
        os.chdir(cwd)
    return networks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=25)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--outdir", default="/tmp/fid_delta")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch
    import cv2

    ref_networks = import_reference_networks()
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tests"))
    from test_weight_import import _make_ref_synthesis_layer, nhwc

    # --- torch reference generator with a fixed seed ------------------------
    ref_networks.SynthesisLayer = _make_ref_synthesis_layer(ref_networks)
    torch.manual_seed(args.seed)
    g_ref = ref_networks.GeneratorFull_v20(
        z_dim=0, c_dim=512, w_dim=512, img_resolution=512, img_channels=3,
        mapping_kwargs=dict(num_layers=1),
        synthesis_kwargs=dict(channel_base=32768, channel_max=512,
                              num_fp16_res=0, conv_clamp=256)).eval()

    # --- import into pasta_tpu ----------------------------------------------
    from pasta_tpu.models import Generator
    from pasta_tpu.io import import_generator_state
    from pasta_tpu.io.torch_import import state_dict_to_numpy

    variables = import_generator_state(state_dict_to_numpy(g_ref))
    model = Generator()

    # --- fixture pairs through OUR preprocessing ----------------------------
    from pasta_tpu.data.testsets import TryonPairDataset, to_model_inputs

    ds = TryonPairDataset(os.path.join(REFERENCE_ROOT, "test_datas"),
                          "test_pairs.txt", mode="upper")
    n_pairs = min(args.pairs, len(ds))

    @jax.jit
    def fwd_jax(variables, inputs):
        img, finetune, parsing = model.apply(
            variables, noise_mode="const", **inputs)
        return img, finetune, parsing

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

    dir_a = os.path.join(args.outdir, "jax")
    dir_b = os.path.join(args.outdir, "torch")
    os.makedirs(dir_a, exist_ok=True)
    os.makedirs(dir_b, exist_ok=True)

    def save(d, i, img):
        u8 = np.clip((img + 1) * 127.5, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(d, f"{i:03d}.png"),
                    cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))

    worst = 0.0
    for i in range(n_pairs):
        batch = [ds[i]]
        inputs, _ = to_model_inputs(batch)
        inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
        img_j, ft_j, pp_j = (np.asarray(v) for v in fwd_jax(variables, inputs))
        img_t, ft_t, pp_t = fwd_ref(
            {k: np.asarray(v) for k, v in inputs.items()})
        save(dir_a, i, ft_j[0])
        save(dir_b, i, ft_t[0])
        err = float(np.max(np.abs(ft_j - ft_t)))
        err_img = float(np.max(np.abs(img_j - img_t)))
        # pixels whose predicted 7-class parsing argmax differs: with
        # random weights the logits are arbitrary and near-ties flip the
        # SPADE branch per pixel — the expected source of any large
        # finetune outliers (a trained parsing head is decisive).
        flips = int((pp_j.argmax(-1) != pp_t.argmax(-1)).sum())
        worst = max(worst, err)
        print(f"pair {i}: max |ft delta| = {err:.5f}  "
              f"max |img delta| = {err_img:.5f}  parsing flips = {flips}",
              flush=True)

    # --- FID between the two folders (framework metric stack). No
    # pretrained Inception ships in this container (zero egress), so the
    # detector is seeded-random — a deterministic feature space in which a
    # near-zero delta still certifies output equivalence; with the real
    # detector weights this is the canonical FID. ----------------------------
    from pasta_tpu.metrics.inception import random_inception_params
    from pasta_tpu.metrics.metric_main import DetectorRunner, calc_metric

    runner = DetectorRunner(random_inception_params(0), 4)
    record = calc_metric("fid", runner, dir_b, dir_a, run_dir=None)
    fid = float(list(record["results"].values())[0])
    print(f"\npairs: {n_pairs}   worst per-pixel |delta|: {worst:.5f}")
    print(f"FID(jax outputs, torch outputs) = {fid:.6f}  (gate: < 0.5)")


if __name__ == "__main__":
    main()
