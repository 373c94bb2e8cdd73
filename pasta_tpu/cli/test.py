"""Try-on inference CLI — flag-compatible with the reference test.py.

Usage (mirrors /root/reference/test.py:48-61 and test.sh):
    python -m pasta_tpu.cli.test --network <ckpt> --dataroot <dir> \
        --testtxt test_pairs.txt --testpart upper --batchsize 1 --outdir out

Writes one composite PNG per pair, `<person>___<clothes>.png`: the center
crop (cols 96:416) of [clothes | person | generated] side by side
(test.py:162-184). With no --network, runs a randomly initialized generator
(pipeline smoke / visual debugging of the data path).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--network", default=None,
                   help="checkpoint: orbax dir / .npz / reference torch pickle")
    p.add_argument("--dataroot", required=True)
    p.add_argument("--testtxt", default="test_pairs.txt")
    p.add_argument("--testpart", default="upper",
                   choices=["upper", "lower", "full"])
    p.add_argument("--batchsize", type=int, default=1)
    p.add_argument("--outdir", default="test_results")
    p.add_argument("--use-sleeve-mask", dest="use_sleeve_mask",
                   action="store_true", default=True)
    p.add_argument("--no-sleeve-mask", dest="use_sleeve_mask",
                   action="store_false")
    p.add_argument("--g-bf16-res", type=int, default=0,
                   help="run the generator's top-N-resolution blocks in "
                        "bf16 (0 = fp32, the reference inference numerics)")
    p.add_argument("--noise-mode", default="const",
                   choices=["const", "random", "none"])
    p.add_argument("--pipeline", default="parity",
                   choices=["parity", "serving"],
                   help="'parity' = host preprocessing (bit-matches the "
                        "reference data path); 'serving' = the production "
                        "TryonPipeline (device conditioning + warps, "
                        "matmul warps on TPU — fastest)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def load_generator_variables(model, network_path, example_inputs):
    """Resolve a checkpoint path into flax variables (or random init)."""
    import jax

    if network_path is None:
        # jit the init: eager init dispatches thousands of individual ops
        # (minutes over the remote-TPU tunnel); one compiled program is fast.
        return jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            **example_inputs)
    if network_path.endswith(".npz"):
        from ..io.npz_ckpt import load_npz_variables

        return load_npz_variables(network_path)
    if network_path.endswith(".pkl"):
        from ..io.legacy_pkl import load_reference_pickle_generator

        return load_reference_pickle_generator(network_path)
    from ..io.checkpoint import load_checkpoint_variables

    return load_checkpoint_variables(network_path)


def _write_composites(outdir, gen, person_imgs, clothes_imgs, person_names,
                      clothes_names):
    """[clothes | person | generated] center-crop composites
    (test.py:162-184 layout, RGB->BGR files)."""
    import cv2

    for i in range(len(person_names)):
        gen_img = np.clip((gen[i] + 1) * 127.5, 0, 255).astype(np.uint8)
        result = np.concatenate(
            [clothes_imgs[i][:, 96:416], person_imgs[i][:, 96:416],
             gen_img[:, 96:416]], axis=1)
        person_n = os.path.basename(person_names[i])
        clothes_n = os.path.basename(clothes_names[i])
        save_name = f"{person_n[:-4]}___{clothes_n[:-4]}.png"
        cv2.imwrite(os.path.join(outdir, save_name), result[..., ::-1])


def _run_serving(args, dataset, model):
    """Production-path inference: TryonPipeline (device conditioning +
    warps; one ingest + one warp/forward program per batch)."""
    import jax
    import jax.numpy as jnp

    from ..data import preprocess as pp
    from ..serving import (TryonPipeline, assemble_inputs_device,
                           host_prepare, ingest_device)

    mode = args.testpart

    def load_pair(person_name, clothes_name):
        person = pp.load_person(
            dataset.root, person_name, pose_raster="device",
            with_garment_parsing=(args.use_sleeve_mask and mode == "lower"))
        clothes = pp.load_person(
            dataset.root, clothes_name,
            with_garment_parsing=(args.use_sleeve_mask and mode != "lower"))
        return person, clothes

    pipe = None
    n_done = 0
    t0 = time.time()
    for start in range(0, len(dataset), args.batchsize):
        pairs = [dataset.pairs[i]
                 for i in range(start,
                                min(start + args.batchsize, len(dataset)))]
        n_real = len(pairs)
        recs = [load_pair(pn, cn) for pn, cn in pairs]
        items = [host_prepare(p, c, mode, args.use_sleeve_mask,
                              cond="device") for p, c in recs]
        while len(items) < args.batchsize:
            items.append(items[-1])
        if pipe is None:
            # variables init from the first real batch (no duplicate prep)
            batch0 = {k: jnp.asarray(np.stack([it[k] for it in items]))
                      for k in items[0]
                      if k not in ("tiles_fit", "cut_fits")}
            variables = load_generator_variables(
                model, args.network,
                assemble_inputs_device(ingest_device(batch0), mode))
            pipe = TryonPipeline(variables, mode=mode, model=model,
                                 noise_mode=args.noise_mode, cond="device",
                                 seed=args.seed)
        gen = np.asarray(pipe.run_batch(items))
        _write_composites(
            args.outdir, gen,
            [p.image for p, _ in recs], [c.image for _, c in recs],
            [pn for pn, _ in pairs], [cn for _, cn in pairs])
        n_done += n_real
    dt = time.time() - t0
    print(f"finished: {n_done} images -> {args.outdir} "
          f"({n_done / max(dt, 1e-9):.2f} img/s incl. preprocessing)")


def main(argv=None):
    args = parse_args(argv)
    import cv2
    import jax
    import jax.numpy as jnp

    from ..models import Generator
    from ..data.testsets import TryonPairDataset, to_model_inputs

    os.makedirs(args.outdir, exist_ok=True)
    dataset = TryonPairDataset(
        args.dataroot, args.testtxt, mode=args.testpart,
        use_sleeve_mask=args.use_sleeve_mask)
    print(f"{len(dataset)} pairs, part={args.testpart}")

    model = Generator(num_bf16_res=args.g_bf16_res)
    if args.pipeline == "serving":
        _run_serving(args, dataset, model)
        return

    first_batch = [dataset[i] for i in range(min(args.batchsize, len(dataset)))]
    inputs0, _ = to_model_inputs(first_batch)
    inputs0 = {k: jnp.asarray(v) for k, v in inputs0.items()}
    variables = load_generator_variables(model, args.network, inputs0)

    @jax.jit
    def forward(variables, inputs, noise_key):
        img, finetune, parsing = model.apply(
            variables, rngs={"noise": noise_key},
            noise_mode=args.noise_mode, **inputs)
        return finetune

    key = jax.random.PRNGKey(args.seed)
    n_done = 0
    t0 = time.time()
    for start in range(0, len(dataset), args.batchsize):
        items = [dataset[i]
                 for i in range(start, min(start + args.batchsize, len(dataset)))]
        # Static batch shape for jit: pad the tail batch.
        n_real = len(items)
        while len(items) < args.batchsize:
            items.append(items[-1])
        inputs, extras = to_model_inputs(items)
        inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
        key, sub = jax.random.split(key)
        gen = np.asarray(forward(variables, inputs, sub))

        _write_composites(
            args.outdir, gen,
            [((extras["image"][i] + 1) * 127.5).astype(np.uint8)
             for i in range(n_real)],
            [((extras["clothes"][i] + 1) * 127.5).astype(np.uint8)
             for i in range(n_real)],
            extras["person_names"][:n_real], extras["clothes_names"][:n_real])
        n_done += n_real
    dt = time.time() - t0
    print(f"finished: {n_done} images -> {args.outdir} "
          f"({n_done / max(dt, 1e-9):.2f} img/s incl. preprocessing)")


if __name__ == "__main__":
    main()
