"""Metric runner CLI (reference calc_metrics.py:87-95 flag surface, adapted
to the folder-vs-folder evaluation that the try-on pipeline actually uses).

    python -m pasta_tpu.cli.calc_metrics --metrics fid,kid \
        --real <dir of real images> --gen <dir of generated composites> \
        --detector inception.npz [--crop-generated]

--crop-generated extracts the generated panel (cols 2/3 of the
[clothes|person|generated] composite) before feature extraction.
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--metrics", default="fid",
                   help="comma-separated: fid,kid,inception_score,pr,ppl")
    p.add_argument("--real", default=None,
                   help="dir of real images (unused by ppl)")
    p.add_argument("--gen", default=None,
                   help="dir of generated images (unused by ppl)")
    # ppl-only inputs: ppl synthesizes along the style interpolation path
    # instead of reading folders (reference ppl2_wend analogue).
    p.add_argument("--network", default=None,
                   help="[ppl] generator checkpoint (orbax dir/.npz/.pkl; "
                        "omit for random init)")
    p.add_argument("--dataroot", default=None,
                   help="[ppl] test data root with the condition pairs")
    p.add_argument("--testtxt", default="test_pairs.txt")
    p.add_argument("--testpart", default="upper",
                   choices=["upper", "lower", "full"])
    p.add_argument("--ppl-items", type=int, default=8,
                   help="[ppl] number of condition pairs to interpolate")
    p.add_argument("--detector", required=True,
                   help="inception_v3 weights (.npz or torch .pth)")
    p.add_argument("--vgg16-detector", default=None,
                   help="torchvision vgg16 weights; when given, `pr` uses "
                        "VGG16 fc7 features (the reference PR detector) "
                        "instead of inception features")
    p.add_argument("--max-items", type=int, default=None)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--run-dir", default=None)
    p.add_argument("--crop-generated", action="store_true",
                   help="use the right third of composite images as gen input")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..metrics.metric_main import (
        DetectorRunner, calc_metric, is_valid_metric, list_metrics,
        load_detector, load_vgg16_detector)

    metrics = [m.strip() for m in args.metrics.split(",") if m.strip()]
    for m in metrics:
        if not is_valid_metric(m):
            raise SystemExit(f"unknown metric '{m}'; valid: {list_metrics()}")
    runner = DetectorRunner(load_detector(args.detector), args.batch)
    vgg_runner = None
    if args.vgg16_detector:
        vgg_runner = DetectorRunner(
            load_vgg16_detector(args.vgg16_detector), args.batch,
            kind="vgg16")
    crop = None
    if args.crop_generated:
        crop = (0, 512, 640, 960)  # generated panel of the 960x512 composite

    ppl_ctx = None
    if "ppl" in metrics:
        if not args.dataroot:
            raise SystemExit("--metrics ppl needs --dataroot (+ --testtxt)")
        import os

        from ..metrics.ppl import build_tryon_ppl_ctx
        from ..models import Generator
        from .test import load_generator_variables
        from ..serving import (host_prepare, ingest_device,
                               assemble_inputs_device)
        from ..data import preprocess as pp

        with open(os.path.join(args.dataroot, args.testtxt)) as f:
            pairs = [ln.split() for ln in f if ln.strip()][:args.ppl_items]
        model = Generator()
        # example inputs for random init when no --network given
        person = pp.load_person(args.dataroot, pairs[0][1])
        clothes = pp.load_person(args.dataroot, pairs[0][0],
                                 with_garment_parsing=True)
        item = host_prepare(person, clothes, args.testpart)
        import numpy as np
        import jax.numpy as jnp

        ex_batch = {k: jnp.asarray(np.asarray(v)[None])
                    for k, v in item.items()
                    if k not in ("tiles_fit", "cut_fits")}
        example_inputs = assemble_inputs_device(
            ingest_device(ex_batch), args.testpart, warp_impl="gather")
        variables = load_generator_variables(
            model, args.network, example_inputs)
        ppl_ctx = build_tryon_ppl_ctx(
            model, variables, args.dataroot, pairs, args.testpart)

    for m in metrics:
        if m == "ppl":
            record = calc_metric(
                m, vgg_runner if vgg_runner is not None else runner,
                args.real, args.gen, run_dir=args.run_dir, ppl_ctx=ppl_ctx,
                max_items=args.max_items)
        else:
            if not (args.real and args.gen):
                raise SystemExit(f"--metrics {m} needs --real and --gen")
            record = calc_metric(
                m, vgg_runner if (m == "pr" and vgg_runner is not None)
                else runner,
                args.real, args.gen, run_dir=args.run_dir,
                max_items=args.max_items, cache_dir=args.cache_dir, crop=crop)
        print(json.dumps(record["results"]))


if __name__ == "__main__":
    main()
