"""Perceptual path length for the try-on generator.

The reference PPL (metrics/perceptual_path_length.py:23-130) is stale for
this model family — it calls the PASTA-GAN-v1 generator signature and has a
`torch.from_numpy(list)` bug (SURVEY.md §2.2). This is a working
reimplementation adapted to the conditional try-on generator:

  * endpoints are the style codes of two garment conditions (the model's
    latent is the 512-d style code, z_dim=0)
  * lerp with a random t, perturb by epsilon, synthesize both, and measure
    the scaled perceptual distance  d(I_t, I_{t+eps}) / eps^2
  * the perceptual metric is a pluggable feature extractor; use
    `make_lpips_feature_fn(vgg16_params)` for the reference's VGG16-LPIPS
    space (perceptual_path_length.py:55-60, 82-93) — squared feature
    distance == LPIPS — or any other [N,D] embedding
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def make_lpips_feature_fn(vgg16_params, downsample_to=256):
    """LPIPS embedding feature_fn for compute_ppl (reference downsamples
    >256px images to 256 before the detector,
    perceptual_path_length.py:78-84)."""
    from .vgg16 import lpips_features

    def feature_fn(images_pm1):
        h = images_pm1.shape[1]
        if downsample_to and h > downsample_to:
            factor = h // downsample_to
            n, hh, ww, c = images_pm1.shape
            images_pm1 = jnp.mean(
                images_pm1.reshape(
                    n, hh // factor, factor, ww // factor, factor, c),
                axis=(2, 4))
        return lpips_features(vgg16_params, images_pm1)

    return feature_fn


def lerp(a, b, t):
    return a + (b - a) * t


def slerp(a, b, t):
    a_n = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b_n = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    d = jnp.sum(a_n * b_n, axis=-1, keepdims=True)
    p = t * jnp.arccos(jnp.clip(d, -1, 1))
    c = b_n - d * a_n
    c = c / (jnp.linalg.norm(c, axis=-1, keepdims=True) + 1e-12)
    d_out = a_n * jnp.cos(p) + c * jnp.sin(p)
    return d_out * jnp.linalg.norm(a, axis=-1, keepdims=True)


def compute_ppl(
    synth_from_code,     # (style_code [N,512]) -> images [N,H,W,3] in [-1,1]
    feature_fn,          # (images) -> [N, D] perceptual features
    codes_a, codes_b,    # [N, 512] endpoint style codes
    key,
    epsilon=1e-4,
    interp="lerp",
    crop=None,           # (y0, y1, x0, x1) center crop before features
):
    """Mean scaled perceptual distance along the style interpolation path."""
    n = codes_a.shape[0]
    t = jax.random.uniform(key, (n, 1))
    interp_fn = lerp if interp == "lerp" else slerp
    c0 = interp_fn(codes_a, codes_b, t)
    c1 = interp_fn(codes_a, codes_b, t + epsilon)
    img0 = synth_from_code(c0)
    img1 = synth_from_code(c1)
    if crop is not None:
        y0, y1, x0, x1 = crop
        img0 = img0[:, y0:y1, x0:x1]
        img1 = img1[:, y0:y1, x0:x1]
    f0 = feature_fn(img0)
    f1 = feature_fn(img1)
    d = jnp.sum(jnp.square(f0 - f1), axis=-1) / (epsilon ** 2)
    d = np.asarray(d)
    # reference filters outliers beyond the 1st/99th percentile implicitly
    # via median-of-means; use the standard PPL trimmed mean. With small n
    # the interpolated percentiles can exclude every sample (n=2: the 1st
    # percentile already sits above the min) — fall back to the plain mean.
    lo, hi = np.percentile(d, [1, 99])
    kept = d[(d >= lo) & (d <= hi)]
    return float(kept.mean() if kept.size else d.mean())


def build_tryon_ppl_ctx(model, variables, dataroot, pairs, part="upper",
                        use_sleeve_mask=True):
    """Conditional-PPL context for the registered `ppl` metric.

    Reference analogue: ppl2_wend (metrics/metric_main.py:96-111) sampled
    two w endpoints from random z's; this model family has z_dim=0, so the
    endpoints are the style codes of two garment CONDITIONS on the same
    person — codes_a = (person, their own garment), codes_b = (person,
    the target garment from the pair file). The synthesis path is fixed to
    the target condition's assembled inputs; only the style code moves.

    Returns dict(synth_from_code, codes_a, codes_b) for compute_ppl.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..data import preprocess as pp
    from ..serving import (host_prepare, ingest_device,
                           assemble_inputs_device)

    items_a, items_b = [], []
    for clothes_name, person_name in pairs:
        person = pp.load_person(dataroot, person_name)
        clothes = pp.load_person(dataroot, clothes_name,
                                 with_garment_parsing=True)
        own = pp.load_person(dataroot, person_name,
                             with_garment_parsing=True)
        items_a.append(host_prepare(person, own, part, use_sleeve_mask))
        items_b.append(host_prepare(person, clothes, part, use_sleeve_mask))

    def to_inputs(items):
        batch = {k: jnp.asarray(np.stack([it[k] for it in items]))
                 for k in items[0] if k not in ("tiles_fit", "cut_fits")}
        return assemble_inputs_device(ingest_device(batch), part,
                                      warp_impl="gather")

    inputs_a = to_inputs(items_a)
    inputs_b = to_inputs(items_b)

    @jax.jit
    def code_of(inputs):
        def run(m, c, retain):
            return m.encode_style(c, retain)[0]

        return model.apply(variables, inputs["c"], inputs["retain"],
                           method=run)

    @jax.jit
    def synth_from_code(code):
        def run(m, code_):
            # The metric may slice the codes (--max-items); the conditioning
            # batch must match. code_.shape[0] is static at trace time, so
            # this is a free static slice of the closed-over inputs.
            cond = jax.tree.map(lambda x: x[:code_.shape[0]], inputs_b)
            ws = m.mapping(jnp.zeros((code_.shape[0], 0)), code_)
            pose_feat = m.encode_pose(cond["pose"])
            _, feats = m.encode_style(cond["c"], cond["retain"])
            cat_feats = {str(f.shape[1]): f for f in feats}
            _, finetune, _ = m.synthesis(
                ws, pose_feat, cat_feats,
                cond["denorm_upper_input"],
                cond["denorm_lower_input"],
                cond["denorm_upper_mask"],
                cond["denorm_lower_mask"], None, noise_mode="const")
            return finetune

        return model.apply(variables, code, method=run)

    return dict(synth_from_code=synth_from_code,
                codes_a=code_of(inputs_a), codes_b=code_of(inputs_b))
