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
    # via median-of-means; use the standard PPL trimmed mean
    lo, hi = np.percentile(d, [1, 99])
    return float(d[(d >= lo) & (d <= hi)].mean())
