"""VGG19 perceptual feature loss (reference loss_fullbody.py:336-477).

Feature slices at torchvision `features` indices [0:2, 2:7, 7:12, 12:21,
21:30] (relu1_1, relu2_1, relu3_1, relu4_1, relu5_1), L1 distance with
weights [1/32, 1/16, 1/8, 1/4, 1]; the target branch is stop-gradiented.

Weights come from a torchvision-format vgg19 state dict
(`features.N.weight` keys, e.g. the reference's checkpoints/
vgg19-dcbb9e9d.pth) via `import_vgg19_torch_state`. Without a weight file
the extractor still runs (random init) — useful for pipeline smoke tests,
meaningless as a perceptual metric; pass weights for real training.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

# VGG19 'features' layout: conv indices within the torchvision Sequential.
# (channels, torchvision index) per conv; 'M' = maxpool.
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
# Slice boundaries in torchvision feature indices (reference :363-377).
SLICE_BOUNDS = [2, 7, 12, 21, 30]
FEATURE_WEIGHTS = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)


def _torchvision_layers():
    """[(kind, tv_index, out_channels)] for the first 30 feature modules."""
    layers = []
    idx = 0
    for v in VGG19_CFG:
        if v == "M":
            layers.append(("pool", idx, None))
            idx += 1
        else:
            layers.append(("conv", idx, v))
            layers.append(("relu", idx + 1, None))
            idx += 2
    return [l for l in layers if l[1] < 30]


class VGG19Features(nn.Module):
    """NHWC VGG19 feature pyramid (5 slices)."""

    @nn.compact
    def __call__(self, x):
        feats = []
        bounds = list(SLICE_BOUNDS)
        in_ch = x.shape[-1]
        for kind, tv_idx, out_ch in _torchvision_layers():
            if kind == "conv":
                w = self.param(
                    f"conv{tv_idx}_kernel", nn.initializers.he_normal(),
                    (3, 3, in_ch, out_ch))
                b = self.param(
                    f"conv{tv_idx}_bias", nn.initializers.zeros, (out_ch,))
                x = jax.lax.conv_general_dilated(
                    x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
                in_ch = out_ch
            elif kind == "relu":
                x = jax.nn.relu(x)
            else:  # maxpool 2x2 stride 2
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if bounds and tv_idx + 1 == bounds[0]:
                feats.append(x)
                bounds.pop(0)
        return feats


def import_vgg19_torch_state(state: Dict[str, np.ndarray]):
    """torchvision vgg19 state dict -> VGG19Features params."""
    params = {}
    for kind, tv_idx, _ in _torchvision_layers():
        if kind != "conv":
            continue
        w = np.asarray(state[f"features.{tv_idx}.weight"])
        b = np.asarray(state[f"features.{tv_idx}.bias"])
        params[f"conv{tv_idx}_kernel"] = w.transpose(2, 3, 1, 0)
        params[f"conv{tv_idx}_bias"] = b
    return {"params": params}


def vgg_features(vgg_params, x, dtype=None):
    """Feature pyramid of one image batch (5 slices, extractor dtype)."""
    if dtype is not None:
        x = x.astype(dtype)
    return VGG19Features().apply(vgg_params, x)


def vgg_feature_loss(vgg_params, x, target_feats, weights=FEATURE_WEIGHTS,
                     dtype=None):
    """Weighted multi-slice L1 distance of x's features to a precomputed
    (detached) target pyramid.

    Sharing `target_feats` across loss terms matters for throughput: the
    training step compares both generator outputs (img and finetune_img)
    against the SAME real image — computing the real pyramid once per step
    instead of once per term (and once more per term under remat) removes
    3 of the 4 real-image VGG forwards from the step.
    """
    fx = vgg_features(vgg_params, x, dtype=dtype)
    loss = 0.0
    for w, a, b in zip(weights, fx, target_feats):
        d = jnp.abs(a - jax.lax.stop_gradient(b)).astype(jnp.float32)
        loss = loss + w * jnp.mean(d)
    return loss


def vgg_loss(vgg_params, x, y, weights=FEATURE_WEIGHTS, dtype=None):
    """Weighted multi-slice L1 feature distance; y is the (detached) target.

    dtype: compute dtype for the feature extractor (e.g. jnp.bfloat16 on
    TPU — the perceptual distance is insensitive to feature precision and
    the VGG forward/backward is a large share of Gmain's FLOPs). The
    per-slice reductions always accumulate in float32.
    """
    fy = vgg_features(vgg_params, jax.lax.stop_gradient(y), dtype=dtype)
    return vgg_feature_loss(vgg_params, x, fy, weights=weights, dtype=dtype)
