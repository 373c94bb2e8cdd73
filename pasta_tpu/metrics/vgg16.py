"""VGG16 feature detector + LPIPS embedding, pure-jax NHWC.

The reference's PPL and PR load NVIDIA's TorchScript VGG16 detector
(metrics/metric_utils.py:21-51, URL .../metrics/vgg16.pt):
  * PR calls it with `return_features=True` -> 4096-d fc7 (relu) features
    (metrics/precision_recall.py:37-46).
  * PPL calls it with `return_lpips=True` -> unit-normalized, lin-weighted
    conv features laid out so that the squared L2 distance of the returned
    vectors IS the LPIPS distance (metrics/perceptual_path_length.py:82-93).

This module reimplements both heads over one torchvision-layout VGG16
backbone (config-D: 13 convs + 3 fc). Weights import from a torchvision
`vgg16` state dict plus (for LPIPS) the `lin{k}.model.1.weight` 1x1 scaling
weights of the official LPIPS release; in weightless environments the
random-init tree keeps the pipeline runnable (relative comparisons only).

Input convention: `fc_features` takes uint8 RGB [N,H,W,3]; images are
bilinearly resized to 224 and normalized with the ImageNet mean/std (the
torchvision convention; the NVIDIA TorchScript bakes an equivalent transform
in). `lpips_features` takes float images in [-1,1] at any resolution and
applies the LPIPS shift/scale.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# torchvision vgg16 'features' config D; 'M' = 2x2 maxpool.
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
# LPIPS taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 — torchvision
# feature indices of the relu producing each slice.
LPIPS_TAPS = (3, 8, 15, 22, 29)
LPIPS_CHANNELS = (64, 128, 256, 512, 512)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
# LPIPS ScalingLayer constants (applied to [-1,1] input).
LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _layers():
    """[(kind, tv_index, out_channels)] over the whole 'features' stack."""
    layers = []
    idx = 0
    for v in VGG16_CFG:
        if v == "M":
            layers.append(("pool", idx, None))
            idx += 1
        else:
            layers.append(("conv", idx, v))
            layers.append(("relu", idx + 1, None))
            idx += 2
    return layers


def _backbone(params, x, taps=()):
    """Run the conv stack; returns (final 7x7x512 maps, {tap_idx: slice})."""
    slices = {}
    for kind, tv_idx, _ in _layers():
        if kind == "conv":
            p = params["features"][str(tv_idx)]
            x = lax.conv_general_dilated(
                x, p["weight"].astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]
        elif kind == "relu":
            x = jax.nn.relu(x)
            if tv_idx in taps:
                slices[tv_idx] = x
        else:
            x = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                ((0, 0), (0, 0), (0, 0), (0, 0)))
    return x, slices


def fc_features(params, images_uint8):
    """uint8 RGB [N,H,W,3] -> 4096-d fc7(relu) features (PR detector mode).

    Deviation note: we resize to 224 on device; the NVIDIA detector instead
    pads/pools arbitrary sizes. Feature *space* matches (same weights, same
    layer); absolute values differ from the TorchScript on non-224 inputs.
    """
    x = jnp.asarray(images_uint8, jnp.float32) / 255.0
    x = jax.image.resize(x, (x.shape[0], 224, 224, 3), method="bilinear")
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    x, _ = _backbone(params, x)
    # torchvision flattens NCHW: [C,H,W] -> C-major. Transpose to match the
    # classifier weight layout.
    n = x.shape[0]
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, 512 * 49)
    c = params["classifier"]
    x = jax.nn.relu(x @ c["0"]["weight"].T + c["0"]["bias"])
    x = jax.nn.relu(x @ c["3"]["weight"].T + c["3"]["bias"])
    return x


def logits(params, images_uint8):
    """1000-way classifier logits (fc8)."""
    x = fc_features(params, images_uint8)
    c = params["classifier"]
    return x @ c["6"]["weight"].T + c["6"]["bias"]


def lpips_features(params, images_pm1):
    """[-1,1] float RGB [N,H,W,3] -> LPIPS embedding [N,D].

    sum((f(a)-f(b))**2, -1) == LPIPS(a, b): each tap's unit-normalized
    activations are scaled by sqrt(lin_w / (H*W)) and flattened, so the
    per-tap spatial mean of lin-weighted squared differences sums into one
    inner product (the NVIDIA detector's return_lpips layout).
    """
    x = (jnp.asarray(images_pm1, jnp.float32) - LPIPS_SHIFT) / LPIPS_SCALE
    _, slices = _backbone(params, x, taps=LPIPS_TAPS)
    feats = []
    for i, tap in enumerate(LPIPS_TAPS):
        act = slices[tap]
        act = act * lax.rsqrt(
            jnp.sum(jnp.square(act), axis=-1, keepdims=True) + 1e-10)
        lin_w = params["lins"][str(i)]  # [C], non-negative
        hw = act.shape[1] * act.shape[2]
        act = act * jnp.sqrt(jnp.maximum(lin_w, 0.0) / hw)
        feats.append(act.reshape(act.shape[0], -1))
    return jnp.concatenate(feats, axis=-1)


def lpips_distance(params, a_pm1, b_pm1):
    """LPIPS(a, b) per pair: squared L2 of the lpips embeddings."""
    fa = lpips_features(params, a_pm1)
    fb = lpips_features(params, b_pm1)
    return jnp.sum(jnp.square(fa - fb), axis=-1)


def import_vgg16_torch_state(state: Dict[str, np.ndarray],
                             lpips_state: Dict[str, np.ndarray] = None):
    """torchvision vgg16 state dict (+ optional LPIPS lin weights) -> tree.

    lpips_state keys: `lin{k}.model.1.weight` with shape [1, C, 1, 1]
    (official richzhang/PerceptualSimilarity layout).
    """
    tree: Dict[str, Any] = {"features": {}, "classifier": {}}
    for key, value in state.items():
        value = np.asarray(value, np.float32)
        parts = key.split(".")
        if parts[0] == "features" and parts[-1] in ("weight", "bias"):
            node = tree["features"].setdefault(parts[1], {})
            if parts[-1] == "weight":
                value = value.transpose(2, 3, 1, 0)
            node[parts[-1]] = value
        elif parts[0] == "classifier" and parts[-1] in ("weight", "bias"):
            tree["classifier"].setdefault(parts[1], {})[parts[-1]] = value
    if lpips_state is not None:
        lins = {}
        for k in range(len(LPIPS_TAPS)):
            w = np.asarray(lpips_state[f"lin{k}.model.1.weight"], np.float32)
            lins[str(k)] = w.reshape(-1)
        tree["lins"] = lins
    else:
        tree["lins"] = {
            str(k): np.ones((c,), np.float32) / c
            for k, c in enumerate(LPIPS_CHANNELS)
        }
    return tree


def random_vgg16_params(seed=0):
    """Random-weight tree (tests / relative comparisons without weights)."""
    rng = np.random.RandomState(seed)
    tree: Dict[str, Any] = {"features": {}, "classifier": {}, "lins": {}}
    in_ch = 3
    for kind, tv_idx, out_ch in _layers():
        if kind != "conv":
            continue
        fan_in = 9 * in_ch
        tree["features"][str(tv_idx)] = dict(
            weight=(rng.randn(3, 3, in_ch, out_ch)
                    * np.sqrt(2.0 / fan_in)).astype(np.float32),
            bias=np.zeros((out_ch,), np.float32))
        in_ch = out_ch
    dims = [(512 * 49, 4096), ("", ""), ("", ""),
            (4096, 4096), ("", ""), ("", ""), (4096, 1000)]
    for idx in (0, 3, 6):
        din, dout = dims[idx]
        tree["classifier"][str(idx)] = dict(
            weight=(rng.randn(dout, din)
                    * np.sqrt(2.0 / din)).astype(np.float32),
            bias=np.zeros((dout,), np.float32))
    tree["lins"] = {
        str(k): rng.rand(c).astype(np.float32) / c
        for k, c in enumerate(LPIPS_CHANNELS)
    }
    return tree
