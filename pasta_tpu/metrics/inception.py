"""InceptionV3 feature extractor (FID variant), pure-jax NHWC inference.

Implements the torchvision `inception_v3` topology with the pytorch-fid
modifications (avg-pools exclude padding; the last InceptionE uses max-pool
in its pool branch) — the standard FID feature network. The reference loads
an equivalent TorchScript detector by URL (metrics/metric_utils.py:21-51);
zero-egress environments supply a torchvision-format state dict instead
(`import_inception_torch_state`, works on torchvision's inception_v3 or
pytorch-fid's FID weights).

Feature layout: 2048-d pool3 features (+1000/1008-way logits for IS).
"""

from __future__ import annotations

from typing import Dict, Any

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

BN_EPS = 1e-3


def _conv_bn(p, x, stride=1, padding=0):
    """BasicConv2d: conv(no bias) -> batchnorm(eps 1e-3) -> relu."""
    w = p["conv"]["weight"]
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    x = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bn = p["bn"]
    inv = lax.rsqrt(bn["running_var"] + BN_EPS)
    x = (x - bn["running_mean"]) * inv * bn["weight"] + bn["bias"]
    return jax.nn.relu(x)


def _avg_pool3(x, fid_variant=True):
    """3x3 stride-1 avg pool, pad 1; FID variant excludes padding from the
    divisor (count_include_pad=False)."""
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    if not fid_variant:
        return summed / 9.0
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(
        ones, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return summed / counts


def _max_pool(x, window=3, stride=2, padding=0):
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, window, window, 1),
        (1, stride, stride, 1), pad)


def _inception_a(p, x, fid_variant):
    b1 = _conv_bn(p["branch1x1"], x)
    b5 = _conv_bn(p["branch5x5_1"], x)
    b5 = _conv_bn(p["branch5x5_2"], b5, padding=2)
    b3 = _conv_bn(p["branch3x3dbl_1"], x)
    b3 = _conv_bn(p["branch3x3dbl_2"], b3, padding=1)
    b3 = _conv_bn(p["branch3x3dbl_3"], b3, padding=1)
    bp = _conv_bn(p["branch_pool"], _avg_pool3(x, fid_variant))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _conv_bn(p["branch3x3"], x, stride=2)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=1)
    bd = _conv_bn(p["branch3x3dbl_3"], bd, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, x, fid_variant):
    pad17 = ((0, 0), (3, 3))
    pad71 = ((3, 3), (0, 0))
    b1 = _conv_bn(p["branch1x1"], x)
    b7 = _conv_bn(p["branch7x7_1"], x)
    b7 = _conv_bn(p["branch7x7_2"], b7, padding=pad17)
    b7 = _conv_bn(p["branch7x7_3"], b7, padding=pad71)
    bd = _conv_bn(p["branch7x7dbl_1"], x)
    bd = _conv_bn(p["branch7x7dbl_2"], bd, padding=pad71)
    bd = _conv_bn(p["branch7x7dbl_3"], bd, padding=pad17)
    bd = _conv_bn(p["branch7x7dbl_4"], bd, padding=pad71)
    bd = _conv_bn(p["branch7x7dbl_5"], bd, padding=pad17)
    bp = _conv_bn(p["branch_pool"], _avg_pool3(x, fid_variant))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = _conv_bn(p["branch3x3_2"], b3, stride=2)
    b7 = _conv_bn(p["branch7x7x3_1"], x)
    b7 = _conv_bn(p["branch7x7x3_2"], b7, padding=((0, 0), (3, 3)))
    b7 = _conv_bn(p["branch7x7x3_3"], b7, padding=((3, 3), (0, 0)))
    b7 = _conv_bn(p["branch7x7x3_4"], b7, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, x, fid_variant, use_max_pool):
    b1 = _conv_bn(p["branch1x1"], x)
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv_bn(p["branch3x3_2a"], b3, padding=((0, 0), (1, 1))),
        _conv_bn(p["branch3x3_2b"], b3, padding=((1, 1), (0, 0))),
    ], axis=-1)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=1)
    bd = jnp.concatenate([
        _conv_bn(p["branch3x3dbl_3a"], bd, padding=((0, 0), (1, 1))),
        _conv_bn(p["branch3x3dbl_3b"], bd, padding=((1, 1), (0, 0))),
    ], axis=-1)
    if use_max_pool:
        bp = _max_pool(x, window=3, stride=1, padding=1)
    else:
        bp = _avg_pool3(x, fid_variant)
    bp = _conv_bn(p["branch_pool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_features(params: Dict[str, Any], x, fid_variant=True,
                       return_logits=False):
    """x: [N, 299, 299, 3] in [-1, 1] -> 2048-d features (and logits)."""
    p = params
    x = _conv_bn(p["Conv2d_1a_3x3"], x, stride=2)
    x = _conv_bn(p["Conv2d_2a_3x3"], x)
    x = _conv_bn(p["Conv2d_2b_3x3"], x, padding=1)
    x = _max_pool(x)
    x = _conv_bn(p["Conv2d_3b_1x1"], x)
    x = _conv_bn(p["Conv2d_4a_3x3"], x)
    x = _max_pool(x)
    x = _inception_a(p["Mixed_5b"], x, fid_variant)
    x = _inception_a(p["Mixed_5c"], x, fid_variant)
    x = _inception_a(p["Mixed_5d"], x, fid_variant)
    x = _inception_b(p["Mixed_6a"], x)
    x = _inception_c(p["Mixed_6b"], x, fid_variant)
    x = _inception_c(p["Mixed_6c"], x, fid_variant)
    x = _inception_c(p["Mixed_6d"], x, fid_variant)
    x = _inception_c(p["Mixed_6e"], x, fid_variant)
    x = _inception_d(p["Mixed_7a"], x)
    x = _inception_e(p["Mixed_7b"], x, fid_variant, use_max_pool=False)
    x = _inception_e(p["Mixed_7c"], x, fid_variant,
                     use_max_pool=fid_variant)
    feats = jnp.mean(x, axis=(1, 2))  # global avg pool -> [N, 2048]
    if not return_logits or "fc" not in p:
        return feats
    logits = feats @ p["fc"]["weight"].T + p["fc"]["bias"]
    return feats, logits


def preprocess_images(images_uint8):
    """[N, H, W, 3] uint8 -> bilinear 299x299, scaled to [-1, 1]."""
    x = jnp.asarray(images_uint8, jnp.float32) / 255.0
    x = jax.image.resize(
        x, (x.shape[0], 299, 299, 3), method="bilinear", antialias=False)
    return x * 2 - 1


def import_inception_torch_state(state: Dict[str, np.ndarray]):
    """torchvision inception_v3 (or pytorch-fid FIDInceptionV3) state dict
    -> nested param tree with HWIO conv weights."""
    tree: Dict[str, Any] = {}
    for key, value in state.items():
        if key.startswith("AuxLogits") or key.endswith("num_batches_tracked"):
            continue
        value = np.asarray(value, np.float32)
        parts = key.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            value = value.transpose(2, 3, 1, 0)
        node = tree
        for seg in parts[:-1]:
            node = node.setdefault(seg, {})
        node[parts[-1]] = value
    return tree


def _conv_bn_shapes(cin, cout, kh, kw):
    return dict(
        conv=dict(weight=(kh, kw, cin, cout)),
        bn=dict(weight=(cout,), bias=(cout,), running_mean=(cout,),
                running_var=(cout,)),
    )


def inception_param_shapes(num_classes=1000):
    """Full shape tree of the FID InceptionV3 (torchvision layout)."""
    s = {}
    s["Conv2d_1a_3x3"] = _conv_bn_shapes(3, 32, 3, 3)
    s["Conv2d_2a_3x3"] = _conv_bn_shapes(32, 32, 3, 3)
    s["Conv2d_2b_3x3"] = _conv_bn_shapes(32, 64, 3, 3)
    s["Conv2d_3b_1x1"] = _conv_bn_shapes(64, 80, 1, 1)
    s["Conv2d_4a_3x3"] = _conv_bn_shapes(80, 192, 3, 3)

    def mixed_a(cin, pf):
        return dict(
            branch1x1=_conv_bn_shapes(cin, 64, 1, 1),
            branch5x5_1=_conv_bn_shapes(cin, 48, 1, 1),
            branch5x5_2=_conv_bn_shapes(48, 64, 5, 5),
            branch3x3dbl_1=_conv_bn_shapes(cin, 64, 1, 1),
            branch3x3dbl_2=_conv_bn_shapes(64, 96, 3, 3),
            branch3x3dbl_3=_conv_bn_shapes(96, 96, 3, 3),
            branch_pool=_conv_bn_shapes(cin, pf, 1, 1))

    s["Mixed_5b"] = mixed_a(192, 32)
    s["Mixed_5c"] = mixed_a(256, 64)
    s["Mixed_5d"] = mixed_a(288, 64)
    s["Mixed_6a"] = dict(
        branch3x3=_conv_bn_shapes(288, 384, 3, 3),
        branch3x3dbl_1=_conv_bn_shapes(288, 64, 1, 1),
        branch3x3dbl_2=_conv_bn_shapes(64, 96, 3, 3),
        branch3x3dbl_3=_conv_bn_shapes(96, 96, 3, 3))

    def mixed_c(c7):
        return dict(
            branch1x1=_conv_bn_shapes(768, 192, 1, 1),
            branch7x7_1=_conv_bn_shapes(768, c7, 1, 1),
            branch7x7_2=_conv_bn_shapes(c7, c7, 1, 7),
            branch7x7_3=_conv_bn_shapes(c7, 192, 7, 1),
            branch7x7dbl_1=_conv_bn_shapes(768, c7, 1, 1),
            branch7x7dbl_2=_conv_bn_shapes(c7, c7, 7, 1),
            branch7x7dbl_3=_conv_bn_shapes(c7, c7, 1, 7),
            branch7x7dbl_4=_conv_bn_shapes(c7, c7, 7, 1),
            branch7x7dbl_5=_conv_bn_shapes(c7, 192, 1, 7),
            branch_pool=_conv_bn_shapes(768, 192, 1, 1))

    s["Mixed_6b"] = mixed_c(128)
    s["Mixed_6c"] = mixed_c(160)
    s["Mixed_6d"] = mixed_c(160)
    s["Mixed_6e"] = mixed_c(192)
    s["Mixed_7a"] = dict(
        branch3x3_1=_conv_bn_shapes(768, 192, 1, 1),
        branch3x3_2=_conv_bn_shapes(192, 320, 3, 3),
        branch7x7x3_1=_conv_bn_shapes(768, 192, 1, 1),
        branch7x7x3_2=_conv_bn_shapes(192, 192, 1, 7),
        branch7x7x3_3=_conv_bn_shapes(192, 192, 7, 1),
        branch7x7x3_4=_conv_bn_shapes(192, 192, 3, 3))

    def mixed_e(cin):
        return dict(
            branch1x1=_conv_bn_shapes(cin, 320, 1, 1),
            branch3x3_1=_conv_bn_shapes(cin, 384, 1, 1),
            branch3x3_2a=_conv_bn_shapes(384, 384, 1, 3),
            branch3x3_2b=_conv_bn_shapes(384, 384, 3, 1),
            branch3x3dbl_1=_conv_bn_shapes(cin, 448, 1, 1),
            branch3x3dbl_2=_conv_bn_shapes(448, 384, 3, 3),
            branch3x3dbl_3a=_conv_bn_shapes(384, 384, 1, 3),
            branch3x3dbl_3b=_conv_bn_shapes(384, 384, 3, 1),
            branch_pool=_conv_bn_shapes(cin, 192, 1, 1))

    s["Mixed_7b"] = mixed_e(1280)
    s["Mixed_7c"] = mixed_e(2048)
    s["fc"] = dict(weight=(num_classes, 2048), bias=(num_classes,))
    return s


def random_inception_params(seed=0, num_classes=1000):
    """Random-weight tree (tests / relative comparisons without weights)."""
    rng = np.random.RandomState(seed)

    def fill(node, in_bn=False):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = fill(v, in_bn=(k == "bn"))
            elif k == "running_var":
                out[k] = np.ones(v, np.float32)
            elif k == "running_mean":
                out[k] = np.zeros(v, np.float32)
            elif in_bn and k == "weight":
                # near-identity BN so activations survive ~40 layers
                out[k] = (1 + 0.1 * rng.randn(*v)).astype(np.float32)
            elif k == "weight" and len(v) >= 2:
                fan_in = int(np.prod(v[:-1]))
                out[k] = (rng.randn(*v) * np.sqrt(2.0 / fan_in)).astype(
                    np.float32)
            else:
                out[k] = rng.randn(*v).astype(np.float32) * 0.1
        return out

    return fill(inception_param_shapes(num_classes))
