"""VGG16 detector + LPIPS parity vs a torch oracle on shared random weights.

The reference's PR/PPL use NVIDIA's TorchScript VGG16
(metric_utils.py:21-51); the oracle here reproduces the torchvision VGG16
forward and the official LPIPS formula in torch (no torchvision needed),
then checks the jax NHWC implementation matches on the same weights.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pasta_tpu.metrics.vgg16 import (
    VGG16_CFG, LPIPS_TAPS, LPIPS_SHIFT, LPIPS_SCALE, IMAGENET_MEAN,
    IMAGENET_STD, fc_features, logits, lpips_features, lpips_distance,
    import_vgg16_torch_state, random_vgg16_params)

torch = pytest.importorskip("torch")


def _torch_state_from_tree(tree):
    """jax tree -> torchvision-layout state dict (for importer roundtrip)."""
    state = {}
    for idx, p in tree["features"].items():
        state[f"features.{idx}.weight"] = torch.tensor(
            np.ascontiguousarray(p["weight"].transpose(3, 2, 0, 1)))
        state[f"features.{idx}.bias"] = torch.tensor(p["bias"])
    for idx, p in tree["classifier"].items():
        state[f"classifier.{idx}.weight"] = torch.tensor(p["weight"])
        state[f"classifier.{idx}.bias"] = torch.tensor(p["bias"])
    lpips_state = {
        f"lin{k}.model.1.weight": torch.tensor(
            tree["lins"][str(k)].reshape(1, -1, 1, 1))
        for k in range(len(LPIPS_TAPS))
    }
    return state, lpips_state


def _torch_backbone(state, x, taps=()):
    """NCHW conv stack; returns (final maps, {tap: act})."""
    import torch.nn.functional as F

    slices = {}
    idx = 0
    for v in VGG16_CFG:
        if v == "M":
            x = F.max_pool2d(x, 2, 2)
            idx += 1
        else:
            x = F.conv2d(x, state[f"features.{idx}.weight"],
                         state[f"features.{idx}.bias"], padding=1)
            x = F.relu(x)
            if idx + 1 in taps:
                slices[idx + 1] = x
            idx += 2
    return x, slices


def _torch_fc_features(state, images_uint8):
    import torch.nn.functional as F

    x = torch.tensor(images_uint8).permute(0, 3, 1, 2).float() / 255.0
    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    x = (x - mean) / std
    x, _ = _torch_backbone(state, x)
    x = torch.flatten(x, 1)
    x = F.relu(F.linear(x, state["classifier.0.weight"],
                        state["classifier.0.bias"]))
    x = F.relu(F.linear(x, state["classifier.3.weight"],
                        state["classifier.3.bias"]))
    return x


def _torch_lpips(state, lpips_state, a_pm1, b_pm1):
    """Official LPIPS: unit-normalize taps, lin-weight, spatial mean, sum."""
    shift = torch.tensor(LPIPS_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(LPIPS_SCALE).view(1, 3, 1, 1)

    def emb(img):
        x = torch.tensor(img).permute(0, 3, 1, 2).float()
        x = (x - shift) / scale
        _, slices = _torch_backbone(state, x, taps=LPIPS_TAPS)
        return slices

    sa, sb = emb(a_pm1), emb(b_pm1)
    total = 0.0
    for k, tap in enumerate(LPIPS_TAPS):
        fa = sa[tap] / (sa[tap].square().sum(1, keepdim=True) + 1e-10).sqrt()
        fb = sb[tap] / (sb[tap].square().sum(1, keepdim=True) + 1e-10).sqrt()
        w = lpips_state[f"lin{k}.model.1.weight"]
        d = torch.nn.functional.conv2d((fa - fb).square(), w)
        total = total + d.mean(dim=(2, 3)).squeeze(1)
    return total


@pytest.fixture(scope="module")
def tree():
    return random_vgg16_params(seed=0)


@pytest.fixture(scope="module")
def torch_states(tree):
    return _torch_state_from_tree(tree)


def test_fc_features_parity(tree, torch_states):
    state, _ = torch_states
    rng = np.random.RandomState(1)
    # 224x224 input: no resize on either side -> exact layer parity.
    imgs = rng.randint(0, 256, (2, 224, 224, 3), dtype=np.uint8)
    ours = np.asarray(fc_features(tree, imgs))
    ref = _torch_fc_features(state, imgs).numpy()
    assert ours.shape == (2, 4096)
    scale = np.abs(ref).max() + 1e-8
    assert np.max(np.abs(ours - ref)) / scale < 2e-4


def test_logits_shape(tree):
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    out = np.asarray(logits(tree, imgs))
    assert out.shape == (2, 1000)


def test_lpips_distance_parity(tree, torch_states):
    state, lpips_state = torch_states
    rng = np.random.RandomState(3)
    a = (rng.rand(2, 64, 64, 3).astype(np.float32)) * 2 - 1
    b = (rng.rand(2, 64, 64, 3).astype(np.float32)) * 2 - 1
    ours = np.asarray(lpips_distance(tree, a, b))
    ref = _torch_lpips(state, lpips_state, a, b).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)


def test_lpips_feature_identity(tree):
    """sum((f(a)-f(b))^2) == lpips_distance by construction."""
    rng = np.random.RandomState(4)
    a = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    b = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    fa = np.asarray(lpips_features(tree, a))
    fb = np.asarray(lpips_features(tree, b))
    d_feat = np.sum((fa - fb) ** 2, axis=-1)
    d_direct = np.asarray(lpips_distance(tree, a, b))
    np.testing.assert_allclose(d_feat, d_direct, rtol=1e-5, atol=1e-8)


@pytest.mark.slow
def test_importer_roundtrip(tree, torch_states):
    state, lpips_state = torch_states
    np_state = {k: v.numpy() for k, v in state.items()}
    np_lpips = {k: v.numpy() for k, v in lpips_state.items()}
    back = import_vgg16_torch_state(np_state, np_lpips)
    rng = np.random.RandomState(5)
    imgs = rng.randint(0, 256, (1, 96, 96, 3), dtype=np.uint8)
    np.testing.assert_allclose(
        np.asarray(fc_features(tree, imgs)),
        np.asarray(fc_features(back, imgs)), rtol=1e-6, atol=1e-6)
    a = rng.rand(1, 48, 48, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(lpips_features(tree, a)),
        np.asarray(lpips_features(back, a)), rtol=1e-6, atol=1e-6)
