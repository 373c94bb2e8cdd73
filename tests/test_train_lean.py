"""Device training loader (lean path) vs the host loader oracle.

assemble_train_batch_lean must reproduce preprocess_person_train +
batch_to_raw_inputs + assemble_train_batch up to the documented device
deviations: warp float paths (uint8 rounding / mask edges) and the pose
raster's calibrated thick-line boundary. RNG-driven augmentation is
compared through rigged deterministic draw sequences.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pasta_tpu.data import preprocess as pp
from pasta_tpu.data.trainsets import (
    TryonTrainDataset, assemble_train_batch, assemble_train_batch_lean,
    batch_to_lean_inputs, batch_to_raw_inputs, preprocess_person_train,
    preprocess_person_train_lean)

FIXTURES = "/root/reference/test_datas"
needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="fixture data not mounted")


class _FakeRng:
    """Deterministic stand-in for np.random.RandomState: rand() pops from
    a queue (then repeats the last value), randint likewise."""

    def __init__(self, rands, randints=(5,)):
        self._rands = list(rands)
        self._randints = list(randints)

    def rand(self):
        return self._rands.pop(0) if len(self._rands) > 1 else self._rands[0]

    def randint(self, a, b=None, size=None):
        v = (self._randints.pop(0) if len(self._randints) > 1
             else self._randints[0])
        return v


def _names(n):
    return sorted(os.listdir(os.path.join(FIXTURES, "image")))[:n]


def _build(names, host_rng, lean_rng):
    host_items, lean_items = [], []
    for nm in names:
        ph = pp.load_person(FIXTURES, nm, with_garment_parsing=True)
        host_items.append(preprocess_person_train(ph, host_rng))
        pd = pp.load_person(FIXTURES, nm, with_garment_parsing=True,
                            pose_raster="device")
        lean_items.append(preprocess_person_train_lean(pd, lean_rng))
    raw = {k: jnp.asarray(v)
           for k, v in batch_to_raw_inputs(host_items).items()}
    host_out = jax.jit(assemble_train_batch)(raw)
    lean_np, tiled, windowed = batch_to_lean_inputs(lean_items)
    lean_batch = {k: jnp.asarray(v) for k, v in lean_np.items()}
    lean_out = jax.jit(
        assemble_train_batch_lean,
        static_argnames=("tiled", "cut_windowed", "warp_impl"))(
        lean_batch, tiled=tiled, cut_windowed=windowed, warp_impl="gather")
    return ({k: np.asarray(v) for k, v in host_out.items()},
            {k: np.asarray(v) for k, v in lean_out.items()})


def _compare(host_out, lean_out):
    assert set(host_out) == set(lean_out)
    # exact conditioning
    np.testing.assert_allclose(
        lean_out["real_img"], host_out["real_img"], atol=1e-5)
    np.testing.assert_allclose(
        lean_out["gt_parsing"], host_out["gt_parsing"], atol=1e-5)
    # label + bound channels exact; pose raster approximate
    np.testing.assert_allclose(
        lean_out["pose"][..., 3:], host_out["pose"][..., 3:], atol=1e-5)
    pose_frac = np.mean(
        np.abs(lean_out["pose"][..., :3] - host_out["pose"][..., :3]) > 1e-3)
    assert pose_frac < 2e-3, pose_frac
    # retain: image*mask with exact masks; skin exact
    retain_frac = np.mean(
        np.abs(lean_out["retain"] - host_out["retain"]) > 1e-3)
    assert retain_frac < 1e-3, retain_frac
    # warped streams: uint8 rounding + mask-edge differences only
    for key in ("style_input", "denorm_upper_input", "denorm_lower_input"):
        frac = np.mean(np.abs(lean_out[key] - host_out[key]) > 0.02)
        assert frac < 0.03, (key, frac)
    for key in ("denorm_upper_mask", "denorm_lower_mask"):
        frac = np.mean(np.abs(lean_out[key] - host_out[key]) > 0)
        assert frac < 0.005, (key, frac)


@needs_fixtures
def test_lean_matches_host_no_augmentation():
    # every rand() = 0.9: erasure gate (>=0.8) and occlusion gate (>=0.9)
    # both off, on both paths, independent of draw order/count
    host_out, lean_out = _build(_names(2), _FakeRng([0.9]), _FakeRng([0.9]))
    _compare(host_out, lean_out)


@needs_fixtures
def test_lean_matches_host_erasure_branch_a():
    # gate 0.1 < 0.8, branch 0.1 < 0.6 (zero torso patch), strip 0.1 < 0.75
    # (erase 5 top rows of patches 1/3), occlusion off (0.95)
    host_rng = _FakeRng([0.1, 0.1, 0.1, 0.95], randints=[5])
    lean_rng = _FakeRng([0.1, 0.1, 0.1, 0.5, 0.95], randints=[5])
    host_out, lean_out = _build(_names(1), host_rng, lean_rng)
    _compare(host_out, lean_out)
    # the erased torso patch (lower slot 0 = style channels 30:33) is
    # exactly -1 everywhere on both paths
    assert np.all(host_out["style_input"][..., 30:33] == -1.0)
    assert np.all(lean_out["style_input"][..., 30:33] == -1.0)


@needs_fixtures
def test_lean_dataset_and_loader_shapes():
    ds = TryonTrainDataset(FIXTURES, image_names=_names(2),
                           loader_impl="device")
    items = [ds.lean_item(0), ds.lean_item(1)]
    batch, tiled, windowed = batch_to_lean_inputs(items)
    assert batch["image"].shape == (2, 512, 512, 3)
    assert batch["erasure"].shape == (2, 5)
    assert batch["upper_lut"].shape == (2, 256)
    assert isinstance(tiled, bool) and isinstance(windowed, bool)
    # host accessor unchanged (evaluator/grid consumers)
    host_item = ds[0]
    assert "norm_img" in host_item and "pose" in host_item


@needs_fixtures
def test_lean_matches_host_without_garment_parsing():
    """No garment_parsing sidecar: host sleeve_mask=None leaves the garment
    unrouted; the lean loader must ship sleeve_valid=0 (NOT an active
    all-zeros mask, which would empty every sleeve patch)."""
    nm = _names(1)[0]
    host_rng, lean_rng = _FakeRng([0.9]), _FakeRng([0.9])
    ph = pp.load_person(FIXTURES, nm, with_garment_parsing=False)
    hi = preprocess_person_train(ph, host_rng)
    pd = pp.load_person(FIXTURES, nm, with_garment_parsing=False,
                        pose_raster="device")
    li = preprocess_person_train_lean(pd, lean_rng)
    raw = {k: jnp.asarray(v) for k, v in batch_to_raw_inputs([hi]).items()}
    host_out = {k: np.asarray(v)
                for k, v in jax.jit(assemble_train_batch)(raw).items()}
    lean_np, tiled, windowed = batch_to_lean_inputs([li])
    lean_out = jax.jit(
        assemble_train_batch_lean,
        static_argnames=("tiled", "cut_windowed", "warp_impl"))(
        {k: jnp.asarray(v) for k, v in lean_np.items()},
        tiled=tiled, cut_windowed=windowed, warp_impl="gather")
    lean_out = {k: np.asarray(v) for k, v in lean_out.items()}
    _compare(host_out, lean_out)
    # sleeve slots of style_input must agree (and not be forced empty)
    frac = np.mean(np.abs(lean_out["style_input"][..., 6:18]
                          - host_out["style_input"][..., 6:18]) > 0.02)
    assert frac < 0.03, frac


@needs_fixtures
def test_lean_matches_host_erasure_branch_b():
    """Branch B of the erasure augmentation: zero torso-patch rows
    [ty:by) where ty is the warped mask's bbox top — ty is computed on
    device from the warped masks, by from the shipped uniform."""
    nm = _names(1)[0]
    rec = pp.load_person(FIXTURES, nm, with_garment_parsing=True)
    # find ty like the host _train_erasure does
    cls = pp.garment_class_masks(rec.parsing)
    upper_mask = cls["tops"] + cls["dresses"]
    lower_mask = cls["skirt"] + cls["pants"]
    norm = pp.normalize_patches(
        upper_mask * rec.image, lower_mask * rec.image,
        np.repeat(upper_mask, 3, axis=2) * 255,
        np.repeat(lower_mask, 3, axis=2) * 255,
        pp.sleeve_mask_from(rec),
        upper_cut_kps=rec.keypoints, lower_cut_kps=rec.keypoints,
        paste_kps=rec.keypoints, erode_k=5)
    bbox = pp.mask_to_bbox(norm["norm_clothes_masks_lower"][..., 0:1])
    assert bbox is not None, "fixture has no lower garment; pick another"
    ty = bbox[1]
    by = min(ty + 4, 128)
    u_by = (by - ty - 1 + 0.5) / (128 - ty)

    host_rng = _FakeRng([0.1, 0.7, 0.95], randints=[by])
    lean_rng = _FakeRng([0.1, 0.7, 0.5, u_by, 0.95], randints=[5])
    host_out, lean_out = _build([nm], host_rng, lean_rng)
    _compare(host_out, lean_out)
    # rows [ty:by) of the torso slot are erased on both paths
    assert np.all(host_out["style_input"][:, ty:by, :, 30:33] == -1.0)
    assert np.all(lean_out["style_input"][:, ty:by, :, 30:33] == -1.0)
    # and a row below the strip is NOT fully erased
    if by < 128:
        assert np.any(host_out["style_input"][:, by:, :, 30:33] > -1.0)


@needs_fixtures
def test_mirror_and_max_size_bookkeeping():
    """--mirror xflip doubling + max_size subsetting (reference
    training/dataset.py:71-81 bookkeeping; flips honestly mirrored here)."""
    names = _names(3)
    base = TryonTrainDataset(FIXTURES, image_names=names)
    assert len(base) == 3

    sub = TryonTrainDataset(FIXTURES, image_names=names, max_size=2)
    assert len(sub) == 2
    assert sorted(sub._raw_idx.tolist()) == sub._raw_idx.tolist()

    mir = TryonTrainDataset(FIXTURES, image_names=names, xflip=True)
    assert len(mir) == 6
    # first half unflipped, second half flipped
    item = mir[0]
    item_f = mir[3]
    np.testing.assert_array_equal(
        np.asarray(item["image"])[:, ::-1], np.asarray(item_f["image"]))
    # pose raster re-derives from swapped keypoints: same number of drawn
    # pixels on both sides (limb colors swap, geometry mirrors)
    assert (np.asarray(item_f["pose"]) > -1).sum() > 0

    # lean path flips too (device loader)
    lean = mir.lean_item(3)
    np.testing.assert_array_equal(
        np.asarray(mir.lean_item(0)["image"])[:, ::-1],
        np.asarray(lean["image"]))
