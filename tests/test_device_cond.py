"""Parity tests: device conditioning vs the host oracle.

Covers data/device_cond.py (pose raster, palm/retain masks, skin median,
cv2-anchor dilation) and the serving wiring (host_prepare(cond="device") +
ingest_device). Host functions are the oracle; reference semantics are
/root/reference/training/dataset.py:507-679 + training/utils.py:10-75.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from pasta_tpu.data import device_cond as dc
from pasta_tpu.data import preprocess as pp
from pasta_tpu.data.pose import get_palm_mask

FIXTURES = "/root/reference/test_datas"
needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="fixture data not mounted")


def _names(n):
    return sorted(os.listdir(os.path.join(FIXTURES, "image")))[:n]


def test_dilate_matches_cv2_on_solid_regions():
    # Solid regions (not scattered pixels): a one-pixel anchor error moves
    # the whole dilated boundary, so this is sensitive to the even-k
    # anchor convention.
    import cv2

    rng = np.random.RandomState(0)
    for k in (5, 8, 28, 35):
        m = np.zeros((64, 80), np.uint8)
        for _ in range(3):
            y, x = rng.randint(10, 54), rng.randint(10, 70)
            yy, xx = np.mgrid[0:64, 0:80]
            m |= ((yy - y) ** 2 + (xx - x) ** 2 < 25).astype(np.uint8)
        ref = cv2.dilate(m, np.ones((k, k), np.uint8), iterations=1) > 0
        dev = np.asarray(
            dc.dilate_cv(jnp.asarray(m[None, ..., None], jnp.float32), k)
        )[0, ..., 0] > 0
        assert np.array_equal(ref, dev), f"k={k}"


@needs_fixtures
def test_garment_class_routing_matches_masks():
    # count-based routing == the materialized disambiguation cascade
    for nm in _names(4):
        rec = pp.load_person(FIXTURES, nm)
        masks = pp.garment_class_masks(rec.parsing)
        routes = pp.garment_class_routing(rec.parsing)
        for k, mask in masks.items():
            labels, count = routes[k]
            assert int(mask.sum()) == count, (nm, k)
            assert np.array_equal(pp.label_lut(labels)[rec.parsing], mask), \
                (nm, k)


@needs_fixtures
def test_palm_retain_skin_exact():
    for nm in _names(3):
        rec = pp.load_person(FIXTURES, nm)
        prm = dc.palm_device_params(rec.keypoints)
        palm_dev = np.asarray(dc.palm_mask_device(
            jnp.asarray(prm["palm_quads"][None]),
            jnp.asarray(prm["palm_valid"][None]),
            jnp.asarray(rec.parsing[None])))[0]
        palm_ref = get_palm_mask(rec.keypoints, rec.parsing)
        assert np.array_equal(palm_dev.astype(np.uint8), palm_ref), nm

        retain_dev = np.asarray(dc.retain_mask_device(
            jnp.asarray(rec.parsing[None]), jnp.asarray(palm_dev[None])))[0]
        retain_ref = pp.retain_mask_of(rec)
        assert np.array_equal(retain_dev.astype(np.uint8), retain_ref), nm

        skin_dev = np.asarray(dc.skin_median_device(
            jnp.asarray(rec.image[None]), jnp.asarray(rec.parsing[None])))[0]
        skin_ref = pp.skin_median_color(rec.image, rec.parsing)
        assert np.allclose(skin_dev, skin_ref), nm


def test_palm_degenerate_zero_length_limb():
    # shoulder == elbow collapses the upper-arm rectangle to a point; the
    # host fills its 1-2px bbox (sign never resolves), the device must not
    # fill the whole canvas (all-zero crosses)
    kp = np.zeros((18, 3))
    kp[5] = [100.0, 100.0, 0.9]   # lshoulder
    kp[6] = [100.0, 100.0, 0.9]   # lelbow == lshoulder
    kp[7] = [140.0, 160.0, 0.9]   # lwrist
    parsing = np.zeros((512, 512, 1), np.int32)
    parsing[90:180, 80:170] = 14  # left hand labels everywhere nearby
    ref = get_palm_mask(kp, parsing)
    prm = dc.palm_device_params(kp)
    dev = np.asarray(dc.palm_mask_device(
        jnp.asarray(prm["palm_quads"][None]),
        jnp.asarray(prm["palm_valid"][None]),
        jnp.asarray(parsing[None])))[0]
    assert np.array_equal(dev.astype(np.uint8), ref)
    assert ref.sum() > 0  # scenario actually exercises a nonempty palm


@needs_fixtures
def test_pose_raster_close_and_keypoints_identical():
    for nm in _names(3):
        host_rec = pp.load_person(FIXTURES, nm)
        dev_rec = pp.load_person(FIXTURES, nm, pose_raster="device")
        # border validation / mutation identical in both modes
        assert np.array_equal(host_rec.keypoints, dev_rec.keypoints), nm
        assert dev_rec.pose_img is None and dev_rec.pose_params is not None

        prm = dev_rec.pose_params
        dev = np.asarray(dc.draw_pose_device(
            jnp.asarray(prm["limb_pts"][None]),
            jnp.asarray(prm["limb_valid"][None]),
            jnp.asarray(prm["joint_pts"][None]),
            jnp.asarray(prm["joint_valid"][None]),
            jnp.asarray(prm["pose_xlim"][None])))[0].astype(np.uint8)
        neq = np.any(dev != host_rec.pose_img, axis=-1)
        frac = neq.sum() / neq.size
        # cv2 thick-line fixed-point boundaries; see the calibration note
        # in draw_pose_device (measured ~0.06% on the fixture poses)
        assert frac < 2e-3, (nm, frac)
        # joint disks are exact: mismatches only where limbs are the top
        # layer. Check a disk pixel directly: every valid joint center.
        for j in range(18):
            if prm["joint_valid"][j]:
                x, y = prm["joint_pts"][j].astype(int)
                if 0 <= y < 512 and 0 <= x < 512:
                    assert np.array_equal(dev[y, x], host_rec.pose_img[y, x])


@needs_fixtures
@pytest.mark.slow
def test_ingest_device_cond_matches_host_path():
    from pasta_tpu.serving import host_prepare, ingest_device

    with open(os.path.join(FIXTURES, "test_pairs.txt")) as f:
        pairs = [line.split() for line in f if line.strip()][:2]

    def batch(cond):
        items = []
        for clothes_name, person_name in pairs:
            person = pp.load_person(
                FIXTURES, person_name,
                pose_raster="device" if cond == "device" else "host")
            clothes = pp.load_person(FIXTURES, clothes_name,
                                     with_garment_parsing=True)
            items.append(host_prepare(person, clothes, "upper", cond=cond))
        return {k: jnp.asarray(np.stack([it[k] for it in items]))
                for k in items[0] if k not in ("tiles_fit", "cut_fits")}

    out_h = {k: np.asarray(v) for k, v in ingest_device(batch("host")).items()}
    out_d = {k: np.asarray(v)
             for k, v in ingest_device(batch("device")).items()}
    assert set(out_h) == set(out_d)
    for k in out_h:
        if k == "pose":
            neq = np.any(out_h[k] != out_d[k], axis=-1)
            assert neq.mean() < 2e-3, neq.mean()
        else:
            assert np.array_equal(out_h[k], out_d[k]), k


def test_garment_class_routing_matches_masks_randomized():
    """Random label maps drive every branch of the disambiguation cascade
    (pants-vs-skirt merge, dress-with-pants, dress-dominant, dress-to-
    tops/skirt) — the fixtures are mostly pants-wearing."""
    rng = np.random.RandomState(7)
    labels = [0, 5, 6, 7, 9, 10, 12, 13, 14]
    for trial in range(20):
        # biased draws so each class can dominate or vanish
        probs = rng.dirichlet(np.ones(len(labels)) * 0.3)
        parsing = rng.choice(labels, size=(64, 64, 1), p=probs)
        masks = pp.garment_class_masks(parsing)
        routes = pp.garment_class_routing(parsing)
        for k, mask in masks.items():
            labels_k, count = routes[k]
            assert int(mask.sum()) == count, (trial, k)
            assert np.array_equal(pp.label_lut(labels_k)[parsing], mask), \
                (trial, k)


def test_skin_median_randomized():
    rng = np.random.RandomState(3)
    for trial in range(6):
        img = rng.randint(0, 256, (1, 64, 64, 3), np.uint8)
        parsing = rng.choice([0, 10, 13], size=(1, 64, 64, 1),
                             p=[0.8, 0.1, 0.1])
        if trial == 5:
            parsing = np.zeros_like(parsing)  # empty mask -> 0.0
        dev = np.asarray(dc.skin_median_device(
            jnp.asarray(img), jnp.asarray(parsing)))[0]
        ref = pp.skin_median_color(img[0], parsing[0])
        assert np.allclose(dev, ref), (trial, dev, ref)
