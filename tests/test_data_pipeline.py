"""Data pipeline tests: geometry vs cv2, fixture preprocessing invariants."""

import os

import numpy as np
import pytest

from pasta_tpu.data.geometry import (
    get_perspective_transform, get_crop_matrices, BODY_PARTS)
from pasta_tpu.data.pose import draw_pose, get_palm_mask, _fill_quad
from pasta_tpu.data import preprocess as pp
from pasta_tpu.data.testsets import TryonPairDataset, to_model_inputs

FIXTURES = "/root/reference/test_datas"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="fixture data not available")


class TestPerspectiveTransform:
    def test_matches_cv2(self):
        import cv2

        rng = np.random.RandomState(0)
        for _ in range(20):
            src = rng.rand(4, 2).astype(np.float32) * 512
            dst = np.float32([[0, 0], [0, 128], [128, 128], [128, 0]])
            ours = get_perspective_transform(src, dst)
            ref = cv2.getPerspectiveTransform(src, dst)
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_roundtrip(self):
        src = np.float32([[10, 20], [30, 400], [500, 380], [450, 40]])
        dst = np.float32([[0, 0], [0, 128], [128, 128], [128, 0]])
        m = get_perspective_transform(src, dst)
        pts = np.concatenate([src, np.ones((4, 1))], axis=1)
        proj = (m @ pts.T).T
        proj = proj[:, :2] / proj[:, 2:3]
        np.testing.assert_allclose(proj, dst, atol=1e-3)


class TestQuadFill:
    def test_axis_aligned_square(self):
        quad = np.array([[2, 2], [2, 6], [6, 6], [6, 2]], np.float64)
        mask = _fill_quad(quad, (10, 10))
        assert mask[4, 4, 0] == 1
        assert mask[0, 0, 0] == 0
        assert mask.sum() == 25  # inclusive 5x5

    def test_winding_invariance(self):
        quad_ccw = np.array([[2, 2], [6, 2], [6, 6], [2, 6]], np.float64)
        quad_cw = quad_ccw[::-1]
        a = _fill_quad(quad_ccw, (10, 10))
        b = _fill_quad(quad_cw, (10, 10))
        np.testing.assert_array_equal(a, b)


class TestPoseDraw:
    def test_border_invalidate(self):
        joints = np.zeros((18, 3))
        joints[9] = [10, 500, 0.9]   # rknee near bottom -> invalidated
        joints[0] = [100, 100, 0.9]  # nose fine
        img, joints = draw_pose(joints, (512, 320))
        assert joints[9][2] == 0.01
        assert img.shape == (512, 320, 3)
        assert img.sum() > 0  # nose disk drawn

    def test_empty(self):
        img, joints = draw_pose(np.zeros((18, 3)), (512, 320))
        assert img.sum() == 0


@needs_fixtures
class TestFixturePipeline:
    @pytest.fixture(scope="class")
    def records(self):
        ds = TryonPairDataset(FIXTURES, "test_pairs.txt", mode="upper")
        person_name, clothes_name = ds.pairs[0]
        person = pp.load_person(FIXTURES, person_name)
        clothes = pp.load_person(FIXTURES, clothes_name,
                                 with_garment_parsing=True)
        return person, clothes

    def test_load_person(self, records):
        person, clothes = records
        assert person.image.shape == (512, 512, 3)
        assert person.pose_img.shape == (512, 512, 3)
        assert person.parsing.shape == (512, 512, 1)
        assert person.keypoints.shape == (18, 3)
        assert clothes.garment_parsing is not None

    def test_crop_matrices(self, records):
        person, _ = records
        n_valid = 0
        for ii in range(len(BODY_PARTS)):
            m, m_inv = get_crop_matrices(person.keypoints, ii, 128, 128, 512, 512)
            if m is not None:
                n_valid += 1
                # M and M_inv must be inverse transforms
                prod = m.astype(np.float64) @ m_inv.astype(np.float64)
                prod /= prod[2, 2]
                np.testing.assert_allclose(prod, np.eye(3), atol=1e-2)
        assert n_valid >= 6  # fashion images have most joints

    def test_palm_mask(self, records):
        person, _ = records
        palm = get_palm_mask(person.keypoints, person.parsing)
        assert palm.shape == (512, 512, 1)
        assert palm.dtype == np.uint8

    @pytest.mark.parametrize("mode", ["upper", "lower", "full"])
    def test_preprocess_modes(self, records, mode):
        person, clothes = records
        if mode == "lower":
            person_gp = pp.load_person(FIXTURES, person.name,
                                       with_garment_parsing=True)
            item = pp.preprocess_pair(person_gp, clothes, mode)
        else:
            item = pp.preprocess_pair(person, clothes, mode)
        assert item["norm_img"].shape == (128, 128, 30)
        assert item["norm_img_lower"].shape == (128, 128, 15)
        assert item["denorm_upper_img"].shape == (512, 512, 3)
        assert item["retain_mask"].shape == (512, 512, 1)
        assert item["lower_label_map"].shape == (512, 512, 1)
        # some garment pixels must survive the warp round trip
        assert item["norm_img"].sum() > 0
        assert item["denorm_upper_img"].sum() > 0

    def test_model_inputs(self, records):
        person, clothes = records
        item = pp.preprocess_pair(person, clothes, "upper")
        inputs, extras = to_model_inputs([item, item])
        assert inputs["c"].shape == (2, 128, 128, 45)
        assert inputs["retain"].shape == (2, 512, 512, 6)
        assert inputs["pose"].shape == (2, 512, 512, 5)
        for v in inputs.values():
            assert np.isfinite(v).all()
        # value ranges after [0,255] -> [-1,1]
        assert inputs["c"].min() >= -1.0 and inputs["c"].max() <= 1.0

    def test_dataset_iteration(self):
        ds = TryonPairDataset(FIXTURES, "test_pairs.txt", mode="upper")
        assert len(ds) == 25
        item = ds[0]
        assert item["person_name"].endswith(".jpg")
