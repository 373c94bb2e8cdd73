"""Native C++ plugin parity vs cv2."""

import numpy as np
import pytest
import cv2

from pasta_tpu import native
from pasta_tpu.data.geometry import get_perspective_transform

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native plugin: {native.build_error()}")


class TestNativeWarp:
    def test_matches_cv2(self):
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 255, (4, 96, 80, 3), np.uint8)
        src_pts = np.float32([[5, 8], [10, 90], [70, 85], [66, 4]])
        dst_pts = np.float32([[0, 0], [0, 128], [128, 128], [128, 0]])
        m = get_perspective_transform(src_pts, dst_pts)
        mats = np.stack([np.linalg.inv(m)] * 4)
        ours = native.warp_perspective_batch(imgs, mats, 128, 128)
        for i in range(4):
            ref = cv2.warpPerspective(
                imgs[i], m.astype(np.float64), (128, 128),
                borderMode=cv2.BORDER_CONSTANT)
            # cv2 uses fixed-point bilinear (5-bit fractional): allow +-1
            assert np.abs(ours[i].astype(int) - ref.astype(int)).max() <= 1

    def test_identity(self):
        img = np.arange(64, dtype=np.uint8).reshape(1, 8, 8, 1)
        eye = np.eye(3)[None]
        out = native.warp_perspective_batch(img, eye, 8, 8)
        np.testing.assert_array_equal(out, img)


class TestNativeErode:
    @pytest.mark.parametrize("k", [5, 8])
    def test_matches_cv2(self, k):
        rng = np.random.RandomState(1)
        masks = (rng.rand(6, 64, 64) > 0.4).astype(np.uint8) * 255
        ours = native.erode_batch(masks, k)
        for i in range(6):
            ref = cv2.erode(masks[i], np.ones((k, k), np.uint8), iterations=1)
            np.testing.assert_array_equal(ours[i], ref)


    def test_degenerate_denominator_is_border_zero(self):
        # Pixels on the horizon line (denom ~ 0) must write BORDER_CONSTANT(0)
        # like cv2/JAX, not sample source pixel (0, 0).
        img = np.full((1, 8, 8, 1), 200, np.uint8)
        m = np.eye(3)
        m[2] = [0.0, 0.0, 0.0]  # denominator identically zero everywhere
        out = native.warp_perspective_batch(img[:1], m[None], 8, 8)
        np.testing.assert_array_equal(out, 0)
