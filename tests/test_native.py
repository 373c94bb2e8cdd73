"""Native C++ plugin parity vs cv2."""

import os

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


class TestNativeDecode:
    """libjpeg/libpng decode parity vs PIL on the reference fixtures."""

    FIXTURES = "/root/reference/test_datas"

    def _pil(self, data):
        import io
        import PIL.Image

        return np.array(PIL.Image.open(io.BytesIO(data)))

    def _fixture_files(self):
        import glob
        import os

        out = []
        for sub in ("image", "parsing", "garment_parsing"):
            out += sorted(glob.glob(os.path.join(self.FIXTURES, sub, "*")))[:4]
        return out

    def test_fixture_parity_vs_pil(self):
        import os

        files = self._fixture_files()
        if not files:
            pytest.skip("fixtures missing")
        for path in files:
            with open(path, "rb") as f:
                data = f.read()
            ref = self._pil(data)
            ours = native.decode_image(data)
            assert ours.shape == ref.shape, os.path.basename(path)
            if path.endswith((".png", ".PNG")):
                # PNG decode is lossless -> bit exact (incl. palette indices)
                np.testing.assert_array_equal(ours, ref)
            else:
                # JPEG IDCT implementations may differ by +-1 LSB
                assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1, \
                    os.path.basename(path)

    def test_synthetic_roundtrips(self):
        import io
        import PIL.Image

        rng = np.random.RandomState(0)
        rgb = rng.randint(0, 255, (33, 47, 3), np.uint8)
        gray = rng.randint(0, 255, (21, 17), np.uint8)
        pal = rng.randint(0, 7, (30, 20), np.uint8)
        # RGB png
        buf = io.BytesIO()
        PIL.Image.fromarray(rgb).save(buf, "PNG")
        np.testing.assert_array_equal(native.decode_image(buf.getvalue()), rgb)
        # gray png
        buf = io.BytesIO()
        PIL.Image.fromarray(gray).save(buf, "PNG")
        np.testing.assert_array_equal(native.decode_image(buf.getvalue()), gray)
        # palette png -> index plane
        img = PIL.Image.fromarray(pal, mode="P")
        img.putpalette([v for i in range(256) for v in (i, 0, 255 - i)])
        buf = io.BytesIO()
        img.save(buf, "PNG")
        np.testing.assert_array_equal(native.decode_image(buf.getvalue()), pal)
        # jpeg: decode matches PIL within IDCT tolerance
        buf = io.BytesIO()
        PIL.Image.fromarray(rgb).save(buf, "JPEG", quality=95)
        ours = native.decode_image(buf.getvalue())
        ref = np.array(PIL.Image.open(io.BytesIO(buf.getvalue())))
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1

    def test_unknown_format_raises(self):
        with pytest.raises(ValueError):
            native.decode_image(b"not an image at all")

    def test_batch_decode(self):
        import io
        import PIL.Image

        rng = np.random.RandomState(2)
        imgs = rng.randint(0, 255, (5, 24, 16, 3), np.uint8)
        blobs = []
        for i in range(5):
            buf = io.BytesIO()
            PIL.Image.fromarray(imgs[i]).save(buf, "PNG")
            blobs.append(buf.getvalue())
        out = native.decode_batch(blobs, 24, 16, 3)
        np.testing.assert_array_equal(out, imgs)

    def test_batch_decode_dim_mismatch_raises(self):
        import io
        import PIL.Image

        buf = io.BytesIO()
        PIL.Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(buf, "PNG")
        with pytest.raises(ValueError):
            native.decode_batch([buf.getvalue()], 16, 16, 3)


class TestNativeWarpDegenerate:
    def test_degenerate_denominator_is_border_zero(self):
        # Pixels on the horizon line (denom ~ 0) must write BORDER_CONSTANT(0)
        # like cv2/JAX, not sample source pixel (0, 0).
        img = np.full((1, 8, 8, 1), 200, np.uint8)
        m = np.eye(3)
        m[2] = [0.0, 0.0, 0.0]  # denominator identically zero everywhere
        out = native.warp_perspective_batch(img[:1], m[None], 8, 8)
        np.testing.assert_array_equal(out, 0)


@pytest.mark.skipif(not os.path.isdir("/root/reference/test_datas"),
                    reason="fixture data not mounted")
def test_label_plane_decode_matches_cv2_all_color_types():
    """_decode_label_plane == cv2.imread-channel-0 for every fixture
    parsing sidecar (grayscale AND truecolor go through the native path)."""
    import cv2

    from pasta_tpu.data.preprocess import _decode_label_plane
    from pasta_tpu.data.roots import as_root

    root = as_root("/root/reference/test_datas")
    for d in ("parsing", "garment_parsing"):
        names = sorted(os.listdir(os.path.join("/root/reference/test_datas",
                                               d)))[:6]
        for nm in names:
            rel = f"{d}/{nm}"
            got = _decode_label_plane(root, rel)
            ref = cv2.imdecode(
                np.frombuffer(root.read(rel), np.uint8),
                cv2.IMREAD_COLOR)[..., 0:1]
            assert np.array_equal(got, ref), rel


def test_label_plane_palette_decode_matches_cv2(tmp_path):
    """Palette PNGs: native index plane + python PLTE blue lookup ==
    cv2's palette-expanded channel 0."""
    import io

    import cv2
    import PIL.Image

    from pasta_tpu.data.preprocess import _decode_label_plane
    from pasta_tpu.data.roots import as_root

    rng = np.random.RandomState(4)
    idx = rng.randint(0, 20, (40, 30), np.uint8)
    img = PIL.Image.fromarray(idx, mode="P")
    img.putpalette([v for i in range(256) for v in (i, 255 - i, (i * 7) % 256)])
    path = tmp_path / "p.png"
    img.save(path, "PNG")
    data = path.read_bytes()
    assert data[25] == 3  # palette color type

    got = _decode_label_plane(as_root(str(tmp_path)), "p.png")
    ref = cv2.imdecode(np.frombuffer(data, np.uint8),
                       cv2.IMREAD_COLOR)[..., 0:1]
    assert np.array_equal(got, ref)
    # the blue entries are (i*7)%256 -> nontrivial mapping exercised
    assert not np.array_equal(got[..., 0], idx)
