"""Capability-parity layer zoo: shapes, gradients, semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pasta_tpu.nn.legacy import (
    FeatureEncoder, PartialConv2dLayer, PartialResBlock, space_to_depth,
    SelfAttention, SpadeModulatedConv2d, MaskPredictingToRGB, AddCoords,
    CoordConv, spectral_normalize, random_affine_matrix, apply_random_crop)
from pasta_tpu.models.patch_discriminator import PatchCoOccurrenceDiscriminator
from pasta_tpu.data.cihp import (
    flip_cihp, parsing2im, label2onehot, cords_to_map)

KEY = jax.random.PRNGKey(0)


class TestLegacyLayers:
    def test_feature_encoder(self):
        m = FeatureEncoder(input_nc=5, ngf=8)
        x = jnp.ones((1, 256, 256, 5))
        v = m.init(KEY, x)
        y = m.apply(v, x)
        assert y.shape == (1, 2, 2, 64)  # 7 downsamplings

    def test_partial_conv_coverage(self):
        m = PartialConv2dLayer(3, 4, 3)
        x = jnp.ones((1, 16, 16, 3))
        mask = jnp.zeros((1, 16, 16, 1)).at[:, 4:12, 4:12].set(1.0)
        v = m.init(KEY, x, mask)
        y_full = m.apply(v, x, jnp.ones((1, 16, 16, 1)))
        y_part = m.apply(v, x, mask)
        assert y_part.shape == (1, 16, 16, 4)
        assert bool(jnp.all(jnp.isfinite(y_part)))
        # interior of the mask: identical to fully-valid conv after coverage
        # normalization... (constant input: coverage-normalized == full)
        np.testing.assert_allclose(
            np.asarray(y_part[:, 6:10, 6:10]),
            np.asarray(y_full[:, 6:10, 6:10]) * 9.0 / 9.0, rtol=2e-4)

    def test_partial_resblock(self):
        m = PartialResBlock(4, 8, down=2)
        x = jnp.ones((1, 16, 16, 4))
        mask = jnp.ones((1, 16, 16, 1))
        v = m.init(KEY, x, mask)
        assert m.apply(v, x, mask).shape == (1, 8, 8, 8)

    def test_space_to_depth(self):
        x = jnp.arange(16.0).reshape(1, 4, 4, 1)
        y = space_to_depth(x, 2)
        assert y.shape == (1, 2, 2, 4)
        np.testing.assert_array_equal(
            np.asarray(y[0, 0, 0]), [0, 1, 4, 5])

    def test_self_attention(self):
        m = SelfAttention(channels=16)
        x = jnp.ones((2, 8, 8, 16))
        v = m.init(KEY, x)
        y = m.apply(v, x)
        assert y.shape == x.shape
        # gamma starts at 0 -> identity
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_spade_modulated_conv(self):
        m = SpadeModulatedConv2d(4, 6)
        x = jnp.ones((2, 8, 8, 4))
        style = jnp.ones((2, 8, 8, 4)) * 0.5
        v = m.init(KEY, x, style)
        assert m.apply(v, x, style).shape == (2, 8, 8, 6)

    @pytest.mark.parametrize("deep", [False, True])
    def test_mask_torgb(self, deep):
        m = MaskPredictingToRGB(8, 3, w_dim=16, is_last=True, deep_heads=deep)
        x = jnp.ones((2, 8, 8, 8))
        w = jnp.ones((2, 16))
        v = m.init(KEY, x, w)
        img, um, lm = m.apply(v, x, w)
        assert img.shape == (2, 8, 8, 3)
        assert um.shape == lm.shape == (2, 8, 8, 1)
        assert float(um.min()) >= 0 and float(um.max()) <= 1

    def test_coordconv(self):
        m = CoordConv(out_channels=4, with_r=True)
        x = jnp.ones((1, 8, 8, 2))
        v = m.init(KEY, x)
        assert m.apply(v, x).shape == (1, 8, 8, 4)

    def test_spectral_normalize(self):
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(8, 16).astype(np.float32))
        u = jnp.asarray(rng.randn(8).astype(np.float32))
        w_sn = w
        for _ in range(30):
            w_sn, u = spectral_normalize(w, u)
        sigma = np.linalg.svd(np.asarray(w_sn), compute_uv=False)[0]
        assert abs(sigma - 1.0) < 1e-3

    def test_random_affine_and_crops(self):
        m = random_affine_matrix(KEY, 4)
        assert m.shape == (4, 3, 3)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                        jnp.float32)
        crops = apply_random_crop(x, KEY, target_size=16, num_crops=3)
        assert crops.shape == (2, 3, 16, 16, 3)
        assert bool(jnp.all(jnp.isfinite(crops)))


class TestPatchDiscriminator:
    @pytest.mark.parametrize("use_ref", [True, False])
    @pytest.mark.slow
    def test_forward(self, use_ref):
        m = PatchCoOccurrenceDiscriminator(
            crop_size=32, num_crops=4, use_reference=use_ref, channel_max=64)
        t = jnp.ones((2, 4, 32, 32, 3))
        r = jnp.ones((2, 2, 32, 32, 3)) if use_ref else None
        v = m.init(KEY, t, r) if use_ref else m.init(KEY, t)
        logits = m.apply(v, t, r) if use_ref else m.apply(v, t)
        assert logits.shape == (2, 4)


class TestCihp:
    def test_flip_swaps_lr(self):
        p = np.zeros((4, 4), np.int64)
        p[0, 0] = 14  # left arm at left edge
        out = flip_cihp(p)
        assert out[0, 3] == 15  # flipped to right edge, right arm label

    def test_parsing2im(self):
        img = parsing2im(np.array([[0, 1], [2, 19]]))
        assert img.shape == (2, 2, 3) and img.dtype == np.uint8
        assert (img[0, 0] == 0).all()

    def test_label2onehot(self):
        oh = np.asarray(label2onehot(np.array([[1, 3]]), 5))
        assert oh.shape == (1, 2, 5)
        assert oh[0, 0, 1] == 1 and oh[0, 1, 3] == 1

    def test_cords_to_map(self):
        kps = np.array([[10, 20, 1.0], [5, 5, 0.05]])
        maps = cords_to_map(kps, (32, 32), sigma=2)
        assert maps.shape == (32, 32, 2)
        assert maps[20, 10, 0] == pytest.approx(1.0)
        assert maps[..., 1].sum() == 0  # low-confidence joint zeroed


class TestZooStragglers:
    """util_classes.py:6-178 — Normalize, apply_offset, EncoderBlock,
    ResBlockDecoder, Jump."""

    def test_channel_normalize_matches_torch(self):
        import torch
        from pasta_tpu.nn.legacy import channel_normalize

        x = np.random.RandomState(0).randn(2, 4, 4, 8).astype(np.float32)
        ours = np.asarray(channel_normalize(jnp.asarray(x)))
        t = torch.from_numpy(x).permute(0, 3, 1, 2)
        norm = t.pow(2).sum(1, keepdim=True).pow(0.5)
        ref = (t / (norm + 1e-7)).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_apply_offset_matches_torch(self):
        import torch
        from pasta_tpu.nn.legacy import apply_offset

        off = np.random.RandomState(1).randn(2, 5, 7, 2).astype(np.float32)
        ours = np.asarray(apply_offset(jnp.asarray(off)))

        toff = torch.from_numpy(off).permute(0, 3, 1, 2)  # [N, 2, H, W]
        sizes = list(toff.size()[2:])
        grids = torch.meshgrid(
            [torch.arange(s) for s in sizes], indexing="ij")
        grids = list(reversed(grids))
        grids = [g.float().unsqueeze(0) + toff[:, d] for d, g in
                 enumerate(grids)]
        grids = [g / ((s - 1.0) / 2.0) - 1.0
                 for g, s in zip(grids, reversed(sizes))]
        ref = torch.stack(grids, dim=-1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    @pytest.mark.slow
    def test_encoder_block_shapes(self):
        from pasta_tpu.nn.legacy import EncoderBlock

        x = jnp.ones((2, 16, 16, 8))
        m = EncoderBlock(out_channels=12, downsample=True)
        vs = m.init(jax.random.PRNGKey(0), x)
        y, _ = m.apply(vs, x, train=True, mutable=["batch_stats"])
        assert y.shape == (2, 8, 8, 12)
        m2 = EncoderBlock(out_channels=12, downsample=False, use_coord=True)
        vs2 = m2.init(jax.random.PRNGKey(0), x)
        y2, _ = m2.apply(vs2, x, train=True, mutable=["batch_stats"])
        assert y2.shape == (2, 16, 16, 12)

    def test_resblock_decoder_shapes(self):
        from pasta_tpu.nn.legacy import ResBlockDecoder

        x = jnp.ones((2, 8, 8, 16))
        m = ResBlockDecoder(out_channels=8, upsample=True)
        vs = m.init(jax.random.PRNGKey(0), x)
        y, _ = m.apply(vs, x, train=True, mutable=["batch_stats"])
        assert y.shape == (2, 16, 16, 8)
        m2 = ResBlockDecoder(out_channels=16, upsample=False)
        vs2 = m2.init(jax.random.PRNGKey(0), x)
        y2, _ = m2.apply(vs2, x, train=True, mutable=["batch_stats"])
        assert y2.shape == (2, 8, 8, 16)

    @pytest.mark.parametrize("use_coord", [False, True])
    def test_jump_shapes(self, use_coord):
        from pasta_tpu.nn.legacy import Jump

        x = jnp.ones((2, 8, 8, 16))
        m = Jump(out_channels=3, kernel_size=3, use_coord=use_coord)
        vs = m.init(jax.random.PRNGKey(0), x)
        y, _ = m.apply(vs, x, train=True, mutable=["batch_stats"])
        assert y.shape == (2, 8, 8, 3)
