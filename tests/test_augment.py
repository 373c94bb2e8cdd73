"""ADA augmentation parity vs the torch reference AugmentPipe.

Uses the reference's debug_percentile mode so both pipelines pick identical
transform parameters; randomness never enters. Geometric borders differ by
design (we reflect analytically instead of the reference's clamped dynamic
margins), so geometric comparisons use interior crops.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pasta_tpu.train.augment import AugmentConfig, augment_pipe

KEY = jax.random.PRNGKey(0)


def nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def nhwc(x):
    return np.transpose(np.asarray(x), (0, 2, 3, 1))


@pytest.fixture(scope="module")
def ref_augment(ref_networks):
    # ref_networks fixture guarantees sys.path + import workarounds
    from training import augment as ref_aug

    return ref_aug


def run_both(ref_augment, cfg_kwargs, dp, n=2, res=64, seed=0):
    import torch

    rng = np.random.RandomState(seed)
    x = rng.rand(n, res, res, 3).astype(np.float32) * 2 - 1

    pipe = ref_augment.AugmentPipe(**cfg_kwargs)
    pipe.p.copy_(torch.ones([]))
    with torch.no_grad():
        ref_y = nhwc(pipe(torch.as_tensor(nchw(x)),
                          debug_percentile=dp).numpy())
    ours = np.asarray(augment_pipe(
        jnp.asarray(x), 1.0, KEY, AugmentConfig(**cfg_kwargs),
        debug_percentile=dp))
    return x, ours, ref_y


class TestColorParity:
    @pytest.mark.parametrize("dp", [0.1, 0.35, 0.5, 0.72, 0.9])
    def test_color_transforms(self, ref_augment, dp):
        cfg = dict(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1)
        _, ours, ref = run_both(ref_augment, cfg, dp)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


class TestGeomParity:
    def test_flip_rot180(self, ref_augment):
        # dp=0.5: xflip=1, rot90 twice -> pure interior permutation, borders
        # match exactly.
        cfg = dict(xflip=1, rotate90=1)
        x, ours, ref = run_both(ref_augment, cfg, 0.5)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-3)

    @pytest.mark.parametrize("dp", [0.3, 0.6])
    def test_geometric_interior(self, ref_augment, dp):
        cfg = dict(scale=1, rotate=1, aniso=1, xfrac=1)
        x, ours, ref = run_both(ref_augment, cfg, dp, res=96)
        m = 24  # interior crop away from border-policy differences
        np.testing.assert_allclose(
            ours[:, m:-m, m:-m], ref[:, m:-m, m:-m], rtol=5e-2, atol=5e-3)

    def test_translation_interior(self, ref_augment):
        cfg = dict(xint=1)
        x, ours, ref = run_both(ref_augment, cfg, 0.8, res=96)
        m = 24
        np.testing.assert_allclose(
            ours[:, m:-m, m:-m], ref[:, m:-m, m:-m], rtol=1e-3, atol=2e-3)


class TestCorruptionParity:
    def test_cutout(self, ref_augment):
        cfg = dict(cutout=1)
        _, ours, ref = run_both(ref_augment, cfg, 0.4)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_imgfilter(self, ref_augment):
        cfg = dict(imgfilter=1)
        _, ours, ref = run_both(ref_augment, cfg, 0.7)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-3)


class TestProbabilityGating:
    def test_p_zero_is_identity(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
        y = augment_pipe(x, 0.0, KEY, AugmentConfig.bgc())
        # p=0: all gates off; geometric path still runs up/downsample, which
        # is near-identity away from borders.
        np.testing.assert_allclose(
            np.asarray(y)[:, 4:-4, 4:-4], np.asarray(x)[:, 4:-4, 4:-4],
            atol=2e-2)

    def test_p_changes_images(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
        y = augment_pipe(x, 1.0, KEY, AugmentConfig.bgc())
        assert not np.allclose(np.asarray(y), np.asarray(x), atol=1e-2)

    def test_jit_with_traced_p(self):
        f = jax.jit(lambda x, p, k: augment_pipe(x, p, k, AugmentConfig.bgc()))
        x = jnp.ones((2, 32, 32, 3))
        out1 = f(x, 0.3, KEY)
        out2 = f(x, 0.7, KEY)  # no recompile needed for new p
        assert out1.shape == out2.shape == x.shape
