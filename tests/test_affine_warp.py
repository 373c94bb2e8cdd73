"""Tests for ops/affine_warp.py — the TPU-native two-pass affine warp.

The pointwise-gather path is the oracle (itself parity-tested against torch
grid_sample via tests/test_augment.py). The two-pass path must be:
  * bit-exact on integer translations, flips, rot90 (frac parts are zero);
  * near-exact on fractional translations and pure scales;
  * close (PSNR) on rotations, where it composes two linear interpolations;
  * an exact adjoint (vjp check), since the backward pass is a custom kernel.
Runs on CPU via the plain-jnp shift backend; the Pallas backend is covered
by scripts/bench_gather.py + the TPU train-step benches.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pasta_tpu.ops.affine_warp import (affine_warp_twopass,
                                       bilinear_warp_gather)

H = 64


def mat_of(theta=0.0, s=1.0, tx=0.0, ty=0.0, aniso=1.0):
    c0 = (H - 1) / 2
    a = np.array([[np.cos(theta) * s * aniso, -np.sin(theta) * s, 0],
                  [np.sin(theta) * s * aniso, np.cos(theta) * s, 0],
                  [0, 0, 1.0]])
    t1 = np.array([[1, 0, -c0], [0, 1, -c0], [0, 0, 1.0]])
    t2 = np.array([[1, 0, c0 + tx], [0, 1, c0 + ty], [0, 0, 1.0]])
    return (t2 @ a @ t1).astype(np.float32)


@pytest.fixture(scope="module")
def smooth_img():
    from scipy.ndimage import gaussian_filter
    rng = np.random.RandomState(0)
    x = np.stack([gaussian_filter(rng.rand(H, H, 3), (2, 2, 0))
                  for _ in range(2)]).astype(np.float32)
    return jnp.asarray(x)


@pytest.fixture(scope="module")
def noise_img():
    rng = np.random.RandomState(1)
    return jnp.asarray(rng.rand(2, H, H, 3).astype(np.float32))


def both(img, mats):
    m = jnp.asarray(np.stack(mats))
    ref = bilinear_warp_gather(img, m)
    got = affine_warp_twopass(img, m, use_pallas=False)
    return np.asarray(ref), np.asarray(got)


class TestExactCases:
    def test_identity(self, noise_img):
        ref, got = both(noise_img, [mat_of(), mat_of()])
        np.testing.assert_array_equal(ref, got)

    def test_integer_translate(self, noise_img):
        ref, got = both(noise_img, [mat_of(tx=5, ty=-7), mat_of(tx=-30)])
        np.testing.assert_allclose(ref, got, atol=1e-6)

    def test_rot90_and_flip(self, noise_img):
        # rot90 k=1..3 and xflip land on integer lattices
        ref, got = both(noise_img, [mat_of(theta=np.pi / 2),
                                    mat_of(theta=np.pi)])
        np.testing.assert_allclose(ref, got, atol=1e-6)
        flip = mat_of()
        flip[0, 0] = -1
        flip[0, 2] = H - 1
        ref, got = both(noise_img, [flip, mat_of(theta=-np.pi / 2)])
        np.testing.assert_allclose(ref, got, atol=1e-6)

    def test_fractional_translate(self, noise_img):
        ref, got = both(noise_img, [mat_of(tx=0.37, ty=-0.61),
                                    mat_of(tx=2.5, ty=3.5)])
        np.testing.assert_allclose(ref, got, atol=1e-5)

    def test_pure_scale(self, smooth_img):
        ref, got = both(smooth_img, [mat_of(s=1.3), mat_of(s=0.8)])
        np.testing.assert_allclose(ref, got, atol=1e-5)


class TestRotationQuality:
    @pytest.mark.parametrize("theta,s,aniso", [
        (0.3, 1.0, 1.0), (-1.2, 0.8, 0.8), (0.5, 1.25, 1.3), (2.5, 1.0, 1.0)])
    def test_psnr(self, smooth_img, theta, s, aniso):
        ref, got = both(smooth_img, [mat_of(theta, s, 1.2, -0.7, aniso)] * 2)
        mse = float(np.mean((ref - got) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-16))
        assert psnr > 30, f"PSNR {psnr:.1f} dB too low"

    def test_mirror_reach(self, smooth_img):
        # huge translation forces sampling deep into mirrored territory
        ref, got = both(smooth_img, [mat_of(tx=50, ty=-80),
                                     mat_of(0.4, 1.0, 70, 10)])
        # integer part exact for the pure translation
        np.testing.assert_allclose(ref[0], got[0], atol=1e-5)
        mse = float(np.mean((ref[1] - got[1]) ** 2))
        assert 10 * np.log10(1.0 / max(mse, 1e-16)) > 28


class TestAdjoint:
    def test_vjp_is_exact_adjoint(self, noise_img):
        mats = jnp.asarray(np.stack(
            [mat_of(0.5, 1.25, 1.2, -0.7, 1.3), mat_of(-0.7, 0.8)]))
        f = lambda im: affine_warp_twopass(im, mats, use_pallas=False)
        out, vjp = jax.vjp(f, noise_img)
        rng = np.random.RandomState(2)
        y = jnp.asarray(rng.rand(*out.shape).astype(np.float32))
        lhs = float(jnp.vdot(out, y))
        rhs = float(jnp.vdot(noise_img, vjp(y)[0]))
        assert abs(lhs - rhs) < 1e-2 * abs(lhs) + 1e-4

    def test_grad_matches_gather_on_integer_case(self, noise_img):
        mats = jnp.asarray(np.stack([mat_of(tx=5, ty=-7),
                                     mat_of(theta=np.pi / 2)]))
        g1 = jax.grad(lambda im: jnp.sum(
            jnp.sin(3 * bilinear_warp_gather(im, mats))))(noise_img)
        g2 = jax.grad(lambda im: jnp.sum(
            jnp.sin(3 * affine_warp_twopass(im, mats,
                                            use_pallas=False))))(noise_img)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


class TestAugmentIntegration:
    @pytest.mark.slow
    def test_twopass_impl_close_to_gather(self):
        from pasta_tpu.train.augment import AugmentConfig, augment_pipe
        rng = np.random.RandomState(3)
        from scipy.ndimage import gaussian_filter
        x = np.stack([gaussian_filter(rng.rand(H, H, 3), (2, 2, 0))
                      for _ in range(2)]).astype(np.float32) * 2 - 1
        x = jnp.asarray(x)
        key = jax.random.PRNGKey(0)
        cfg = AugmentConfig.bgc()
        a = augment_pipe(x, 0.7, key, cfg, impl="gather")
        b = augment_pipe(x, 0.7, key, cfg, impl="twopass")
        mse = float(jnp.mean((a - b) ** 2))
        dyn = float(jnp.mean(a ** 2))
        assert mse < 0.02 * dyn, (mse, dyn)


class TestUpfirdnMatrices:
    def test_upsample_matrix_matches_upsample2d(self):
        from pasta_tpu.ops import setup_filter, upsample2d
        from pasta_tpu.ops.affine_warp import _upsample_matrix
        from pasta_tpu.train.augment import WAVELETS
        f = setup_filter(WAVELETS["sym6"])
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(2, 36, 36, 3).astype(np.float32))
        ref = np.asarray(upsample2d(x, f, up=2))
        u = jnp.asarray(_upsample_matrix(f, 36))
        xp = jnp.transpose(x, (0, 3, 1, 2))
        xp = jnp.einsum("ij,ncyj->ncyi", u, xp)
        xp = jnp.einsum("ij,ncjx->ncix", u, xp)
        got = np.asarray(jnp.transpose(xp, (0, 2, 3, 1)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_downsample_matrix_matches_downsample2d(self):
        from pasta_tpu.ops import setup_filter, downsample2d
        from pasta_tpu.ops.affine_warp import _downsample_matrix
        from pasta_tpu.train.augment import WAVELETS
        f = setup_filter(WAVELETS["sym6"])
        rng = np.random.RandomState(1)
        m = 6
        x = jnp.asarray(rng.rand(2, 96, 96, 3).astype(np.float32))
        ref = np.asarray(downsample2d(x, f, down=2, padding=-2 * m,
                                      flip_filter=True))
        d = jnp.asarray(_downsample_matrix(f, 96, extra_pad=-2 * m))
        xp = jnp.transpose(x, (0, 3, 1, 2))
        xp = jnp.einsum("ij,ncyj->ncyi", d, xp)
        xp = jnp.einsum("ij,ncjx->ncix", d, xp)
        got = np.asarray(jnp.transpose(xp, (0, 2, 3, 1)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-5)


class TestGeomPipeline:
    def _both(self, img, mats, m=6):
        """planar twopass pipeline vs pad+up+gather-warp+down."""
        from pasta_tpu.ops import setup_filter, upsample2d, downsample2d
        from pasta_tpu.ops.affine_warp import geom_resample_twopass
        from pasta_tpu.train.augment import WAVELETS
        f = setup_filter(WAVELETS["sym6"])
        mats = jnp.asarray(np.stack(mats))
        padded = jnp.pad(img, ((0, 0), (m, m), (m, m), (0, 0)),
                         mode="reflect")
        up = upsample2d(padded, f, up=2)
        up = bilinear_warp_gather(up, mats)
        ref = downsample2d(up, f, down=2, padding=-2 * m, flip_filter=True)
        got = geom_resample_twopass(img, mats, f, m, use_pallas=False)
        return np.asarray(ref), np.asarray(got)

    def test_identity_and_integer_translate(self, noise_img):
        c0 = (H + 2 * 6) * 2  # up-canvas size
        def up_mat(tx, ty):
            a = np.eye(3, dtype=np.float32)
            a[0, 2] = tx
            a[1, 2] = ty
            return a
        ref, got = self._both(noise_img, [up_mat(0, 0), up_mat(4, -8)])
        np.testing.assert_allclose(ref, got, atol=1e-4)

    def test_rotation_psnr(self, smooth_img):
        c0 = ((H + 12) * 2 - 1) / 2
        th = 0.4
        a = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1.0]], np.float32)
        t1 = np.array([[1, 0, -c0], [0, 1, -c0], [0, 0, 1.0]])
        t2 = np.array([[1, 0, c0], [0, 1, c0], [0, 0, 1.0]])
        mat = (t2 @ a @ t1).astype(np.float32)
        ref, got = self._both(smooth_img, [mat, mat])
        mse = float(np.mean((ref - got) ** 2))
        assert 10 * np.log10(1.0 / max(mse, 1e-16)) > 32


class TestSPMD:
    """The shift kernels under multi-device SPMD (shard_map path).

    pallas_call does not partition under plain jit SPMD, so _row_shift
    runs per-shard via shard_map when a mesh is passed. Runs on the
    8-device CPU mesh (conftest forces the host-device count)."""

    def _mesh(self):
        from jax.sharding import Mesh
        devs = np.asarray(jax.devices()[:8])
        return Mesh(devs, ("data",))

    def test_row_shift_sharded_matches_single(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from pasta_tpu.ops.affine_warp import _row_shift

        mesh = self._mesh()
        rng = np.random.RandomState(0)
        r, v, out_w = 64, 512, 256
        wide = jnp.asarray(rng.rand(r, v).astype(np.float32))
        q = jnp.asarray(rng.rand(r).astype(np.float32) * 100)

        ref = _row_shift(wide, q, out_w, use_pallas=False)
        sh = NamedSharding(mesh, P("data"))
        widesh = jax.device_put(wide, sh)
        qsh = jax.device_put(q, sh)
        for use_pallas in (False, True):  # True = pallas interpret per shard
            got = jax.jit(
                lambda w_, q_: _row_shift(w_, q_, out_w, use_pallas, mesh)
            )(widesh, qsh)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-5)

    def test_row_shift_sharded_grad(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from pasta_tpu.ops.affine_warp import _row_shift

        mesh = self._mesh()
        rng = np.random.RandomState(1)
        r, v, out_w = 64, 384, 128  # r/8 blocks must divide the mesh
        wide = jnp.asarray(rng.rand(r, v).astype(np.float32))
        q = jnp.asarray(rng.rand(r).astype(np.float32) * 50)
        g_ref = jax.grad(lambda w_: jnp.sum(
            jnp.sin(_row_shift(w_, q, out_w, False))))(wide)
        sh = NamedSharding(mesh, P("data"))
        g_sh = jax.jit(jax.grad(lambda w_: jnp.sum(jnp.sin(
            _row_shift(w_, q, out_w, False, mesh)))))(
                jax.device_put(wide, sh))
        np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                                   atol=1e-5)

    @pytest.mark.slow
    def test_train_step_twopass_on_mesh(self):
        """Full smoke train step over the 8-device mesh with the twopass
        ADA warp (jnp backend under shard_map)."""
        import dataclasses
        from pasta_tpu.train.config import smoke_config
        from pasta_tpu.train.entry import make_mesh, replicate, shard_batch
        from pasta_tpu.train.state import init_state, example_batch
        from pasta_tpu.train.steps import make_train_step

        cfg = dataclasses.replace(smoke_config(8), ada_impl="twopass",
                                  augment_p_init=0.9)
        mesh = make_mesh(8)
        state = replicate(init_state(cfg, jax.random.PRNGKey(0)), mesh)
        step = make_train_step(cfg, mesh=mesh)
        batch = shard_batch(example_batch(cfg, np.random.RandomState(0)),
                            mesh)
        state, metrics = step(state, batch, jax.random.PRNGKey(1),
                              do_r1_d=True, do_r1_dp=True)
        for k, val in metrics.items():
            assert np.isfinite(float(val)), k
