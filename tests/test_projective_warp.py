"""Parity tests: ops.projective_warp (one-hot matmul two-pass) vs the
pointwise-gather oracle (data.device_warp.warp_perspective*), which itself
is parity-tested against cv2.warpPerspective in test_device_warp.py.

Like the affine two-pass (test_affine_warp.py), exactness is asserted where
the decomposition is exact (integer translations, axis-aligned maps,
quarter-turns) and PSNR elsewhere (the two chained linear interpolations
form a slightly softer hat*hat kernel than one 2-D bilinear tap).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import cv2

from pasta_tpu.data.device_warp import (
    warp_perspective, warp_perspective_multi)
from pasta_tpu.ops.projective_warp import (
    warp_perspective_matmul, warp_perspective_matmul_multi)


def _rand_h(rng, src=64, out=64, persp=0.3, scale_lo=0.2, scale_hi=0.45):
    """dst->src homography of a random rotated/perspective quad."""
    dst = np.float32([[0, 0], [out - 1, 0], [out - 1, out - 1], [0, out - 1]])
    c = src / 2
    ang = rng.uniform(0, 2 * np.pi)
    rot = np.float32([[np.cos(ang), -np.sin(ang)],
                      [np.sin(ang), np.cos(ang)]])
    base = np.float32([[-1, -1], [1, -1], [1, 1], [-1, 1]]) \
        * rng.uniform(src * scale_lo, src * scale_hi)
    quad = (base @ rot.T) + c + rng.uniform(
        -persp * src * 0.2, persp * src * 0.2, (4, 2)).astype(np.float32)
    return cv2.getPerspectiveTransform(dst, quad.astype(np.float32))


def _smooth(rng, n, s, c):
    x = rng.uniform(0, 255, (n, s, s, c)).astype(np.float32)
    return np.stack([cv2.GaussianBlur(v, (5, 5), 1.2).reshape(s, s, c)
                     for v in x])


def _psnr(a, b, peak=255.0):
    mse = float(np.mean((a - b) ** 2))
    return np.inf if mse == 0 else 10 * np.log10(peak * peak / mse)


class TestExactness:
    def test_integer_translation_exact(self):
        rng = np.random.RandomState(0)
        src = rng.uniform(0, 255, (4, 64, 64, 3)).astype(np.float32)
        m = np.tile(np.eye(3, dtype=np.float32), (4, 1, 1))
        m[:, 0, 2] = [-9, 0, 5, 17]
        m[:, 1, 2] = [3, -12, 0, 8]
        ref = np.asarray(warp_perspective(jnp.asarray(src), jnp.asarray(m), 64, 64))
        got = np.asarray(warp_perspective_matmul(
            jnp.asarray(src), jnp.asarray(m), 64, 64))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_quarter_turn_exact(self):
        rng = np.random.RandomState(1)
        src = rng.uniform(0, 255, (2, 64, 64, 1)).astype(np.float32)
        m = np.zeros((2, 3, 3), np.float32)
        m[:, 0, 1] = 1.0
        m[:, 1, 0] = -1.0
        m[:, 1, 2] = 63.0
        m[:, 2, 2] = 1.0
        ref = np.asarray(warp_perspective(jnp.asarray(src), jnp.asarray(m), 64, 64))
        got = np.asarray(warp_perspective_matmul(
            jnp.asarray(src), jnp.asarray(m), 64, 64))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_axis_aligned_scale_matches_gather(self):
        # No rotation/perspective: pass 1 is the only fractional resample in
        # x and pass 2 in y -> identical taps to the 2-D bilinear gather.
        rng = np.random.RandomState(2)
        src = rng.uniform(0, 255, (2, 64, 64, 2)).astype(np.float32)
        m = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
        m[:, 0, 0] = [0.53, 1.71]
        m[:, 1, 1] = [1.37, 0.66]
        m[:, 0, 2] = [2.25, -3.5]
        m[:, 1, 2] = [-1.75, 0.3]
        ref = np.asarray(warp_perspective(jnp.asarray(src), jnp.asarray(m), 96, 96))
        got = np.asarray(warp_perspective_matmul(
            jnp.asarray(src), jnp.asarray(m), 96, 96))
        np.testing.assert_allclose(got, ref, atol=2e-3)


class TestPsnr:
    def test_random_quads(self):
        rng = np.random.RandomState(3)
        src = _smooth(rng, 6, 64, 3)
        m = np.stack([_rand_h(rng) for _ in range(6)]).astype(np.float32)
        ref = np.asarray(warp_perspective(jnp.asarray(src), jnp.asarray(m), 96, 96))
        got = np.asarray(warp_perspective_matmul(
            jnp.asarray(src), jnp.asarray(m), 96, 96))
        assert _psnr(ref, got) > 40, _psnr(ref, got)

    def test_strong_perspective(self):
        rng = np.random.RandomState(4)
        src = _smooth(rng, 6, 64, 3)
        m = np.stack([_rand_h(rng, persp=1.0)
                      for _ in range(6)]).astype(np.float32)
        ref = np.asarray(warp_perspective(jnp.asarray(src), jnp.asarray(m), 96, 96))
        got = np.asarray(warp_perspective_matmul(
            jnp.asarray(src), jnp.asarray(m), 96, 96))
        assert _psnr(ref, got) > 40, _psnr(ref, got)

    def test_mask_channel_threshold(self):
        # The downstream consumer thresholds warped {0,255} masks at 254.5
        # after erosion; boundary softening must only move edge pixels.
        rng = np.random.RandomState(5)
        yy, xx = np.mgrid[0:64, 0:64]
        mask = (((xx - 32) ** 2 + (yy - 32) ** 2) < 24 ** 2
                ).astype(np.float32)[None, :, :, None] * 255.0
        mask = np.tile(mask, (4, 1, 1, 1))
        m = np.stack([_rand_h(rng) for _ in range(4)]).astype(np.float32)
        ref = np.asarray(warp_perspective(jnp.asarray(mask), jnp.asarray(m), 96, 96))
        got = np.asarray(warp_perspective_matmul(
            jnp.asarray(mask), jnp.asarray(m), 96, 96))
        rm, gm = ref >= 254.5, got >= 254.5
        frac = (rm != gm).mean()
        assert frac < 0.01, frac

    def test_bf16_weights_close(self):
        rng = np.random.RandomState(6)
        src = _smooth(rng, 4, 64, 3)
        m = np.stack([_rand_h(rng) for _ in range(4)]).astype(np.float32)
        f32 = np.asarray(warp_perspective_matmul(
            jnp.asarray(src), jnp.asarray(m), 96, 96))
        b16 = np.asarray(warp_perspective_matmul(
            jnp.asarray(src), jnp.asarray(m), 96, 96,
            w_dtype=jnp.bfloat16, precision=jax.lax.Precision.DEFAULT))
        assert _psnr(f32, b16) > 40, _psnr(f32, b16)


class TestMultiApi:
    def test_matches_gather_multi(self):
        rng = np.random.RandomState(7)
        stack = np.stack([_smooth(rng, 3, 64, 4) for _ in range(2)])
        src_idx = np.array([0, 1, 2, 0, 2])
        m = np.stack([np.stack([_rand_h(rng) for _ in range(5)])
                      for _ in range(2)]).astype(np.float32)
        ref = np.asarray(warp_perspective_multi(
            jnp.asarray(stack), src_idx, jnp.asarray(m), 96, 96))
        got = np.asarray(warp_perspective_matmul_multi(
            jnp.asarray(stack), src_idx, jnp.asarray(m), 96, 96,
            part_chunk=2))
        assert got.shape == ref.shape
        assert _psnr(ref, got) > 40, _psnr(ref, got)

    def test_zero_matrices_finite(self):
        # Invalid parts carry all-zero matrices (masked downstream); the
        # warp must stay finite like the gather oracle.
        src = np.ones((2, 64, 64, 4), np.float32) * 100
        m = np.zeros((2, 3, 3), np.float32)
        got = np.asarray(warp_perspective_matmul(
            jnp.asarray(src), jnp.asarray(m), 32, 32))
        assert np.isfinite(got).all()

    def test_gradients_flow(self):
        # Unlike the affine Pallas kernels, this path is plain jnp: grads
        # through the source must exist and be finite (used if a training
        # objective ever differentiates through device preprocessing).
        rng = np.random.RandomState(8)
        src = jnp.asarray(_smooth(rng, 1, 32, 1))
        m = jnp.asarray(_rand_h(rng, src=32, out=32)[None].astype(np.float32))

        def f(x):
            return jnp.sum(warp_perspective_matmul(x, m, 32, 32) ** 2)

        g = jax.grad(f)(src)
        assert np.isfinite(np.asarray(g)).all()


class TestSourceWindow:
    def test_windowed_matches_full(self):
        """Windowed cut (host-style offsets covering each quad) must equal
        the unwindowed matmul warp exactly (integer crop + translated H)."""
        rng = np.random.RandomState(9)
        stack = rng.uniform(0, 255, (2, 2, 128, 128, 3)).astype(np.float32)
        src_idx = np.array([0, 1, 0])
        # quads confined to a 64px region so a 64-window always fits
        mats = []
        for b in range(2):
            row = []
            for _ in range(3):
                m = _rand_h(rng, src=48, out=32, scale_lo=0.15, scale_hi=0.28)
                # shift the quad into a random part of the 128 source
                t = np.eye(3)
                t[0, 2], t[1, 2] = rng.randint(0, 70), rng.randint(0, 70)
                row.append(t @ m)
            mats.append(np.stack(row))
        mats = np.stack(mats).astype(np.float32)

        # host-side window layout
        from pasta_tpu.data.device_warp import cut_window_layout
        offs = np.zeros((2, 3, 2), np.int32)
        fits = True
        for b in range(2):
            o, f = cut_window_layout(mats[b], [True] * 3, res=128, win=64,
                                     margin=4, patch=32)
            offs[b] = o
            fits = fits and f
        assert fits

        full = np.asarray(warp_perspective_matmul_multi(
            jnp.asarray(stack), src_idx, jnp.asarray(mats), 32, 32))
        win = np.asarray(warp_perspective_matmul_multi(
            jnp.asarray(stack), src_idx, jnp.asarray(mats), 32, 32,
            src_window_offsets=jnp.asarray(offs), src_window=64))
        # identical sampling; tolerance covers fp32 re-association in the
        # translated position polynomials
        np.testing.assert_allclose(win, full, atol=1e-2)

    def test_oversize_quad_reports_no_fit(self):
        from pasta_tpu.data.device_warp import cut_window_layout
        m = np.eye(3, dtype=np.float32)[None] * 1.0
        m[0, 0, 0] = 4.0  # 32-patch maps from a 128-wide quad
        m[0, 1, 1] = 4.0
        _, fits = cut_window_layout(m, [True], res=256, win=64, margin=4,
                                    patch=32)
        assert not fits
