"""ADA augmentation pipeline (StyleGAN2-ADA), pure-jnp, NHWC, static shapes.

Parity target: reference training/augment.py (AugmentPipe, :116-429). The
probability-gating structure, parameter distributions, and transform algebra
are ported 1:1. One TPU-first redesign: the reference pads each batch by a
*data-dependent* margin before its geometric grid-sample (augment.py:270-287)
— a dynamic shape XLA can't compile. Here reflection is applied analytically
to the sampling coordinates (mirror-mode warp), which is equivalent to an
unbounded reflect margin: static shapes, no padding, and no clamped-margin
artifacts. The warp itself has two implementations (ops/affine_warp.py): a
bit-parity pointwise gather and the TPU-native two-pass shear decomposition
(MXU matmuls + a Pallas per-row shift kernel; no gathers or scatters).

All randomness flows through an explicit PRNG key; `p` is a traced scalar
(the ADA controller updates it between steps without recompilation).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import scipy.signal
import jax
import jax.numpy as jnp

from ..ops import setup_filter, upsample2d, downsample2d
from ..ops.affine_warp import (bilinear_warp_gather, geom_resample_twopass)

# 'sym2'/'sym6' wavelets (reference augment.py:21-38).
WAVELETS = {
    "sym2": [-0.12940952255092145, 0.22414386804185735,
             0.836516303737469, 0.48296291314469025],
    "sym6": [0.015404109327027373, 0.0034907120842174702,
             -0.11799011114819057, -0.048311742585633, 0.4910559419267466,
             0.787641141030194, 0.3379294217276218, -0.07263752278646252,
             -0.021060292512300564, 0.04472490177066578,
             0.0017677118642428036, -0.007800708325034148],
}


def _make_fbank():
    """4-band filter bank from sym2 (reference augment.py:171-181)."""
    hz_lo = np.asarray(WAVELETS["sym2"])
    hz_hi = hz_lo * ((-1) ** np.arange(hz_lo.size))
    hz_lo2 = np.convolve(hz_lo, hz_lo[::-1]) / 2
    hz_hi2 = np.convolve(hz_hi, hz_hi[::-1]) / 2
    fbank = np.eye(4, 1)
    for i in range(1, fbank.shape[0]):
        fbank = np.dstack([fbank, np.zeros_like(fbank)]).reshape(
            fbank.shape[0], -1)[:, :-1]
        fbank = scipy.signal.convolve(fbank, [hz_lo2])
        lo = (fbank.shape[1] - hz_hi2.size) // 2
        fbank[i, lo:lo + hz_hi2.size] += hz_hi2
    return fbank.astype(np.float32)


def _translate2d(tx, ty):
    n = tx.shape[0]
    m = jnp.tile(jnp.eye(3), (n, 1, 1))
    m = m.at[:, 0, 2].set(tx)
    return m.at[:, 1, 2].set(ty)


def _scale2d(sx, sy):
    sx = jnp.asarray(sx)
    sy = jnp.asarray(sy)
    if sx.ndim == 0:
        sx = sx[None]
        sy = sy[None]
    n = sx.shape[0]
    m = jnp.tile(jnp.eye(3), (n, 1, 1))
    m = m.at[:, 0, 0].set(sx)
    return m.at[:, 1, 1].set(sy)


def _rotate2d(theta):
    n = theta.shape[0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    m = jnp.tile(jnp.eye(3), (n, 1, 1))
    m = m.at[:, 0, 0].set(c)
    m = m.at[:, 0, 1].set(-s)
    m = m.at[:, 1, 0].set(s)
    return m.at[:, 1, 1].set(c)


def _translate3d(t):
    """[N,3] -> [N,4,4] homogeneous color translation."""
    n = t.shape[0]
    m = jnp.tile(jnp.eye(4), (n, 1, 1))
    return m.at[:, :3, 3].set(t)


def _scale3d(s):
    n = s.shape[0]
    m = jnp.tile(jnp.eye(4), (n, 1, 1))
    m = m.at[:, 0, 0].set(s)
    m = m.at[:, 1, 1].set(s)
    return m.at[:, 2, 2].set(s)


def _rotate3d_around(v, theta):
    """Rotation around unit axis v (len 3), batched theta [N]."""
    n = theta.shape[0]
    vx, vy, vz = v[0], v[1], v[2]
    s, c = jnp.sin(theta), jnp.cos(theta)
    cc = 1 - c
    rows = [
        [vx * vx * cc + c, vx * vy * cc - vz * s, vx * vz * cc + vy * s],
        [vy * vx * cc + vz * s, vy * vy * cc + c, vy * vz * cc - vx * s],
        [vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + c],
    ]
    m = jnp.tile(jnp.eye(4), (n, 1, 1))
    for i in range(3):
        for j in range(3):
            m = m.at[:, i, j].set(rows[i][j])
    return m


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Probability multipliers + parameter ranges (reference defaults).

    `bgc()` gives the shipped fashion training config (train.py:292).
    """

    xflip: float = 0.0
    rotate90: float = 0.0
    xint: float = 0.0
    xint_max: float = 0.125
    scale: float = 0.0
    rotate: float = 0.0
    aniso: float = 0.0
    xfrac: float = 0.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    imgfilter: float = 0.0
    imgfilter_bands: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5

    @staticmethod
    def bgc():
        return AugmentConfig(
            xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1,
            brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1)


def augment_pipe(images, p, key, cfg: AugmentConfig, debug_percentile=None,
                 impl="auto", spmd_mesh=None):
    """Apply the ADA pipeline to NHWC images with overall probability `p`.

    Args:
        images: [N, H, W, C] float; C in {1, 3}.
        p:      scalar in [0, 1] (traced; the ADA-controlled knob).
        key:    PRNG key.
        cfg:    static AugmentConfig (python constants — gates compile away
                when a multiplier is 0, like the reference's `if self.x > 0`).
        debug_percentile: float in [0,1) — deterministic parameter selection
            (reference parity/debug mode, augment.py forward).
        impl:   geometric-warp implementation: 'gather' (bit-parity pointwise
            path), 'twopass' (TPU-native shear-decomposed warp —
            ops/affine_warp.py; no gathers/scatters, ~40x faster on TPU,
            equal augmentation quality but not bit parity on rotations), or
            'auto' (twopass on TPU, gather elsewhere).
        spmd_mesh: the jax Mesh when this call sits inside a multi-device
            jitted program — the twopass warp's kernels then run per-shard
            via shard_map (pallas_call does not partition under plain
            SPMD).

    Returns augmented images, same shape.
    """
    n, height, width, channels = images.shape
    p = jnp.asarray(p, jnp.float32)
    keys = iter(jax.random.split(key, 32))
    dp = debug_percentile
    erfinv = jax.scipy.special.erfinv

    # ---- pixel blitting + geometric: accumulate inverse 2D transform -----
    g_inv = jnp.tile(jnp.eye(3), (n, 1, 1))
    used_geom = False

    if cfg.xflip > 0:
        i = jnp.floor(jax.random.uniform(next(keys), (n,)) * 2)
        i = jnp.where(jax.random.uniform(next(keys), (n,)) < cfg.xflip * p, i, 0.0)
        if dp is not None:
            i = jnp.full((n,), np.floor(dp * 2))
        g_inv = g_inv @ _scale2d(1 / (1 - 2 * i), jnp.ones((n,)))
        used_geom = True
    if cfg.rotate90 > 0:
        i = jnp.floor(jax.random.uniform(next(keys), (n,)) * 4)
        i = jnp.where(jax.random.uniform(next(keys), (n,)) < cfg.rotate90 * p, i, 0.0)
        if dp is not None:
            i = jnp.full((n,), np.floor(dp * 4))
        g_inv = g_inv @ _rotate2d(np.pi / 2 * i)
        used_geom = True
    if cfg.xint > 0:
        t = (jax.random.uniform(next(keys), (n, 2)) * 2 - 1) * cfg.xint_max
        t = jnp.where(jax.random.uniform(next(keys), (n, 1)) < cfg.xint * p, t, 0.0)
        if dp is not None:
            t = jnp.full((n, 2), (dp * 2 - 1) * cfg.xint_max)
        g_inv = g_inv @ _translate2d(-jnp.round(t[:, 0] * width),
                                     -jnp.round(t[:, 1] * height))
        used_geom = True
    if cfg.scale > 0:
        s = jnp.exp2(jax.random.normal(next(keys), (n,)) * cfg.scale_std)
        s = jnp.where(jax.random.uniform(next(keys), (n,)) < cfg.scale * p, s, 1.0)
        if dp is not None:
            s = jnp.full((n,), jnp.exp2(erfinv(dp * 2 - 1) * cfg.scale_std))
        g_inv = g_inv @ _scale2d(1 / s, 1 / s)
        used_geom = True
    if cfg.rotate > 0:
        p_rot = 1 - jnp.sqrt(jnp.clip(1 - cfg.rotate * p, 0, 1))
        theta = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * np.pi * cfg.rotate_max
        theta = jnp.where(jax.random.uniform(next(keys), (n,)) < p_rot, theta, 0.0)
        if dp is not None:
            theta = jnp.full((n,), (dp * 2 - 1) * np.pi * cfg.rotate_max)
        g_inv = g_inv @ _rotate2d(theta)  # rotate2d_inv(-theta) == rotate2d(theta)
        used_geom = True
    if cfg.aniso > 0:
        s = jnp.exp2(jax.random.normal(next(keys), (n,)) * cfg.aniso_std)
        s = jnp.where(jax.random.uniform(next(keys), (n,)) < cfg.aniso * p, s, 1.0)
        if dp is not None:
            s = jnp.full((n,), jnp.exp2(erfinv(dp * 2 - 1) * cfg.aniso_std))
        g_inv = g_inv @ _scale2d(1 / s, s)
        used_geom = True
    if cfg.rotate > 0:
        p_rot = 1 - jnp.sqrt(jnp.clip(1 - cfg.rotate * p, 0, 1))
        theta = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * np.pi * cfg.rotate_max
        theta = jnp.where(jax.random.uniform(next(keys), (n,)) < p_rot, theta, 0.0)
        if dp is not None:
            theta = jnp.zeros((n,))
        g_inv = g_inv @ _rotate2d(theta)
    if cfg.xfrac > 0:
        t = jax.random.normal(next(keys), (n, 2)) * cfg.xfrac_std
        t = jnp.where(jax.random.uniform(next(keys), (n, 1)) < cfg.xfrac * p, t, 0.0)
        if dp is not None:
            t = jnp.full((n, 2), erfinv(dp * 2 - 1) * cfg.xfrac_std)
        g_inv = g_inv @ _translate2d(-t[:, 0] * width, -t[:, 1] * height)
        used_geom = True

    if used_geom:
        if impl == "auto":
            impl = ("twopass" if jax.default_backend() == "tpu"
                    else "gather")
        hz_geom = setup_filter(WAVELETS["sym6"])
        hz_pad = len(WAVELETS["sym6"]) // 4
        # Static reflect margin of Hz_pad*2 (the data-independent part of the
        # reference margin, augment.py:276-279) so the FIR upsampler sees
        # reflected content at the borders; the transform's own out-of-range
        # reach is handled analytically by the mirror sampler instead of the
        # reference's data-dependent (dynamic-shape) margin.
        m = hz_pad * 2
        h2 = w2 = (height + 2 * m) * 2
        g = _scale2d(jnp.asarray(2.0), jnp.asarray(2.0)) @ g_inv @ \
            _scale2d(jnp.asarray(0.5), jnp.asarray(0.5))
        g = _translate2d(jnp.full((n,), -0.5), jnp.full((n,), -0.5)) @ g @ \
            _translate2d(jnp.full((n,), 0.5), jnp.full((n,), 0.5))
        # centered-pixel -> align_corners=False normalized coords
        # (x_norm = 2*c/W), both sides (reference augment.py:297).
        g = _scale2d(jnp.asarray(2.0 / w2), jnp.asarray(2.0 / h2)) @ g @ \
            _scale2d(jnp.asarray(w2 / 2.0), jnp.asarray(h2 / 2.0))
        # Convert the normalized (align_corners=False) matrix to pixel space:
        # out px -> out norm ((2p+1)/W - 1) -> g -> src norm -> src px
        # ((s+1)W/2 - 1/2). Exact 3x3 composition, f64 on host constants.
        to_norm = np.array([[2.0 / w2, 0, 1.0 / w2 - 1],
                            [0, 2.0 / h2, 1.0 / h2 - 1],
                            [0, 0, 1]], np.float32)
        to_pix = np.array([[w2 / 2.0, 0, w2 / 2.0 - 0.5],
                           [0, h2 / 2.0, h2 / 2.0 - 0.5],
                           [0, 0, 1]], np.float32)
        mat_pix = jnp.einsum(
            "ij,njk,kl->nil", jnp.asarray(to_pix), g, jnp.asarray(to_norm),
            precision=jax.lax.Precision.HIGHEST)
        if impl == "twopass":
            # Planar bf16 pipeline: pad/up-FIR/warp/down-FIR with spatial
            # minor dims throughout — the NHWC 3-channel 2x canvases of the
            # gather path get pathological padded layouts (16-40x HBM).
            images = geom_resample_twopass(
                images.astype(jnp.bfloat16), mat_pix,
                hz_geom, m, mesh=spmd_mesh).astype(images.dtype)
        else:
            padded = jnp.pad(
                images, ((0, 0), (m, m), (m, m), (0, 0)), mode="reflect")
            up = upsample2d(padded, hz_geom, up=2)
            up = bilinear_warp_gather(up, mat_pix)
            # Downsample, crop the margin back off (reference augment.py:305).
            images = downsample2d(up, hz_geom, down=2, padding=-m * 2,
                                  flip_filter=True)

    # ---- color transform --------------------------------------------------
    c_mat = jnp.tile(jnp.eye(4), (n, 1, 1))
    used_color = False
    v_luma = jnp.asarray(np.asarray([1, 1, 1, 0]) / np.sqrt(3), jnp.float32)

    if cfg.brightness > 0:
        b = jax.random.normal(next(keys), (n,)) * cfg.brightness_std
        b = jnp.where(jax.random.uniform(next(keys), (n,)) < cfg.brightness * p, b, 0.0)
        if dp is not None:
            b = jnp.full((n,), erfinv(dp * 2 - 1) * cfg.brightness_std)
        c_mat = _translate3d(jnp.stack([b, b, b], axis=1)) @ c_mat
        used_color = True
    if cfg.contrast > 0:
        c = jnp.exp2(jax.random.normal(next(keys), (n,)) * cfg.contrast_std)
        c = jnp.where(jax.random.uniform(next(keys), (n,)) < cfg.contrast * p, c, 1.0)
        if dp is not None:
            c = jnp.full((n,), jnp.exp2(erfinv(dp * 2 - 1) * cfg.contrast_std))
        c_mat = _scale3d(c) @ c_mat
        used_color = True
    if cfg.lumaflip > 0:
        i = jnp.floor(jax.random.uniform(next(keys), (n,)) * 2)
        i = jnp.where(jax.random.uniform(next(keys), (n,)) < cfg.lumaflip * p, i, 0.0)
        if dp is not None:
            i = jnp.full((n,), np.floor(dp * 2))
        house = jnp.eye(4) - 2 * jnp.outer(v_luma, v_luma) * i[:, None, None]
        c_mat = house @ c_mat
        used_color = True
    if cfg.hue > 0 and channels > 1:
        theta = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * np.pi * cfg.hue_max
        theta = jnp.where(jax.random.uniform(next(keys), (n,)) < cfg.hue * p, theta, 0.0)
        if dp is not None:
            theta = jnp.full((n,), (dp * 2 - 1) * np.pi * cfg.hue_max)
        c_mat = _rotate3d_around(v_luma[:3], theta) @ c_mat
        used_color = True
    if cfg.saturation > 0 and channels > 1:
        s = jnp.exp2(jax.random.normal(next(keys), (n,)) * cfg.saturation_std)
        s = jnp.where(jax.random.uniform(next(keys), (n,)) < cfg.saturation * p, s, 1.0)
        if dp is not None:
            s = jnp.full((n,), jnp.exp2(erfinv(dp * 2 - 1) * cfg.saturation_std))
        vvt = jnp.outer(v_luma, v_luma)
        c_mat = (vvt + (jnp.eye(4) - vvt) * s[:, None, None]) @ c_mat
        used_color = True

    if used_color:
        if channels == 3:
            images = jnp.einsum(
                "nij,nhwj->nhwi", c_mat[:, :3, :3], images,
                precision=jax.lax.Precision.HIGHEST) + c_mat[:, None, None, :3, 3]
        elif channels == 1:
            cm = jnp.mean(c_mat[:, :3, :], axis=1, keepdims=True)
            images = images * jnp.sum(cm[:, :, :3], axis=2)[:, :, None, None] \
                + cm[:, :, 3][:, :, None, None]
        else:
            raise ValueError("augment color transform needs 1 or 3 channels")

    # ---- image-space filtering -------------------------------------------
    if cfg.imgfilter > 0:
        fbank = jnp.asarray(_make_fbank())
        num_bands = fbank.shape[0]
        expected_power = jnp.asarray(np.array([10, 1, 1, 1]) / 13, jnp.float32)
        g_gain = jnp.ones((n, num_bands))
        for i, band_strength in enumerate(cfg.imgfilter_bands):
            t_i = jnp.exp2(jax.random.normal(next(keys), (n,)) * cfg.imgfilter_std)
            t_i = jnp.where(
                jax.random.uniform(next(keys), (n,)) < cfg.imgfilter * p * band_strength,
                t_i, 1.0)
            if dp is not None:
                t_i = (jnp.full((n,), jnp.exp2(erfinv(dp * 2 - 1) * cfg.imgfilter_std))
                       if band_strength > 0 else jnp.ones((n,)))
            t = jnp.ones((n, num_bands)).at[:, i].set(t_i)
            t = t / jnp.sqrt(
                jnp.sum(expected_power * jnp.square(t), axis=-1, keepdims=True))
            g_gain = g_gain * t
        hz_prime = g_gain @ fbank  # [N, taps]
        taps = hz_prime.shape[1]
        pad = taps // 2
        # Separable per-sample filter as an unrolled shift-accumulate
        # (static taps; avoids batch-grouped convs the MXU dislikes).
        padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                         mode="reflect")

        def _axis_filter(x, axis):
            out = 0.0
            length = images.shape[axis]
            for t in range(taps):
                idx = [slice(None)] * 4
                idx[axis] = slice(t, t + length)
                out = out + x[tuple(idx)] * hz_prime[:, t][
                    (slice(None),) + (None,) * 3]
            return out

        tmp = _axis_filter(padded, 2)           # filter W, keeps H padded
        images = _axis_filter(tmp, 1)           # filter H

    # ---- corruptions ------------------------------------------------------
    if cfg.noise > 0:
        sigma = jnp.abs(jax.random.normal(next(keys), (n, 1, 1, 1))) * cfg.noise_std
        sigma = jnp.where(
            jax.random.uniform(next(keys), (n, 1, 1, 1)) < cfg.noise * p, sigma, 0.0)
        if dp is not None:
            sigma = jnp.full((n, 1, 1, 1), erfinv(dp) * cfg.noise_std)
        images = images + jax.random.normal(next(keys), images.shape) * sigma
    if cfg.cutout > 0:
        size = jnp.full((n, 2), cfg.cutout_size)
        size = jnp.where(
            jax.random.uniform(next(keys), (n, 1)) < cfg.cutout * p, size, 0.0)
        center = jax.random.uniform(next(keys), (n, 2))
        if dp is not None:
            size = jnp.full((n, 2), cfg.cutout_size)
            center = jnp.full((n, 2), dp)
        cx = jnp.arange(width)[None, None, :]
        cy = jnp.arange(height)[None, :, None]
        mask_x = jnp.abs((cx + 0.5) / width - center[:, 0, None, None]) >= size[:, 0, None, None] / 2
        mask_y = jnp.abs((cy + 0.5) / height - center[:, 1, None, None]) >= size[:, 1, None, None] / 2
        images = images * jnp.logical_or(mask_x, mask_y)[..., None]

    return images
