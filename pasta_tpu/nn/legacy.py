"""Capability-parity layers outside the live fullbody path.

The reference ships a layer zoo that the shipped pipeline never calls
(SURVEY.md §2.2 items marked ✗) but that is part of its capability surface:
PASTA-GAN-v1 leftovers, partial convolutions (whose `Conv2dLayer_partialconv`
dependency is UNDEFINED in the reference — reconstructed working here),
self-attention, coord convs, and the mask-predicting ToRGB variants. All
NHWC / lax-composed.

References: /root/reference/training/networks.py and util_classes.py as
cited per class.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import bias_act, conv2d_resample, modulated_conv2d, setup_filter
from ..ops.bias_act import activation_funcs
from .layers import Conv2dLayer, FullyConnectedLayer, instance_norm_2d


class FeatureEncoder(nn.Module):
    """7-stage stride-2 encoder (networks.py:265-283; v1 leftover)."""

    input_nc: int
    ngf: int = 64

    @nn.compact
    def __call__(self, x):
        mult_ins = [1, 2, 4, 4, 8, 8, 8]
        mult_outs = [2, 4, 4, 8, 8, 8, 8]
        x = Conv2dLayer(self.input_nc, self.ngf, kernel_size=1,
                        name="model.0")(x)
        for i in range(7):
            x = Conv2dLayer(self.ngf * mult_ins[i], self.ngf * mult_outs[i],
                            kernel_size=3, down=2, name=f"model.{i + 1}")(x)
        return x


class PartialConv2dLayer(nn.Module):
    """Mask-normalized conv: output scaled by valid-coverage fraction.

    The reference's ResBlock_partialconv depends on an UNDEFINED
    `Conv2dLayer_partialconv` (networks.py:318-353; SURVEY §2.2) — this is
    the working reconstruction, following the Spade_Conv2dLayer_partialconv
    normalization semantics (networks.py:1692-1696): x_out / conv(mask),
    with zero-coverage positions set to 1 before the division.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, mask, gain=1.0):
        k = self.kernel_size
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, self.in_channels, self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        weight_gain = 1.0 / math.sqrt(self.in_channels * k * k)
        f = setup_filter(self.resample_filter)
        flip_weight = self.up == 1
        x = conv2d_resample(x, (w * weight_gain).astype(x.dtype), f=f,
                            up=self.up, down=self.down, padding=k // 2,
                            flip_weight=flip_weight)
        mask_w = jnp.ones((k, k, 1, 1), x.dtype)
        coverage = conv2d_resample(mask, mask_w, f=f, up=self.up,
                                   down=self.down, padding=k // 2,
                                   flip_weight=flip_weight)
        coverage = jnp.where(mask_resampled_zero(coverage), 1.0, coverage)
        x = x / coverage
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, act=self.activation, gain=act_gain,
                        clamp=act_clamp)


def mask_resampled_zero(coverage, eps=1e-6):
    return jnp.abs(coverage) < eps


class PartialResBlock(nn.Module):
    """ResBlock over partial convs (reference ResBlock_partialconv,
    networks.py:318-353)."""

    in_channels: int
    out_channels: int
    activation: str = "linear"
    down: int = 1

    @nn.compact
    def __call__(self, x, mask):
        y = Conv2dLayer(self.in_channels, self.out_channels, kernel_size=1,
                        use_bias=False, down=self.down, name="skip")(
                            x, gain=math.sqrt(0.5))
        x = PartialConv2dLayer(self.in_channels, self.out_channels, 3,
                               activation=self.activation, down=self.down,
                               name="conv0")(x, mask)
        if self.down == 2:
            mask = (mask[:, ::2, ::2, :] == 1).astype(x.dtype)
        x = PartialConv2dLayer(self.out_channels, self.out_channels, 3,
                               activation=self.activation, name="conv1")(
                                   x, mask, gain=math.sqrt(0.5))
        return y + x


def space_to_depth(x, block_size):
    """networks.py:380-388 (unfold-based) — lax-native rearrange."""
    n, h, w, c = x.shape
    bs = block_size
    x = x.reshape(n, h // bs, bs, w // bs, bs, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // bs, w // bs, bs * bs * c)


class SelfAttention(nn.Module):
    """SAGAN-style self-attention (reference Attention, networks.py:410-440),
    as batched matmuls on the MXU."""

    channels: int

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        ch8 = max(c // 8, 1)
        ch2 = max(c // 2, 1)
        conv = lambda out, name: nn.Conv(out, (1, 1), use_bias=False, name=name)
        theta = conv(ch8, "theta")(x).reshape(n, h * w, ch8)
        phi = nn.max_pool(conv(ch8, "phi")(x), (2, 2), strides=(2, 2))
        g = nn.max_pool(conv(ch2, "g")(x), (2, 2), strides=(2, 2))
        phi = phi.reshape(n, -1, ch8)
        g = g.reshape(n, -1, ch2)
        beta = jax.nn.softmax(
            jnp.einsum("nik,njk->nij", theta, phi,
                       precision=jax.lax.Precision.HIGHEST), axis=-1)
        o = jnp.einsum("nij,njc->nic", beta, g,
                       precision=jax.lax.Precision.HIGHEST)
        o = o.reshape(n, h, w, ch2)
        o = conv(c, "o")(o)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma * o + x


class SpadeModulatedConv2d(nn.Module):
    """Spatially-modulated conv (reference spade_modulated_conv2d,
    networks.py:1519-1583; defined there but never called): per-pixel style
    maps modulate the input, demodulation from the mean style."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    demodulate: bool = True

    @nn.compact
    def __call__(self, x, style_map):
        """style_map: [N, H, W, in_channels] spatial modulation."""
        k = self.kernel_size
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, self.in_channels, self.out_channels))
        x = x * style_map
        dcoefs = None
        if self.demodulate:
            s_mean = jnp.mean(style_map, axis=(1, 2))          # [N, I]
            w_sq = jnp.sum(jnp.square(w), axis=(0, 1))          # [I, O]
            dcoefs = jax.lax.rsqrt(jnp.square(s_mean) @ w_sq + 1e-8)
        x = conv2d_resample(x, w.astype(x.dtype), padding=k // 2)
        if dcoefs is not None:
            x = x * dcoefs[:, None, None, :].astype(x.dtype)
        return x


class MaskPredictingToRGB(nn.Module):
    """v1 torgb that also emits sigmoid upper/lower masks at the last block
    (reference ToRGBLayerV18/ToRGBLayerV18_512, networks.py:1777-1855);
    `deep_heads=True` gives the _512 two-stage mask heads."""

    in_channels: int
    out_channels: int
    w_dim: int
    conv_clamp: Optional[float] = None
    is_last: bool = False
    deep_heads: bool = False

    @nn.compact
    def __call__(self, x, w):
        affine = FullyConnectedLayer(self.w_dim, self.in_channels,
                                     bias_init=1.0, name="affine")
        weight_gain = 1.0 / math.sqrt(self.in_channels)
        styles = affine(w) * weight_gain

        def head(name, deep):
            if deep:
                w1 = self.param(f"{name}_w", nn.initializers.normal(1.0),
                                (1, 1, self.in_channels, self.in_channels))
                b1 = self.param(f"{name}_b", nn.initializers.zeros,
                                (self.in_channels,))
                h = modulated_conv2d(x, w1, styles)
                h = bias_act(h, b1, clamp=self.conv_clamp)
            else:
                h = x
            w2 = self.param(f"{name}_w1", nn.initializers.normal(1.0),
                            (1, 1, self.in_channels, 1))
            b2 = self.param(f"{name}_b1", nn.initializers.zeros, (1,))
            out = modulated_conv2d(h, w2, styles, demodulate=False)
            return bias_act(out, b2, act="sigmoid", clamp=self.conv_clamp)

        upper_mask = lower_mask = None
        if self.is_last:
            upper_mask = head("m1", self.deep_heads)
            lower_mask = head("m2", self.deep_heads)
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (1, 1, self.in_channels, self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        img = modulated_conv2d(x, weight, styles, demodulate=False)
        img = bias_act(img, b, clamp=self.conv_clamp)
        return img, upper_mask, lower_mask


class AddCoords(nn.Module):
    """Append normalized xy (+r) channels (util_classes.py AddCoords)."""

    with_r: bool = False

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        ys = jnp.linspace(-1, 1, h)[None, :, None, None]
        xs = jnp.linspace(-1, 1, w)[None, None, :, None]
        yy = jnp.broadcast_to(ys, (n, h, w, 1))
        xx = jnp.broadcast_to(xs, (n, h, w, 1))
        feats = [x, xx, yy]
        if self.with_r:
            feats.append(jnp.sqrt(xx ** 2 + yy ** 2))
        return jnp.concatenate(feats, axis=-1)


class CoordConv(nn.Module):
    """Conv over coord-augmented input (util_classes.py CoordConv)."""

    out_channels: int
    kernel_size: int = 3
    with_r: bool = False

    @nn.compact
    def __call__(self, x):
        x = AddCoords(with_r=self.with_r)(x)
        return nn.Conv(self.out_channels,
                       (self.kernel_size, self.kernel_size), name="conv")(x)


def spectral_normalize(w, u, n_iters=1, eps=1e-12):
    """One power-iteration step of spectral normalization
    (util_classes.py spectral_norm wrapper semantics).

    Returns (w / sigma, new_u). `w` is [out, in_flat]; `u` is [out]."""
    for _ in range(n_iters):
        v = w.T @ u
        v = v / (jnp.linalg.norm(v) + eps)
        u = w @ v
        u = u / (jnp.linalg.norm(u) + eps)
    sigma = u @ w @ v
    return w / sigma, jax.lax.stop_gradient(u)


def random_affine_matrix(key, n, angle_range=10.0, scale_range=0.05,
                         shift_range=0.05):
    """Batched random 2D affines (util_functions.py:162-253 semantics):
    rotation (deg), isotropic scale, translation — as [N, 3, 3]."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ang = jax.random.uniform(k1, (n,), minval=-angle_range,
                             maxval=angle_range) * jnp.pi / 180
    sc = 1 + jax.random.uniform(k2, (n,), minval=-scale_range,
                                maxval=scale_range)
    tx = jax.random.uniform(k3, (n,), minval=-shift_range, maxval=shift_range)
    ty = jax.random.uniform(k4, (n,), minval=-shift_range, maxval=shift_range)
    c, s = jnp.cos(ang) * sc, jnp.sin(ang) * sc
    m = jnp.tile(jnp.eye(3), (n, 1, 1))
    m = m.at[:, 0, 0].set(c).at[:, 0, 1].set(-s).at[:, 0, 2].set(tx)
    m = m.at[:, 1, 0].set(s).at[:, 1, 1].set(c).at[:, 1, 2].set(ty)
    return m


def apply_random_crop(x, key, target_size, scale_range=(0.25, 0.5),
                      num_crops=1):
    """Random resized crops via bilinear sampling (util_functions.py:272-317
    apply_random_crop; torch grid_sample replaced by our sampler).

    Returns [N, num_crops, target, target, C]."""
    from ..data.device_warp import warp_perspective

    n, h, w, c = x.shape
    k1, k2, k3 = jax.random.split(key, 3)
    scales = jax.random.uniform(
        k1, (n, num_crops), minval=scale_range[0], maxval=scale_range[1])
    max_off = 1.0 - scales
    ox = jax.random.uniform(k2, (n, num_crops)) * max_off * w
    oy = jax.random.uniform(k3, (n, num_crops)) * max_off * h
    outs = []
    for j in range(num_crops):
        sx = scales[:, j] * w / target_size
        sy = scales[:, j] * h / target_size
        m = jnp.tile(jnp.eye(3), (n, 1, 1))
        m = m.at[:, 0, 0].set(sx).at[:, 0, 2].set(ox[:, j])
        m = m.at[:, 1, 1].set(sy).at[:, 1, 2].set(oy[:, j])
        outs.append(warp_perspective(x, m, target_size, target_size))
    return jnp.stack(outs, axis=1)


def channel_normalize(x, power=2, eps=1e-7):
    """Lp-normalize over the channel axis (util_classes.py:6-14 Normalize;
    NHWC: channels last instead of torch's dim 1)."""
    norm = jnp.sum(jnp.abs(x) ** power, axis=-1, keepdims=True) ** (1.0 / power)
    return x / (norm + eps)


def apply_offset(offset):
    """Offset grid -> normalized sampling-location grid
    (util_classes.py:17-32). NHWC: offset [N, H, W, 2] with channels
    (dx, dy); returns [N, H, W, 2] with (x, y) in [-1, 1]."""
    n, h, w, _ = offset.shape
    gx = jnp.broadcast_to(jnp.arange(w, dtype=offset.dtype)[None, None, :],
                          (n, h, w))
    gy = jnp.broadcast_to(jnp.arange(h, dtype=offset.dtype)[None, :, None],
                          (n, h, w))
    x = (gx + offset[..., 0]) / ((w - 1.0) / 2.0) - 1.0
    y = (gy + offset[..., 1]) / ((h - 1.0) / 2.0) - 1.0
    return jnp.stack([x, y], axis=-1)


def _zoo_conv(out_channels, kernel_size, strides=1, use_coord=False,
              name=None):
    """coord_conv helper (util_classes.py:96-101): plain conv or CoordConv.
    Spectral norm is a training-time reparameterization in torch; the zoo
    ships with use_spect=False everywhere, so it is not replicated here."""
    if use_coord:
        return CoordConv(out_channels, kernel_size=kernel_size, name=name)
    return nn.Conv(out_channels, (kernel_size, kernel_size),
                   strides=(strides, strides), name=name)


class EncoderBlock(nn.Module):
    """norm-act-conv x2 downsampling block (util_classes.py:103-126)."""

    out_channels: int
    downsample: bool = True
    use_coord: bool = False
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=not train, name="norm1")(x)
        x = nn.leaky_relu(x, 0.01)
        if self.downsample:
            x = nn.Conv(self.out_channels, (4, 4), strides=(2, 2),
                        padding=1, name="conv1")(x)
        else:
            x = _zoo_conv(self.out_channels, 3, use_coord=self.use_coord,
                          name="conv1")(x)
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=not train, name="norm2")(x)
        x = nn.leaky_relu(x, 0.01)
        x = _zoo_conv(self.out_channels, 3, use_coord=self.use_coord,
                      name="conv2")(x)
        return x


class ResBlockDecoder(nn.Module):
    """Residual decoder block, optionally 2x-upsampling via transposed conv
    (util_classes.py:128-157)."""

    out_channels: int
    hidden_channels: Optional[int] = None
    upsample: bool = True
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.hidden_channels or x.shape[-1]
        h = x
        if self.use_norm:
            h = nn.BatchNorm(use_running_average=not train, name="norm1")(h)
        h = nn.leaky_relu(h, 0.01)
        h = nn.Conv(hidden, (3, 3), name="conv1")(h)
        if self.use_norm:
            h = nn.BatchNorm(use_running_average=not train, name="norm2")(h)
        h = nn.leaky_relu(h, 0.01)
        if self.upsample:
            # torch ConvTranspose2d(k3, s2, p1, output_padding=1): exact 2x
            h = nn.ConvTranspose(self.out_channels, (3, 3), strides=(2, 2),
                                 name="conv2")(h)
            shortcut = nn.ConvTranspose(self.out_channels, (3, 3),
                                        strides=(2, 2), name="bypass")(x)
        else:
            h = nn.Conv(self.out_channels, (3, 3), name="conv2")(h)
            shortcut = x
        return h + shortcut


class Jump(nn.Module):
    """Output head: norm-act-reflectpad-conv (util_classes.py:160-178)."""

    out_channels: int
    kernel_size: int = 3
    use_coord: bool = False
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=not train, name="norm")(x)
        x = nn.leaky_relu(x, 0.01)
        p = self.kernel_size // 2
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        if self.use_coord:
            x = AddCoords()(x)
        # VALID padding: the reflect pad above supplies the borders
        return nn.Conv(self.out_channels,
                       (self.kernel_size, self.kernel_size),
                       padding="VALID", name="conv")(x)
