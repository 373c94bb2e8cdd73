"""Basic equalized-learning-rate layers (NHWC).

References (behavioral parity targets, /root/reference):
  FullyConnectedLayer  training/networks.py:98-128
  Conv2dLayer          training/networks.py:132-179
  Dense                training/networks.py:390-407
  MinibatchStdLayer    training/networks.py:527-549
  ResBlock             training/networks.py:286-316
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import bias_act, conv2d_resample, setup_filter
from ..ops.bias_act import activation_funcs


def normalize_2nd_moment(x, axis=-1, eps=1e-8):
    """Pixel-norm over `axis` (reference networks.py:30-32)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def instance_norm_2d(x, eps=1e-5):
    """Per-sample, per-channel normalization over H,W of an NHWC tensor.

    Matches torch nn.InstanceNorm2d(affine=False): biased variance, no
    running stats. Moments are always accumulated in fp32 (bf16 variance
    underflows); output keeps the input dtype.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class FullyConnectedLayer(nn.Module):
    """Equalized-lr linear with fused bias+activation."""

    in_features: int
    out_features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x):
        # Stored at scale 1/lr_multiplier; rescaled at use: the equalized-lr
        # trick keeps the optimizer's effective step proportional.
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0 / self.lr_multiplier),
            (self.out_features, self.in_features),
        )
        weight_gain = self.lr_multiplier / math.sqrt(self.in_features)
        w = w.astype(x.dtype) * weight_gain
        b = None
        if self.use_bias:
            b = self.param(
                "bias",
                nn.initializers.constant(self.bias_init),
                (self.out_features,),
            )
            if self.lr_multiplier != 1.0:
                b = b * self.lr_multiplier
        x = x @ w.T
        return bias_act(x, b, act=self.activation)


class Conv2dLayer(nn.Module):
    """Equalized-lr conv with optional FIR up/downsampling and fused act."""

    in_channels: int
    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    trainable: bool = True  # recorded for optimizer masking (freeze-D)

    @nn.compact
    def __call__(self, x, gain=1.0, x2=None, split_at=None):
        """Standard path: conv over x. With `x2`/`split_at` (1x1, no
        resampling): computes conv(concat([x, x2]), w) as
        conv(x, w[:split_at]) + conv(x2, w[split_at:]) — exact (a 1x1 conv
        is linear over input channels), and it keeps lane-pad-wide x/x2
        tensors conv-consumable without a concat that would misalign the
        zero-padded weight rows (see ops/conv2d_resample.py lane-pad)."""
        k = self.kernel_size
        w = self.param(
            "weight", nn.initializers.normal(1.0), (k, k, self.in_channels, self.out_channels)
        )
        weight_gain = 1.0 / math.sqrt(self.in_channels * k * k)
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )
        f = setup_filter(self.resample_filter)
        flip_weight = self.up == 1
        if x2 is not None:
            assert k == 1 and self.up == 1 and self.down == 1
            wg = (w * weight_gain)
            x = conv2d_resample(
                x, wg[:, :, :split_at].astype(x.dtype),
                flip_weight=flip_weight,
            ) + conv2d_resample(
                x2, wg[:, :, split_at:].astype(x2.dtype),
                flip_weight=flip_weight,
            ).astype(x.dtype)
        else:
            x = conv2d_resample(
                x,
                (w * weight_gain).astype(x.dtype),
                f=f,
                up=self.up,
                down=self.down,
                padding=k // 2,
                flip_weight=flip_weight,
            )
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, act=self.activation, gain=act_gain, clamp=act_clamp)


class Dense(nn.Module):
    """1x1 linear over channels + InstanceNorm + LeakyReLU(0.01).

    Matches reference `Dense` (networks.py:390-407): note the torch-default
    0.01 negative slope (nn.LeakyReLU()), not the StyleGAN 0.2.
    """

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        # torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)).
        lim = 1.0 / math.sqrt(self.in_channels)

        def _uniform(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -lim, lim)

        dense = nn.Dense(
            self.out_channels, kernel_init=_uniform, bias_init=_uniform,
            name="linear",
        )
        # NHWC: channels already last; torch permutes to apply Linear.
        x = instance_norm_2d(dense(x))
        return jax.nn.leaky_relu(x, negative_slope=0.01)


class MinibatchStdLayer(nn.Module):
    """Append cross-minibatch stddev features (reference networks.py:527-549).

    NOTE: couples samples within a group of `group_size` — under data
    parallelism the group must live on one device (guaranteed when the
    per-device batch is a multiple of group_size).
    """

    group_size: Optional[int] = 4
    num_channels: int = 1

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        g = min(self.group_size, n) if self.group_size is not None else n
        f = self.num_channels
        cg = c // f
        y = x.reshape(g, n // g, h, w, f, cg)
        y = y - jnp.mean(y, axis=0, keepdims=True)
        y = jnp.mean(jnp.square(y), axis=0)
        y = jnp.sqrt(y + 1e-8)
        y = jnp.mean(y, axis=(1, 2, 4))        # [n//g, F]
        y = y[:, None, None, :]                 # [n//g, 1, 1, F]
        y = jnp.tile(y, (g, h, w, 1))           # [N, H, W, F]
        return jnp.concatenate([x, y.astype(x.dtype)], axis=-1)


class ResBlock(nn.Module):
    """conv-conv + 1x1 skip, each path scaled by sqrt(1/2).

    Reference networks.py:286-316 (used by the generator's spade_encoder).
    """

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        common = dict(
            resample_filter=self.resample_filter, conv_clamp=self.conv_clamp
        )
        skip = Conv2dLayer(
            self.in_channels, self.out_channels, kernel_size=1, use_bias=False,
            up=self.up, down=self.down, name="skip", **common)
        conv0 = Conv2dLayer(
            self.in_channels, self.out_channels, kernel_size=3,
            activation=self.activation, up=self.up, down=self.down,
            name="conv0", **common)
        conv1 = Conv2dLayer(
            self.out_channels, self.out_channels, kernel_size=3,
            activation=self.activation, name="conv1", **common)
        y = skip(x, gain=math.sqrt(0.5))
        x = conv0(x)
        x = conv1(x, gain=math.sqrt(0.5))
        return y + x
