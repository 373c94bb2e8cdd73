"""StyleGAN2 discriminator (resnet architecture), NHWC.

References (/root/reference/training/networks.py):
  DiscriminatorBlock    — networks.py:443-523
  MinibatchStdLayer     — networks.py:527-549
  DiscriminatorEpilogue — networks.py:553-607
  Discriminator         — networks.py:611-666

Instantiated twice by the trainer (training_loop_fullbody.py:405-410):
image D with img_channels=3+3 (image ⧺ pose rgb) and parsing D with 7+3.
The reference runs the top-3 resolutions in fp16 with conv_clamp=256; here a
`dtype` policy selects bf16 for those blocks instead.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.layers import Conv2dLayer, FullyConnectedLayer, MinibatchStdLayer
from ..nn.mapping import MappingNetwork
from ..ops import downsample2d, setup_filter


class DiscriminatorBlock(nn.Module):
    in_channels: int          # 0 = first block (fromrgb)
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_bf16: bool = False

    @nn.compact
    def __call__(self, x, img):
        dtype = jnp.bfloat16 if self.use_bf16 else jnp.float32
        common = dict(conv_clamp=self.conv_clamp)
        if x is not None:
            x = x.astype(dtype)

        if self.in_channels == 0 or self.architecture == "skip":
            img = img.astype(dtype)
            fromrgb = Conv2dLayer(
                self.img_channels, self.tmp_channels, kernel_size=1,
                activation=self.activation, name="fromrgb", **common)
            y = fromrgb(img)
            x = x + y if x is not None else y
            img = (
                downsample2d(img, setup_filter(self.resample_filter))
                if self.architecture == "skip" else None
            )

        conv0 = Conv2dLayer(
            self.tmp_channels, self.tmp_channels, kernel_size=3,
            activation=self.activation, name="conv0", **common)
        conv1 = Conv2dLayer(
            self.tmp_channels, self.out_channels, kernel_size=3,
            activation=self.activation, down=2,
            resample_filter=self.resample_filter, name="conv1", **common)
        if self.architecture == "resnet":
            skip = Conv2dLayer(
                self.tmp_channels, self.out_channels, kernel_size=1,
                use_bias=False, down=2, resample_filter=self.resample_filter,
                name="skip")
            y = skip(x, gain=math.sqrt(0.5))
            x = conv0(x)
            x = conv1(x, gain=math.sqrt(0.5))
            x = y + x
        else:
            x = conv0(x)
            x = conv1(x)
        return x, img


class DiscriminatorEpilogue(nn.Module):
    in_channels: int
    cmap_dim: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    mbstd_group_size: Optional[int] = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, img, cmap):
        x = x.astype(jnp.float32)
        if self.architecture == "skip":
            fromrgb = Conv2dLayer(
                self.img_channels, self.in_channels, kernel_size=1,
                activation=self.activation, name="fromrgb")
            x = x + fromrgb(img.astype(jnp.float32))
        if self.mbstd_num_channels > 0:
            x = MinibatchStdLayer(
                group_size=self.mbstd_group_size,
                num_channels=self.mbstd_num_channels, name="mbstd")(x)
        x = Conv2dLayer(
            self.in_channels + self.mbstd_num_channels, self.in_channels,
            kernel_size=3, activation=self.activation,
            conv_clamp=self.conv_clamp, name="conv")(x)
        # Flatten NHWC; the torch importer permutes fc weights from the
        # reference's C-major (NCHW) flatten order.
        x = x.reshape(x.shape[0], -1)
        x = FullyConnectedLayer(
            self.in_channels * self.resolution ** 2, self.in_channels,
            activation=self.activation, name="fc")(x)
        x = FullyConnectedLayer(
            self.in_channels, 1 if self.cmap_dim == 0 else self.cmap_dim,
            name="out")(x)
        if self.cmap_dim > 0:
            x = jnp.sum(x * cmap, axis=1, keepdims=True) * (
                1.0 / math.sqrt(self.cmap_dim))
        return x


class Discriminator(nn.Module):
    c_dim: int
    img_resolution: int
    img_channels: int
    architecture: str = "resnet"
    channel_base: int = 32768
    channel_max: int = 512
    num_bf16_res: int = 0      # top-N resolutions in bf16 (ref num_fp16_res)
    conv_clamp: Optional[float] = None
    cmap_dim: Optional[int] = None
    mbstd_group_size: Optional[int] = 4

    @nn.compact
    def __call__(self, img, c):
        from ..shapes import assert_shape

        # Trace-time input contract (reference misc.assert_shape style)
        assert_shape(img, (None, self.img_resolution, self.img_resolution,
                           self.img_channels), name="img")
        res_log2 = int(math.log2(self.img_resolution))
        block_resolutions = [2 ** i for i in range(res_log2, 2, -1)]
        channels = {
            res: min(self.channel_base // res, self.channel_max)
            for res in block_resolutions + [4]
        }
        bf16_resolution = max(2 ** (res_log2 + 1 - self.num_bf16_res), 8)

        cmap_dim = self.cmap_dim
        if cmap_dim is None:
            cmap_dim = channels[4]
        if self.c_dim == 0:
            cmap_dim = 0

        x = None
        for res in block_resolutions:
            block = DiscriminatorBlock(
                in_channels=(channels[res] if res < self.img_resolution else 0),
                tmp_channels=channels[res],
                out_channels=channels[res // 2],
                resolution=res,
                img_channels=self.img_channels,
                architecture=self.architecture,
                conv_clamp=self.conv_clamp,
                use_bf16=(self.num_bf16_res > 0 and res >= bf16_resolution),
                name=f"b{res}",
            )
            # Profiler scope per block (reference record_function taxonomy)
            with jax.named_scope(f"D_b{res}"):
                x, img = block(x, img)

        cmap = None
        if self.c_dim > 0:
            with jax.named_scope("D_mapping"):
                cmap = MappingNetwork(
                    z_dim=0, c_dim=self.c_dim, w_dim=cmap_dim, num_ws=None,
                    w_avg_beta=None, name="mapping")(None, c)
        with jax.named_scope("D_b4"):
            x = DiscriminatorEpilogue(
                channels[4], cmap_dim=cmap_dim, resolution=4,
                img_channels=self.img_channels,
                architecture=self.architecture, conv_clamp=self.conv_clamp,
                mbstd_group_size=self.mbstd_group_size, name="b4")(
                    x, img, cmap)
        return x
