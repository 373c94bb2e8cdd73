"""StyleGAN2 synthesis layers and PASTA-GAN++ SPADE blocks (NHWC).

References (/root/reference/training/networks.py):
  SynthesisLayer        — undefined in the reference repo (survives only in
                          the pretrained pickle); reconstructed per the
                          standard StyleGAN2-ADA definition, guided by the
                          param names in legacy.py:171-202 (weight, bias,
                          affine.{weight,bias}, noise_const, noise_strength).
  ToRGBLayerFull_v1_v4/5 — networks.py:1909-1967 (one class here; the
                          parsing head channel count is a parameter).
  Spade_Conv2dLayer     — networks.py:1585-1636
  Spade_Norm_Block      — networks.py:1701-1723
  Spade_ResBlockV4_512  — networks.py:1858-1904
  SynthesisBlockFull_v1_v4 (texture) — networks.py:1970-2082
  SynthesisBlockFull_v1_v6 (style)   — networks.py:2085-2194
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import bias_act, conv2d_resample, modulated_conv2d, setup_filter, upsample2d
from ..ops.bias_act import activation_funcs
from .layers import Conv2dLayer, FullyConnectedLayer, ResBlock, instance_norm_2d


class SynthesisLayer(nn.Module):
    """Modulated conv + noise + fused lrelu; optional 2x upsample."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, w, noise_mode="random", gain=1.0):
        assert noise_mode in ("random", "const", "none")
        affine = FullyConnectedLayer(
            self.w_dim, self.in_channels, bias_init=1.0, name="affine"
        )
        styles = affine(w)
        k = self.kernel_size
        weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (k, k, self.in_channels, self.out_channels),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))

        noise = None
        if self.use_noise:
            noise_strength = self.param(
                "noise_strength", nn.initializers.zeros, ()
            )
            noise_const = self.variable(
                "buffers", "noise_const",
                lambda: jnp.zeros((self.resolution, self.resolution), jnp.float32),
            )
            if noise_mode == "random":
                key = self.make_rng("noise")
                noise = (
                    jax.random.normal(
                        key, (x.shape[0], self.resolution, self.resolution, 1)
                    )
                    * noise_strength
                )
            elif noise_mode == "const":
                noise = (noise_const.value * noise_strength)[None, :, :, None]

        flip_weight = self.up == 1
        x = modulated_conv2d(
            x,
            weight,
            styles,
            noise=noise,
            up=self.up,
            padding=k // 2,
            resample_filter=setup_filter(self.resample_filter),
            flip_weight=flip_weight,
        )
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, act=self.activation, gain=act_gain, clamp=act_clamp)


class ToRGBLayer(nn.Module):
    """1x1 modulated conv to image channels, optional parsing-prediction head.

    parsing_channels=7 reproduces ToRGBLayerFull_v1_v5's head (used at the
    style branch's last block); None disables it (texture branch / non-last).
    """

    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = None
    parsing_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, w):
        k = self.kernel_size
        affine = FullyConnectedLayer(
            self.w_dim, self.in_channels, bias_init=1.0, name="affine"
        )
        weight_gain = 1.0 / math.sqrt(self.in_channels * k * k)
        styles = affine(w) * weight_gain

        weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (k, k, self.in_channels, self.out_channels),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))

        pred_parsing = None
        if self.parsing_channels is not None:
            m_weight1 = self.param(
                "m_weight1", nn.initializers.normal(1.0),
                (k, k, self.in_channels, self.parsing_channels),
            )
            m_bias1 = self.param(
                "m_bias1", nn.initializers.zeros, (self.parsing_channels,)
            )
            # Both heads consume the SAME styles-scaled input with
            # demodulate=False — output channels of a conv accumulate
            # independently, so one weight-concat conv then a split is
            # exact and replaces two [N,512²,64]→tiny-C convs (each too
            # skinny to fill the MXU's 128 output lanes) with one.
            w_cat = jnp.concatenate([weight, m_weight1], axis=-1)
            b_cat = jnp.concatenate([b, m_bias1], axis=0)
            y = modulated_conv2d(x, w_cat, styles, demodulate=False)
            y = bias_act(y, b_cat, clamp=self.conv_clamp)
            x = y[..., : self.out_channels]
            pred_parsing = y[..., self.out_channels:]
        else:
            x = modulated_conv2d(x, weight, styles, demodulate=False)
            x = bias_act(x, b, clamp=self.conv_clamp)
        return x, pred_parsing


class SpadeConv2dLayer(nn.Module):
    """Conv2dLayer variant with *pre*-activation (act before conv), optional.

    Reference Spade_Conv2dLayer (networks.py:1585-1636): forward applies
    bias_act first (unless no_act), then the conv.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activation: str = "relu"
    up: int = 1
    down: int = 1
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, gain=1.0, no_act=False):
        k = self.kernel_size
        w = self.param(
            "weight", nn.initializers.normal(1.0),
            (k, k, self.in_channels, self.out_channels),
        )
        weight_gain = 1.0 / math.sqrt(self.in_channels * k * k)
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )
        if not no_act:
            act_gain = activation_funcs[self.activation].def_gain * gain
            act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
            x = bias_act(x, b, act=self.activation, gain=act_gain, clamp=act_clamp)
        flip_weight = self.up == 1
        return conv2d_resample(
            x,
            (w * weight_gain).astype(x.dtype),
            f=setup_filter(self.resample_filter),
            up=self.up,
            down=self.down,
            padding=k // 2,
            flip_weight=flip_weight,
        )


class _ConvWeight(nn.Module):
    """Weight-only holder: registers `<name>/weight` without running a conv,
    so a parent can fuse several same-input convs into one (param tree —
    and thus the torch importer's name map — stays identical to the
    unfused layout)."""

    shape: Sequence[int]

    @nn.compact
    def __call__(self):
        return self.param("weight", nn.initializers.normal(1.0),
                          tuple(self.shape))


class SpadeNormBlock(nn.Module):
    """SPADE: InstanceNorm(x) * (1 + gamma(feat)) + beta(feat).

    Reference Spade_Norm_Block (networks.py:1701-1723).

    gamma and beta are two 3x3 C->C convolutions of the *same* activation;
    a C=64 output only fills half the MXU's 128 output lanes, so they are
    emitted as one C->2C conv and split (identical math — output channels
    accumulate independently — measured ~2x the per-conv rate at the
    512px blocks)."""

    in_channels: int      # channels of the conditioning features
    norm_channels: int    # channels of x

    @nn.compact
    def __call__(self, x, denorm_feats):
        conv_mlp = SpadeConv2dLayer(
            self.in_channels, self.norm_channels, kernel_size=3,
            use_bias=False, name="conv_mlp")
        c = self.norm_channels
        w_gamma = _ConvWeight((3, 3, c, c), name="conv_gamma")()
        w_beta = _ConvWeight((3, 3, c, c), name="conv_beta")()
        normalized = instance_norm_2d(x)
        actv = jax.nn.relu(conv_mlp(denorm_feats, no_act=True))
        gain = 1.0 / math.sqrt(c * 3 * 3)
        w_gb = (jnp.concatenate([w_gamma, w_beta], axis=-1) * gain)
        gb = conv2d_resample(
            actv, w_gb.astype(actv.dtype), f=None, padding=1,
            flip_weight=True)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        if gamma.shape[-1] < normalized.shape[-1]:
            # x is lane-pad wide: gamma=0 / beta=0 on the pad lanes leaves
            # them as `normalized` garbage — inert at the next conv's
            # zero-padded weight rows.
            pad = normalized.shape[-1] - gamma.shape[-1]
            zeros = jnp.zeros(gamma.shape[:-1] + (pad,), gamma.dtype)
            gamma = jnp.concatenate([gamma, zeros], axis=-1)
            beta = jnp.concatenate([beta, zeros], axis=-1)
        return normalized * (1 + gamma) + beta


class SpadeResBlock(nn.Module):
    """Residual block with SPADE conditioning before each conv.

    Reference Spade_ResBlockV4_512 (networks.py:1858-1904).
    """

    in_channels: int
    out_channels: int
    spade_channels: int
    conv_clamp: Optional[float] = None
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    # Rematerialize each SPADE normalization in the backward. At 512px the
    # three SpadeNormBlocks hold ~9 full-res intermediates (mlp/gamma/beta
    # per norm) live at once during the block's transpose — the dominant
    # term of the batch-16 OOM; inner remat trades them for recompute.
    inner_remat: bool = False

    @nn.compact
    def __call__(self, x, denorm_feat):
        common = dict(
            resample_filter=self.resample_filter, conv_clamp=self.conv_clamp,
            use_bias=False)
        conv = SpadeConv2dLayer(
            self.in_channels, self.in_channels, kernel_size=3, name="conv", **common)
        conv0 = SpadeConv2dLayer(
            self.in_channels, self.out_channels, kernel_size=3, name="conv0", **common)
        conv1 = SpadeConv2dLayer(
            self.out_channels, self.out_channels, kernel_size=3, name="conv1", **common)
        skip = SpadeConv2dLayer(
            self.in_channels, self.out_channels, kernel_size=1, name="skip", **common)
        norm_cls = nn.remat(SpadeNormBlock) if self.inner_remat \
            else SpadeNormBlock
        spade_skip = norm_cls(self.spade_channels, self.in_channels, name="spade_skip")
        spade0 = norm_cls(self.spade_channels, self.in_channels, name="spade0")
        spade1 = norm_cls(self.spade_channels, self.out_channels, name="spade1")

        x = conv(x, no_act=True)
        y = skip(spade_skip(x, denorm_feat), gain=math.sqrt(0.5))
        x = conv0(spade0(x, denorm_feat))
        x = conv1(spade1(x, denorm_feat), gain=math.sqrt(0.5))
        return y + x


class _SynthesisBlockBase(nn.Module):
    """Shared structure of the style (v6) and texture (v4) blocks.

    use_bf16 runs the block's convs in bfloat16 compute with fp32 params
    (reference fp16-per-resolution policy, networks.py:2013-2016 block dtype
    selection; conv_clamp bounds activations either way). torgb outputs are
    always accumulated in fp32 (networks.py ToRGB float32 casts).
    """

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    is_style: bool = False
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_noise: bool = True
    use_bf16: bool = False
    inner_remat: bool = False   # texture block: remat SPADE norms (see
                                # SpadeResBlock.inner_remat)

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.use_bf16 else jnp.float32

    def _main(self, x, ws, pose_feature, cat_feat, noise_mode):
        """conv0/conv1 (+cat_feat merge); returns features pre-SPADE.

        cat_feat is this block's OWN-resolution skip entry (or None for
        res <= 32) — passed as a single tensor, pre-cast by the caller,
        so a remat'd block saves one (possibly bf16) residual instead of
        the whole f32 skip dict."""
        layer_common = dict(
            w_dim=self.w_dim,
            resolution=self.resolution,
            resample_filter=self.resample_filter,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
        )
        w_idx = 0
        if self.in_channels == 0:
            x = pose_feature.astype(self._dtype)
        if self.in_channels != 0:
            conv0 = SynthesisLayer(
                self.in_channels, self.out_channels, up=2, name="conv0",
                **layer_common)
            x = conv0(x, ws[:, w_idx], noise_mode=noise_mode)
            w_idx += 1
        conv1 = SynthesisLayer(
            self.out_channels, self.out_channels, name="conv1", **layer_common)
        x = conv1(x, ws[:, w_idx], noise_mode=noise_mode)
        w_idx += 1

        if self.in_channels != 0 and self.resolution > 32:
            from ..ops.conv2d_resample import lane_pad_enabled

            merge_conv = Conv2dLayer(
                self.out_channels + 64, self.out_channels, kernel_size=1,
                resample_filter=self.resample_filter, name="merge_conv")
            if lane_pad_enabled():
                # Split form keeps lane-pad-wide x / cat_feat consumable
                # (concat would misalign the zero weight rows).
                x = merge_conv(x, x2=cat_feat.astype(x.dtype),
                               split_at=self.out_channels)
            else:
                x = jnp.concatenate([x, cat_feat.astype(x.dtype)], axis=-1)
                x = merge_conv(x)
        return x, w_idx

    def _torgb(self, x, img, ws, w_idx):
        img_out = img
        if img_out is not None:
            img_out = upsample2d(img_out, setup_filter(self.resample_filter))
        torgb = ToRGBLayer(
            self.out_channels,
            self.img_channels,
            w_dim=self.w_dim,
            conv_clamp=self.conv_clamp,
            parsing_channels=(7 if (self.is_last and self.is_style) else None),
            name="torgb",
        )
        y, pred_parsing = torgb(x, ws[:, w_idx])
        y = y.astype(jnp.float32)
        if pred_parsing is not None:
            pred_parsing = pred_parsing.astype(jnp.float32)
        img_out = img_out + y if img_out is not None else y
        return img_out, pred_parsing


class SynthesisBlockStyle(_SynthesisBlockBase):
    """Style-branch block (SynthesisBlockFull_v1_v6): no SPADE; last block's
    torgb also emits the 7-class parsing prediction."""

    @nn.compact
    def __call__(self, x, img, ws, pose_feature, cat_feat, noise_mode="random"):
        x = x.astype(self._dtype) if x is not None else x
        x, w_idx = self._main(x, ws, pose_feature, cat_feat, noise_mode)
        img, pred_parsing = self._torgb(x, img, ws, w_idx)
        return x, img, pred_parsing


class SynthesisBlockTexture(_SynthesisBlockBase):
    """Texture-branch block (SynthesisBlockFull_v1_v4): SPADE resblock
    conditioned on the parsing-index map after the merge."""

    @nn.compact
    def __call__(self, x, img, ws, pose_feature, cat_feat, parsing,
                 noise_mode="random"):
        x = x.astype(self._dtype)
        x, w_idx = self._main(x, ws, pose_feature, cat_feat, noise_mode)
        spade_b512 = SpadeResBlock(
            self.out_channels, self.out_channels, spade_channels=1,
            conv_clamp=self.conv_clamp, inner_remat=self.inner_remat,
            name="spade_b512")
        x = spade_b512(x, parsing.astype(x.dtype))
        img, pred_parsing = self._torgb(x, img, ws, w_idx)
        return x, img, pred_parsing
