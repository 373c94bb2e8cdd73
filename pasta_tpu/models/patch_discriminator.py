"""Patch co-occurrence discriminator (swapping-autoencoder style).

Capability parity for the reference StyleGAN2PatchDiscriminator(_V2)
(networks.py:1182-1515; unused by the shipped fullbody loss but part of the
repo's surface). The reference builds it from a vendored rosinality layer
family (ConvLayer/ResBlock_PD/EqualLinear/Blur — the repo's second,
duplicated StyleGAN2 implementation; SURVEY.md §2.1 'dead duplicate').
This rebuild keeps ONE layer family: the same co-occurrence architecture is
expressed with our Conv2dLayer/FullyConnectedLayer stack.

Architecture function (networks.py:1374-1418): sample K random crops from
the target and (for the non-V2 variant) reference images, encode each crop
with a shared conv encoder, aggregate reference features, and score
(target_feat, ref_feat) pairs through a pairlinear MLP. V2 drops the
reference branch.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.layers import Conv2dLayer, FullyConnectedLayer, ResBlock


class PatchEncoder(nn.Module):
    """Shared crop encoder: fromrgb + downsampling resblocks to 4x4."""

    crop_size: int = 64
    channel_base: int = 2048
    channel_max: int = 256

    @nn.compact
    def __call__(self, x):
        res = self.crop_size
        ch = lambda r: min(self.channel_base // r, self.channel_max)
        x = Conv2dLayer(3, ch(res), kernel_size=1, activation="lrelu",
                        name="fromrgb")(x)
        while res > 4:
            x = ResBlock(ch(res), ch(res // 2), kernel_size=3,
                         activation="lrelu", down=2, name=f"b{res}")(x)
            res //= 2
        x = Conv2dLayer(ch(4), ch(4), kernel_size=3, activation="lrelu",
                        name="conv4")(x)
        x = x.reshape(x.shape[0], -1)
        return FullyConnectedLayer(ch(4) * 16, ch(4), activation="lrelu",
                                   name="fc")(x)


class PatchCoOccurrenceDiscriminator(nn.Module):
    """Score whether target crops share texture statistics with reference
    crops. use_reference=False gives the V2 variant (networks.py:1496-1515).
    """

    crop_size: int = 64
    num_crops: int = 8
    use_reference: bool = True
    channel_max: int = 256

    @nn.compact
    def __call__(self, target_crops, reference_crops=None):
        """target_crops: [N, K, crop, crop, 3];
        reference_crops: [N, Kr, crop, crop, 3] (required unless V2)."""
        n, k = target_crops.shape[:2]
        encoder = PatchEncoder(crop_size=self.crop_size,
                               channel_max=self.channel_max, name="encoder")
        feat_dim = min(2048 // 4, self.channel_max)

        t_feat = encoder(target_crops.reshape((-1,) + target_crops.shape[2:]))
        t_feat = t_feat.reshape(n, k, -1)

        if self.use_reference:
            assert reference_crops is not None
            kr = reference_crops.shape[1]
            r_feat = encoder(
                reference_crops.reshape((-1,) + reference_crops.shape[2:]))
            r_feat = r_feat.reshape(n, kr, -1).mean(axis=1, keepdims=True)
            pair = jnp.concatenate(
                [t_feat, jnp.broadcast_to(r_feat, t_feat.shape)], axis=-1)
            in_dim = feat_dim * 2
        else:
            pair = t_feat
            in_dim = feat_dim

        h = FullyConnectedLayer(in_dim, feat_dim, activation="lrelu",
                                name="pairlinear.0")(pair.reshape(n * k, -1))
        h = FullyConnectedLayer(feat_dim, feat_dim, activation="lrelu",
                                name="pairlinear.1")(h)
        logits = FullyConnectedLayer(feat_dim, 1, name="pairlinear.2")(h)
        return logits.reshape(n, k)
