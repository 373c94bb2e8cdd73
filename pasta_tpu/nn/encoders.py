"""Pose and style encoders.

References (/root/reference/training/networks.py):
  ConstEncoderNetwork     — networks.py:356-375 (instantiated with
                            input_nc=5, n_downsampling=6, networks.py:2350)
  StyleEncoderNetworkV18  — networks.py:1726-1774 (input_nc=45)

Sequential children are named '0', '1', ... to mirror torch nn.Sequential
parameter paths for the weight importer.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv2dLayer, Dense, FullyConnectedLayer


class ConstEncoderNetwork(nn.Module):
    """Pose encoder: e.g. 5ch @ 512^2 -> 512ch @ 8^2 via 6 stride-2 convs.

    All convs use the reference's default linear activation.
    """

    input_nc: int
    output_nc: int
    ngf: int = 64
    n_downsampling: int = 6

    @nn.compact
    def __call__(self, x):
        if self.n_downsampling == 6:
            # exact reference channel schedule (networks.py:363-364)
            mult_ins = [1, 2, 4, 4, 4, 8]
            mult_outs = [2, 4, 4, 4, 8, 8]
        else:
            # doubling, capped at 8 (small/test configs)
            mult_ins = [min(2 ** i, 8) for i in range(self.n_downsampling)]
            mult_outs = [min(2 ** (i + 1), 8) for i in range(self.n_downsampling)]
            mult_outs[-1] = 8
            if self.n_downsampling >= 2:
                mult_ins[-1] = mult_outs[-2]
        x = Conv2dLayer(self.input_nc, self.ngf, kernel_size=1, name="model.0")(x)
        for i in range(self.n_downsampling):
            conv = Conv2dLayer(
                self.ngf * mult_ins[i], self.ngf * mult_outs[i],
                kernel_size=3, down=2, name=f"model.{i + 1}")
            x = conv(x)
        return x


class StyleEncoderNetwork(nn.Module):
    """Dual encoder: garment-patch style path -> 512-d code, plus a shallow
    retain-input pyramid whose 4 feature maps are skip-injected into the
    generator (cat_feats)."""

    input_nc: int
    output_nc: int
    ngf: int = 64

    @nn.compact
    def __call__(self, x, const_input):
        # Retain-feature pyramid (feat_enc): 6ch @512 -> 64ch @ {512,256,128,64}
        const_feats = []
        feat = const_input
        feat = Conv2dLayer(6, self.ngf, kernel_size=3, name="feat_enc.0")(feat)
        const_feats.append(feat)
        for i in range(3):
            feat = Conv2dLayer(
                self.ngf, self.ngf, kernel_size=3, down=2,
                name=f"feat_enc.{i + 1}")(feat)
            const_feats.append(feat)

        # Style path over the 45ch 128^2 patch stack.
        ngf = self.ngf
        x = Conv2dLayer(self.input_nc, ngf, kernel_size=1, name="model.0")(x)
        idx = 1
        for mult_in, mult_out in zip([1, 2, 4], [2, 4, 8]):
            x = Dense(ngf * mult_in, ngf * mult_in, name=f"model.{idx}")(x)
            x = Conv2dLayer(
                ngf * mult_in, ngf * mult_out, kernel_size=3, down=2,
                name=f"model.{idx + 1}")(x)
            idx += 2
        for _ in range(3):
            x = Dense(ngf * 8, ngf * 8, name=f"model.{idx}")(x)
            x = Conv2dLayer(
                ngf * 8, ngf * 8, kernel_size=3, name=f"model.{idx + 1}")(x)
            idx += 2
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1) + flatten
        x = FullyConnectedLayer(self.output_nc, self.output_nc, name="fc")(x)
        return x, const_feats
