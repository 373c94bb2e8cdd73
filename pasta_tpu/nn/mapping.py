"""Mapping network z,c -> w with w_avg tracking and truncation.

Reference: MappingNetwork (training/networks.py:183-259). In the shipped
`fashion` config: z_dim=0, c_dim=512 (the style-encoder code), num_layers=1,
lr_multiplier=0.01, w_avg tracked with beta 0.995.

The w_avg moving average lives in the 'buffers' variable collection; training
steps call with mutable=['buffers'] and update_w_avg=True.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import FullyConnectedLayer, normalize_2nd_moment


class MappingNetwork(nn.Module):
    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: Optional[int]
    num_layers: int = 8
    embed_features: Optional[int] = None
    layer_features: Optional[int] = None
    activation: str = "lrelu"
    lr_multiplier: float = 0.01
    w_avg_beta: Optional[float] = 0.995

    @nn.compact
    def __call__(self, z, c, truncation_psi=1.0, truncation_cutoff=None,
                 update_w_avg=False):
        embed_features = self.embed_features
        if embed_features is None:
            embed_features = self.w_dim
        if self.c_dim == 0:
            embed_features = 0
        layer_features = self.layer_features or self.w_dim
        features_list = (
            [self.z_dim + embed_features]
            + [layer_features] * (self.num_layers - 1)
            + [self.w_dim]
        )

        x = None
        if self.z_dim > 0:
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            embed = FullyConnectedLayer(self.c_dim, embed_features, name="embed")
            y = normalize_2nd_moment(embed(c.astype(jnp.float32)))
            x = jnp.concatenate([x, y], axis=1) if x is not None else y

        for idx in range(self.num_layers):
            layer = FullyConnectedLayer(
                features_list[idx],
                features_list[idx + 1],
                activation=self.activation,
                lr_multiplier=self.lr_multiplier,
                name=f"fc{idx}",
            )
            x = layer(x)

        if self.num_ws is not None and self.w_avg_beta is not None:
            w_avg = self.variable(
                "buffers", "w_avg", lambda: jnp.zeros((self.w_dim,), jnp.float32)
            )
            if update_w_avg and not self.is_initializing():
                batch_mean = jnp.mean(jax.lax.stop_gradient(x), axis=0)
                w_avg.value = (
                    batch_mean * (1 - self.w_avg_beta)
                    + w_avg.value * self.w_avg_beta
                )

        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)

        if truncation_psi != 1:
            assert self.w_avg_beta is not None
            w_avg_val = self.get_variable("buffers", "w_avg")
            if self.num_ws is None or truncation_cutoff is None:
                x = w_avg_val + truncation_psi * (x - w_avg_val)
            else:
                head = w_avg_val + truncation_psi * (x[:, :truncation_cutoff] - w_avg_val)
                x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)
        return x
