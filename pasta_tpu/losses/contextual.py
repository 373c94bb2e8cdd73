"""Contextual loss (reference loss_fullbody.py:483-618).

Cosine-distance softmax affinity between VGG feature sets of generated and
target images. The reference instantiates it when contextual_weight > 0
(default 0 in the shipped config, train.py:218); provided here for full
capability parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .vgg import VGG19Features


def contextual_distance(x_feat, y_feat, h=0.5, eps=1e-5):
    """CX distance between feature maps [N, H, W, C] (loss_fullbody.py:574-618).

    Features are mean-centered by the target, L2-normalized, and matched by
    softmax over relative cosine distances.
    """
    n, hh, ww, c = x_feat.shape
    y_mu = jnp.mean(y_feat, axis=(0, 1, 2), keepdims=True)
    x = x_feat - y_mu
    y = y_feat - y_mu
    x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)
    y = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + eps)
    x = x.reshape(n, -1, c)
    y = y.reshape(n, -1, c)
    # cosine distance -> relative distance -> softmax affinity
    d = 1.0 - jnp.einsum("nic,njc->nij", x, y)
    d_min = jnp.min(d, axis=2, keepdims=True)
    d_rel = d / (d_min + eps)
    w = jnp.exp((1.0 - d_rel) / h)
    cx = w / jnp.sum(w, axis=2, keepdims=True)
    cx_max = jnp.max(cx, axis=1)  # best match per target feature
    return jnp.mean(-jnp.log(jnp.mean(cx_max, axis=1) + eps))


def contextual_loss(vgg_params, x, y, layers=(2, 3), h=0.5,
                    max_spatial=64):
    """Contextual loss over selected VGG slices (relu3_1, relu4_1 by
    default); spatial maps larger than max_spatial are average-pooled first
    (the affinity matrix is quadratic in pixels)."""
    model = VGG19Features()
    fx = model.apply(vgg_params, x)
    fy = model.apply(vgg_params, jax.lax.stop_gradient(y))
    loss = 0.0
    for i in layers:
        a, b = fx[i], fy[i]
        while a.shape[1] > max_spatial:
            a = jax.lax.reduce_window(
                a, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4
            b = jax.lax.reduce_window(
                b, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4
        loss = loss + contextual_distance(a, b, h=h)
    return loss
