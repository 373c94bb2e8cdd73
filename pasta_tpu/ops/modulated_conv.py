"""StyleGAN2 modulated convolution, NHWC, TPU-first formulation.

Reference: `modulated_conv2d` (training/networks.py:36-94). The reference's
"fused" path is a grouped conv with groups == batch — hostile to the MXU. We
always use the mathematically-equivalent activation-scaling formulation
(networks.py:72-82): scale inputs by styles, run ONE shared-weight conv
(large, batched, MXU-shaped), then scale outputs by demodulation coefficients.

The demodulation coefficients depend only on (weight, styles):
    dcoef[n, o] = rsqrt( sum_{i,k,k} (w[o,i,k,k] * s[n,i])^2 + 1e-8 )
which we compute as a [N,I]x[I,O] matmul over the per-(i,o) squared-weight
sums — no [N,O,I,k,k] tensor is ever materialized.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .conv2d_resample import conv2d_resample


def modulated_conv2d(
    x,                      # [N, H, W, I] input.
    weight,                 # [kh, kw, I, O] weights (HWIO).
    styles,                 # [N, I] modulation coefficients.
    noise=None,             # optional [N, H', W', 1]-broadcastable noise.
    up=1,
    down=1,
    padding=0,
    resample_filter=None,   # FIR filter from setup_filter.
    demodulate=True,
    flip_weight=True,
    input_gain=None,        # optional extra per-input-channel gain (fp16-style pre-normalization hook).
):
    """Per-sample style-modulated conv with optional demodulation.

    Returns [N, out_h, out_w, O], same dtype as x.
    """
    n = x.shape[0]
    kh, kw, in_ch, out_ch = weight.shape
    assert styles.shape == (n, in_ch)

    # Pre-normalize to avoid overflow in reduced precision (matches the
    # reference fp16 guard, networks.py:56-59; applied for bf16 here).
    if x.dtype == jnp.bfloat16 and demodulate:
        weight = weight * (
            1
            / jnp.sqrt(jnp.asarray(in_ch * kh * kw, jnp.float32))
            / jnp.max(jnp.abs(weight), axis=(0, 1, 2), keepdims=True)
        )
        styles = styles / jnp.max(jnp.abs(styles), axis=1, keepdims=True)

    dcoefs = None
    if demodulate:
        # sum over spatial taps of w^2 -> [I, O]; then [N,I] @ [I,O] -> [N,O].
        w32 = weight.astype(jnp.float32)
        s32 = styles.astype(jnp.float32)
        w_sq = jnp.sum(jnp.square(w32), axis=(0, 1))
        dcoefs = lax.rsqrt(
            jnp.square(s32) @ w_sq + 1e-8
        )  # [N, O]

    if input_gain is not None:
        styles = styles * input_gain

    if x.shape[-1] > in_ch:
        # Lane-padded wide input (ops/conv2d_resample.py lane-pad lever):
        # zero styles for the pad lanes zero the scaled input there, and the
        # conv's zero-padded weight rows make them inert either way.
        styles = jnp.concatenate(
            [styles, jnp.zeros((n, x.shape[-1] - in_ch), styles.dtype)],
            axis=1)
    x = x * styles.astype(x.dtype)[:, None, None, :]
    x = conv2d_resample(
        x,
        weight.astype(x.dtype),
        f=resample_filter,
        up=up,
        down=down,
        padding=padding,
        flip_weight=flip_weight,
    )
    if x.shape[-1] > out_ch:
        # Widened output: pad the per-sample demodulation with zeros so the
        # pad lanes stay exactly zero ahead of the (broadcast) noise add.
        if dcoefs is not None:
            dcoefs = jnp.concatenate(
                [dcoefs, jnp.zeros((n, x.shape[-1] - out_ch), dcoefs.dtype)],
                axis=1)
    if demodulate and noise is not None:
        x = x * dcoefs.astype(x.dtype)[:, None, None, :] + noise.astype(x.dtype)
    elif demodulate:
        x = x * dcoefs.astype(x.dtype)[:, None, None, :]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x
