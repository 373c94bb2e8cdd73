"""Fused bias + activation + gain + clamp (elementwise).

TPU-native replacement for the reference CUDA plugin
(torch_utils/ops/bias_act.{cpp,cu}; python API ops/bias_act.py:55-123).
Composed from jnp primitives so XLA fuses it into neighboring convs and
`jax.grad(jax.grad(...))` (R1 regularization) works without custom VJPs.

Clamp semantics match the kernel: forward clamps to ±clamp; the induced
gradient is zero wherever the pre-clamp output leaves [-clamp, clamp], which
is exactly what jnp.clip's autodiff does.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Callable

import jax
import jax.numpy as jnp


class _ActSpec(NamedTuple):
    func: Callable
    def_alpha: float
    def_gain: float


activation_funcs = {
    "linear": _ActSpec(lambda x, alpha: x, 0.0, 1.0),
    "relu": _ActSpec(lambda x, alpha: jax.nn.relu(x), 0.0, math.sqrt(2.0)),
    "lrelu": _ActSpec(
        lambda x, alpha: jax.nn.leaky_relu(x, negative_slope=alpha),
        0.2,
        math.sqrt(2.0),
    ),
    "tanh": _ActSpec(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": _ActSpec(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": _ActSpec(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": _ActSpec(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": _ActSpec(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": _ActSpec(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0, math.sqrt(2.0)),
}


def bias_act(x, b=None, dim=-1, act="linear", alpha=None, gain=None, clamp=None):
    """Add bias along `dim`, apply activation, scale by gain, clamp.

    Matches reference `bias_act()` (ops/bias_act.py:55-123) with the layout
    default transposed: `dim` defaults to -1 (channels-last) instead of 1.

    Args:
        x:     input of any shape.
        b:     1-D bias of length x.shape[dim], or None.
        dim:   dimension of x that b indexes.
        act:   one of `activation_funcs` keys.
        alpha: activation shape parameter (None = per-act default).
        gain:  output scale (None = per-act default, e.g. sqrt(2) for lrelu).
        clamp: clamp output to ±clamp (None = no clamping).

    Returns:
        Tensor shaped like x, same dtype.
    """
    assert clamp is None or clamp >= 0
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)

    if b is not None:
        assert b.ndim == 1
        axis = dim % x.ndim
        if b.shape[0] < x.shape[axis]:
            # Lane-padded wide activation (conv2d_resample lane-pad lever):
            # zero bias for the pad lanes.
            from .conv2d_resample import lane_pad_enabled

            assert lane_pad_enabled(), (
                f"bias length {b.shape[0]} < channel dim {x.shape[axis]}")
            b = jnp.concatenate(
                [b, jnp.zeros((x.shape[axis] - b.shape[0],), b.dtype)])
        shape = [1] * x.ndim
        shape[axis] = -1
        x = x + b.astype(x.dtype).reshape(shape)

    x = spec.func(x, alpha)
    if gain != 1:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return x
