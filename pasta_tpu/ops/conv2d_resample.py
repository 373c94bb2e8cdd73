"""2-D convolution with optional FIR up/downsampling, NHWC / HWIO.

TPU-native equivalent of reference `conv2d_resample()`
(torch_utils/ops/conv2d_resample.py:59-154). The padding algebra is ported
exactly; the execution strategy is re-chosen for XLA:

  * down-only  -> FIR pass (fused depthwise conv) then strided conv
  * up         -> FIR pass with lhs_dilation (zero-upsample fused into the
                  depthwise conv) then plain conv — mathematically identical
                  to the reference's transpose-conv fast path
  * plain      -> one conv

Everything lowers to `lax.conv_general_dilated`, which XLA tiles onto the MXU;
no grouped-by-batch convs, no transpose convs.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

from .upfirdn2d import upfirdn2d, _parse_padding, _get_filter_size

# Lane-pad lever (serving throughput). The round-5 serving trace showed
# 512² convs with 64 output channels running at 20-28 TFLOP/s while
# 128-out convs in the SAME program at the SAME {3,0,2,1:T(8,128)} layout
# run at 100-153 (docs/perf_round5.md): a 64-wide minor dim fills half the
# MXU's 128 lanes AND steers XLA to the slow EmitAllBatchInSublanes conv
# emitter. Since a C=64 lane dim is already padded to 128 in HBM, widening
# the conv to an explicit 128 output (zero weights — exact: extra output
# channels accumulate independently) costs no memory and roughly doubles
# the useful rate (scripts/probe_chanpad.py).
#
# CRITICAL: the widened output must NOT be sliced back to 64 next to the
# conv — XLA's algebraic simplifier recognizes slice(conv(x, concat(w, 0)))
# and reverts the whole trick (measured: identical runtime, and the
# optimized HLO shows no 128-out convs). Instead the wide tensor FLOWS
# through the elementwise epilogues, and every consumer conv zero-pads its
# weight's *input* rows to the physical width (zero rows make the garbage
# pad lanes inert — exact). Slices only ever appear where a multi-consumer
# split already exists (the SPADE gamma/beta pattern, which XLA keeps).
#
# Off by default (training programs are compiled under remat/HBM pressure —
# measured separately); bench/serving enable it explicitly.
_LANE_PAD = os.environ.get("PASTA_LANE_PAD", "0") == "1"
_LANE_PAD_MIN_PIXELS = 512 * 512
_LANE = 128


def set_lane_pad(on: bool):
    global _LANE_PAD
    _LANE_PAD = bool(on)


def lane_pad_enabled() -> bool:
    return _LANE_PAD


def _lane_pad_wants(x, w, groups):
    # Widen only the exactly-half-lane case: 64-out convs on large maps.
    # Smaller heads (torgb's 3/10-out) must keep their logical width — their
    # consumers (image composites) are not convs and cannot eat pad lanes.
    return (_LANE_PAD and groups == 1 and x.ndim == 4
            and w.shape[3] == _LANE // 2
            and x.shape[1] * x.shape[2] >= _LANE_PAD_MIN_PIXELS)


def _conv2d(x, w, stride=1, padding=0, groups=1, flip_weight=True):
    """Plain NHWC conv. `w` is [kh, kw, in_per_group, out].

    flip_weight=True performs correlation (torch F.conv2d semantics);
    False flips the kernel spatially first (true convolution).
    """
    if not flip_weight:
        w = w[::-1, ::-1]
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif len(padding) == 2 and isinstance(padding[0], int):
        # [py, px] like the torch wrapper
        py, px = padding
        padding = ((py, py), (px, px))
    if _LANE_PAD and groups == 1 and x.shape[-1] > w.shape[2]:
        # Wide (lane-padded) input from an upstream widened conv: zero rows
        # for the pad lanes make their garbage contribute exactly nothing.
        w = jnp.concatenate(
            [w, jnp.zeros((w.shape[0], w.shape[1],
                           x.shape[-1] - w.shape[2], w.shape[3]), w.dtype)],
            axis=2)
    if _lane_pad_wants(x, w, groups):
        w = jnp.concatenate(
            [w, jnp.zeros(w.shape[:3] + (_LANE - w.shape[3],), w.dtype)],
            axis=3)
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def conv2d_resample(x, w, f=None, up=1, down=1, padding=0, groups=1,
                    flip_weight=True, flip_filter=False):
    """Conv with optional up/downsampling; padding applied once, up-front.

    Args:
        x:           [N, H, W, C] input.
        w:           [kh, kw, in_channels // groups, out_channels] weights.
        f:           FIR filter from `setup_filter`, or None.
        up:          integer upsampling factor.
        down:        integer downsampling factor.
        padding:     int, (x, y), or (x0, x1, y0, y1) w.r.t. the upsampled image.
        groups:      feature group count.
        flip_weight: True = correlation (torch conv2d), False = convolution.
        flip_filter: same for the FIR filter.

    Returns:
        [N, out_h, out_w, out_channels].
    """
    assert x.ndim == 4 and w.ndim == 4
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    kh, kw = int(w.shape[0]), int(w.shape[1])
    fw, fh = _get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    # Adjust padding for up/downsampling (reference conv2d_resample.py:96-106).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # 1x1 kernel + downsampling only: downsample first, then cheap conv.
    if kw == 1 and kh == 1 and down > 1 and up == 1:
        x = upfirdn2d(x, f, down=down, padding=[px0, px1, py0, py1],
                      flip_filter=flip_filter)
        return _conv2d(x, w, groups=groups, flip_weight=flip_weight)

    # 1x1 kernel + upsampling only: conv first, then upsample.
    if kw == 1 and kh == 1 and up > 1 and down == 1:
        x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
        return upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1],
                         gain=up ** 2, flip_filter=flip_filter)

    # Downsampling only: FIR pass, then strided conv.
    if down > 1 and up == 1:
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1], flip_filter=flip_filter)
        return _conv2d(x, w, stride=down, groups=groups, flip_weight=flip_weight)

    # Upsampling (with optional downsampling): fused zero-upsample + FIR pass,
    # then conv. Equivalent to the reference's transpose-conv fast path
    # (conv2d_resample.py:127-142) and to its generic fallback (:146-150).
    if up > 1:
        x = upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1],
                      gain=up ** 2, flip_filter=flip_filter)
        x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
        if down > 1:
            x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    # Plain conv with symmetric non-negative padding.
    if px0 == px1 and py0 == py1 and px0 >= 0 and py0 >= 0:
        return _conv2d(x, w, padding=[py0, px0], groups=groups,
                       flip_weight=flip_weight)

    # Asymmetric / negative padding: explicit pad/crop pass then conv. (The
    # FIR filter is not applied here — matching the reference fallback, which
    # passes f=None when up == 1, conv2d_resample.py:146.)
    x = upfirdn2d(x, None, padding=[px0, px1, py0, py1])
    return _conv2d(x, w, groups=groups, flip_weight=flip_weight)
