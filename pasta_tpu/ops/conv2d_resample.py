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

# Epilogue-split lever (serving throughput). When on, large low-channel conv
# outputs get an optimization_barrier so XLA cannot fuse the elementwise
# epilogue (noise/bias/lrelu/clamp) INTO the convolution fusion: the fused
# emitter runs the 512² C<=64 convs at 20-28 TFLOP/s where the unfused conv
# plus a separate epilogue fusion runs at ~60 (scripts/probe_epilogue.py;
# docs/perf_round5.md). The split costs one HBM round-trip of the conv
# output (~1.3 ms/GB at 819 GB/s) against 2-3x on the conv itself. Off by
# default (training is HBM-bound — extra materialization is the wrong trade
# there until measured); bench/serving enable it explicitly.
_EPILOGUE_SPLIT = os.environ.get("PASTA_EPILOGUE_SPLIT", "0") == "1"


def set_epilogue_split(on: bool):
    global _EPILOGUE_SPLIT
    _EPILOGUE_SPLIT = bool(on)


def _maybe_split_epilogue(y):
    if (_EPILOGUE_SPLIT and y.ndim == 4 and y.shape[-1] <= 64
            and y.shape[1] * y.shape[2] >= 512 * 512):
        return jax.lax.optimization_barrier(y)
    return y


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
    return _maybe_split_epilogue(lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    ))


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
