"""Fused pad → zero-upsample → FIR filter → downsample, NHWC.

TPU-native replacement for the reference CUDA plugin
(torch_utils/ops/upfirdn2d.{cpp,cu}; python API ops/upfirdn2d.py:126-382).
Implemented as a single `lax.conv_general_dilated` per (separable) pass:
  * zero-upsampling  -> lhs_dilation
  * padding/cropping -> conv padding (XLA supports negative padding = crop)
  * FIR filtering    -> depthwise convolution
  * downsampling     -> window strides
so XLA fuses the whole thing, and first/second-order autodiff (needed for R1)
falls out of the conv primitive.

One semantic delta handled explicitly: the reference zero-upsampling appends
`up-1` trailing zeros per input sample (out size H*up), while lhs_dilation
inserts zeros only *between* samples (out size (H-1)*up+1). We add the missing
`up-1` to the trailing pad.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def _parse_scaling(scaling):
    if isinstance(scaling, (int, np.integer)):
        scaling = [int(scaling), int(scaling)]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding):
    if isinstance(padding, (int, np.integer)):
        padding = [int(padding), int(padding)]
    padding = [int(p) for p in padding]
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def _get_filter_size(f):
    if f is None:
        return 1, 1
    assert f.ndim in (1, 2)
    fw = int(f.shape[-1])
    fh = int(f.shape[0])
    return fw, fh


def _fir_pass(x, taps_2d, up, down, pad0, pad1, axis):
    """One depthwise FIR pass along `axis` (1=H, 2=W) of an NHWC tensor.

    `taps_2d` is an [fh, fw] float32 kernel (one of the dims is 1 for a
    separable pass). Already gain-scaled and flip-adjusted by the caller.
    """
    n, h, w, c = x.shape
    fh, fw = int(taps_2d.shape[0]), int(taps_2d.shape[1])
    kernel = jnp.broadcast_to(
        taps_2d.astype(x.dtype)[:, :, None, None], (fh, fw, 1, c)
    )
    if axis == 1:
        lhs_dilation = (up, 1)
        strides = (down, 1)
        padding = ((pad0, pad1 + up - 1), (0, 0))
    else:
        lhs_dilation = (1, up)
        strides = (1, down)
        padding = ((0, 0), (pad0, pad1 + up - 1))
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _fir_pass_2d(x, f, upx, upy, downx, downy, px0, px1, py0, py1):
    """Non-separable 2-D depthwise FIR pass on NHWC."""
    n, h, w, c = x.shape
    fh, fw = int(f.shape[0]), int(f.shape[1])
    kernel = jnp.broadcast_to(f.astype(x.dtype)[:, :, None, None], (fh, fw, 1, c))
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(downy, downx),
        padding=((py0, py1 + upy - 1), (px0, px1 + upx - 1)),
        lhs_dilation=(upy, upx),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    """Pad, upsample, FIR-filter, and downsample a batch of NHWC images.

    Mirrors reference `upfirdn2d()` (ops/upfirdn2d.py:126-208) exactly, with
    the layout transposed to NHWC.

    Args:
        x:           [N, H, W, C] input.
        f:           float32 FIR filter — [fh, fw] (non-separable), [taps]
                     (separable), or None (identity). Use `setup_filter`.
        up:          int or (upx, upy) upsampling factor.
        down:        int or (downx, downy) downsampling factor.
        padding:     int, (x, y), or (x0, x1, y0, y1), relative to the
                     upsampled image; negative = crop.
        flip_filter: False = convolution (filter flipped before correlation),
                     True = correlation.
        gain:        overall magnitude scale.

    Returns:
        [N, out_h, out_w, C] tensor,
        out_h = (H*upy + pady0 + pady1 - fh) // downy + 1.
    """
    assert x.ndim == 4
    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    f = jnp.asarray(f, dtype=jnp.float32)
    assert f.ndim in (1, 2)
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)

    # Filter is applied as correlation after an optional flip, matching the
    # reference (`if not flip_filter: f = f.flip(...)`).
    if not flip_filter:
        f = f[::-1] if f.ndim == 1 else f[::-1, ::-1]

    if f.ndim == 1:
        # Separable: horizontal pass then vertical pass, sqrt(gain) each.
        g = float(gain) ** 0.5
        x = _fir_pass(x, (f * g)[None, :], upx, downx, px0, px1, axis=2)
        x = _fir_pass(x, (f * g)[:, None], upy, downy, py0, py1, axis=1)
        return x
    return _fir_pass_2d(
        x, f * float(gain), upx, upy, downx, downy, px0, px1, py0, py1
    )


def filter2d(x, f, padding=0, flip_filter=False, gain=1):
    """FIR-filter NHWC images, output padded to match input shape by default.

    Reference: ops/upfirdn2d.py:272-306.
    """
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        px0 + fw // 2,
        px1 + (fw - 1) // 2,
        py0 + fh // 2,
        py1 + (fh - 1) // 2,
    ]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1):
    """Upsample NHWC images with the given FIR filter.

    Reference: ops/upfirdn2d.py:310-347.
    """
    upx, upy = _parse_scaling(up)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        px0 + (fw + upx - 1) // 2,
        px1 + (fw - upx) // 2,
        py0 + (fh + upy - 1) // 2,
        py1 + (fh - upy) // 2,
    ]
    return upfirdn2d(
        x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy
    )


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1):
    """Downsample NHWC images with the given FIR filter.

    Reference: ops/upfirdn2d.py:351-387.
    """
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        px0 + (fw - downx + 1) // 2,
        px1 + (fw - downx) // 2,
        py0 + (fh - downy + 1) // 2,
        py1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
