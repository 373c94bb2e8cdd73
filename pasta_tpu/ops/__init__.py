"""Core resampling / activation / modulated-conv ops (NHWC, lax-composed).

These replace the reference's CUDA plugins (torch_utils/ops/upfirdn2d.cu,
bias_act.cu) with XLA-fusable compositions of lax primitives, so first- and
second-order autodiff (needed for R1 regularization) come for free.
"""

from .filters import setup_filter
from .upfirdn2d import upfirdn2d, upsample2d, downsample2d, filter2d
from .bias_act import bias_act, activation_funcs
from .conv2d_resample import conv2d_resample
from .modulated_conv import modulated_conv2d
from .projective_warp import (
    warp_perspective_matmul, warp_perspective_matmul_multi)

__all__ = [
    "warp_perspective_matmul",
    "warp_perspective_matmul_multi",
    "setup_filter",
    "upfirdn2d",
    "upsample2d",
    "downsample2d",
    "filter2d",
    "bias_act",
    "activation_funcs",
    "conv2d_resample",
    "modulated_conv2d",
]
