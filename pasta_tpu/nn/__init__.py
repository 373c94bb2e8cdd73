"""Neural-net layer library (flax.linen, NHWC).

Param-tree layout mirrors the reference torch module names (weight/bias,
submodule attribute names) so the torch-pickle weight importer is a pure
name-map + layout transpose.
"""

from .layers import (
    normalize_2nd_moment,
    instance_norm_2d,
    FullyConnectedLayer,
    Conv2dLayer,
    Dense,
    MinibatchStdLayer,
    ResBlock,
)
from .mapping import MappingNetwork
from .synthesis import (
    SynthesisLayer,
    ToRGBLayer,
    SpadeConv2dLayer,
    SpadeNormBlock,
    SpadeResBlock,
    SynthesisBlockStyle,
    SynthesisBlockTexture,
)
from .encoders import ConstEncoderNetwork, StyleEncoderNetwork
from . import legacy  # capability-parity layer zoo (v1 leftovers etc.)
