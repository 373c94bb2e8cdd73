"""Checkpoint + weight-import IO."""

from .torch_import import (
    import_generator_state,
    import_discriminator_state,
    torch_key_to_flax_path,
)
