"""One-way importer for reference network-snapshot pickles.

The reference checkpoint format embeds module source code in the pickle and
re-executes it on load (torch_utils/persistence.py:35-227). Deserializing it
therefore needs torch + the reference package importable; this converter is a
one-off boundary tool — after conversion everything is torch-free
(.npz / orbax).
"""

from __future__ import annotations

import os
import pickle
import sys

REFERENCE_ROOT = os.environ.get("PASTA_REFERENCE_ROOT", "/root/reference")


def _prepare_reference_import():
    if not os.path.isdir(REFERENCE_ROOT):
        raise RuntimeError(
            f"reference repo not found at {REFERENCE_ROOT}; set "
            f"PASTA_REFERENCE_ROOT to unpickle legacy snapshots")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import torch

    if torch.version.cuda is None:
        torch.version.cuda = "0.0"  # reference import-time crash workaround


def _unpickle_snapshot(path):
    """Unpickle a reference network snapshot (the persistence format:
    training_loop_fullbody.py:721-736 writes {G, D, D_parsing, G_ema,
    augment_pipe, training_set_kwargs}; each module's class re-executes its
    embedded networks.py source on load, persistence.py:179-227)."""
    _prepare_reference_import()
    cwd = os.getcwd()
    os.chdir(REFERENCE_ROOT)
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    finally:
        os.chdir(cwd)


def load_reference_pickle_generator(path, key="G_ema"):
    """Load {G, D, G_ema, ...} snapshot; return flax variables for `key`."""
    from .torch_import import import_generator_state, state_dict_to_numpy

    module = _unpickle_snapshot(path)[key]
    return import_generator_state(state_dict_to_numpy(module))


def load_reference_pickle_discriminator(path, key="D"):
    """Load a snapshot's discriminator ('D' or 'D_parsing') as flax vars."""
    from .torch_import import import_discriminator_state, state_dict_to_numpy

    module = _unpickle_snapshot(path)[key]
    return import_discriminator_state(state_dict_to_numpy(module))
