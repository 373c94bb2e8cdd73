"""Flat .npz serialization of flax variable trees (portable, torch-free)."""

from __future__ import annotations

import numpy as np
import jax

SEP = "||"  # module names may contain '.', so use an unambiguous separator


def save_npz_variables(path, variables):
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    out = {}
    for keypath, value in flat:
        segs = []
        for k in keypath:
            segs.append(str(getattr(k, "key", k)))
        out[SEP.join(segs)] = np.asarray(value)
    np.savez(path, **out)


def load_npz_into(path, template):
    """Restore an npz saved by save_npz_variables into `template`'s pytree
    structure (dataclasses included) — the resume loader for the
    multi-process training snapshots. Uses the identical flatten paths, so
    the roundtrip is exact by construction."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for keypath, _ in flat:
        segs = [str(getattr(k, "key", k)) for k in keypath]
        leaves.append(data[SEP.join(segs)])
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_npz_variables(path):
    data = np.load(path)
    tree = {}
    for key in data.files:
        node = tree
        segs = key.split(SEP)
        for seg in segs[:-1]:
            node = node.setdefault(seg, {})
        node[segs[-1]] = data[key]
    return tree
