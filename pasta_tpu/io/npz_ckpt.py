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
