"""Orbax checkpointing for training state and inference variables.

Improves on the reference snapshot format (source-embedding pickles,
persistence.py:35-227; no optimizer/ADA/step state saved,
training_loop_fullbody.py:721-736): atomic directories holding the full
{params, ema, opt states, ada_p, step} pytree.
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp


def save_checkpoint_variables(path, variables):
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, variables, force=True)


def load_checkpoint_variables(path, abstract_tree=None):
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if abstract_tree is None:
            return ckptr.restore(path)
        return ckptr.restore(path, abstract_tree)
