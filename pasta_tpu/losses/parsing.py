"""7-class weighted parsing cross-entropy (loss_fullbody.py:55-56, 186-189).

Class weights [1,3,4,4,4,4,4], ignore_index 255.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax

PARSING_CLASS_WEIGHTS = jnp.asarray([1.0, 3.0, 4.0, 4.0, 4.0, 4.0, 4.0])


def weighted_parsing_ce(logits, targets, ignore_index=255):
    """Mean weighted CE over valid pixels.

    Matches torch nn.CrossEntropyLoss(weight=w, ignore_index=255) semantics:
    sum(w_t * nll) / sum(w_t) over non-ignored pixels.

    Args:
        logits:  [N, H, W, 7].
        targets: [N, H, W] integer labels (may contain ignore_index).
    """
    valid = targets != ignore_index
    safe_targets = jnp.where(valid, targets, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # One-hot contractions instead of take_along_axis / fancy indexing:
    # per-pixel gathers run at GB/s on TPU while these fuse into VPU ops.
    onehot = jax.nn.one_hot(safe_targets, logits.shape[-1], dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    w = (onehot @ PARSING_CLASS_WEIGHTS.astype(logp.dtype)) \
        * valid.astype(logits.dtype)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-8)
