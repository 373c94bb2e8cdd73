"""k-NN manifold precision / recall (reference
metrics/precision_recall.py:19-60), batched on device."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _kth_nn_radius(features, nhood_size, row_batch=2048, col_batch=4096):
    """Distance to the k-th nearest neighbor within `features` (self
    excluded by k+1 like the reference's kth value over the full set)."""
    n = features.shape[0]
    feats = jnp.asarray(features)
    radii = []

    @jax.jit
    def batch_kth(rows, feats):
        d2 = (
            jnp.sum(rows ** 2, axis=1, keepdims=True)
            - 2 * rows @ feats.T
            + jnp.sum(feats ** 2, axis=1)[None, :]
        )
        d2 = jnp.maximum(d2, 0.0)
        # kth smallest including self-distance 0 -> index nhood_size
        vals = jnp.sort(d2, axis=1)[:, nhood_size]
        return jnp.sqrt(vals)

    for start in range(0, n, row_batch):
        radii.append(np.asarray(batch_kth(feats[start:start + row_batch], feats)))
    return np.concatenate(radii)


def _fraction_within(query, manifold, radii, row_batch=2048):
    """Fraction of query points within some manifold point's k-NN radius."""
    q = jnp.asarray(query)
    m = jnp.asarray(manifold)
    r = jnp.asarray(radii)

    @jax.jit
    def batch_hit(rows):
        d2 = (
            jnp.sum(rows ** 2, axis=1, keepdims=True)
            - 2 * rows @ m.T
            + jnp.sum(m ** 2, axis=1)[None, :]
        )
        d = jnp.sqrt(jnp.maximum(d2, 0.0))
        return jnp.any(d <= r[None, :], axis=1)

    hits = []
    for start in range(0, query.shape[0], row_batch):
        hits.append(np.asarray(batch_hit(q[start:start + row_batch])))
    return float(np.concatenate(hits).mean())


def compute_pr(real_features, gen_features, nhood_size=3):
    """Returns (precision, recall)."""
    real_radii = _kth_nn_radius(real_features, nhood_size)
    gen_radii = _kth_nn_radius(gen_features, nhood_size)
    precision = _fraction_within(gen_features, real_features, real_radii)
    recall = _fraction_within(real_features, gen_features, gen_radii)
    return precision, recall
