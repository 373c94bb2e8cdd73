"""Frechet Inception Distance (reference
metrics/frechet_inception_distance.py:20-39)."""

from __future__ import annotations

import numpy as np
import scipy.linalg


def compute_fid(mu_real, sigma_real, mu_gen, sigma_gen):
    m = np.square(mu_gen - mu_real).sum()
    s, _ = scipy.linalg.sqrtm(
        np.dot(sigma_gen, sigma_real), disp=False)
    return float(np.real(m + np.trace(sigma_gen + sigma_real - s * 2)))
