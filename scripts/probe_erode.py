"""Probe erosion strategies on the chip.

Candidates for the separable k-window min at the serving shapes:
  * reduce_window (current)
  * log-shift min composition (jnp.minimum over power-of-2 shifted copies
    via lax.pad+slice — pure elementwise VPU work)
Both with/without the trailing C=1 and in f32/bf16.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_ITERS = 30


def timed(fn, *args):
    @jax.jit
    def loop(*args):
        def body(i, acc):
            return acc + fn(acc, *args)

        return lax.fori_loop(0, N_ITERS, body, jnp.float32(0.0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / N_ITERS


def erode_rw(x, k, w_axis=None, h_axis=None):
    """Current device_warp.erode core (separable reduce_window, squeezed)."""
    pad = k // 2
    nd = x.ndim
    win = [1] * nd
    padding = [(0, 0)] * nd
    w_axis = nd - 1 if w_axis is None else w_axis
    h_axis = nd - 2 if h_axis is None else h_axis
    ww, pw = list(win), list(padding)
    ww[w_axis] = k
    pw[w_axis] = (pad, k - 1 - pad)
    x = lax.reduce_window(x, jnp.inf, lax.min, ww, [1] * nd, pw)
    wh, ph = list(win), list(padding)
    wh[h_axis] = k
    ph[h_axis] = (pad, k - 1 - pad)
    return lax.reduce_window(x, jnp.inf, lax.min, wh, [1] * nd, ph)


def _shift(x, s, axis, fill):
    """x shifted by s along axis (s>0 pulls from higher indices), +inf fill."""
    pads = [(0, 0, 0)] * x.ndim
    if s >= 0:
        pads[axis] = (0, s, 0)
        y = lax.pad(x, jnp.asarray(fill, x.dtype), pads)
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(s, s + x.shape[axis])
        return y[tuple(idx)]
    pads[axis] = (-s, 0, 0)
    y = lax.pad(x, jnp.asarray(fill, x.dtype), pads)
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(0, x.shape[axis])
    return y[tuple(idx)]


def _axis_min(x, k, pad, axis):
    """Sliding window-min of size k via log-shift composition, then align
    so output[i] = min(x[i-pad : i-pad+k])."""
    covered = 1
    y = x
    while covered * 2 <= k:
        y = jnp.minimum(y, _shift(y, covered, axis, jnp.inf))
        covered *= 2
    if covered < k:
        y = jnp.minimum(y, _shift(y, k - covered, axis, jnp.inf))
    return _shift(y, -pad, axis, jnp.inf)


def erode_shift(x, k):
    pad = k // 2
    x = _axis_min(x, k, pad, x.ndim - 1)
    return _axis_min(x, k, pad, x.ndim - 2)


def main():
    key = jax.random.PRNGKey(0)
    # serving shapes: per-part tile masks and full-res kept-garment masks
    cases = [("tiles", (120, 256, 256), 5), ("tiles_k8", (120, 256, 256), 8),
             ("fullres", (8, 512, 512), 8)]
    for name, shape, k in cases:
        x = jax.random.uniform(key, shape, jnp.float32) * 255.0
        rec = {"case": name, "shape": shape, "k": k}
        # parity first
        a = jax.jit(lambda v: erode_rw(v, k))(x)
        b = jax.jit(lambda v: erode_shift(v, k))(x)
        rec["max_abs_diff"] = float(jnp.max(jnp.abs(a - b)))

        def rw_body(acc, v):
            return jnp.mean(erode_rw(v + acc, k))

        def sh_body(acc, v):
            return jnp.mean(erode_shift(v + acc, k))

        def rw_c1_body(acc, v):
            # NHWC layout with trailing C=1 (the pre-round-4 call shape)
            y = (v + acc)[..., None]
            return jnp.mean(erode_rw(y, k, w_axis=y.ndim - 2,
                                     h_axis=y.ndim - 3))

        for nm, body in (("reduce_window_ms", rw_body),
                         ("shift_min_ms", sh_body),
                         ("reduce_window_c1_ms", rw_c1_body)):
            try:
                rec[nm] = round(timed(body, x) * 1e3, 3)
            except Exception as e:  # noqa: BLE001
                rec[nm] = f"{type(e).__name__}"
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
