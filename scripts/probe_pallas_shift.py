"""Probe: Mosaic support for per-row dynamic lane-dim slices (the core of the
two-pass warp's row-shift kernel) on the current TPU toolchain.

Kernel: out[r, :] = src[r, k[r] : k[r]+W] * (1-f[r]) + src[r, k[r]+1 : ...] * f[r]
"""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_shift(R, L, W, rows_per_block=8):
    def kernel(k_ref, f_ref, src_ref, out_ref):
        def body(r, _):
            k = k_ref[r]
            a = src_ref[r, pl.ds(k, W)]
            b = src_ref[r, pl.ds(k + 1, W)]
            f = f_ref[r]
            out_ref[r, :] = a * (1.0 - f) + b * f
            return 0

        jax.lax.fori_loop(0, rows_per_block, body, 0)

    grid = (R // rows_per_block,)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[pl.BlockSpec((rows_per_block, L), lambda i, k, f: (i, 0))],
            out_specs=pl.BlockSpec((rows_per_block, W), lambda i, k, f: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
    )


def main():
    R, L, W = 4 * 1048, 4096 + 128, 3144  # rows, padded width, out width (W*C)
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(R, L).astype(np.float32))
    k = jnp.asarray(rng.randint(0, L - W - 1, size=(R,)).astype(np.int32))
    f = jnp.asarray(rng.rand(R).astype(np.float32))

    shift = jax.jit(make_shift(R, L, W))
    out = shift(k, f, src)
    out.block_until_ready()
    got = np.asarray(out)
    # check a few rows
    s = np.asarray(src); kk = np.asarray(k); ff = np.asarray(f)
    for r in [0, 1, 17, R - 1]:
        want = s[r, kk[r]:kk[r] + W] * (1 - ff[r]) + s[r, kk[r] + 1:kk[r] + 1 + W] * ff[r]
        err = np.abs(got[r] - want).max()
        print(f"row {r}: maxerr {err:.2e}")

    np.asarray(shift(k, f, src))  # sync
    t0 = time.perf_counter()
    for _ in range(10):
        out = shift(k, f, src)
    np.asarray(out)
    print(f"shift kernel: {(time.perf_counter() - t0) / 10 * 1e3:.3f} ms "
          f"({R}x{W} out, {R*W*4/1e6:.0f} MB)")


if __name__ == "__main__":
    main()
