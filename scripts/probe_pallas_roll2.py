"""Probe v2: 2-D window + roll along lanes (axis=1), static and dynamic."""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L, W = 32, 4224, 3144
RB = 8
WIN = W + 256


def make(mode):
    def kernel(k_ref, f_ref, src_ref, out_ref):
        def body(r, _):
            k = k_ref[r]
            k128 = pl.multiple_of((k // 128) * 128, 128)
            rem = k - k128
            win = src_ref[pl.ds(r, 1), pl.ds(k128, WIN)]   # [1, WIN]
            if mode == "dyn":
                rolled = pltpu.roll(win, shift=WIN - rem, axis=1)
            elif mode == "static":
                rolled = pltpu.roll(win, shift=WIN - 7, axis=1)
            else:  # barrel: 7 static rolls selected by rem bits
                rolled = win
                for i in range(7):
                    s = 1 << i
                    cand = pltpu.roll(rolled, shift=WIN - s, axis=1)
                    bit = ((rem // s) % 2) == 1
                    rolled = jnp.where(bit, cand, rolled)
            a = rolled[:, :W]
            b = rolled[:, 1:W + 1]
            f = f_ref[r]
            out_ref[pl.ds(r, 1), :] = a * (1.0 - f) + b * f
            return 0

        jax.lax.fori_loop(0, RB, body, 0)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(R // RB,),
            in_specs=[pl.BlockSpec((RB, L), lambda i, k, f: (i, 0))],
            out_specs=pl.BlockSpec((RB, W), lambda i, k, f: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
    )


def main():
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(R, L).astype(np.float32))
    k = jnp.asarray(rng.randint(0, L - W - 257, size=(R,)).astype(np.int32))
    f = jnp.asarray(rng.rand(R).astype(np.float32))

    for mode in ["static", "dyn", "barrel"]:
        try:
            fn = jax.jit(make(mode))
            got = np.asarray(fn(k, f, src))
            s, kk, ff = np.asarray(src), np.asarray(k), np.asarray(f)
            errs = []
            for r in range(R):
                kr = kk[r] if mode != "static" else (kk[r] // 128) * 128 + 7
                want = s[r, kr:kr + W] * (1 - ff[r]) + \
                    s[r, kr + 1:kr + 1 + W] * ff[r]
                errs.append(np.abs(got[r] - want).max())
            print(f"{mode}: maxerr {max(errs):.2e}", flush=True)
        except Exception as e:
            print(f"{mode}: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
