"""Probe layouts for the spade-encoder stem conv (7x7, Cin=3 -> 64).

The serving profile shows the stem's conv fusion at ~5 ms per batch-16
call — byte-bound on a 42x lane-padded input copy
(bf16[16,512,512,3]{0,3,2,1:T(4,128)(2,1)}: C=3 on lanes pads to 128).
This measures semantics-preserving alternatives on the real chip:

  plain      — lax.conv NHWC, Cin=3 (the shipping form)
  pad8       — input zero-padded to Cin=8, weight zero-padded to match
  pad64      — same, Cin=64 (lanes still pad to 128, but the emitter may
               pick a different path / skip the input copy)
  nchw       — feature dim moved to dim 1 (spatial dims minor)
  f32_in     — f32 input, bf16 weights (T(8,128) vs (2,1)-packed tiling)

Usage: python scripts/probe_stem_conv.py [--batch 16] [--iters 30]
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, *args, iters=30):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    n, s = args.batch, args.size
    x = jnp.asarray(rng.randn(n, s, s, 3), jnp.bfloat16)
    w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.05, jnp.bfloat16)

    def conv(x, w, dn=("NHWC", "HWIO", "NHWC")):
        return lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=dn)

    @jax.jit
    def plain(x, w):
        return conv(x, w)

    @jax.jit
    def pad8(x, w):
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, 5), (0, 0)))
        return conv(xp, wp)

    @jax.jit
    def pad64(x, w):
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 61)))
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, 61), (0, 0)))
        return conv(xp, wp)

    @jax.jit
    def nchw(x, w):
        xc = jnp.transpose(x, (0, 3, 1, 2))
        out = lax.conv_general_dilated(
            xc, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW"))
        return jnp.transpose(out, (0, 2, 3, 1))

    @jax.jit
    def f32_in(x, w):
        return conv(x.astype(jnp.float32), w)

    flops = 2 * n * s * s * 49 * 3 * 64
    ref = None
    for name, fn in [("plain", plain), ("pad8", pad8), ("pad64", pad64),
                     ("nchw", nchw), ("f32_in", f32_in)]:
        try:
            out = np.asarray(fn(x, w), np.float32)
            if ref is None:
                ref = out
            err = float(np.max(np.abs(out - ref)))
            dt = timed(fn, x, w, iters=args.iters)
            print({"variant": name, "ms": round(dt * 1e3, 3),
                   "tflops": round(flops / dt / 1e12, 1),
                   "max_abs_vs_plain": err})
        except Exception as e:  # noqa: BLE001 — probe survives OOM variants
            print({"variant": name, "error": f"{type(e).__name__}: {e}"[:160]})


if __name__ == "__main__":
    main()
