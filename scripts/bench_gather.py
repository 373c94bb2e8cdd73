"""Microbenchmark bilinear-warp gather formulations on the TPU.

Compares, at the ADA augment shape [4, 1048, 1048, 3]:
  a) pointwise: 4 separate advanced-indexing gathers (current augment impl)
  b) patch: one lax.gather of (1,2,2,C) slices per output pixel
  c) rowcol: gather (1,2,W,C) row-pairs by y, then x via second gather
fwd and fwd+bwd (the backward is the scatter that dominates training).
"""

import argparse
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=5):
    import jax
    out = fn(*args)
    jax.tree.map(lambda a: a.copy_to_host_async(), out)
    np.asarray(jax.tree.leaves(out)[0])  # real sync over the axon tunnel
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--hw", type=int, default=1048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    n, h, w, c = args.n, args.hw, args.hw, 3
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    # random affine-ish coords, in-range after mirror
    sx = jnp.asarray((rng.rand(n, h, w) * (w - 2)).astype(np.float32))
    sy = jnp.asarray((rng.rand(n, h, w) * (h - 2)).astype(np.float32))

    def pointwise(img, sx, sy):
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = (sx - x0)[..., None]
        fy = (sy - y0)[..., None]
        bi = jnp.arange(n)[:, None, None]

        def g(yc, xc):
            return img[bi, jnp.clip(yc.astype(jnp.int32), 0, h - 1),
                       jnp.clip(xc.astype(jnp.int32), 0, w - 1)]

        v00 = g(y0, x0)
        v01 = g(y0, x0 + 1)
        v10 = g(y0 + 1, x0)
        v11 = g(y0 + 1, x0 + 1)
        top = v00 * (1 - fx) + v01 * fx
        bot = v10 * (1 - fx) + v11 * fx
        return top * (1 - fy) + bot * fy

    def patch(img, sx, sy):
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = (sx - x0)[..., None]
        fy = (sy - y0)[..., None]
        imgp = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
        yi = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        # one gather of (1,2,2,C) slices per output pixel
        starts = jnp.stack(
            [jnp.broadcast_to(jnp.arange(n)[:, None, None], (n, h, w)),
             yi, xi], axis=-1).reshape(-1, 3)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2))
        out = lax.gather(imgp, starts, dn, slice_sizes=(1, 2, 2, c),
                         mode=lax.GatherScatterMode.CLIP)
        out = out.reshape(n, h, w, 2, 2, c)
        top = out[..., 0, 0, :] * (1 - fx) + out[..., 0, 1, :] * fx
        bot = out[..., 1, 0, :] * (1 - fx) + out[..., 1, 1, :] * fx
        return top * (1 - fy) + bot * fy

    err = float(jax.jit(lambda a, b, cc: jnp.max(jnp.abs(
        pointwise(a, b, cc) - patch(a, b, cc))))(img, sx, sy))
    print(f"patch vs pointwise maxerr {err:.2e}", flush=True)

    fns = {"pointwise": pointwise, "patch": patch}
    for name, fn in fns.items():
        fwd = jax.jit(fn)
        t = timeit(fwd, img, sx, sy)
        loss = jax.jit(jax.grad(lambda im, a, b: jnp.sum(fn(im, a, b) ** 2)))
        tb = timeit(loss, img, sx, sy)
        print(f"{name:10s} fwd {t*1e3:8.2f} ms   fwd+bwd {tb*1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
