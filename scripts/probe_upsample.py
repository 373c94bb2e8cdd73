"""Probe: alternatives to the up-path's pre-padded VALID conv.

probe_epilogue (round 5) showed the serving stragglers are NOT epilogue
fusions: a [32,512,512,64] SAME conv with the full noise/bias/lrelu/clamp
epilogue runs ~60 TFLOP/s, but the SAME shape consumed as a pre-padded
[32,514,514,64] VALID conv (what conv2d_resample's up path emits: the FIR
upsample carries the conv's halo) runs 26.9 TFLOP/s — the real program's
style-b512 rate. Candidates measured here:

  two_stage        — current production path: upfirdn(up=2, halo pad) then
                     VALID 3x3 on [B,514,514,C] (256 -> 512 block).
  two_stage_alig   — upfirdn emits halo-free 512², then SAME conv, with the
                     1-px halo recovered by padding the upfirdn output
                     (exact: extra zeros enter before the FIR only outside
                     its support — see conv2d_resample for the algebra).
  merged_dilated   — ONE conv: FIR (4-tap outer) convolved into the 3x3
                     weights (6x6 effective), lhs_dilation=2 from 256²
                     directly to 512². Mathematically identical (both are
                     linear convolutions of the zero-upsampled input).
  conv256_then_fir — not equivalent (kept out).

Usage: python scripts/probe_upsample.py [--batch 32]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--res", type=int, default=256)   # input res; output 2x
    ap.add_argument("--cin", type=int, default=64)
    ap.add_argument("--cout", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pasta_tpu.ops import setup_filter
    from pasta_tpu.ops.upfirdn2d import upfirdn2d

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dt = jnp.dtype(args.dtype)
    B, R, CI, CO = args.batch, args.res, args.cin, args.cout
    RO = R * 2
    x = jnp.asarray(np.random.randn(B, R, R, CI), dt)
    w = jnp.asarray(np.random.randn(3, 3, CI, CO) * 0.05, dt)
    b = jnp.asarray(np.random.randn(CO) * 0.05, dt)
    skip = jnp.asarray(np.random.randn(B, RO, RO, CO), dt)
    f = setup_filter((1, 3, 3, 1))  # [4,4] outer filter, gain 1
    # conv flops only (the FIR pass is extra in the two-stage variants)
    flops = 2 * B * RO * RO * CI * CO * 9

    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def epi(y, s):
        y = y + b
        y = jnp.maximum(y, 0) + jnp.minimum(y, 0) * np.asarray(0.2, dt)
        y = y * np.asarray(np.sqrt(2), dt)
        return jnp.clip(y, -256, 256) + s

    # Production path (conv2d_resample up=1? no: up=2 path): padding
    # algebra for up=2, fw=4, k=3, padding=1:
    #   px0 = 1 + (4+2-1)//2 = 3, px1 = 1 + (4-2)//2 = 2  -> [B,514,514,C]
    def two_stage(x, s):
        xu = upfirdn2d(x, f, up=2, padding=[3, 2, 3, 2], gain=4)
        return epi(conv(xu, w, padding="VALID"), s)

    # Halo-free upfirdn (px0=2, px1=1 -> exactly 512²) then SAME conv.
    # NOT exact at the 1-px border (the halo is FIR data, not zeros) —
    # measured to see what the alignment alone is worth.
    def two_stage_same(x, s):
        xu = upfirdn2d(x, f, up=2, padding=[2, 1, 2, 1], gain=4)
        return epi(conv(xu, w, padding=((1, 1), (1, 1))), s)

    # Exact halo via over-padding: upfirdn emits [B,520,520,C] (extra
    # zeros land outside the original halo -> values shift, don't change),
    # VALID conv gives 518², crop [3:515] recovers the production output.
    def two_stage_aligned(x, s):
        xu = upfirdn2d(x, f, up=2, padding=[6, 5, 6, 5], gain=4)
        y = conv(xu, w, padding="VALID")
        return epi(y[:, 3:3 + RO, 3:3 + RO, :], s)

    # Merged: w_eff[i,o] = full 2-D correlation of the 4x4 FIR with the
    # 3x3 kernel -> 6x6; one lhs-dilated conv from 256² to 512².
    # padding: upsampled length 2R-1 (dilation), want RO=2R outputs with a
    # 6-tap kernel -> total pad 2R + 6 - 1 - (2R - 1) = 6; the exact split
    # matching the two-stage path is (px0, px1) = (3, 2) + conv pad... use
    # (4, 2)/(4, 2): validated against two_stage below, printed as maxdiff.
    f4 = np.outer(np.array([1, 3, 3, 1]), np.array([1, 3, 3, 1]))
    f4 = f4 / f4.sum() * 4.0
    w_np = np.asarray(w, np.float32)
    w_eff = np.zeros((6, 6, CI, CO), np.float32)
    for i in range(4):
        for j in range(4):
            w_eff[i:i + 3, j:j + 3] += f4[i, j] * w_np
    w_eff = jnp.asarray(w_eff, dt)

    def merged_dilated(x, s, pad=(4, 2)):
        y = conv(x, w_eff, padding=(pad, pad), lhs_dilation=(2, 2))
        return epi(y, s)

    # numeric check vs production (bf16 end to end; difference of two
    # mathematically-identical linear ops in bf16 is rounding-scale)
    xs, ss = x[:1], skip[:1]
    ref = two_stage(xs, ss)
    best = None
    for p0 in range(2, 6):
        for p1 in range(1, 5):
            try:
                got = merged_dilated(xs, ss, pad=(p0, p1))
            except Exception:
                continue
            if got.shape != ref.shape:
                continue
            d = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
            if best is None or d < best[0]:
                best = (d, p0, p1)
    print(json.dumps({"merged_pad_search": best and
                      {"maxdiff": best[0], "pad": [best[1], best[2]]}}),
          flush=True)
    pad = (best[1], best[2]) if best else (4, 2)

    agg = jnp.zeros((), dt)

    def timed(fn):
        @jax.jit
        def loop(x, s):
            def body(i, acc):
                return acc + fn(x + (acc * 0).astype(x.dtype), s).ravel()[0]
            return jax.lax.fori_loop(0, args.iters, body, jnp.zeros((), dt))

        float(loop(x, skip))
        t0 = time.perf_counter()
        float(loop(x, skip))
        return (time.perf_counter() - t0) / args.iters

    for name, fn in (
            ("two_stage_prod", two_stage),
            ("two_stage_same_512", two_stage_same),
            ("two_stage_aligned_520", two_stage_aligned),
            ("merged_dilated_6x6", lambda x, s: merged_dilated(x, s, pad)),
    ):
        dt_s = timed(fn)
        print(json.dumps({
            "variant": name, "ms": round(dt_s * 1e3, 3),
            "conv_tflops": round(flops / dt_s / 1e12, 1),
            "shape": f"B{B} {R}->{RO} {CI}->{CO} {args.dtype}",
        }), flush=True)


if __name__ == "__main__":
    main()
