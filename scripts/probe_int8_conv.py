"""Probe: does int8 conv hit the v5e MXU at ~2x the bf16 rate?

Times s8xs8->s32 vs bf16 vs f32 convs at the serving hot shapes, plus the
full dynamic-quant round trip (quantize x per-sample, w per-out-channel,
conv, rescale) that ops/quant.py uses.
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


def conv(x, w, ptype=None):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=ptype)


def main():
    shapes = [((8, 512, 512, 64), (3, 3, 64, 64)),
              ((8, 256, 256, 128), (3, 3, 128, 128)),
              ((8, 128, 128, 256), (3, 3, 256, 256))]
    key = jax.random.PRNGKey(0)
    for xs, ws in shapes:
        x = jax.random.normal(key, xs, jnp.float32)
        w = jax.random.normal(key, ws, jnp.float32) * 0.05
        xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
        xi = jnp.clip(jnp.round(x * 20), -127, 127).astype(jnp.int8)
        wi = jnp.clip(jnp.round(w * 500), -127, 127).astype(jnp.int8)

        def f32_body(acc, x, w):
            return jnp.mean(conv(x + acc.astype(x.dtype), w))

        def bf16_body(acc, x, w):
            return jnp.mean(conv(x + acc.astype(x.dtype), w)
                            .astype(jnp.float32))

        def i8_body(acc, x, w):
            xx = (x + acc.astype(jnp.int32).astype(jnp.int8))
            return jnp.mean(conv(xx, w, jnp.int32).astype(jnp.float32))

        def dynq_body(acc, x, w):
            x = x + acc.astype(x.dtype)
            s_x = jnp.maximum(
                jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True), 1e-12
            ) / 127.0
            xq = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
            s_w = jnp.maximum(
                jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True), 1e-12
            ) / 127.0
            wq = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
            y = conv(xq, wq, jnp.int32).astype(jnp.float32) * s_x * s_w
            return jnp.mean(y)

        flops = (2 * xs[0] * xs[1] * xs[2] * ws[0] * ws[1] * ws[2] * ws[3])
        rec = {"x": xs, "w": ws}
        for name, body, a, b in (("f32", f32_body, x, w),
                                 ("bf16", bf16_body, xb, wb),
                                 ("int8", i8_body, xi, wi),
                                 ("dynq_bf16", dynq_body, xb, wb)):
            try:
                t = timed(body, a, b)
                rec[name + "_ms"] = round(t * 1e3, 3)
                rec[name + "_tflops"] = round(flops / t / 1e12, 1)
            except Exception as e:  # noqa: BLE001
                rec[name + "_error"] = f"{type(e).__name__}: {e}"[:200]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
