"""Pallas 3x3 convolution for the serving hot path (small-channel 512²).

Why this exists: XLA's TPU conv emitter picks `EmitAllBatchInSublanes`
blocking for the [N,512,512,64]x[3,3,{64,128},64] convolutions inside the
big serving program and runs them at 20-28 TFLOP/s, while the identical
shape in a standalone program reaches ~60 (docs/perf_round5.md round-5
probes; the emitter choice is not steerable from JAX). This kernel computes
the same conv as MXU matmuls per row-block — VALID 3x3 over an input that
already carries its 1-px halo — bypassing the emitter entirely, so its
rate does not depend on surrounding program context.

Design notes (Mosaic constraints discovered on hardware, round 5):
  * HBM->VMEM DMA slices require a 128-aligned lane (minor) dim — a
    64-channel NHWC tensor cannot be DMA-sliced directly. For C_in=64 the
    input is viewed as [N, H+2, W'/2, 128] (two adjacent W columns packed
    into lanes; pure bitcast in row-major) and the weights become 9
    block-diagonal [128,128] taps computing both columns at once — the
    MXU runs at full 128x128 occupancy, 2x the useful rate of a 64-out
    dot. C_in=128 inputs are already lane-aligned and go direct.
  * In-VMEM window slices must have tile-aligned extents AND offsets on
    the sublane dim, so the three kernel-column taps use pltpu.roll
    (cheap VPU copies) instead of offset-1/2 slices.

Scope (serving forward only — no custom VJP; training keeps the XLA conv):
stride 1, groups 1, bf16 in / weights, f32 accumulation, C_out <= 128.

Reference behavioral target: torch F.conv2d inside the reference's
SynthesisLayer / ResBlock / Spade blocks (training/networks.py) — parity
is pinned against lax.conv_general_dilated in tests/test_pallas_conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_packed(x_hbm, w_ref, out_ref, xslab, sems, *, block_rows,
                   out_cols, c_out2, n_blocks_h, slab_cols):
    """C_in=64 path. x_hbm: [N, H+2, W'/2, 128] (two W columns in lanes);
    w_ref: [9*128, c_out2] block-diagonal taps; out: [N, H, W/2, c_out2]."""
    n = pl.program_id(0)
    r = pl.program_id(1)
    step = n * n_blocks_h + r

    def slab_dma(slot, nn, rr):
        return pltpu.make_async_copy(
            x_hbm.at[nn, pl.ds(rr * block_rows, block_rows + 2)],
            xslab.at[slot], sems.at[slot])

    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        slab_dma(slot, n, r).start()

    @pl.when(step + 1 < pl.num_programs(0) * n_blocks_h)
    def _():
        nn = jax.lax.div(step + 1, n_blocks_h)
        rr = jax.lax.rem(step + 1, n_blocks_h)
        slab_dma(nxt, nn, rr).start()

    slab_dma(slot, n, r).wait()

    slab = xslab[slot]                                  # [RB+2, W'/2, 128]
    # kc taps in packed coords: kc=0 -> packed col j = cols (2j, 2j+1);
    # kc=2 -> packed col j+1; kc=1 -> (2j+1, 2j+2): high lanes of col j +
    # low lanes of col j+1, built from two lane-rolls + a lane select.
    shift1 = pltpu.roll(slab, shift=slab.shape[1] - 1, axis=1)  # col j+1
    lo = pltpu.roll(slab, shift=64, axis=2)             # lanes0:64 <- 2j+1
    hi = pltpu.roll(shift1, shift=64, axis=2)           # lanes64: <- 2j+2
    lane = jax.lax.broadcasted_iota(jnp.int32, slab.shape, 2)
    mid = jnp.where(lane < 64, lo, hi)
    srcs = (slab, mid, shift1)

    acc = jnp.zeros((block_rows * out_cols, c_out2), jnp.float32)
    for kr in range(3):
        for kc in range(3):
            window = srcs[kc][kr:kr + block_rows, 0:out_cols, :].reshape(
                block_rows * out_cols, 128)
            wk = w_ref[(kr * 3 + kc) * 128:(kr * 3 + kc + 1) * 128, :]
            acc = acc + jnp.dot(window, wk,
                                preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(block_rows, out_cols, c_out2).astype(
        out_ref.dtype)


def _kernel_direct(x_hbm, w_ref, out_ref, xslab, sems, *, block_rows,
                   w_out, c_in, c_out, n_blocks_h):
    """C_in=128 path: direct [RB*W, 128] x [128, C_out] dots; kc taps via
    sublane rolls (offset-aligned windows)."""
    n = pl.program_id(0)
    r = pl.program_id(1)
    step = n * n_blocks_h + r

    def slab_dma(slot, nn, rr):
        return pltpu.make_async_copy(
            x_hbm.at[nn, pl.ds(rr * block_rows, block_rows + 2)],
            xslab.at[slot], sems.at[slot])

    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        slab_dma(slot, n, r).start()

    @pl.when(step + 1 < pl.num_programs(0) * n_blocks_h)
    def _():
        nn = jax.lax.div(step + 1, n_blocks_h)
        rr = jax.lax.rem(step + 1, n_blocks_h)
        slab_dma(nxt, nn, rr).start()

    slab_dma(slot, n, r).wait()

    slab = xslab[slot]                                   # [RB+2, W', C]
    nsub = slab.shape[1]
    srcs = (slab,
            pltpu.roll(slab, shift=nsub - 1, axis=1),
            pltpu.roll(slab, shift=nsub - 2, axis=1))

    acc = jnp.zeros((block_rows * w_out, c_out), jnp.float32)
    for kr in range(3):
        for kc in range(3):
            window = srcs[kc][kr:kr + block_rows, 0:w_out, :].reshape(
                block_rows * w_out, c_in)
            wk = w_ref[(kr * 3 + kc) * c_in:(kr * 3 + kc + 1) * c_in, :]
            acc = acc + jnp.dot(window, wk,
                                preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(block_rows, w_out, c_out).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "out_w"))
def conv3x3_valid(x_padded, w, block_rows=16, out_w=None):
    """VALID 3x3 conv: [N, H+2, W', C_in] x [3, 3, C_in, C_out] (HWIO)
    -> [N, H, out_w, C_out] (out_w defaults to W'-2; columns past
    out_w + 2 are alignment padding and never read). bf16-friendly,
    f32 accumulation."""
    n, hp, wp, ci = x_padded.shape
    h = hp - 2
    w_out = wp - 2 if out_w is None else out_w
    co = w.shape[3]
    assert w.shape[:3] == (3, 3, ci), w.shape
    assert h % block_rows == 0, (h, block_rows)
    assert ci in (64, 128) and co <= 128, (ci, co)
    n_blocks_h = h // block_rows
    dt = x_padded.dtype
    w = w.astype(dt)

    flops = 2 * n * h * w_out * ci * co * 9
    bytes_accessed = (n * hp * wp * ci + n * h * w_out * co) * 2 + w.size * 2

    if ci == 64:
        assert w_out % 2 == 0
        out_cols = w_out // 2
        # packed view needs W' even and >= 2*out_cols + 2, and the packed
        # sublane dim (W'/2) 8-aligned -> W' a multiple of 16.
        need = max(2 * out_cols + 2, wp)
        need += (16 - need % 16) % 16
        if need != wp:
            x_padded = jnp.pad(
                x_padded, ((0, 0), (0, 0), (0, need - wp), (0, 0)))
            wp = need
        slab_cols = wp // 2
        xp = x_padded.reshape(n, hp, slab_cols, 128)
        # block-diagonal taps: [128 (2 cols x C), c_out2 (2 cols x C_out)]
        w9 = w.transpose(0, 1, 2, 3).reshape(9, 64, co)
        z = jnp.zeros((9, 64, co), dt)
        wp9 = jnp.concatenate([
            jnp.concatenate([w9, z], axis=2),
            jnp.concatenate([z, w9], axis=2)], axis=1)   # [9, 128, 2*co]
        c_out2 = 2 * co
        kern = functools.partial(
            _kernel_packed, block_rows=block_rows, out_cols=out_cols,
            c_out2=c_out2, n_blocks_h=n_blocks_h, slab_cols=slab_cols)
        y = pl.pallas_call(
            kern,
            grid=(n, n_blocks_h),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((9 * 128, c_out2), lambda a, b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_rows, out_cols, c_out2),
                lambda a, b: (a, b, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (n, h, out_cols, c_out2), dt),
            scratch_shapes=[
                pltpu.VMEM((2, block_rows + 2, slab_cols, 128), dt),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * flops, bytes_accessed=bytes_accessed,
                transcendentals=0),
        )(xp, wp9.reshape(9 * 128, c_out2))
        return y.reshape(n, h, w_out, co)

    # ci == 128: direct path (lane dim already DMA-aligned)
    if wp % 8:
        x_padded = jnp.pad(
            x_padded, ((0, 0), (0, 0), (0, 8 - wp % 8), (0, 0)))
        wp += 8 - wp % 8
    kern = functools.partial(
        _kernel_direct, block_rows=block_rows, w_out=w_out, c_in=ci,
        c_out=co, n_blocks_h=n_blocks_h)
    return pl.pallas_call(
        kern,
        grid=(n, n_blocks_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9 * ci, co), lambda a, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_rows, w_out, co),
            lambda a, b: (a, b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w_out, co), dt),
        scratch_shapes=[
            pltpu.VMEM((2, block_rows + 2, wp, ci), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
    )(x_padded, w.reshape(9 * ci, co))


def conv3x3_same(x, w, block_rows=16):
    """SAME 3x3 via an explicit zero pad + the VALID kernel."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return conv3x3_valid(xp, w, block_rows=block_rows, out_w=x.shape[2])
