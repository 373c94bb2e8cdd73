"""Batched affine image warp with mirror boundary — TPU-native two-pass form.

The ADA augmentation pipeline (reference training/augment.py:270-301) warps
each image by a per-sample inverse affine matrix with bilinear sampling and
reflection padding. A direct translation is a pointwise gather (4 taps per
output pixel) whose backward pass is a scatter-add; on TPU both are
scalar-unit bound and dominated an entire 512px training step (~66% of it,
measured). This module re-derives the warp as TPU-friendly primitives:

  1. `rot90-normalize`: fold a quarter-turn into the source image (cheap
     transpose/reverse) so the residual matrix has |m01| <= |m11|.
  2. Per row, the source x-coordinate is `a1*x + b1*y + c1` — separable
     (Catmull & Smith two-pass warping). Pass 1 resamples rows, pass 2
     columns; each pass factors into
       (a) a *shared-rate* 1-D resample along the axis — a dense banded
           matrix built on the fly from iota (mirror boundary folded into
           the matrix) and applied as one batched matmul on the MXU, and
       (b) a *per-line fractional shift* — a small Pallas kernel: one
           dynamic whole-block roll to a 128-aligned base plus static
           tap-FMA slices (shifts of adjacent lines differ by the bounded
           line slope). Its adjoint is the same kernel structure run in
           reverse, so the backward pass contains **no scatters**.

Numerics: integer translations / flips / rot90 are bit-exact vs the gather
reference; fractional/rotated transforms compose two linear interpolations
(hat*hat) instead of one, i.e. a slightly softer kernel — equivalent
augmentation quality, not bit parity (tests assert exactness where exact and
PSNR elsewhere). Extreme parameter tails (|line slope| beyond the static tap
window, |log2 scale| beyond the static wide-buffer span) are clamped.
Training-equivalence was measured end-to-end (docs/ada_twopass_ab.md): 200
smoke-config steps with identical seeds per implementation give max
|ada_p delta| 0.0048 and an identical final ada_p — the ADA controller
trajectory is unchanged.

The pointwise-gather path ships alongside (`bilinear_warp_gather`) as the
bit-parity reference (used by the ADA debug_percentile parity tests) and as
the fallback for non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Static sizing of the fast path (pixels).
_TAPS = 40          # per-line tap window: covers |d shift/d line| * 8 + 2
_ROWS_PER_BLOCK = 8


def _mirror_coord(c, n):
    """Reflect (no edge repeat, torch 'reflect') into [0, n-1]. Works for
    floats and ints."""
    m = n - 1
    t = jnp.mod(c, 2 * m)
    return jnp.where(t > m, 2 * m - t, t)


def bilinear_warp_gather(img, mat, out_hw=None):
    """Reference warp: out[n,y,x] = img[n, sy, sx] bilinear w/ mirror, where
    (sx, sy, 1) = mat @ (x, y, 1) in pixel coordinates. NHWC.

    This is the bit-parity oracle (matches torch grid_sample+reflect given
    the matching coordinate convention); pointwise gathers — slow on TPU.
    """
    n, h, w, _ = img.shape
    oh, ow = out_hw or (h, w)
    xs = jnp.arange(ow, dtype=jnp.float32)
    ys = jnp.arange(oh, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    ones = jnp.ones_like(gx)
    coords = jnp.stack([gx, gy, ones], 0)  # [3, oh, ow]
    src = jnp.einsum("nij,jhw->nihw", mat, coords,
                     precision=lax.Precision.HIGHEST)
    sx, sy = src[:, 0], src[:, 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    def gather(yc, xc):
        yc = _mirror_coord(yc, h).astype(jnp.int32)
        xc = _mirror_coord(xc, w).astype(jnp.int32)
        bi = jnp.arange(n)[:, None, None]
        return img[bi, yc, xc]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


# ---------------------------------------------------------------------------
# per-line fractional shift: out[r, x] = wide[r, k[r] + x] two-tap blended,
# expressed as T static taps weighted by a per-row one-hot pair.
# ---------------------------------------------------------------------------

def _shift_prep(q, out_w, v_dim):
    """From real-valued per-row positions q: per-8-row-block aligned base &
    roll remainder, and per-row [T] tap weights. All plain jnp."""
    r = q.shape[0]
    q = jnp.clip(q, 0.0, float(v_dim - out_w - _TAPS - 2))
    k = jnp.floor(q)
    f = (q - k).astype(jnp.float32)
    k = k.astype(jnp.int32)
    kb = k.reshape(r // _ROWS_PER_BLOCK, _ROWS_PER_BLOCK)
    kmin = jnp.min(kb, axis=1)
    base = (kmin // 128) * 128
    rem = kmin - base
    t = jnp.clip(k - jnp.repeat(kmin, _ROWS_PER_BLOCK), 0, _TAPS - 2)
    w = (jax.nn.one_hot(t, _TAPS, dtype=jnp.float32) * (1 - f)[:, None]
         + jax.nn.one_hot(t + 1, _TAPS, dtype=jnp.float32) * f[:, None])
    return base, rem, w


def _win(out_w):
    return ((out_w + _TAPS + 127) // 128 + 1) * 128


def _pad_lanes(x, to):
    return jnp.pad(x, ((0, 0), (0, to - x.shape[1])))


def _grid_group(n_blocks):
    """Row-blocks fused per grid step: ~3 us of grid overhead per step makes
    8-row steps launch-bound (measured ~10 ms for a 25k-row shift whose HBM
    floor is ~0.2 ms); fusing G blocks per step amortizes it. Largest
    divisor keeps the grid exact without row padding."""
    for g in (32, 24, 16, 12, 8, 6, 4, 3, 2):
        if n_blocks % g == 0:
            return g
    return 1


def _shift_fwd_pallas(base, rem, w, wide, out_w):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, v = wide.shape
    win = _win(out_w)
    vp = ((v + win + 127) // 128) * 128
    wide = _pad_lanes(wide, vp)
    rb = _ROWS_PER_BLOCK
    g = _grid_group(r // rb)

    def kernel(base_ref, rem_ref, w_ref, src_ref, out_ref):
        i = pl.program_id(0)
        for j in range(g):
            b = pl.multiple_of(base_ref[i * g + j], 128)
            rows = slice(j * rb, (j + 1) * rb)
            # roll in f32 (Mosaic: "Rotate with non-32-bit data"
            # unimplemented)
            blk = src_ref[rows, pl.ds(b, win)].astype(jnp.float32)
            rolled = pltpu.roll(blk, shift=win - rem_ref[i * g + j], axis=1)
            acc = w_ref[rows, 0][:, None] * rolled[:, :out_w]
            for t in range(1, _TAPS):
                acc = acc + w_ref[rows, t][:, None] * rolled[:, t:t + out_w]
            out_ref[rows, :] = acc.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(r // (rb * g),),
            in_specs=[pl.BlockSpec((rb * g, _TAPS), lambda i, b, rm: (i, 0)),
                      pl.BlockSpec((rb * g, vp), lambda i, b, rm: (i, 0))],
            out_specs=pl.BlockSpec((rb * g, out_w), lambda i, b, rm: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((r, out_w), wide.dtype),
        interpret=jax.default_backend() != "tpu",
    )(base, rem, w, wide)


def _shift_bwd_pallas(base, rem, w, dout, v_dim):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, out_w = dout.shape
    win = _win(out_w)
    vp = ((v_dim + win + 127) // 128) * 128
    rb = _ROWS_PER_BLOCK
    g = _grid_group(r // rb)

    def kernel(base_ref, rem_ref, w_ref, dout_ref, dw_ref):
        i = pl.program_id(0)
        dw_ref[:, :] = jnp.zeros((rb * g, vp), dw_ref.dtype)
        for j in range(g):
            b = pl.multiple_of(base_ref[i * g + j], 128)
            rows = slice(j * rb, (j + 1) * rb)
            d = dout_ref[rows, :].astype(jnp.float32)
            # accumulate taps as static rolls of the zero-padded cotangent
            # (``.at[].add``/dynamic_slice lower to unsupported Mosaic ops);
            # the pad tail (win - out_w >= _TAPS) absorbs the wrap-around.
            dpad = jnp.concatenate(
                [d, jnp.zeros((rb, win - out_w), jnp.float32)], axis=1)
            acc = w_ref[rows, 0][:, None] * dpad
            for t in range(1, _TAPS):
                acc = acc + w_ref[rows, t][:, None] * pltpu.roll(
                    dpad, shift=t, axis=1)
            rolled = pltpu.roll(acc, shift=rem_ref[i * g + j], axis=1)
            dw_ref[rows, pl.ds(b, win)] = rolled.astype(dw_ref.dtype)

    dwide = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(r // (rb * g),),
            in_specs=[pl.BlockSpec((rb * g, _TAPS), lambda i, b, rm: (i, 0)),
                      pl.BlockSpec((rb * g, out_w), lambda i, b, rm: (i, 0))],
            out_specs=pl.BlockSpec((rb * g, vp), lambda i, b, rm: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((r, vp), dout.dtype),
        interpret=jax.default_backend() != "tpu",
    )(base, rem, w, dout)
    return dwide[:, :v_dim]


def _shift_fwd_ref(base, rem, w, wide, out_w):
    """Plain-jnp equivalent (CPU tests / non-TPU backends)."""
    r, v = wide.shape
    start = jnp.repeat(base + rem, _ROWS_PER_BLOCK)
    idx = start[:, None] + jnp.arange(out_w + _TAPS)[None, :]
    win = jnp.take_along_axis(
        jnp.pad(wide, ((0, 0), (0, _win(out_w)))), idx,
        axis=1).astype(jnp.float32)
    out = jnp.zeros((r, out_w), jnp.float32)
    for t in range(_TAPS):
        out = out + w[:, t][:, None] * win[:, t:t + out_w]
    return out.astype(wide.dtype)


def _shift_bwd_ref(base, rem, w, dout, v_dim):
    r, out_w = dout.shape
    start = jnp.repeat(base + rem, _ROWS_PER_BLOCK)
    dwin = jnp.zeros((r, out_w + _TAPS), jnp.float32)
    d32 = dout.astype(jnp.float32)
    for t in range(_TAPS):
        dwin = dwin.at[:, t:t + out_w].add(w[:, t][:, None] * d32)
    idx = start[:, None] + jnp.arange(out_w + _TAPS)[None, :]
    dwide = jnp.zeros((r, v_dim + _win(out_w)), jnp.float32)
    dwide = dwide.at[jnp.arange(r)[:, None], idx].add(dwin)
    return dwide[:, :v_dim].astype(dout.dtype)


# The shift and its adjoint form a mutually-defined linear pair: each is a
# custom_vjp function whose backward calls the other. R1 regularization
# differentiates D(augment(x)) w.r.t. x and then again w.r.t. D's params
# (reference loss_fullbody.py:248-274), so the adjoint itself sits inside a
# differentiated graph — without its own custom_vjp, JAX would try to
# linearize the Pallas call (no JVP rule). This pairing supports arbitrary
# gradient towers; all kernels stay scatter-free.

def _int_zero(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _spmd_wrap(fn, mesh):
    """Run a per-row kernel under shard_map over the mesh's first axis.

    pallas_call does not partition under plain jit SPMD (this jax requires
    Manual mesh axes); the shift rows are fully independent, so mapping the
    kernel over row shards is exact. Applies to the jnp backend too (keeps
    one code path)."""
    if mesh is None or np.prod(list(mesh.shape.values())) <= 1:
        return fn
    from jax import shard_map
    from jax.sharding import PartitionSpec

    p = PartitionSpec(mesh.axis_names[0])
    return shard_map(fn, mesh=mesh, in_specs=(p, p, p, p), out_specs=p,
                     check_vma=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _shift_apply(base, rem, w, wide, out_w, use_pallas, mesh):
    if use_pallas:
        fn = lambda b, r, ww, wd: _shift_fwd_pallas(b, r, ww, wd, out_w)
    else:
        fn = lambda b, r, ww, wd: _shift_fwd_ref(b, r, ww, wd, out_w)
    return _spmd_wrap(fn, mesh)(base, rem, w, wide)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _shift_adjoint(base, rem, w, dout, v_dim, use_pallas, mesh):
    if use_pallas:
        fn = lambda b, r, ww, d: _shift_bwd_pallas(b, r, ww, d, v_dim)
    else:
        fn = lambda b, r, ww, d: _shift_bwd_ref(b, r, ww, d, v_dim)
    return _spmd_wrap(fn, mesh)(base, rem, w, dout)


def _shift_apply_fwd(base, rem, w, wide, out_w, use_pallas, mesh):
    out = _shift_apply(base, rem, w, wide, out_w, use_pallas, mesh)
    return out, (base, rem, w, wide.shape[1])


def _shift_apply_bwd(out_w, use_pallas, mesh, res, dout):
    base, rem, w, v_dim = res
    dwide = _shift_adjoint(base, rem, w, dout, v_dim, use_pallas, mesh)
    return _int_zero(base), _int_zero(rem), jnp.zeros_like(w), dwide


def _shift_adjoint_fwd(base, rem, w, dout, v_dim, use_pallas, mesh):
    out = _shift_adjoint(base, rem, w, dout, v_dim, use_pallas, mesh)
    return out, (base, rem, w, dout.shape[1])


def _shift_adjoint_bwd(v_dim, use_pallas, mesh, res, c):
    base, rem, w, out_w = res
    ddout = _shift_apply(base, rem, w, c, out_w, use_pallas, mesh)
    return _int_zero(base), _int_zero(rem), jnp.zeros_like(w), ddout


_shift_apply.defvjp(_shift_apply_fwd, _shift_apply_bwd)
_shift_adjoint.defvjp(_shift_adjoint_fwd, _shift_adjoint_bwd)


def _row_shift(wide, q, out_w, use_pallas, mesh=None):
    """out[r, x] = (1-f) wide[r, k+x] + f wide[r, k+x+1], (k, f) = divmod q.

    wide: [R, V] (R multiple of 8), q: [R] float positions (clamped to the
    valid window). Linear in `wide`; q is treated as non-differentiable
    (its path comes from augmentation RNG). Pass the SPMD mesh when called
    inside a multi-device jit (the kernels then run per-shard)."""
    base, rem, w = _shift_prep(jax.lax.stop_gradient(q), out_w,
                               wide.shape[1])
    return _shift_apply(base, rem, w, wide, out_w, use_pallas, mesh)


# ---------------------------------------------------------------------------
# shared-rate mirror resample as a batched matmul
# ---------------------------------------------------------------------------

def _resample_matrix(alpha, w0, src_n, v_dim, dtype, precision_dtype=None):
    """B[n, j, v]: bilinear taps of source column j at position
    alpha[n]*v + w0[n], mirror boundary folded in. Built from iota."""
    v = jnp.arange(v_dim, dtype=jnp.float32)[None, :]
    pos = alpha[:, None] * v + w0[:, None]          # [n, V]
    fl = jnp.floor(pos)
    fr = pos - fl
    j0 = _mirror_coord(fl, src_n)
    j1 = _mirror_coord(fl + 1, src_n)
    j = jnp.arange(src_n, dtype=jnp.float32)[None, :, None]   # [1, J, 1]
    b = ((j0[:, None, :] == j) * (1 - fr)[:, None, :]
         + (j1[:, None, :] == j) * fr[:, None, :])
    return b.astype(dtype)


def _safe(x, eps=1e-4):
    return jnp.where(jnp.abs(x) < eps, jnp.where(x < 0, -eps, eps), x)


def _warp_core_planar(xp, mat, use_pallas, mesh=None,
                      precision=lax.Precision.HIGHEST):
    """Two-pass warp on planar [n, c, H, W] input (square canvas). mat is
    the pixel-space [N, 3, 3] output->source map, (sx, sy, 1) = mat@(x,y,1).
    Returns planar [n, c, H, W]. All big intermediates keep spatial minor
    dims (no N- or C-minor layouts — those get catastrophic lane padding)."""
    n, c, h, w = xp.shape
    assert h == w, "two-pass warp assumes a square canvas"

    m00, m01, m02 = mat[:, 0, 0], mat[:, 0, 1], mat[:, 0, 2]
    m10, m11, m12 = mat[:, 1, 0], mat[:, 1, 1], mat[:, 1, 2]

    # rot90-normalize: if |m01| > |m11|, read through a quarter-turned source
    # so pass-1's line slope |m01/m11| <= 1. img_q[y, x] = img[x, n-1-y];
    # equivalently source coords (sx, sy) -> (sy, n-1-sx).
    swap = jnp.abs(m01) > jnp.abs(m11)
    img_q = jnp.flip(jnp.swapaxes(xp, 2, 3), axis=2)   # img_q[y,x]=img[x,H-1-y]
    xp = jnp.where(swap[:, None, None, None], img_q, xp)
    nm1 = float(h - 1)
    a00 = jnp.where(swap, m10, m00)
    a01 = jnp.where(swap, m11, m01)
    a02 = jnp.where(swap, m12, m02)
    a10 = jnp.where(swap, -m00, m10)
    a11 = jnp.where(swap, -m01, m11)
    a12 = jnp.where(swap, nm1 - m02, m12)

    det = a00 * a11 - a01 * a10
    a11s = _safe(a11)
    alpha1 = det / a11s                      # pass-1 resample rate
    beta1 = a01 / a11s                       # pass-1 per-row slope (|.|<=1)
    c1 = a02 - a01 * a12 / a11s

    v_dim = ((w + 2 * h + _TAPS + 127) // 128) * 128
    dtype = xp.dtype

    def one_pass(xq, alpha, beta, off, out_w):
        # xq: [n, c, L, J]  (resample along J, lines L)
        nn, cc, ll, jj = xq.shape
        alpha_s = _safe(alpha)
        lines = jnp.arange(ll, dtype=jnp.float32)
        # choose w0 so positions start slightly before the smallest need
        qraw = (beta[:, None] * lines[None, :] + off[:, None]) / alpha_s[:, None]
        qmin = jnp.min(qraw, axis=1)
        # alpha_s (not alpha) everywhere below: the window positions must
        # invert the same (clamped) division as qraw, and B must use the
        # same rate — alpha_s == alpha except in the degenerate guard.
        w0 = (qmin - 2.0) * alpha_s          # source-pos offset of v=0
        q = qraw - (qmin - 2.0)[:, None]     # per-line window start, >=2
        b = _resample_matrix(alpha_s, w0, jj, v_dim, dtype)
        wide = jnp.einsum("nclj,njv->nclv", xq, b, precision=precision)
        qrows = jnp.broadcast_to(q[:, None, :], (nn, cc, ll)).reshape(-1)
        r = qrows.shape[0]
        pad_r = (-r) % _ROWS_PER_BLOCK
        widef = wide.reshape(r, v_dim)
        if pad_r:
            # Edge-pad qrows (zero-padding would drag the shared 8-row
            # block's kmin to 0 and clamp the real rows' tap offsets,
            # corrupting the last block for non-8-aligned row counts).
            widef = jnp.pad(widef, ((0, pad_r), (0, 0)))
            qrows = jnp.pad(qrows, (0, pad_r), mode="edge")
        out = _row_shift(widef, qrows, out_w, use_pallas, mesh)
        if pad_r:
            out = out[:r]
        return out.reshape(nn, cc, ll, out_w)

    # pass 1: rows are source rows y_s; Sx(y_s, x_t) = alpha1 x_t + beta1 y_s + c1
    tmp = one_pass(xp, alpha1, beta1, c1, w)            # [n, c, y_s, x_t]
    # pass 2: lines are target columns x_t; Sy(x_t, y_t) = a11 y_t + a10 x_t + a12
    tmp_t = jnp.swapaxes(tmp, 2, 3)                     # [n, c, x_t, y_s]
    out_t = one_pass(tmp_t, a11, a10, a12, h)           # [n, c, x_t, y_t]
    return jnp.swapaxes(out_t, 2, 3)                    # [n, c, y_t, x_t]


def affine_warp_twopass(img, mat, use_pallas=None, mesh=None,
                        precision=lax.Precision.HIGHEST):
    """Two-pass TPU warp, same interface/convention as bilinear_warp_gather
    (square canvases, out size == in size). mat: [N, 3, 3] pixel-space,
    (sx, sy, 1) = mat @ (x, y, 1). NHWC in/out; prefer the planar pipeline
    (`geom_resample_twopass`) inside larger chains to avoid NHWC<->planar
    transposes of big canvases."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    xp = jnp.transpose(img, (0, 3, 1, 2))
    out = _warp_core_planar(xp, mat, use_pallas, mesh, precision)
    return jnp.transpose(out, (0, 2, 3, 1))


def upfirdn1d_matrix(f, n_in, up=1, down=1, pad0=0, pad1=0,
                     flip_filter=False, gain=1.0):
    """[n_out, n_in] matrix exactly matching one separable axis pass of
    ops.upfirdn2d.upfirdn2d (zero-stuff `up`, pad, correlate, stride `down`).

    Built in numpy at trace time (static filter/shape), so resampling
    becomes a single MXU matmul on planar tensors instead of an NHWC
    depthwise conv — avoiding the pathological padded layouts XLA picks
    for 3-channel NHWC canvases.
    """
    f = np.asarray(f, np.float64) * float(gain)
    if not flip_filter:
        f = f[::-1]
    fl = len(f)
    # The zero-stuffed signal below has length n_in*up (reference semantics:
    # `up-1` trailing zeros per sample), so no extra pad1 adjustment.
    n_out = (n_in * up + pad0 + pad1 - fl) // down + 1
    m = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        for t in range(fl):
            k = i * down + t - pad0
            if 0 <= k < n_in * up and k % up == 0:
                m[i, k // up] += f[t]
    return m


def _upsample_matrix(f, n_in, up=2):
    """Matches ops.upfirdn2d.upsample2d's per-axis pass (incl. gain)."""
    fl = len(np.asarray(f))
    return upfirdn1d_matrix(
        f, n_in, up=up, pad0=(fl + up - 1) // 2, pad1=(fl - up) // 2,
        flip_filter=False, gain=up)


def _downsample_matrix(f, n_in, down=2, extra_pad=0):
    """Matches ops.upfirdn2d.downsample2d(padding=extra_pad,
    flip_filter=True)'s per-axis pass."""
    fl = len(np.asarray(f))
    return upfirdn1d_matrix(
        f, n_in, down=down, pad0=extra_pad + (fl - down + 1) // 2,
        pad1=extra_pad + (fl - down) // 2, flip_filter=True, gain=1)


def geom_resample_twopass(images, mat_pix, f_taps, margin, use_pallas=None,
                          mesh=None):
    """The ADA geometric stage as one planar pipeline: reflect-pad by
    `margin`, 2x FIR upsample, affine warp (`mat_pix` in up-canvas pixel
    coords), 2x FIR downsample with the margin cropped off. NHWC in/out.

    Replaces pad + upsample2d + warp + downsample2d (augment.py geometry,
    reference augment.py:270-305): identical math, but every 2x-canvas
    intermediate is planar [n, c, Y, X] with spatial minor dims, and the
    up/down FIRs are matmuls — no NHWC 3-channel canvas is ever
    materialized (XLA pads those to 128 lanes, 16-40x memory blowup).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n, h, w, c = images.shape
    assert h == w
    xp = jnp.transpose(images, (0, 3, 1, 2))
    xp = jnp.pad(xp, ((0, 0), (0, 0), (margin, margin), (margin, margin)),
                 mode="reflect")
    npad = h + 2 * margin
    u = jnp.asarray(_upsample_matrix(f_taps, npad), xp.dtype)
    xp = jnp.einsum("ij,ncyj->ncyi", u, xp)      # upsample x
    xp = jnp.einsum("ij,ncjx->ncix", u, xp)      # upsample y
    xp = _warp_core_planar(xp, mat_pix, use_pallas, mesh)
    d = jnp.asarray(
        _downsample_matrix(f_taps, 2 * npad, extra_pad=-2 * margin),
        xp.dtype)
    xp = jnp.einsum("ij,ncyj->ncyi", d, xp)      # downsample x + crop
    xp = jnp.einsum("ij,ncjx->ncix", d, xp)      # downsample y + crop
    return jnp.transpose(xp, (0, 2, 3, 1))
