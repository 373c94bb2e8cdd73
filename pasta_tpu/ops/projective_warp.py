"""Projective (homography) image warp as one-hot MXU matmuls — no gathers.

The serving compositor's per-part cut/paste warps are cv2.warpPerspective
semantics (reference training/dataset.py:1069-1085): bilinear sampling at
``(sx, sy) = H @ (x, y, 1)`` (projected), zero outside the source. A direct
translation is a pointwise gather; on this TPU toolchain XLA's row gathers
run at ~0.5-4 GB/s and dominated the measured serving program (73% of
device time at batch 8). The affine two-pass machinery (ops/affine_warp.py)
does not apply directly: a homography's per-line resample maps are rational
(Moebius), not shared-rate affine.

This module uses the exact Catmull-Smith two-pass decomposition of the
projective map, with each pass executed as a *dense one-hot-pair matmul*:

  pass 1 (per source row l, resample along x over output columns v):
      pos1(l, v) = ((A0 + A1 l) v + (B0 + B1 l)) / (C v + D)
      with A0 = a00 a11 - a01 a10,  A1 = a01 p - a00 q,
           B0 = a02 a11 - a01 a12,  B1 = a01 r - a02 q,
           C  = p a11 - q a10,      D  = r a11 - q a12
      (derived by eliminating y_t from sy(x,y) = l; note the denominator is
      independent of l — a property of homographies that keeps the weight
      construction cheap).
  pass 2 (per output column v, resample along source rows j):
      pos2(v, y) = (a10 v + a11 y + a12) / (p v + q y + r)

Each pass builds bilinear one-hot-pair weights from iota comparisons and
contracts them with the image on the MXU:

      out[c, v] = sum_j src[c, j] * W[j, v]        (per sample, per line)

oriented so the small channel count lands on the M (sublane, granularity 8)
axis and the spatial extents on K/N (lane, granularity 128) — the matmul
runs at real MXU rates instead of gather rates. Weights are built on the
fly per line; nothing is ever scattered and the whole thing is plain jnp,
so it differentiates and shards like any other XLA program.

Numerics: identical sampling positions to the gather (same divisions, f32),
but two chained 1-D linear interpolations instead of one 2-D bilinear —
exact where the source row position is integral, a slightly softened
(hat*hat) kernel elsewhere; tests assert exactness on axis-aligned maps and
PSNR vs the gather oracle on random quads. Like the affine two-pass, a
rotation-heavy map would squeeze pass 1 into few effective samples
(Catmull-Smith "bottleneck"), so sources are quarter-turn-normalized per
sample first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _safe(x, eps=1e-9):
    return jnp.where(jnp.abs(x) < eps, jnp.where(x < 0, -eps, eps), x)


def _finite_or_far(pos, far=-1e6):
    """Sanitize positions: NaN/inf (horizon-line denominators) become a far
    out-of-range coordinate whose one-hot row is all zero (zero border)."""
    return jnp.where(jnp.isfinite(pos), jnp.clip(pos, -1e6, 1e6), far)


def _onehot_pair(pos, n_src, dtype):
    """Bilinear tap weights as a dense matrix over the source axis.

    pos: [N, L, V] sampling positions. Returns [N, L, n_src, V] (source
    axis inserted at -2, matching the einsum layouts below) with (1-f) at
    floor(pos) and f at floor(pos)+1; positions whose taps fall outside
    [0, n_src) lose those taps (zero border, cv2 BORDER_CONSTANT).
    """
    pos = _finite_or_far(pos)[:, :, None, :]         # [N, L, 1, V]
    j = jnp.arange(n_src, dtype=jnp.float32)[None, None, :, None]
    # hat(pos - j) = the bilinear pair in one expression: 1-f at floor(pos),
    # f at floor(pos)+1, zero elsewhere (incl. both taps out of range).
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos - j)).astype(dtype)


def _rot90_source(img):
    """img_q[a, b] = img[b, H-1-a] for planar [N, C, H, W] (square)."""
    return jnp.flip(jnp.swapaxes(img, 2, 3), axis=2)


def _rot90_fold(mats, src_h):
    """Fold a quarter-turn of the source into the homography: if the source
    is replaced by _rot90_source(img), sampling positions become
    (sx', sy') = (sy, (H-1) - sx)."""
    row0, row1, row2 = mats[:, 0], mats[:, 1], mats[:, 2]
    new0 = row1
    new1 = float(src_h - 1) * row2 - row0
    return jnp.stack([new0, new1, row2], axis=1)


def _needs_rot90(mats, out_h, out_w):
    """True where sx varies more along y than x at the output center
    (rotation-heavy map: pass 1 would bottleneck)."""
    cx, cy = (out_w - 1) / 2.0, (out_h - 1) / 2.0
    a00, a01 = mats[:, 0, 0], mats[:, 0, 1]
    a02 = mats[:, 0, 2]
    p, q, r = mats[:, 2, 0], mats[:, 2, 1], mats[:, 2, 2]
    den = _safe(p * cx + q * cy + r)
    nx = a00 * cx + a01 * cy + a02
    dsx_dx = (a00 * den - nx * p) / (den * den)
    dsx_dy = (a01 * den - nx * q) / (den * den)
    return jnp.abs(dsx_dy) > jnp.abs(dsx_dx)


def _pass_coeffs(mats):
    a00, a01, a02 = mats[:, 0, 0], mats[:, 0, 1], mats[:, 0, 2]
    a10, a11, a12 = mats[:, 1, 0], mats[:, 1, 1], mats[:, 1, 2]
    p, q, r = mats[:, 2, 0], mats[:, 2, 1], mats[:, 2, 2]
    return dict(
        A0=a00 * a11 - a01 * a10, A1=a01 * p - a00 * q,
        B0=a02 * a11 - a01 * a12, B1=a01 * r - a02 * q,
        C=p * a11 - q * a10, D=r * a11 - q * a12,
        a10=a10, a11=a11, a12=a12, p=p, q=q, r=r,
    )


def _warp_core(src_p, mats, out_h, out_w, w_dtype, precision):
    """Planar [N, C, sh, sw] -> [N, C, out_h, out_w]; mats [N, 3, 3]."""
    n, c, sh, sw = src_p.shape
    k = _pass_coeffs(mats.astype(jnp.float32))

    ls = jnp.arange(sh, dtype=jnp.float32)           # source rows
    vs = jnp.arange(out_w, dtype=jnp.float32)        # output columns
    ys = jnp.arange(out_h, dtype=jnp.float32)        # output rows

    # pass 1: pos1[n, l, v]
    num = ((k["A0"][:, None, None] + k["A1"][:, None, None] * ls[None, :, None])
           * vs[None, None, :]
           + (k["B0"][:, None, None]
              + k["B1"][:, None, None] * ls[None, :, None]))
    den = _safe(k["C"][:, None, None] * vs[None, None, :]
                + k["D"][:, None, None])
    w1 = _onehot_pair(num / den, sw, w_dtype)         # [n, l, sw, v]
    # out[c, v] = sum_j src[c, j] W[j, v]: channels on M (sublanes),
    # j on K, v on N (lanes).
    tmp = jnp.einsum("nclj,nljv->nclv", src_p, w1,
                     precision=precision)             # [n, c, l=y_s, v=x_t]

    # pass 2: pos2[n, v, y] over source rows
    num2 = (k["a10"][:, None, None] * vs[None, :, None]
            + k["a11"][:, None, None] * ys[None, None, :]
            + k["a12"][:, None, None])
    den2 = _safe(k["p"][:, None, None] * vs[None, :, None]
                 + k["q"][:, None, None] * ys[None, None, :]
                 + k["r"][:, None, None])
    w2 = _onehot_pair(num2 / den2, sh, w_dtype)       # [n, v, sh, y]
    tmp_t = jnp.swapaxes(tmp, 2, 3)                   # [n, c, v, l]
    out_t = jnp.einsum("ncvj,nvjy->ncvy", tmp_t, w2,
                       precision=precision)           # [n, c, x_t, y_t]
    return jnp.swapaxes(out_t, 2, 3)


def warp_perspective_matmul(img, m_dst_to_src, out_h, out_w,
                            w_dtype=jnp.float32,
                            precision=lax.Precision.HIGHEST,
                            rot90_normalize=True):
    """Drop-in for data.device_warp.warp_perspective (NHWC in/out).

    img: [N, H, W, C] (square H == W when rot90_normalize); m_dst_to_src:
    [N, 3, 3] output-pixel -> source-pixel homography. Zero border.
    """
    n, sh, sw, c = img.shape
    src_p = jnp.transpose(img, (0, 3, 1, 2))
    m = m_dst_to_src.astype(jnp.float32)
    if rot90_normalize:
        assert sh == sw, "rot90 normalization assumes a square source"
        swap = _needs_rot90(m, out_h, out_w)
        src_q = _rot90_source(src_p)
        src_p = jnp.where(swap[:, None, None, None], src_q, src_p)
        m = jnp.where(swap[:, None, None], _rot90_fold(m, sh), m)
    out = _warp_core(src_p, m, out_h, out_w, w_dtype, precision)
    return jnp.transpose(out, (0, 2, 3, 1)).astype(img.dtype)


def _extract_windows(sel_p, offsets, win):
    """Per-part source windows via integer one-hot matmuls (no gathers).

    sel_p: [B, K, C, H, W] planar per-part sources; offsets: [B, K, 2]
    int32 (y0, x0), clamped by the caller to [0, H-win]/[0, W-win].
    Returns [B, K, C, win, win].
    """
    b, k, c, h, w = sel_p.shape
    off = offsets.astype(jnp.float32)
    rows = off[:, :, 0:1] + jnp.arange(win, dtype=jnp.float32)[None, None, :]
    cols = off[:, :, 1:2] + jnp.arange(win, dtype=jnp.float32)[None, None, :]
    wy = (rows[:, :, :, None]
          == jnp.arange(h, dtype=jnp.float32)[None, None, None, :])
    wx = (cols[:, :, :, None]
          == jnp.arange(w, dtype=jnp.float32)[None, None, None, :])
    out = jnp.einsum("bkwy,bkcyx->bkcwx", wy.astype(sel_p.dtype), sel_p)
    return jnp.einsum("bkvx,bkcwx->bkcwv", wx.astype(sel_p.dtype), out)


def warp_perspective_matmul_multi(src_stack, src_idx, m_dst_to_src,
                                  out_h, out_w, part_chunk=None,
                                  w_dtype=jnp.float32,
                                  precision=lax.Precision.HIGHEST,
                                  weight_budget_bytes=768 * 1024 ** 2,
                                  src_window_offsets=None, src_window=0):
    """Drop-in for data.device_warp.warp_perspective_multi.

    src_stack: [B, S, H, W, C] candidate sources; src_idx: [P] static ints;
    m_dst_to_src: [B, P, 3, 3]. Returns [B, P, out_h, out_w, C].

    Parts are processed in static chunks so the per-pass one-hot weight
    tensors stay bounded transients instead of materializing for all B*P
    samples at once. part_chunk=None sizes chunks so the larger pass's
    weight tensor stays under `weight_budget_bytes` (the cut warps read a
    512^2 source: one sample's pass-1 weights alone are 512*512*out_w
    elements — ~134 MB fp32 at out_w=128).

    src_window_offsets/src_window: optional per-part source windowing for
    large sources — [B, P, 2] int32 (y0, x0) origins of src_window-sized
    crops covering each part's source quad (host-computed; caller must
    fall back when a quad exceeds the window). The crop is two integer
    one-hot matmuls and shrinks the dense pass weights by
    (H/src_window)*(W/src_window).
    """
    b, s, sh, sw, c = src_stack.shape
    p = m_dst_to_src.shape[1]
    src_idx = np.asarray(src_idx)
    use_window = src_window_offsets is not None and 0 < src_window < min(sh, sw)
    eff_h, eff_w = (src_window, src_window) if use_window else (sh, sw)
    if part_chunk is None:
        bytes_per = jnp.dtype(w_dtype).itemsize * max(
            eff_h * eff_w * out_w,      # pass-1 weights per sample
            out_w * eff_h * out_h)      # pass-2 weights per sample
        part_chunk = max(1, min(p, int(weight_budget_bytes // (bytes_per * b))))
    outs = []
    for lo in range(0, p, part_chunk):
        hi = min(lo + part_chunk, p)
        idx = src_idx[lo:hi]
        # [B, k, H, W, C] — static source selection (src_idx is host data)
        sel = jnp.stack([src_stack[:, int(i)] for i in idx], axis=1)
        k = hi - lo
        mats = m_dst_to_src[:, lo:hi].reshape(b * k, 3, 3).astype(jnp.float32)
        if use_window:
            off = jnp.clip(src_window_offsets[:, lo:hi].astype(jnp.int32),
                           0, max(sh, sw) - src_window)
            sel_p = jnp.transpose(sel, (0, 1, 4, 2, 3))
            wins = _extract_windows(sel_p, off, src_window)  # [B,k,C,w,w]
            flat = jnp.transpose(
                wins.reshape(b * k, c, src_window, src_window), (0, 2, 3, 1))
            # source coords shift by the crop origin: rows 0/1 -= off * row2
            offf = off.reshape(b * k, 2).astype(jnp.float32)
            mats = mats.at[:, 0].add(-offf[:, 1:2] * mats[:, 2])
            mats = mats.at[:, 1].add(-offf[:, 0:1] * mats[:, 2])
        else:
            flat = sel.reshape(b * k, sh, sw, c)
        out = warp_perspective_matmul(
            flat, mats, out_h, out_w, w_dtype=w_dtype, precision=precision)
        outs.append(out.reshape(b, k, out_h, out_w, c))
    return jnp.concatenate(outs, axis=1)
