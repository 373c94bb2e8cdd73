"""On-device patch geometry: batched perspective warps, erosion, compositing.

The north-star redesign (BASELINE.json): the reference runs ~30
cv2.warpPerspective + erode calls per pair on the host
(dataset.py normalize, :1010-1195); here the whole cut->paste->erode->
composite chain is ONE jitted XLA program over [B, 10, ...] tensors.
The host keeps only decode, keypoint parsing, and the 3x3 homography
solves (microseconds).

Semantics match cv2 defaults used by the reference:
  warpPerspective — bilinear, BORDER_CONSTANT(0), pixel centers at
      integer coordinates, dst->src mapping via the inverse matrix.
  erode (k x k ones) — window minimum; out-of-image treated as +inf
      (cv2 morphology default border), i.e. borders don't erode inward.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .geometry import get_crop_matrices, BODY_PARTS, SLEEVE_PARTS, LOWER_PARTS


def warp_perspective(img, m_dst_to_src, out_h, out_w):
    """Warp one NHWC-batched image by per-sample dst->src homographies.

    Args:
        img: [N, H, W, C].
        m_dst_to_src: [N, 3, 3] mapping output pixel (x, y, 1) to source.
        out_h, out_w: output size.

    Returns [N, out_h, out_w, C]; zero outside the source.
    """
    n, h, w, c = img.shape
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    # Coordinates via explicit fp32 multiply-adds on the VPU: an einsum here
    # would route through the MXU at reduced precision (~2px error at 512).
    m = m_dst_to_src.astype(jnp.float32)[:, :, :, None, None]  # [N,3,3,1,1]
    sx_n = m[:, 0, 0] * gx + m[:, 0, 1] * gy + m[:, 0, 2]
    sy_n = m[:, 1, 0] * gx + m[:, 1, 1] * gy + m[:, 1, 2]
    denom = m[:, 2, 0] * gx + m[:, 2, 1] * gy + m[:, 2, 2]
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    sx = sx_n / safe
    sy = sy_n / safe

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    def gather(yc, xc):
        inside = (
            (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        )[..., None]
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        batch_idx = jnp.arange(n)[:, None, None]
        vals = img[batch_idx, yi, xi]
        return jnp.where(inside, vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _shift_fill(x, s, axis, fill):
    """x translated by s along axis (out[i] = x[i+s]), `fill` outside."""
    nd = x.ndim
    pads = [(0, 0, 0)] * nd
    pads[axis] = (max(0, -s), max(0, s), 0)
    y = lax.pad(x, jnp.asarray(fill, x.dtype), pads)
    idx = [slice(None)] * nd
    idx[axis] = slice(max(0, s), max(0, s) + x.shape[axis])
    return y[tuple(idx)]


def _prefix_window_min(x, size, axis):
    """min over offsets [0, size-1] along axis, out-of-range = +inf.

    Log-shift doubling: min is idempotent, so overlapping coverage is
    exact; each shift +inf-fills its border, reproducing reduce_window's
    init-value padding bit-for-bit."""
    y = x
    cover = 1  # offsets [0, cover-1] covered
    while cover < size:
        s = min(cover, size - cover)
        y = jnp.minimum(y, _shift_fill(y, s, axis, jnp.inf))
        cover += s
    return y


def _axis_window_min(x, k, pad, axis):
    """Sliding min over window [i-pad, i-pad+k-1] along `axis`, out-of-range
    treated as +inf (pure elementwise min/pad ops — layout-agnostic).

    +inf-pad first so clipped border windows keep their valid elements
    (exactly reduce_window's init-value padding), then prefix-min, then
    slice the original extent back out."""
    nd = x.ndim
    pads = [(0, 0, 0)] * nd
    pads[axis] = (pad, k - 1 - pad, 0)
    y = lax.pad(x, jnp.asarray(jnp.inf, x.dtype), pads)
    y = _prefix_window_min(y, k, axis)
    idx = [slice(None)] * nd
    idx[axis] = slice(0, x.shape[axis])
    return y[tuple(idx)]


def erode(mask, k, impl="shift"):
    """k x k window minimum over NHWC; borders treated as +inf (cv2).

    impl="shift" (default): separable log-shift min composition — pure
    elementwise minimum + pad ops that fuse into neighbouring fusions in ANY
    layout. The reduce_window lowering ("reduce_window" impl, the oracle)
    inherits the warp outputs' hostile layouts in the serving program
    (lane dim = H, window axis strided) and measured 18.5 ms per batch vs
    ~0.5 ms for the shift form. Both are exact window minima.

    The trailing mask channel (always 1) is squeezed for the reduction."""
    pad = k // 2
    squeeze = mask.shape[-1] == 1
    x = mask[..., 0] if squeeze else mask
    nd = x.ndim
    w_axis, h_axis = (nd - 1, nd - 2) if squeeze else (nd - 2, nd - 3)
    if impl == "shift":
        x = _axis_window_min(x, k, pad, w_axis)
        x = _axis_window_min(x, k, pad, h_axis)
    else:
        strides = [1] * nd
        win_w, pad_w = [1] * nd, [(0, 0)] * nd
        win_w[w_axis] = k
        pad_w[w_axis] = (pad, k - 1 - pad)
        x = lax.reduce_window(x, jnp.inf, lax.min, win_w, strides, pad_w)
        win_h, pad_h = [1] * nd, [(0, 0)] * nd
        win_h[h_axis] = k
        pad_h[h_axis] = (pad, k - 1 - pad)
        x = lax.reduce_window(x, jnp.inf, lax.min, win_h, strides, pad_h)
    return x[..., None] if squeeze else x


def warp_perspective_multi(src_stack, src_idx, m_dst_to_src, out_h, out_w):
    """Warp P parts from a stack of source images in ONE gather.

    Args:
        src_stack: [B, S, H, W, C] candidate source images.
        src_idx:   [P] int — which source each part samples.
        m_dst_to_src: [B, P, 3, 3].

    Returns [B, P, out_h, out_w, C]; zero outside the source.
    """
    b, s, h, w, c = src_stack.shape
    p = m_dst_to_src.shape[1]
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    # Explicit fp32 multiply-adds (VPU): einsum would hit the MXU at reduced
    # precision — ~2px coordinate quantization at 512 scale.
    m = m_dst_to_src.astype(jnp.float32)[:, :, :, :, None, None]  # [B,P,3,3,1,1]
    sx_n = m[:, :, 0, 0] * gx + m[:, :, 0, 1] * gy + m[:, :, 0, 2]
    sy_n = m[:, :, 1, 0] * gx + m[:, :, 1, 1] * gy + m[:, :, 1, 2]
    denom = m[:, :, 2, 0] * gx + m[:, :, 2, 1] * gy + m[:, :, 2, 2]
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    sx = sx_n / safe
    sy = sy_n / safe

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    src_sel = jnp.asarray(src_idx)[None, :, None, None]

    def gather(yc, xc):
        inside = (
            (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        )[..., None]
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        batch_idx = jnp.arange(b)[:, None, None, None]
        vals = src_stack[batch_idx, src_sel, yi, xi]
        return jnp.where(inside, vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _mask_thresh(warp_impl):
    """Warped-mask interior threshold (see the comment at the paste site):
    254.5 for exact/f32 warps, 252.5 for bf16 one-hot weights whose pair
    sums carry a 2*2^-8 relative error."""
    return 252.5 if warp_impl == "matmul_bf16" else 254.5


def resolve_warp_impl(impl):
    """'auto' -> the measured-best backend for the platform: matmul_bf16 on
    TPU (55 vs 51.5 img/s/chip over f32 weights at batch 8, round 4; parity
    within the accepted hat*hat class), bit-parity gathers elsewhere.
    Callers must resolve BEFORE branching on the impl string — the warped-
    mask threshold (_mask_thresh) is impl-dependent."""
    if impl == "auto":
        return "matmul_bf16" if jax.default_backend() == "tpu" else "gather"
    return impl


def _warp_multi(impl):
    """Select the multi-part warp backend.

    'gather': pointwise bilinear gathers (bit-parity oracle; ~0.5-4 GB/s on
    TPU — measured 73% of the serving program). 'matmul': the one-hot MXU
    two-pass (ops/projective_warp.py) — hat*hat-softened like the ADA
    two-pass, >40 dB vs the oracle on image content; '_bf16' = bf16 one-hot
    weights. 'auto': resolve_warp_impl's platform pick."""
    impl = resolve_warp_impl(impl)
    if impl in ("matmul", "matmul_bf16"):
        import functools

        from ..ops.projective_warp import warp_perspective_matmul_multi

        if impl == "matmul_bf16":
            # bf16 one-hot weights: halves the dominant W-matrix traffic;
            # >40 dB vs f32 weights on image content (same class as the
            # accepted hat*hat softening).
            return functools.partial(warp_perspective_matmul_multi,
                                     w_dtype=jnp.bfloat16,
                                     precision=lax.Precision.DEFAULT)
        return warp_perspective_matmul_multi
    assert impl == "gather", impl
    return warp_perspective_multi


def _cut_src_stack(upper_img, lower_img, upper_mask, lower_mask,
                   sleeve_mask, sleeve_valid):
    """[B, 3, H, W, 4] cut-warp sources: 0 = non-sleeve-routed upper,
    1 = sleeve-routed upper, 2 = lower; image (3ch) + {0,255} mask (1ch).

    sleeve_valid [B] (or None = all valid) distinguishes the host oracle's
    two cases: a PRESENT sleeve mask routes arm parts (even if it is all
    zeros -> empty sleeve patches, dataset.py:1062-1067), while an ABSENT
    one (sleeve_mask=None on host) leaves the garment unrouted — both
    sources see the full garment."""
    if sleeve_valid is None:
        eff = sleeve_mask
        routed = None
    else:
        sv = sleeve_valid.astype(jnp.float32)[:, None, None, None]
        eff = sleeve_mask * sv
        routed = sv
    nonsleeve = jnp.concatenate(
        [upper_img * (1 - eff), upper_mask * (1 - eff)], axis=-1)
    sleeve_src = jnp.concatenate(
        [upper_img * eff, upper_mask * eff], axis=-1)
    if routed is not None:
        full = jnp.concatenate([upper_img, upper_mask], axis=-1)
        sleeve_src = routed * sleeve_src + (1 - routed) * full
    lower_src = jnp.concatenate([lower_img, lower_mask], axis=-1)
    return jnp.stack([nonsleeve, sleeve_src, lower_src], axis=1)


def normalize_patches_device(
    upper_img, lower_img, upper_mask, lower_mask, sleeve_mask,
    upper_cut_m, lower_cut_m, paste_m_inv, part_valid,
    patch=128, erode_k=5, track_wo_sleeve=False, warp_impl="gather",
    sleeve_valid=None,
):
    """Batched device version of the patch normalize/denormalize chain.

    All inputs are jnp arrays:
        upper_img/lower_img:   [B, H, W, 3] float (masked garment pixels).
        upper_mask/lower_mask: [B, H, W, 1] float in {0, 255}.
        sleeve_mask:           [B, H, W, 1] float in {0, 1}.
        sleeve_valid:          [B] (or None = all valid): False reproduces
            the host's sleeve_mask=None (garment unrouted), distinct from
            a present-but-empty mask — see _cut_src_stack.
        upper_cut_m/lower_cut_m: [B, 10, 3, 3] INVERSE cut transforms
            (patch pixel -> image pixel) per part; arbitrary for invalid.
        paste_m_inv:           [B, 10, 3, 3] patch -> person image.
        part_valid:            [B, 10, 3] bools: (upper cut, lower cut,
                               paste) validity.

    Returns dict with norm_img [B,128,128,30], norm_img_lower [B,128,128,15],
    denorm_upper_img / denorm_lower_img [B,H,W,3] and their masks.

    Sleeve mirroring runs on device too (mirror_sleeves_device below);
    train erasure lives in trainsets.assemble_train_batch_lean.
    """
    b, h, w, _ = upper_img.shape
    n_parts = len(BODY_PARTS)
    lower_parts = list(LOWER_PARTS)

    # --- all 15 cut warps as ONE gather ------------------------------------
    # sources: 0 = non-sleeve-routed upper, 1 = sleeve-routed upper,
    # 2 = lower; image (3ch) and {0,255} mask (1ch) packed per source.
    src_stack = _cut_src_stack(upper_img, lower_img, upper_mask,
                               lower_mask, sleeve_mask, sleeve_valid)

    cut_src_idx = np.array(
        [1 if i in SLEEVE_PARTS else 0 for i in range(n_parts)]
        + [2] * len(lower_parts))
    cut_m = jnp.concatenate(
        [upper_cut_m, lower_cut_m[:, lower_parts]], axis=1)   # [B, 15, 3, 3]
    cut_valid = jnp.concatenate(
        [part_valid[:, :, 0], part_valid[:, lower_parts, 1]], axis=1
    ).astype(jnp.float32)                                     # [B, 15]

    warp_impl = resolve_warp_impl(warp_impl)
    warp_multi = _warp_multi(warp_impl)
    cuts = warp_multi(src_stack, cut_src_idx, cut_m, patch, patch)
    cuts = cuts * cut_valid[:, :, None, None, None]           # [B,15,p,p,4]

    # --- all 15 paste warps as ONE gather ----------------------------------
    paste_m = jnp.concatenate(
        [paste_m_inv, paste_m_inv[:, lower_parts]], axis=1)
    paste_valid = jnp.concatenate(
        [part_valid[:, :, 2], part_valid[:, lower_parts, 2]], axis=1
    ).astype(jnp.float32)
    pasted = warp_multi(
        cuts, np.arange(n_parts + len(lower_parts)), paste_m, h, w)

    d_imgs = pasted[..., 0:3]
    d_masks = pasted[..., 3:4]
    # >= 254.5, not == 255: bilinear-warped constants can be 1 ulp off under
    # plain IEEE evaluation and erosion's window-min propagates any deviation.
    # bf16 one-hot weights widen that interval: the pair weights need not
    # sum to exactly 1, so interior 255s come back as 255*(1 +/- 2*2^-8)
    # over the two passes — threshold at 252.5 (covers the error band;
    # true bilinear edge pixels in (252.5, 254.5) are <1% of the 1px-wide
    # transition, i.e. a sub-1%-of-a-pixel edge shift).
    thresh = _mask_thresh(warp_impl)
    d_masks = (
        erode(d_masks.reshape(-1, h, w, 1), erode_k).reshape(d_masks.shape)
        >= thresh).astype(jnp.float32)
    d_masks = d_masks * (cut_valid * paste_valid)[:, :, None, None, None]

    # --- sequential composite (order matters: later parts overwrite) -------
    denorm_upper = jnp.zeros_like(upper_img)
    denorm_upper_wo_sleeve = jnp.zeros_like(upper_img)
    denorm_lower = jnp.zeros_like(upper_img)
    for ii in range(n_parts):
        m = d_masks[:, ii]
        denorm_upper = d_imgs[:, ii] * m + denorm_upper * (1 - m)
        if track_wo_sleeve and ii not in SLEEVE_PARTS:
            denorm_upper_wo_sleeve = (
                d_imgs[:, ii] * m + denorm_upper_wo_sleeve * (1 - m))
    for jj in range(len(lower_parts)):
        m = d_masks[:, n_parts + jj]
        denorm_lower = d_imgs[:, n_parts + jj] * m + denorm_lower * (1 - m)

    part_imgs = [cuts[:, i, :, :, 0:3] for i in range(n_parts)]
    part_masks = [cuts[:, i, :, :, 3:4] for i in range(n_parts)]
    part_imgs_lower = [cuts[:, n_parts + j, :, :, 0:3]
                       for j in range(len(lower_parts))]
    part_masks_lower = [cuts[:, n_parts + j, :, :, 3:4]
                        for j in range(len(lower_parts))]

    out = dict(
        norm_img=jnp.concatenate(part_imgs, axis=-1),
        norm_img_lower=jnp.concatenate(part_imgs_lower, axis=-1),
        norm_clothes_masks=jnp.concatenate(part_masks, axis=-1),
        norm_clothes_masks_lower=jnp.concatenate(part_masks_lower, axis=-1),
        denorm_upper_img=denorm_upper,
        denorm_lower_img=denorm_lower,
    )
    if track_wo_sleeve:
        out["denorm_upper_img_wo_sleeve"] = denorm_upper_wo_sleeve
    return out


def bound_from_mask_top(mask):
    """Device bound map: rows at/under the mask's topmost nonzero row,
    {0, 255}; all-zero mask -> zeros (mask_to_bbox None semantics)."""
    b, h, w = mask.shape[0], mask.shape[1], mask.shape[2]
    present = jnp.any(mask > 0, axis=(2, 3))                 # [B, H]
    row_idx = jnp.arange(h)
    top = jnp.min(jnp.where(present, row_idx[None, :], h), axis=1)  # [B]
    nonempty = jnp.any(present, axis=1)
    bound = (row_idx[None, :] >= top[:, None]) & nonempty[:, None]
    bound = bound.astype(jnp.float32)[:, :, None, None] * 255.0
    return jnp.broadcast_to(bound, (b, h, w, 1))


def zero_bound_above_mask_bottom(bound, mask):
    """Zero bound rows above the mask's bottommost nonzero row (upper-mode
    conditioning cut, dataset.py:2213-2219); empty mask leaves bound as-is."""
    b, h = mask.shape[0], mask.shape[1]
    present = jnp.any(mask > 0, axis=(2, 3))
    row_idx = jnp.arange(h)
    bottom = jnp.max(jnp.where(present, row_idx[None, :], -1), axis=1)  # [B]
    nonempty = jnp.any(present, axis=1)
    keep = (row_idx[None, :] >= bottom[:, None]) | ~nonempty[:, None]
    return bound * keep.astype(jnp.float32)[:, :, None, None]


def host_matrices_for_pair(upper_cut_kps, lower_cut_kps, paste_kps,
                           patch=128, res=512, return_paste_fwd=False):
    """Solve the per-part homographies on host -> arrays for the device path.

    Returns (upper_cut_m, lower_cut_m, paste_m_inv, part_valid), shapes
    [10,3,3]x3 and [10,3] — the only host work besides decode/keypoints.
    With return_paste_fwd also the patch->image paste transforms (a free
    by-product the tile-layout pass otherwise re-derives by inversion).

    All ~30 per-pair 8x8 homography systems go through ONE batched solve
    (geometry.perspective_batch — the sequential solves dominated the host
    profile). The cut transforms are solved directly in the device's
    dst->src direction (patch->image), which the loop formulation obtained
    by solving image->patch and inverting — identical warp up to the
    homography's irrelevant overall scale.
    """
    from .geometry import part_quads, perspective_batch

    n_parts = len(BODY_PARTS)
    qu, vu = part_quads(upper_cut_kps, res, res)
    ql, vl = part_quads(lower_cut_kps, res, res)
    qp, vp = part_quads(paste_kps, res, res)
    dst = np.float32([[0, 0], [0, patch], [patch, patch], [patch, 0]])
    dst_all = np.broadcast_to(dst, (n_parts, 4, 2))

    # Guard degenerate zero quads (invalid parts) from the batched solve:
    # substitute the identity square so the system stays nonsingular.
    ident = np.float32([[0, 0], [0, 1], [1, 1], [1, 0]])
    qu_s = np.where(vu[:, None, None], qu, ident)
    ql_s = np.where(vl[:, None, None], ql, ident)
    qp_s = np.where(vp[:, None, None], qp, ident)

    src = np.concatenate([dst_all, dst_all, qp_s, dst_all], axis=0)
    tgt = np.concatenate([qu_s, ql_s, dst_all, qp_s], axis=0)
    m = perspective_batch(src, tgt).astype(np.float32)
    upper_m = np.where(vu[:, None, None], m[:n_parts], 0.0)
    lower_m = np.where(vl[:, None, None], m[n_parts:2 * n_parts], 0.0)
    paste_inv = np.where(vp[:, None, None], m[2 * n_parts:3 * n_parts], 0.0)
    paste_fwd = np.where(vp[:, None, None], m[3 * n_parts:], 0.0)
    valid = np.stack([vu, vl, vp], axis=1)
    if return_paste_fwd:
        return upper_m, lower_m, paste_inv, valid, paste_fwd
    return upper_m, lower_m, paste_inv, valid


# ---------------------------------------------------------------------------
# Tiled paste path: warp each part into a fixed TILE around its destination
# quad instead of the full 512^2 canvas. The paste gather is the serving
# bottleneck (latency-bound XLA gathers); tiles cut gathered pixels by
# (TILE/RES)^2. Host guarantees fit (quad bbox + erode margin inside the
# tile) and falls back to the full-canvas program otherwise — two compiled
# variants, dispatched per batch.

PASTE_TILE = 256


def paste_tile_layout(paste_m_inv_parts, part_valid_paste, res=512,
                      tile=PASTE_TILE, margin=8, patch=128,
                      paste_fwd_parts=None):
    """Host: per-part tile offsets + fit check.

    Args:
        paste_m_inv_parts: [10, 3, 3] patch->image transforms (or zeros).
        part_valid_paste:  [10] bools.
        paste_fwd_parts:   optional [10, 3, 3] forward (patch->image)
            transforms from host_matrices_for_pair(return_paste_fwd=True);
            skips the per-part inversions below.

    Returns (offsets [10, 2] int32 (y, x), fits: bool).
    """
    corners = np.array(
        [[0, 0, 1], [0, patch, 1], [patch, patch, 1], [patch, 0, 1]],
        np.float64)
    offsets = np.zeros((len(paste_m_inv_parts), 2), np.int32)
    fits = True
    for i, m in enumerate(paste_m_inv_parts):
        if not part_valid_paste[i]:
            continue
        # The device matrices map image(dst) -> patch(src); the destination
        # quad needs the forward patch -> image direction.
        m_fwd = (np.asarray(paste_fwd_parts[i], np.float64)
                 if paste_fwd_parts is not None
                 else np.linalg.inv(np.asarray(m, np.float64)))
        proj = corners @ m_fwd.T
        xy = proj[:, :2] / np.maximum(np.abs(proj[:, 2:3]), 1e-9) * np.sign(
            proj[:, 2:3])
        x0 = np.clip(np.floor(xy[:, 0].min()) - margin, 0, res)
        x1 = np.clip(np.ceil(xy[:, 0].max()) + margin, 0, res)
        y0 = np.clip(np.floor(xy[:, 1].min()) - margin, 0, res)
        y1 = np.clip(np.ceil(xy[:, 1].max()) + margin, 0, res)
        if (x1 - x0) > tile or (y1 - y0) > tile:
            fits = False
        oy = int(np.clip(y0, 0, res - tile))
        ox = int(np.clip(x0, 0, res - tile))
        offsets[i] = (oy, ox)
    return offsets, fits


CUT_WINDOW = 320


def cut_window_layout(cut_m_parts, valid, res=512, win=CUT_WINDOW,
                      margin=8, patch=128):
    """Host: per-part source-window origins for the windowed matmul cut.

    cut_m_parts: [P, 3, 3] patch->image transforms (device dst->src
    direction); valid: [P] bools. Projects the patch corners into the
    source image; a window of `win` must cover the quad + margin.

    Returns (offsets [P, 2] int32 (y, x), fits: bool).
    """
    corners = np.array(
        [[0, 0, 1], [0, patch, 1], [patch, patch, 1], [patch, 0, 1]],
        np.float64)
    offsets = np.zeros((len(cut_m_parts), 2), np.int32)
    fits = True
    for i, m in enumerate(cut_m_parts):
        if not valid[i]:
            continue
        proj = corners @ np.asarray(m, np.float64).T
        xy = proj[:, :2] / np.maximum(np.abs(proj[:, 2:3]), 1e-9) * np.sign(
            proj[:, 2:3])
        x0 = np.floor(xy[:, 0].min()) - margin
        x1 = np.ceil(xy[:, 0].max()) + margin
        y0 = np.floor(xy[:, 1].min()) - margin
        y1 = np.ceil(xy[:, 1].max()) + margin
        if (x1 - x0) > win or (y1 - y0) > win:
            fits = False
        offsets[i] = (int(np.clip(y0, 0, res - win)),
                      int(np.clip(x0, 0, res - win)))
    return offsets, fits


def part_layouts_for_pair(mu, ml, pinv, valid, paste_fwd=None):
    """15-slot (upper x10 + lower x5) paste-tile / cut-window layouts for
    the device warps. One shared implementation for serving.host_prepare
    and the lean training loader.

    Returns (tile_offsets [15, 2] i32, tiles_fit, cut_window_offsets
    [15, 2] i32, cut_fits)."""
    lower = list(LOWER_PARTS)
    tile10, tiles_fit = paste_tile_layout(
        pinv, valid[:, 2], paste_fwd_parts=paste_fwd)
    tile_offsets = np.concatenate([tile10, tile10[lower]], axis=0)
    cw_u, fits_u = cut_window_layout(mu, valid[:, 0])
    cw_l, fits_l = cut_window_layout(ml[lower], valid[lower, 1])
    cut_window_offsets = np.concatenate([cw_u, cw_l], axis=0)
    return (tile_offsets.astype(np.int32), bool(tiles_fit),
            cut_window_offsets.astype(np.int32), bool(fits_u and fits_l))


def normalize_patches_device_tiled(
    upper_img, lower_img, upper_mask, lower_mask, sleeve_mask,
    upper_cut_m, lower_cut_m, paste_m_inv, part_valid, tile_offsets,
    patch=128, erode_k=5, track_wo_sleeve=False, tile=PASTE_TILE,
    warp_impl="gather", cut_window_offsets=None, cut_window=0,
    sleeve_valid=None,
):
    """Tiled-paste variant of normalize_patches_device.

    tile_offsets: [B, 15, 2] int32 (y, x) tile origins from
    paste_tile_layout (upper parts then lower parts). Callers must have
    checked `fits`; quads exceeding their tile get cropped.
    """
    b, h, w, _ = upper_img.shape
    n_parts = len(BODY_PARTS)
    lower_parts = list(LOWER_PARTS)
    n_all = n_parts + len(lower_parts)

    src_stack = _cut_src_stack(upper_img, lower_img, upper_mask,
                               lower_mask, sleeve_mask, sleeve_valid)

    cut_src_idx = np.array(
        [1 if i in SLEEVE_PARTS else 0 for i in range(n_parts)]
        + [2] * len(lower_parts))
    cut_m = jnp.concatenate(
        [upper_cut_m, lower_cut_m[:, lower_parts]], axis=1)
    cut_valid = jnp.concatenate(
        [part_valid[:, :, 0], part_valid[:, lower_parts, 1]], axis=1
    ).astype(jnp.float32)
    warp_impl = resolve_warp_impl(warp_impl)
    warp_multi = _warp_multi(warp_impl)
    cut_kw = {}
    if cut_window_offsets is not None and warp_multi is not warp_perspective_multi:
        cut_kw = dict(src_window_offsets=cut_window_offsets,
                      src_window=cut_window)
    cuts = warp_multi(src_stack, cut_src_idx, cut_m, patch, patch, **cut_kw)
    cuts = cuts * cut_valid[:, :, None, None, None]

    # Fold the tile translation into the dst->src matrices:
    # dst = t + off  =>  m_tile = m @ T(off).
    paste_m = jnp.concatenate(
        [paste_m_inv, paste_m_inv[:, lower_parts]], axis=1)  # [B, 15, 3, 3]
    off = tile_offsets.astype(jnp.float32)
    t_off = jnp.tile(jnp.eye(3), (b, n_all, 1, 1))
    t_off = t_off.at[:, :, 0, 2].set(off[:, :, 1])  # x
    t_off = t_off.at[:, :, 1, 2].set(off[:, :, 0])  # y
    paste_m_tile = paste_m @ t_off
    paste_valid = jnp.concatenate(
        [part_valid[:, :, 2], part_valid[:, lower_parts, 2]], axis=1
    ).astype(jnp.float32)

    pasted = warp_multi(
        cuts, np.arange(n_all), paste_m_tile, tile, tile)   # [B,15,T,T,4]
    t_imgs = pasted[..., 0:3]
    t_masks = pasted[..., 3:4]
    t_masks = (
        erode(t_masks.reshape(-1, tile, tile, 1), erode_k).reshape(
            t_masks.shape) >= _mask_thresh(warp_impl)).astype(jnp.float32)
    t_masks = t_masks * (cut_valid * paste_valid)[:, :, None, None, None]

    def composite_one(canvas, tile_img, tile_mask, off_yx):
        region = jax.lax.dynamic_slice(
            canvas, (off_yx[0], off_yx[1], 0), (tile, tile, 3))
        region = tile_img * tile_mask + region * (1 - tile_mask)
        return jax.lax.dynamic_update_slice(
            canvas, region, (off_yx[0], off_yx[1], 0))

    composite = jax.vmap(composite_one)

    denorm_upper = jnp.zeros_like(upper_img)
    denorm_upper_wo_sleeve = jnp.zeros_like(upper_img)
    denorm_lower = jnp.zeros_like(upper_img)
    for ii in range(n_parts):
        denorm_upper = composite(
            denorm_upper, t_imgs[:, ii], t_masks[:, ii], tile_offsets[:, ii])
        if track_wo_sleeve and ii not in SLEEVE_PARTS:
            denorm_upper_wo_sleeve = composite(
                denorm_upper_wo_sleeve, t_imgs[:, ii], t_masks[:, ii],
                tile_offsets[:, ii])
    for jj in range(len(lower_parts)):
        k = n_parts + jj
        denorm_lower = composite(
            denorm_lower, t_imgs[:, k], t_masks[:, k], tile_offsets[:, k])

    out = dict(
        norm_img=jnp.concatenate(
            [cuts[:, i, :, :, 0:3] for i in range(n_parts)], axis=-1),
        norm_img_lower=jnp.concatenate(
            [cuts[:, n_parts + j, :, :, 0:3]
             for j in range(len(lower_parts))], axis=-1),
        norm_clothes_masks=jnp.concatenate(
            [cuts[:, i, :, :, 3:4] for i in range(n_parts)], axis=-1),
        norm_clothes_masks_lower=jnp.concatenate(
            [cuts[:, n_parts + j, :, :, 3:4]
             for j in range(len(lower_parts))], axis=-1),
        denorm_upper_img=denorm_upper,
        denorm_lower_img=denorm_lower,
    )
    if track_wo_sleeve:
        out["denorm_upper_img_wo_sleeve"] = denorm_upper_wo_sleeve
    return out


def mirror_sleeves_device(norm, patch=128):
    """Device sleeve mirroring: copy a present sleeve onto a missing one."""
    imgs = norm["norm_img"]
    masks = norm["norm_clothes_masks"]  # device masks: 1 channel per part

    out_imgs = [imgs[..., i * 3:(i + 1) * 3] for i in range(10)]
    out_masks = [masks[..., i:i + 1] for i in range(10)]
    for a, b in [(2, 4), (3, 5)]:
        sum_a = jnp.sum(out_masks[a], axis=(1, 2, 3), keepdims=True)
        sum_b = jnp.sum(out_masks[b], axis=(1, 2, 3), keepdims=True)
        mirror_a = (sum_a == 0) & (sum_b > 0)
        mirror_b = (sum_b == 0) & (sum_a > 0)
        new_a = jnp.where(mirror_a, out_imgs[b][:, :, ::-1], out_imgs[a])
        new_b = jnp.where(mirror_b, out_imgs[a][:, :, ::-1], out_imgs[b])
        ma = jnp.where(mirror_a, out_masks[b][:, :, ::-1], out_masks[a])
        mb = jnp.where(mirror_b, out_masks[a][:, :, ::-1], out_masks[b])
        out_imgs[a], out_imgs[b] = new_a, new_b
        out_masks[a], out_masks[b] = ma, mb
    norm["norm_img"] = jnp.concatenate(out_imgs, axis=-1)
    norm["norm_clothes_masks"] = jnp.concatenate(out_masks, axis=-1)
    return norm


def zero_conflicts_device(norm):
    """Zero kept-stream torso/hip patches under transferred-garment patches
    (upper/lower modes; test variants dataset.py:2660-2670)."""
    masks = norm["norm_clothes_masks"]  # 1 channel per part
    imgs_l = norm["norm_img_lower"]
    masks_l = norm["norm_clothes_masks_lower"]
    out_imgs, out_masks = [], []
    for lower_idx, upper_idx in [(0, 0), (1, 6), (3, 8)]:
        occupied = (
            masks[..., upper_idx:upper_idx + 1] > 0).astype(jnp.float32)
        out_imgs.append((lower_idx,
                         imgs_l[..., lower_idx * 3:(lower_idx + 1) * 3]
                         * (1 - occupied)))
        out_masks.append((lower_idx,
                          masks_l[..., lower_idx:lower_idx + 1]
                          * (1 - occupied)))
    img_parts = [imgs_l[..., i * 3:(i + 1) * 3] for i in range(5)]
    mask_parts = [masks_l[..., i:i + 1] for i in range(5)]
    for i, v in out_imgs:
        img_parts[i] = v
    for i, v in out_masks:
        mask_parts[i] = v
    norm["norm_img_lower"] = jnp.concatenate(img_parts, axis=-1)
    norm["norm_clothes_masks_lower"] = jnp.concatenate(mask_parts, axis=-1)
    return norm
