"""Device-side person conditioning: pose raster, palm/retain masks, skin.

The reference computes all conditioning on the host inside `__getitem__`
(/root/reference/training/dataset.py:507-679): cv2 stick-figure lines and
skimage disks (dataset.py:779-823), pycocotools palm rectangles + dilation
(dataset.py:698-775, training/utils.py:10-75), parsing-label retain masks
(dataset.py:538-542) and the skin median color (dataset.py:549-566). On
this repo's 1-core host those four stages are ~30% of the remaining
serving host time (scripts/profile_host.py), while the chip sits idle.

This module moves the raster/reduce work on device; the host keeps only
the per-pair *scalar* geometry (keypoint validation, palm rectangle
corners, winding normalization) which is microseconds:

  host:  pose_device_params / palm_device_params  — tiny arrays per item
  device: draw_pose_device  — thick segments as point-to-segment distance
                              fields + joint disks, sequential overwrite
          palm_mask_device  — convex-quad half-plane fills + separable
                              reduce_window dilation (cv2 anchor semantics)
          retain_mask_device — one LUT take over parsing labels + palm
          skin_median_device — masked sort median (np.median semantics)

Numerics: disks, quad fills, dilation, retain and skin median are exact
vs the host oracle (same pixel-center tests / window extents / median
definition). Thick limb segments use the Euclidean distance criterion
(d <= thickness/2) where cv2.line rasterizes a filled polygon with round
caps in fixed-point — boundary pixels can differ; measured agreement on
the fixture poses is >99.9% of pixels (tests/test_device_cond.py). The
host path remains the bit-parity oracle for the reference-comparison CLI.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .pose import LIMB_SEQ, KPT_COLORS

RES = 512

_LIMB_COLORS = np.asarray(KPT_COLORS, np.float32)          # [19, 3]
_JOINT_COLORS = np.asarray(KPT_COLORS[:18], np.float32)    # [18, 3]

# ---------------------------------------------------------------------------
# Host-side parameter builders (scalar keypoint geometry only)
# ---------------------------------------------------------------------------

def pose_device_params(keypoints, img_h, img_w, left):
    """Limb/joint raster parameters for one person, padded-canvas coords.

    Mirrors draw_pose (pose.py:59-96): limbs use pre-validation
    confidences; knee/ankle joints hugging the original (unpadded) borders
    are invalidated (confidence 0.01) before their disks draw. MUTATES
    `keypoints` exactly like the host raster so downstream get_crop sees
    the same validity.

    Args:
        keypoints: [18, 3] (x, y, conf) in ORIGINAL (unpadded) coords.
        img_h, img_w: original image size (canvas is img_h x img_h after
            the symmetric width pad).
        left: left pad added to x by the caller afterwards.

    Returns dict of numpy arrays (see draw_pose_device).
    """
    limb_pts = np.zeros((len(LIMB_SEQ), 2, 2), np.float32)
    limb_valid = np.zeros(len(LIMB_SEQ), bool)
    for i, (f1, t1) in enumerate(LIMB_SEQ):
        f, t = f1 - 1, t1 - 1
        if keypoints[f][2] < 0.05 or keypoints[t][2] < 0.05:
            continue
        limb_valid[i] = True
        limb_pts[i, 0] = (int(keypoints[f][0]), int(keypoints[f][1]))
        limb_pts[i, 1] = (int(keypoints[t][0]), int(keypoints[t][1]))

    joint_pts = np.zeros((18, 2), np.float32)
    joint_valid = np.zeros(18, bool)
    for i in range(18):
        if keypoints[i][2] < 0.05:
            continue
        if i in (9, 10, 12, 13):
            if (keypoints[i][0] <= 0 or keypoints[i][1] <= 0
                    or keypoints[i][0] >= img_w - 50
                    or keypoints[i][1] >= img_h - 50):
                keypoints[i][2] = 0.01
                continue
        joint_valid[i] = True
        joint_pts[i] = (int(keypoints[i][0]), int(keypoints[i][1]))

    limb_pts[..., 0] += left
    joint_pts[..., 0] += left
    return dict(
        limb_pts=limb_pts, limb_valid=limb_valid,
        joint_pts=joint_pts, joint_valid=joint_valid,
        pose_xlim=np.asarray([left, left + img_w], np.int32),
    )


def _winding_normalized(quad):
    """Return the quad with positive shoelace orientation (so the device
    fill can test cross >= 0 on every edge).

    A zero-length limb segment degenerates the rectangle to a point; the
    host _fill_quad then fills the point's 1-2px bbox (its sign never
    resolves, every cross is 0), while an all-zero-cross half-plane test
    would fill the whole canvas. Substitute the equivalent axis-aligned
    bbox quad (pixel centers in [floor(min), ceil(max)]), which fills
    exactly the host's pixel set."""
    x, y = quad[:, 0], quad[:, 1]
    area2 = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    if abs(area2) < 1e-9:
        # +-0.25 keeps the box non-degenerate at integer coords without
        # adding pixel centers (centers are integers)
        x0, x1 = np.floor(x.min()) - 0.25, np.ceil(x.max()) + 0.25
        y0, y1 = np.floor(y.min()) - 0.25, np.ceil(y.max()) + 0.25
        return np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float64)
    return quad if area2 >= 0 else quad[::-1]


def palm_device_params(keypoints):
    """Palm rectangle corners for both sides, padded coords.

    Host half of get_palm_mask (pose.py:195-227): the oriented upper-arm /
    forearm rectangles (_rectangle_quad) and the confidence gate. Corner
    selection and winding are normalized here so the device fill is a
    plain all-edges half-plane test.

    Returns dict(palm_quads [2, 2, 4, 2] f32, palm_valid [2] bool) with
    side 0 = left (labels 14, keypoints 5/6/7), side 1 = right (15, 2/3/4).
    """
    from .pose import _rectangle_quad

    quads = np.zeros((2, 2, 4, 2), np.float32)
    valid = np.zeros(2, bool)
    for side, idx in enumerate(([5, 6, 7], [2, 3, 4])):
        (s_x, s_y, s_c), (e_x, e_y, e_c), (w_x, w_y, w_c) = keypoints[idx]
        if not (s_c > 0.1 and e_c > 0.1) or not (e_c > 0.1 and w_c > 0.1):
            continue
        valid[side] = True
        quads[side, 0] = _winding_normalized(
            _rectangle_quad(s_x, s_y, e_x, e_y))
        quads[side, 1] = _winding_normalized(
            _rectangle_quad(e_x, e_y, w_x, w_y))
    return dict(palm_quads=quads, palm_valid=valid)


# ---------------------------------------------------------------------------
# Device-side raster / reduce kernels
# ---------------------------------------------------------------------------

def _grid(h, w):
    yy = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return yy, xx


def draw_pose_device(limb_pts, limb_valid, joint_pts, joint_valid,
                     pose_xlim, res=RES, thickness=5, radius=5):
    """Rasterize OpenPose stick figures on device. All args batched [B,...].

    Limbs draw in LIMB_SEQ order (later limbs overwrite), joints overwrite
    limbs, matching the host/cv2 sequential draw. A thick segment is the
    set of pixels within thickness/2 of the segment (cv2 round-cap
    geometry); joint disks use the strict (<r^2) integer-center test of
    the host `_disk_coords`. Columns outside `pose_xlim` are zeroed (the
    host rasterizes at the unpadded width, then pads).

    Returns [B, res, res, 3] float32 with uint8 values.
    """
    yy, xx = _grid(res, res)
    canvas = jnp.zeros(limb_pts.shape[:1] + (res, res, 3), jnp.float32)

    # cv2.line(t=5) rasterizes ~1px wider than t/2 (fixed-point polygon
    # fill): measured boundary lies at perp 3.0-3.68 depending on angle and
    # phase. 3.45 is the calibrated constant minimizing disagreement
    # (2.6% of line pixels on random segments, all on the 1px boundary).
    r_line2 = (thickness / 5.0 * 3.45) ** 2
    for i in range(len(LIMB_SEQ)):
        a = limb_pts[:, i, 0]                      # [B, 2] (x, y)
        b = limb_pts[:, i, 1]
        ab = b - a
        den = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-12)   # [B]
        px = xx[None] - a[:, 0, None, None]
        py = yy[None] - a[:, 1, None, None]
        t = jnp.clip(
            (px * ab[:, 0, None, None] + py * ab[:, 1, None, None])
            / den[:, None, None], 0.0, 1.0)
        dx = px - t * ab[:, 0, None, None]
        dy = py - t * ab[:, 1, None, None]
        hit = (dx * dx + dy * dy) <= r_line2
        hit = hit & limb_valid[:, i, None, None]
        canvas = jnp.where(hit[..., None], _LIMB_COLORS[i], canvas)

    r2 = float(radius) ** 2
    for j in range(18):
        c = joint_pts[:, j]                        # [B, 2] (x, y)
        dx = xx[None] - c[:, 0, None, None]
        dy = yy[None] - c[:, 1, None, None]
        hit = (dx * dx + dy * dy) < r2
        hit = hit & joint_valid[:, j, None, None]
        canvas = jnp.where(hit[..., None], _JOINT_COLORS[j], canvas)

    xcol = lax.broadcasted_iota(jnp.int32, (res,), 0)
    keep = ((xcol[None] >= pose_xlim[:, 0:1])
            & (xcol[None] < pose_xlim[:, 1:2]))   # [B, res]
    return canvas * keep[:, None, :, None]


def dilate_cv(mask, k):
    """k x k ones dilation over NHWC with cv2 anchor semantics.

    For an all-ones kernel cv2.dilate's window matches erode's: offsets
    [-(k//2), k-1-k//2] (verified against cv2 on solid-region masks, where
    a one-pixel anchor shift moves the whole dilated boundary). Separable
    (two 1-D max passes); borders -inf."""
    pad = k // 2
    mask = lax.reduce_window(
        mask, -jnp.inf, lax.max, (1, 1, k, 1), (1, 1, 1, 1),
        ((0, 0), (0, 0), (pad, k - 1 - pad), (0, 0)))
    return lax.reduce_window(
        mask, -jnp.inf, lax.max, (1, k, 1, 1), (1, 1, 1, 1),
        ((0, 0), (pad, k - 1 - pad), (0, 0), (0, 0)))


def _fill_quad_device(quad, res):
    """[B, 4, 2] winding-normalized quad -> [B, res, res] bool fill.

    Same pixel-center half-plane test as the host _fill_quad
    (pose.py:118-147) with the sign fixed by the host winding pass."""
    yy, xx = _grid(res, res)
    inside = jnp.ones(quad.shape[:1] + (res, res), bool)
    for i in range(4):
        x0 = quad[:, i, 0, None, None]
        y0 = quad[:, i, 1, None, None]
        x1 = quad[:, (i + 1) % 4, 0, None, None]
        y1 = quad[:, (i + 1) % 4, 1, None, None]
        cross = (x1 - x0) * (yy[None] - y0) - (y1 - y0) * (xx[None] - x0)
        inside = inside & (cross >= 0)
    return inside


def palm_mask_device(palm_quads, palm_valid, parsing, res=RES):
    """Device palm mask: hand parsing minus dilated arm rectangles.

    Args:
        palm_quads: [B, 2, 2, 4, 2] from palm_device_params.
        palm_valid: [B, 2] bool.
        parsing:    [B, H, W, 1] integer parsing map.

    Returns [B, H, W, 1] float32 {0, 1}.
    """
    p = parsing[..., 0]
    out = jnp.zeros(p.shape, bool)
    for side, label, (k_up, k_bot) in ((0, 14, (35, 28)), (1, 15, (35, 28))):
        hand = (p == label)
        up = _fill_quad_device(palm_quads[:, side, 0], res)
        bot = _fill_quad_device(palm_quads[:, side, 1], res)
        up = dilate_cv(up[..., None].astype(jnp.float32), k_up)[..., 0] > 0
        bot = dilate_cv(bot[..., None].astype(jnp.float32), k_bot)[..., 0] > 0
        side_mask = hand & ~up & ~bot & palm_valid[:, side, None, None]
        out = out | side_mask
    return out[..., None].astype(jnp.float32)


def retain_mask_device(parsing, palm):
    """Shoes+head labels + palm mask — device twin of retain_mask_of.

    The six-label LUT unrolls to comparisons (the labels are disjoint, so
    the sum is the union; a 512^2 index gather would be scalar-bound on
    TPU). palm is disjoint from these labels (hands 14/15 vs
    18/19/1/2/4/13), so the total stays {0, 1} exactly like the host."""
    m = palm
    for lbl in (18, 19, 1, 2, 4, 13):
        m = m + (parsing == lbl).astype(jnp.float32)
    return m


GARMENT_SRC_LABELS = (5, 6, 7, 9, 12)  # tops/dresses/pants/skirt sources


def garment_lut_mask(lut, parsing, labels=GARMENT_SRC_LABELS):
    """Per-item label LUT -> mask, as comparisons over the candidate labels.

    lut: [B, 256] (uint8 {0,1} flags or small class values), parsing
    [B, H, W, 1] int. Only `labels` can be nonzero in the LUTs (the
    garment source labels), so the sum over comparisons equals the full
    256-entry gather without any TPU-hostile index gather.
    Returns [B, H, W, 1] float32.
    """
    m = jnp.zeros(parsing.shape, jnp.float32)
    for lbl in labels:
        m = m + (lut[:, lbl].astype(jnp.float32)[:, None, None, None]
                 * (parsing == lbl))
    return m


def skin_median_device(image, parsing):
    """Per-channel median of nonzero neck+face pixels (np.median semantics:
    average of the two middle order statistics). Returns [B, 3] float32.

    Device twin of skin_median_color (preprocess.py). Values are uint8, so
    each order statistic is found EXACTLY by an 8-step binary search over
    the threshold (count of masked values <= t is monotone) — vector
    compares + reductions only. A sort of the 512^2 masked plane would be
    comparator-network-bound on TPU; this is ~16 masked-reduction passes."""
    p = parsing[..., 0]
    skin = ((p == 10) | (p == 13))[..., None]          # [B, H, W, 1]
    m = skin & (image > 0)                             # [B, H, W, 3]
    n = jnp.sum(m, axis=(1, 2)).astype(jnp.int32)      # [B, 3]
    img = image.astype(jnp.int32)

    def order_stat(k):
        """Smallest v with count(masked values <= v) >= k+1, per [B, 3]."""
        lo = jnp.zeros_like(n)
        hi = jnp.full_like(n, 255)

        def body(_, lohi):
            lo, hi = lohi
            mid = (lo + hi) // 2
            cnt = jnp.sum(
                (m & (img <= mid[:, None, None, :])).astype(jnp.int32),
                axis=(1, 2))
            take = cnt >= k + 1
            return jnp.where(take, lo, mid + 1), jnp.where(take, mid, hi)

        lo, hi = lax.fori_loop(0, 8, body, (lo, hi))
        return hi.astype(jnp.float32)

    med = (order_stat((n - 1) // 2) + order_stat(n // 2)) / 2.0
    return jnp.where(n > 0, med, 0.0)


def flip_pose_params(params, res):
    """x-flip pose_device_params output on the `res`-wide padded canvas.

    Coordinates mirror; limb/joint identities swap left<->right so the
    raster colors stay side-correct (dataset --mirror xflip)."""
    from .pose import OPENPOSE_FLIP

    swap = {i + 1: OPENPOSE_FLIP[i] + 1 for i in range(18)}  # 1-based
    limb_perm = []
    index_of = {tuple(p): i for i, p in enumerate(LIMB_SEQ)}
    for f1, t1 in LIMB_SEQ:
        limb_perm.append(index_of[(swap[f1], swap[t1])])
    limb_perm = np.asarray(limb_perm)
    joint_perm = np.asarray(OPENPOSE_FLIP)

    limb_pts = np.asarray(params["limb_pts"])[limb_perm].copy()
    limb_valid = np.asarray(params["limb_valid"])[limb_perm].copy()
    limb_pts[..., 0] = np.where(
        limb_valid[:, None], res - 1 - limb_pts[..., 0], limb_pts[..., 0])
    joint_pts = np.asarray(params["joint_pts"])[joint_perm].copy()
    joint_valid = np.asarray(params["joint_valid"])[joint_perm].copy()
    joint_pts[..., 0] = np.where(
        joint_valid, res - 1 - joint_pts[..., 0], joint_pts[..., 0])
    lo, hi = (int(v) for v in np.asarray(params["pose_xlim"]))
    return dict(
        limb_pts=limb_pts, limb_valid=limb_valid,
        joint_pts=joint_pts, joint_valid=joint_valid,
        pose_xlim=np.asarray([res - hi, res - lo], np.int32),
    )
