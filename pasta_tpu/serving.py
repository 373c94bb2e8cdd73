"""End-to-end try-on serving: device preprocessing + generator, one program.

The reference's inference hot loop runs ~30 OpenCV warps per pair on the
host before every generator call (SURVEY.md §3.1). Here the host does only
decode / keypoint parsing / mask labeling / homography solves (sub-ms numpy)
and everything else — patch warps, erosion, compositing, sleeve mirroring,
conflict zeroing, input assembly, generator forward — is ONE jitted XLA
program per batch.

Data-dependent reference branches become tensor selects:
  * sleeve mirroring (dataset.py:1100-1129): patch-sum scalars gate a
    flipped copy via jnp.where
  * kept-garment streams (upper/lower modes): host passes the kept denorm
    image; a static mode flag selects it
  * patch conflict zeroing (test variants): mask-overlap multiply
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .data import preprocess as pp
from .data.device_warp import (
    normalize_patches_device, normalize_patches_device_tiled,
    host_matrices_for_pair, erode, bound_from_mask_top,
    zero_bound_above_mask_bottom, paste_tile_layout, cut_window_layout,
    CUT_WINDOW, LOWER_PARTS)
from .models import Generator


def host_prepare(person, clothes, mode, use_sleeve_mask=True):
    """Host side: masks, scalars, homographies. Returns a dict of small
    numpy arrays (everything heavy stays un-warped full-res images)."""
    assert mode in ("full", "upper", "lower")
    person_cls = pp.garment_class_masks(person.parsing)
    clothes_cls = pp.garment_class_masks(clothes.parsing)

    if mode == "full":
        upper_src, lower_src = clothes, clothes
        upper_masks, lower_masks = clothes_cls, clothes_cls
    elif mode == "upper":
        upper_src, lower_src = clothes, person
        upper_masks, lower_masks = clothes_cls, person_cls
    else:
        upper_src, lower_src = person, clothes
        upper_masks, lower_masks = person_cls, clothes_cls

    upper_mask = upper_masks["tops"] + upper_masks["dresses"]
    lower_mask = lower_masks["skirt"] + lower_masks["pants"]
    dress_transfer = False
    if mode == "upper" and clothes_cls["dresses"].sum() > 0:
        lower_mask = lower_mask * 0
        dress_transfer = True
    if mode == "lower" and person_cls["dresses"].sum() > 0:
        lower_mask = lower_mask * 0
        dress_transfer = True

    sleeve_src = person if mode == "lower" else clothes
    sleeve = pp.sleeve_mask_from(sleeve_src) if use_sleeve_mask else None

    mu, ml, pinv, valid, pfwd = host_matrices_for_pair(
        upper_src.keypoints, lower_src.keypoints, person.keypoints,
        return_paste_fwd=True)
    tile_offsets10, tiles_fit = paste_tile_layout(
        pinv, valid[:, 2], paste_fwd_parts=pfwd)
    # offsets for the 15-slot (upper x10 + lower x5) device layout
    tile_offsets = np.concatenate(
        [tile_offsets10, tile_offsets10[list(LOWER_PARTS)]], axis=0)
    # source windows for the matmul cut warps, same 15-slot layout
    cw_u, cut_fits_u = cut_window_layout(mu, valid[:, 0])
    cw_l, cut_fits_l = cut_window_layout(
        ml[list(LOWER_PARTS)], valid[list(LOWER_PARTS), 1])
    cut_window_offsets = np.concatenate([cw_u, cw_l], axis=0)

    # Host-side conditioning scalars (keypoint/bbox logic, preprocess_pair
    # parity). The warp-dependent parts of the bound (upper garment bottom,
    # full-mode composite top) are finished on device.
    bound = np.zeros_like(lower_mask[..., 0:1], np.float64)
    if mode == "upper":
        lower_bbox = pp.mask_to_bbox(lower_mask.copy())
        lhip, rhip = person.keypoints[11], person.keypoints[8]
        ub = None
        if lhip[2] > 0.05 and rhip[2] > 0.05:
            hip_width = np.linalg.norm(lhip[0:2] - rhip[0:2])
            middle_y = (lhip[1] + rhip[1]) / 2
            ub = int(middle_y - (3 * hip_width / 4))
            if lower_bbox is not None:
                ub = min(ub, lower_bbox[1])
        elif lower_bbox is not None:
            ub = lower_bbox[1]
        if ub is not None and not dress_transfer:
            bound[ub:, ...] += 255
    elif mode == "lower":
        lower_bbox = pp.mask_to_bbox(
            (person_cls["skirt"] + person_cls["pants"]).copy())
        if lower_bbox is not None:
            bound[lower_bbox[1]:, ...] += 255
    # full mode: bound built on device from the composite (unless dress)

    # Lower-garment class label map (preprocess_pair parity).
    if mode == "upper":
        pants, skirt = lower_masks["pants"], lower_masks["skirt"]
        dress = clothes_cls["dresses"]
    elif mode == "lower":
        pants, skirt = lower_masks["pants"], lower_masks["skirt"]
        dress = person_cls["dresses"]
    else:
        pants, skirt, dress = (
            clothes_cls["pants"], clothes_cls["skirt"], clothes_cls["dresses"])
    if dress_transfer:
        pants, skirt = pants * 0, skirt * 0
    if pants.sum() > 0:
        cls = 0
    elif skirt.sum() > 0:
        cls = 1
    elif dress.sum() > 0:
        cls = 2
    else:
        cls = 1
    # the {0, 1/2, 1}*255 lower_label_map is reconstructed on device
    label_cls = np.full_like(lower_mask, cls, np.uint8)

    # Everything big ships as uint8 (4x less host work + transfer than f32;
    # the device program casts — assemble_inputs_device). skin is the [3]
    # median color, broadcast on device instead of materializing a
    # [H, W, 3] map per item on host.
    return dict(
        upper_img=upper_mask * upper_src.image,                     # u8
        lower_img=lower_mask * lower_src.image,                     # u8
        upper_mask=upper_mask * np.uint8(255),                      # u8
        lower_mask=lower_mask * np.uint8(255),                      # u8
        sleeve=(sleeve if sleeve is not None
                else np.zeros_like(upper_mask)),                    # u8 {0,1}
        upper_cut_m=mu, lower_cut_m=ml, paste_m_inv=pinv, part_valid=valid,
        image=person.image,                                         # u8
        pose=person.pose_img,                                       # u8
        retain_mask=pp.retain_mask_of(person),                      # u8 {0,1}
        skin_color=np.asarray(
            pp.skin_median_color(person.image, person.parsing), np.float32),
        label_cls=label_cls,                                        # u8 {0,1,2}
        bound=bound.astype(np.uint8),                               # u8 {0,255}
        tile_offsets=tile_offsets.astype(np.int32),
        tiles_fit=np.asarray(tiles_fit),
        cut_window_offsets=cut_window_offsets.astype(np.int32),
        cut_fits=np.asarray(bool(cut_fits_u and cut_fits_l)),
        dress_transfer=np.asarray(
            0.0 if (mode == "full" and clothes_cls["dresses"].sum() > 0)
            else 1.0, np.float32),
    )


def _mirror_sleeves(norm, patch=128):
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


def _zero_conflicts(norm):
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


_INGEST_F32_KEYS = ("upper_img", "lower_img", "upper_mask", "lower_mask",
                    "sleeve", "image", "pose", "retain_mask", "bound")


@jax.jit
def ingest_device(host: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Stage-1 device program: uint8 host arrays -> f32 model inputs.

    Runs as its OWN jit so the f32 outputs land in default layouts at the
    program boundary. Folding these casts into the main serving program lets
    XLA's layout assignment propagate transposed layouts into the paste/cut
    warp gathers (gather output row index in the lane dim), measured 91 ms
    vs ~1.5 ms per paste gather — 240 -> 144 img/s end to end. The cast
    traffic itself is ~0.1 GB/batch, microseconds.
    """
    out = dict(host)
    for k in _INGEST_F32_KEYS:
        out[k] = host[k].astype(jnp.float32)
    # lower_label_map in {0, 1/2, 1} * 255 from the {0,1,2} class plane
    out["label"] = host["label_cls"].astype(jnp.float32) * 127.5
    out.pop("label_cls")
    return out


def assemble_inputs_device(host: Dict[str, jnp.ndarray], mode: str,
                           tiled: bool = False, warp_impl: str = "auto",
                           cut_windowed: bool = False):
    """Device: warps + assembly -> generator input dict. Jit-traceable.

    tiled=True uses the fixed-tile paste path (4x less gather work); callers
    must have verified host["tiles_fit"] for every batch item.

    warp_impl: 'auto' (default) runs the cut/paste warps as one-hot MXU
    matmuls on TPU (ops/projective_warp.py — the pointwise gathers were 73%
    of the measured serving program) and gathers elsewhere; 'gather' forces
    the oracle path.

    Accepts either the raw uint8 host_prepare batch or the output of
    ingest_device (casts below are identities then). Production callers
    should ingest first — see ingest_device's layout note.
    """
    host = dict(host)
    for k in _INGEST_F32_KEYS:
        host[k] = host[k].astype(jnp.float32)
    if "label" not in host:
        host["label"] = host["label_cls"].astype(jnp.float32) * 127.5
    erode_k = 8 if mode == "upper" else 5
    if tiled:
        cut_kw = {}
        if cut_windowed and "cut_window_offsets" in host:
            cut_kw = dict(cut_window_offsets=host["cut_window_offsets"],
                          cut_window=CUT_WINDOW)
        norm = normalize_patches_device_tiled(
            host["upper_img"], host["lower_img"],
            host["upper_mask"], host["lower_mask"], host["sleeve"],
            host["upper_cut_m"], host["lower_cut_m"], host["paste_m_inv"],
            host["part_valid"], host["tile_offsets"], erode_k=erode_k,
            track_wo_sleeve=(mode == "upper"), warp_impl=warp_impl,
            **cut_kw)
    else:
        norm = normalize_patches_device(
            host["upper_img"], host["lower_img"],
            host["upper_mask"], host["lower_mask"], host["sleeve"],
            host["upper_cut_m"], host["lower_cut_m"], host["paste_m_inv"],
            host["part_valid"], erode_k=erode_k,
            track_wo_sleeve=(mode == "upper"), warp_impl=warp_impl)
    if mode in ("upper", "lower"):
        norm = _zero_conflicts(norm)
    norm = _mirror_sleeves(norm)

    denorm_upper = norm["denorm_upper_img"]
    denorm_lower = norm["denorm_lower_img"]
    bound = host["bound"]
    if mode == "upper":
        kept = (erode(host["lower_mask"], 8) >= 254.5).astype(jnp.float32)
        denorm_lower = host["lower_img"] * kept
        wo_sleeve_mask = (
            jnp.sum(norm["denorm_upper_img_wo_sleeve"], axis=-1,
                    keepdims=True) > 0).astype(jnp.float32)
        bound = zero_bound_above_mask_bottom(bound, wo_sleeve_mask)
    if mode == "lower":
        kept = (erode(host["upper_mask"], 8) >= 254.5).astype(jnp.float32)
        denorm_upper = host["upper_img"] * kept
    if mode == "full":
        denorm_lower_mask = (
            jnp.sum(denorm_lower, axis=-1, keepdims=True) > 0
        ).astype(jnp.float32)
        bound = bound_from_mask_top(denorm_lower_mask) * \
            host["dress_transfer"][:, None, None, None]

    norm01 = lambda x: x / 127.5 - 1.0
    image = norm01(host["image"])
    retain = image * host["retain_mask"] - (1 - host["retain_mask"])
    n = image.shape[0]
    skin = jnp.broadcast_to(
        norm01(host["skin_color"])[:, None, None, :], image.shape)
    return dict(
        z=jnp.zeros((n, 0)),
        c=jnp.concatenate(
            [norm01(norm["norm_img"]), norm01(norm["norm_img_lower"])],
            axis=-1),
        retain=jnp.concatenate([retain, skin], axis=-1),
        pose=jnp.concatenate(
            [norm01(host["pose"]), norm01(host["label"]),
             norm01(bound)], axis=-1),
        denorm_upper_input=norm01(denorm_upper),
        denorm_lower_input=norm01(denorm_lower),
        denorm_upper_mask=(
            jnp.sum(denorm_upper, axis=-1, keepdims=True) > 0
        ).astype(jnp.float32),
        denorm_lower_mask=(
            jnp.sum(denorm_lower, axis=-1, keepdims=True) > 0
        ).astype(jnp.float32),
    )


class TryonPipeline:
    """Batched serving pipeline: host_prepare -> one jitted device program
    (assemble + generator forward)."""

    def __init__(self, variables, mode="upper", model: Optional[Generator] = None,
                 noise_mode="const", warp_impl="auto"):
        self.model = model or Generator()
        self.variables = variables
        self.mode = mode
        self.noise_mode = noise_mode

        @functools.partial(jax.jit,
                           static_argnames=("tiled", "cut_windowed"))
        def _run(variables, host_batch, tiled=False, cut_windowed=False):
            inputs = assemble_inputs_device(
                host_batch, mode, tiled=tiled, warp_impl=warp_impl,
                cut_windowed=cut_windowed)
            img, finetune, parsing = self.model.apply(
                variables, noise_mode=noise_mode, **inputs)
            return finetune

        self._run = _run

    def prepare(self, person, clothes, use_sleeve_mask=True):
        return host_prepare(person, clothes, self.mode, use_sleeve_mask)

    def run_batch(self, host_items):
        # tiled / windowed fast paths when every item's quads fit
        tiled = all(bool(it["tiles_fit"]) for it in host_items)
        cut_windowed = tiled and all(
            bool(it.get("cut_fits", False)) for it in host_items)
        batch = {
            k: jnp.asarray(np.stack([it[k] for it in host_items]))
            for k in host_items[0] if k not in ("tiles_fit", "cut_fits")
        }
        # two-stage: uint8 transfer + boundary-pinning cast program, then
        # the main warp+forward program (see ingest_device).
        return self._run(self.variables, ingest_device(batch), tiled=tiled,
                         cut_windowed=cut_windowed)
