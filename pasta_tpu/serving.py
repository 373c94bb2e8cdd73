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

from .data import device_cond as dc
from .data import preprocess as pp
from .data.device_warp import (
    normalize_patches_device, normalize_patches_device_tiled,
    host_matrices_for_pair, erode, bound_from_mask_top,
    zero_bound_above_mask_bottom, paste_tile_layout, cut_window_layout,
    part_layouts_for_pair,
    mirror_sleeves_device as _mirror_sleeves,
    zero_conflicts_device as _zero_conflicts,
    CUT_WINDOW, LOWER_PARTS)
from .models import Generator


def host_prepare(person, clothes, mode, use_sleeve_mask=True, cond="host"):
    """Host side: masks, scalars, homographies. Returns a dict of small
    numpy arrays (everything heavy stays un-warped full-res images).

    cond="device" defers the person-conditioning rasters (pose stick
    figure, palm/retain masks, skin median — data/device_cond.py) to the
    device ingest program: the dict then carries the raw parsing plane and
    the pose/palm scalar params instead of pose/retain_mask/skin_color.
    Requires `person` loaded with pose_raster="device"."""
    assert mode in ("full", "upper", "lower")
    assert cond in ("host", "device")
    if cond == "device" and person.pose_params is None:
        raise ValueError(
            "host_prepare(cond='device') needs load_person("
            "pose_raster='device') records (pose_params missing)")
    # Garment-class disambiguation as label ROUTING (one bincount per
    # parsing; garment_class_routing == garment_class_masks by counts), so
    # the big masks never materialize on host in device mode.
    person_rt = pp.garment_class_routing(person.parsing)
    clothes_rt = pp.garment_class_routing(clothes.parsing)

    if mode == "full":
        upper_src, lower_src = clothes, clothes
        upper_rt, lower_rt = clothes_rt, clothes_rt
    elif mode == "upper":
        upper_src, lower_src = clothes, person
        upper_rt, lower_rt = clothes_rt, person_rt
    else:
        upper_src, lower_src = person, clothes
        upper_rt, lower_rt = person_rt, clothes_rt

    upper_labels = upper_rt["tops"][0] | upper_rt["dresses"][0]
    lower_labels = lower_rt["skirt"][0] | lower_rt["pants"][0]
    dress_transfer = False
    if mode == "upper" and clothes_rt["dresses"][1] > 0:
        lower_labels = frozenset()
        dress_transfer = True
    if mode == "lower" and person_rt["dresses"][1] > 0:
        lower_labels = frozenset()
        dress_transfer = True

    sleeve_src = person if mode == "lower" else clothes
    sleeve_gp = (sleeve_src.garment_parsing
                 if use_sleeve_mask else None)

    mu, ml, pinv, valid, pfwd = host_matrices_for_pair(
        upper_src.keypoints, lower_src.keypoints, person.keypoints,
        return_paste_fwd=True)
    tile_offsets, tiles_fit, cut_window_offsets, cut_fits = \
        part_layouts_for_pair(mu, ml, pinv, valid, pfwd)

    # Host-side conditioning scalars (keypoint/bbox logic, preprocess_pair
    # parity). The warp-dependent parts of the bound (upper garment bottom,
    # full-mode composite top) are finished on device. bound[ub:] slice
    # semantics normalized to a start row (negative ub wraps like a python
    # slice; >= canvas height -> empty).
    res = person.parsing.shape[0]
    bound_row = res
    if mode == "upper":
        lower_bbox = pp.bbox_of_labels(lower_src.parsing, lower_labels)
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
            bound_row = ub if ub >= 0 else max(res + ub, 0)
    elif mode == "lower":
        lower_bbox = pp.bbox_of_labels(
            person.parsing,
            person_rt["skirt"][0] | person_rt["pants"][0])
        if lower_bbox is not None:
            bound_row = lower_bbox[1]
    # full mode: bound built on device from the composite (unless dress)

    # Lower-garment class label map (preprocess_pair parity).
    if mode == "upper":
        pants_n, skirt_n = lower_rt["pants"][1], lower_rt["skirt"][1]
        dress_n = clothes_rt["dresses"][1]
    elif mode == "lower":
        pants_n, skirt_n = lower_rt["pants"][1], lower_rt["skirt"][1]
        dress_n = person_rt["dresses"][1]
    else:
        pants_n, skirt_n, dress_n = (
            clothes_rt["pants"][1], clothes_rt["skirt"][1],
            clothes_rt["dresses"][1])
    if dress_transfer:
        pants_n = skirt_n = 0
    if pants_n > 0:
        cls = 0
    elif skirt_n > 0:
        cls = 1
    elif dress_n > 0:
        cls = 2
    else:
        cls = 1

    common = dict(
        upper_cut_m=mu, lower_cut_m=ml, paste_m_inv=pinv, part_valid=valid,
        image=person.image,                                         # u8
        # distinguishes host sleeve_mask=None (garment unrouted) from a
        # present-but-empty sleeve mask — see device_warp._cut_src_stack
        sleeve_valid=np.asarray(
            1.0 if sleeve_gp is not None else 0.0, np.float32),
        tile_offsets=tile_offsets,
        tiles_fit=np.asarray(tiles_fit),
        cut_window_offsets=cut_window_offsets,
        cut_fits=np.asarray(cut_fits),
        dress_transfer=np.asarray(
            0.0 if (mode == "full" and clothes_rt["dresses"][1] > 0)
            else 1.0, np.float32),
    )

    if cond == "device":
        # Lean shipping: raw u8 planes + per-item routing LUTs and scalar
        # rows; every mask/multiply/raster happens in the device ingest
        # program (compute_device_cond).
        return dict(
            **common,
            parsing=person.parsing.astype(np.uint8, copy=False),                # u8
            upper_src_image=upper_src.image,                        # u8
            lower_src_image=lower_src.image,                        # u8
            upper_src_parsing=upper_src.parsing.astype(np.uint8, copy=False),   # u8
            lower_src_parsing=lower_src.parsing.astype(np.uint8, copy=False),   # u8
            upper_lut=pp.label_lut(upper_labels),                   # [256] u8
            lower_lut=pp.label_lut(lower_labels),                   # [256] u8
            sleeve_parsing=(
                sleeve_gp.astype(np.uint8, copy=False) if sleeve_gp is not None
                else np.zeros_like(person.parsing, np.uint8)),      # u8
            label_cls=np.asarray(cls, np.uint8),                    # scalar
            bound_row=np.asarray(bound_row, np.int32),              # scalar
            **{k: np.asarray(v) for k, v in person.pose_params.items()},
            **{k: np.asarray(v)
               for k, v in dc.palm_device_params(person.keypoints).items()},
        )

    # Host path (reference-parity oracle): materialize the masks from the
    # routing LUTs (identical to garment_class_masks unions) and rasterize
    # the conditioning on host. Everything big ships as uint8 (4x less host
    # work + transfer than f32; the device program casts). skin is the [3]
    # median color, broadcast on device instead of materializing a
    # [H, W, 3] map per item on host.
    upper_mask = pp.label_lut(upper_labels)[upper_src.parsing]
    lower_mask = pp.label_lut(lower_labels)[lower_src.parsing]
    sleeve = pp.sleeve_mask_from(sleeve_src) if use_sleeve_mask else None
    bound = np.zeros((res, res, 1), np.uint8)
    bound[bound_row:, ...] = 255
    return dict(
        **common,
        upper_img=upper_mask * upper_src.image,                     # u8
        lower_img=lower_mask * lower_src.image,                     # u8
        upper_mask=upper_mask * np.uint8(255),                      # u8
        lower_mask=lower_mask * np.uint8(255),                      # u8
        sleeve=(sleeve if sleeve is not None
                else np.zeros_like(upper_mask)),                    # u8 {0,1}
        pose=person.pose_img,                                       # u8
        retain_mask=pp.retain_mask_of(person),                      # u8 {0,1}
        skin_color=np.asarray(
            pp.skin_median_color(person.image, person.parsing),
            np.float32),
        label_cls=np.full((res, res, 1), cls, np.uint8),            # u8
        bound=bound,                                                # u8 {0,255}
    )


_INGEST_F32_KEYS = ("upper_img", "lower_img", "upper_mask", "lower_mask",
                    "sleeve", "image", "pose", "retain_mask", "bound")

_DEVICE_COND_KEYS = ("parsing", "limb_pts", "limb_valid", "joint_pts",
                     "joint_valid", "pose_xlim", "palm_quads", "palm_valid")



def compute_device_cond(host: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Device conditioning: raw parsing/image planes + scalar params ->
    every host-mode conditioning array (pose, retain_mask, skin_color,
    masked garment streams, label/bound planes).

    Jit-traceable twin of host_prepare's host branch — see
    data/device_cond.py for the raster/reduce numerics. Per-item label
    LUTs are evaluated as comparisons over the five garment source labels
    (a 512^2 index gather would be scalar-bound on TPU)."""
    out = dict(host)
    parsing = out.pop("parsing")
    pose = dc.draw_pose_device(
        out.pop("limb_pts"), out.pop("limb_valid"),
        out.pop("joint_pts"), out.pop("joint_valid"), out.pop("pose_xlim"))
    palm = dc.palm_mask_device(
        out.pop("palm_quads"), out.pop("palm_valid"), parsing)
    out["pose"] = pose
    out["retain_mask"] = dc.retain_mask_device(parsing, palm)
    out["skin_color"] = dc.skin_median_device(host["image"], parsing)

    up = dc.garment_lut_mask(
        out.pop("upper_lut"), out.pop("upper_src_parsing"))
    low = dc.garment_lut_mask(
        out.pop("lower_lut"), out.pop("lower_src_parsing"))
    out["upper_img"] = up * out.pop("upper_src_image").astype(jnp.float32)
    out["lower_img"] = low * out.pop("lower_src_image").astype(jnp.float32)
    out["upper_mask"] = up * 255.0
    out["lower_mask"] = low * 255.0
    gp = out.pop("sleeve_parsing")
    out["sleeve"] = ((gp == 10) | (gp == 11)).astype(jnp.float32)

    b, h = parsing.shape[0], parsing.shape[1]
    cls = out.pop("label_cls").astype(jnp.float32)
    out["label"] = jnp.broadcast_to(
        (cls * 127.5)[:, None, None, None], (b, h, h, 1))
    row = out.pop("bound_row")
    yy = jax.lax.broadcasted_iota(jnp.int32, (h,), 0)
    out["bound"] = jnp.broadcast_to(
        ((yy[None, :] >= row[:, None]).astype(jnp.float32)
         * 255.0)[:, :, None, None], (b, h, h, 1))
    return out


@jax.jit
def ingest_device(host: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Stage-1 device program: uint8 host arrays -> f32 model inputs.

    Runs as its OWN jit so the f32 outputs land in default layouts at the
    program boundary. Folding these casts into the main serving program lets
    XLA's layout assignment propagate transposed layouts into the paste/cut
    warp gathers (gather output row index in the lane dim), measured 91 ms
    vs ~1.5 ms per paste gather — 240 -> 144 img/s end to end. The cast
    traffic itself is ~0.1 GB/batch, microseconds.

    When the batch carries host_prepare(cond="device") keys, the person
    conditioning (pose raster, palm/retain masks, skin median) is computed
    here too — same program-boundary layout argument.
    """
    out = dict(host)
    if "parsing" in out:
        out = compute_device_cond(out)
    for k in _INGEST_F32_KEYS:
        out[k] = out[k].astype(jnp.float32)
    # lower_label_map in {0, 1/2, 1} * 255 from the {0,1,2} class plane
    if "label" not in out:
        out["label"] = out["label_cls"].astype(jnp.float32) * 127.5
    out.pop("label_cls", None)
    return out


def assemble_inputs_device(host: Dict[str, jnp.ndarray], mode: str,
                           tiled: bool = False, warp_impl: str = "auto",
                           cut_windowed: bool = False):
    """Device: warps + assembly -> generator input dict. Jit-traceable.

    tiled=True uses the fixed-tile paste path (4x less gather work); callers
    must have verified host["tiles_fit"] for every batch item.

    warp_impl: 'auto' (default) runs the cut/paste warps as one-hot MXU
    matmuls with bf16 weights on TPU (ops/projective_warp.py — the pointwise
    gathers were 73% of the measured serving program; bf16 weights halve the
    W-matrix traffic, measured 55 vs 51.5 img/s/chip at batch 8) and gathers
    elsewhere; 'matmul' forces f32 weights, 'gather' forces the oracle path.

    Accepts either the raw uint8 host_prepare batch or the output of
    ingest_device (casts below are identities then). Production callers
    should ingest first — see ingest_device's layout note.
    """
    host = dict(host)
    if "parsing" in host:
        host = compute_device_cond(host)
    for k in _INGEST_F32_KEYS:
        host[k] = host[k].astype(jnp.float32)
    if "label" not in host:
        host["label"] = host["label_cls"].astype(jnp.float32) * 127.5

    from .shapes import assert_batch_shapes

    res = host["image"].shape[1]
    # Trace-time input contracts (reference misc.assert_shape style): a
    # transposed or mis-stacked host array fails here by name instead of
    # deep inside the warp program.
    assert_batch_shapes(host, {
        "image": (None, res, res, 3), "pose": (None, res, res, 3),
        "upper_img": (None, res, res, 3), "lower_img": (None, res, res, 3),
        "upper_mask": (None, res, res, 1), "lower_mask": (None, res, res, 1),
        "sleeve": (None, res, res, 1),
        "retain_mask": (None, res, res, 1), "bound": (None, res, res, 1),
        "upper_cut_m": (None, None, 3, 3), "lower_cut_m": (None, None, 3, 3),
        "paste_m_inv": (None, None, 3, 3), "skin_color": (None, 3),
    }, name="host")
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
            sleeve_valid=host.get("sleeve_valid"), **cut_kw)
    else:
        norm = normalize_patches_device(
            host["upper_img"], host["lower_img"],
            host["upper_mask"], host["lower_mask"], host["sleeve"],
            host["upper_cut_m"], host["lower_cut_m"], host["paste_m_inv"],
            host["part_valid"], erode_k=erode_k,
            track_wo_sleeve=(mode == "upper"), warp_impl=warp_impl,
            sleeve_valid=host.get("sleeve_valid"))
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
    (assemble + generator forward).

    Pass `mesh` (a 1-axis jax.sharding.Mesh) for multi-chip serving: the
    batch shards over the mesh axis and the generator weights replicate —
    serving is per-item parallel (no cross-batch ops), so jit scales it
    across the mesh with zero collectives in the program. Batch size must
    be a multiple of the mesh size.
    """

    def __init__(self, variables, mode="upper", model: Optional[Generator] = None,
                 noise_mode="const", warp_impl="auto", cond="host",
                 mesh=None, seed=0):
        self.model = model or Generator()
        self.variables = variables
        self.mode = mode
        self.noise_mode = noise_mode
        self.cond = cond
        self.mesh = mesh
        self._noise_key = jax.random.PRNGKey(seed)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._batch_sharding = NamedSharding(
                mesh, PartitionSpec(mesh.axis_names[0]))
            self.variables = jax.device_put(
                variables, NamedSharding(mesh, PartitionSpec()))

        @functools.partial(jax.jit,
                           static_argnames=("tiled", "cut_windowed"))
        def _run(variables, host_batch, noise_key, tiled=False,
                 cut_windowed=False):
            inputs = assemble_inputs_device(
                host_batch, mode, tiled=tiled, warp_impl=warp_impl,
                cut_windowed=cut_windowed)
            rngs = {"noise": noise_key} if noise_mode == "random" else None
            img, finetune, parsing = self.model.apply(
                variables, rngs=rngs, noise_mode=noise_mode, **inputs)
            return finetune

        self._run = _run

    def prepare(self, person, clothes, use_sleeve_mask=True):
        return host_prepare(person, clothes, self.mode, use_sleeve_mask,
                            cond=self.cond)

    def run_batch(self, host_items):
        # tiled / windowed fast paths when every item's quads fit
        tiled = all(bool(it["tiles_fit"]) for it in host_items)
        cut_windowed = tiled and all(
            bool(it.get("cut_fits", False)) for it in host_items)
        batch = {
            k: jnp.asarray(np.stack([it[k] for it in host_items]))
            for k in host_items[0] if k not in ("tiles_fit", "cut_fits")
        }
        if self.mesh is not None:
            assert len(host_items) % self.mesh.size == 0, (
                f"batch {len(host_items)} not divisible by mesh size "
                f"{self.mesh.size}")
            batch = {k: jax.device_put(v, self._batch_sharding)
                     for k, v in batch.items()}
        self._noise_key, sub = jax.random.split(self._noise_key)
        # two-stage: uint8 transfer + boundary-pinning cast program, then
        # the main warp+forward program (see ingest_device).
        return self._run(self.variables, ingest_device(batch), sub,
                         tiled=tiled, cut_windowed=cut_windowed)

    def run_stream(self, root, pairs, batch_size=8, use_sleeve_mask=True,
                   num_workers=8, prefetch=2):
        """Overlapped streaming serving over (person_name, clothes_name)
        pairs from a data root.

        Host prep (decode + host_prepare) for the next `prefetch` batches
        runs on a thread pool while the device executes the current batch;
        device outputs are fetched one batch late so jax's async dispatch
        overlaps with the next batch's upload. Yields
        (pairs_chunk, outputs [len(chunk), H, W, 3] np.float32) in order.
        The tail batch is padded to `batch_size` (one compiled program).
        """
        import collections
        import concurrent.futures

        pose_raster = "device" if self.cond == "device" else "host"
        sleeve_for = "person" if self.mode == "lower" else "clothes"

        def prep(pair):
            pn, cn = pair
            person = pp.load_person(
                root, pn, pose_raster=pose_raster,
                with_garment_parsing=(use_sleeve_mask
                                      and sleeve_for == "person"))
            # host_prepare never reads the clothes pose image; the device
            # raster mode skips that per-pair host raster (scalars only)
            clothes = pp.load_person(
                root, cn, pose_raster="device",
                with_garment_parsing=(use_sleeve_mask
                                      and sleeve_for == "clothes"))
            return self.prepare(person, clothes, use_sleeve_mask)

        prefetch = max(1, prefetch)
        pairs = list(pairs)
        chunks = [pairs[i:i + batch_size]
                  for i in range(0, len(pairs), batch_size)]
        with concurrent.futures.ThreadPoolExecutor(num_workers) as pool:
            inflight = collections.deque(
                (c, [pool.submit(prep, p) for p in c])
                for c in chunks[:prefetch])
            next_chunk = prefetch
            pending = None
            while inflight:
                chunk, futs = inflight.popleft()
                items = [f.result() for f in futs]
                while len(items) < batch_size:
                    items.append(items[-1])
                out = self.run_batch(items)      # async dispatch
                if next_chunk < len(chunks):
                    c = chunks[next_chunk]
                    inflight.append((c, [pool.submit(prep, p) for p in c]))
                    next_chunk += 1
                if pending is not None:
                    pc, po = pending
                    yield pc, np.asarray(po)[:len(pc)]
                pending = (chunk, out)
            if pending is not None:
                pc, po = pending
                yield pc, np.asarray(po)[:len(pc)]
