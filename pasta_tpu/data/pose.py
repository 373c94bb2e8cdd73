"""OpenPose-18 keypoint utilities: stick-figure rasterization, palm masks.

Behavioral parity targets (/root/reference/training/dataset.py):
  limbseq / kptcolors      — dataset.py:44-52
  get_joints               — dataset.py:815-823 (draws at (512, 320), then
                             the caller pads to 512^2 and shifts x)
  draw_pose_from_cords     — dataset.py:779-813 (cv2 5px limb lines + radius-5
                             joint disks; knees/ankles near borders are
                             invalidated in-place)
  get_hand_mask / get_palm — dataset.py:705-775 + training/utils.py:10-75
                             (pycocotools polygon rasterization replaced by a
                             vectorized half-plane point-in-quad test)
"""

from __future__ import annotations

import json
import math

import cv2
import numpy as np

# Limb connectivity (1-based OpenPose indices) and per-limb/joint colors.
LIMB_SEQ = [
    [2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
    [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
    [1, 16], [16, 18], [3, 17], [6, 18],
]
KPT_COLORS = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85], [255, 0, 0],
]

# Joint order used by the patch geometry (dataset.py:1033-1035).
JOINT_ORDER = [
    "cnose", "cneck", "rshoulder", "relbow", "rwrist", "lshoulder",
    "lelbow", "lwrist", "rhip", "rknee", "rankle", "lhip", "lknee",
    "lankle", "reye", "leye", "rear", "lear",
]


def _disk_coords(cx_row, cy_col, radius, shape):
    """Filled-circle pixel coords, replacing skimage.draw.circle (which the
    reference pins to skimage<=0.18; README.md:16)."""
    h, w = shape[:2]
    r0 = max(int(math.floor(cx_row - radius)), 0)
    r1 = min(int(math.ceil(cx_row + radius)) + 1, h)
    c0 = max(int(math.floor(cy_col - radius)), 0)
    c1 = min(int(math.ceil(cy_col + radius)) + 1, w)
    if r0 >= r1 or c0 >= c1:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    rr, cc = np.mgrid[r0:r1, c0:c1]
    keep = (rr - cx_row) ** 2 + (cc - cy_col) ** 2 < radius ** 2
    return rr[keep], cc[keep]


def draw_pose(pose_joints, img_size=(512, 320), radius=5, draw_limbs=True):
    """Rasterize an OpenPose skeleton to an RGB uint8 image.

    Mutates `pose_joints` like the reference: knee/ankle joints hugging the
    border get confidence 0.01 (so downstream get_crop treats them invalid).

    Args:
        pose_joints: [18, 3] float array (x, y, confidence). MUTATED.
        img_size:    (H, W).

    Returns:
        (colors [H, W, 3] uint8, pose_joints).
    """
    colors = np.zeros(tuple(img_size) + (3,), dtype=np.uint8)
    if draw_limbs:
        for i, (f1, t1) in enumerate(LIMB_SEQ):
            f, t = f1 - 1, t1 - 1
            if pose_joints[f][2] < 0.05 or pose_joints[t][2] < 0.05:
                continue
            p_from = (int(pose_joints[f][0]), int(pose_joints[f][1]))
            p_to = (int(pose_joints[t][0]), int(pose_joints[t][1]))
            cv2.line(colors, p_from, p_to, KPT_COLORS[i], 5)

    for i, joint in enumerate(pose_joints):
        if pose_joints[i][2] < 0.05:
            continue
        if i in (9, 10, 12, 13):  # knees/ankles near borders -> invalidate
            if (
                pose_joints[i][0] <= 0
                or pose_joints[i][1] <= 0
                or pose_joints[i][0] >= img_size[1] - 50
                or pose_joints[i][1] >= img_size[0] - 50
            ):
                pose_joints[i][2] = 0.01
                continue
        rr, cc = _disk_coords(int(joint[1]), int(joint[0]), radius, img_size)
        colors[rr, cc] = KPT_COLORS[i]
    return colors, pose_joints


def load_keypoints(path, img_size=(512, 320)):
    """Load an OpenPose JSON (path or file-like) and rasterize the skeleton.

    Returns (pose_img [H, W, 3] uint8, keypoints [18, 3]).
    """
    if hasattr(path, "read"):
        data = json.load(path)
    else:
        with open(path, "r") as f:
            data = json.load(f)
    if len(data["people"]) == 0:
        keypoints = np.zeros((18, 3))
    else:
        keypoints = np.array(
            data["people"][0]["pose_keypoints_2d"]).reshape(-1, 3)
    pose_img, keypoints = draw_pose(keypoints, img_size)
    return pose_img, keypoints


def _fill_quad(quad_xy, shape):
    """Rasterize a convex quad given as [(x, y)] * 4 in winding order.

    Replaces the reference's pycocotools frPyObjects/merge/decode path
    (training/utils.py:10-15). COCO RLE uses a half-open polygon fill; a
    half-plane test agrees except on boundary pixels — immaterial here since
    every consumer dilates by >= 20px afterwards.
    """
    h, w = shape
    xs = quad_xy[:, 0]
    ys = quad_xy[:, 1]
    c0 = max(int(np.floor(xs.min())), 0)
    c1 = min(int(np.ceil(xs.max())) + 1, w)
    r0 = max(int(np.floor(ys.min())), 0)
    r1 = min(int(np.ceil(ys.max())) + 1, h)
    mask = np.zeros((h, w, 1), np.float32)
    if r0 >= r1 or c0 >= c1:
        return mask
    rr, cc = np.mgrid[r0:r1, c0:c1]
    inside = np.ones(rr.shape, bool)
    sign = 0.0
    for i in range(4):
        x0, y0 = quad_xy[i]
        x1, y1 = quad_xy[(i + 1) % 4]
        cross = (x1 - x0) * (rr - y0) - (y1 - y0) * (cc - x0)
        if sign == 0.0 and np.any(cross != 0):
            sign = 1.0 if cross.mean() >= 0 else -1.0
        inside &= (cross * sign) >= 0
    mask[r0:r1, c0:c1, 0] = inside.astype(np.float32)
    return mask


def _rectangle_mask(a, b, c, d, img_h, img_w):
    """Oriented rectangle around the segment (a,b)->(c,d), reference
    get_rectangle_mask (dataset.py:705-729). Returns {0,255} float mask."""
    x1, y1 = a + (b - d) / 4, b + (c - a) / 4
    x2, y2 = a - (b - d) / 4, b - (c - a) / 4
    x3, y3 = c + (b - d) / 4, d + (c - a) / 4
    x4, y4 = c - (b - d) / 4, d - (c - a) / 4

    v0 = np.array([c - a, d - b], np.float64)
    v1 = np.array([x3 - x1, y3 - y1], np.float64)
    v2 = np.array([x4 - x1, y4 - y1], np.float64)

    def _cos(u, v):
        den = np.linalg.norm(u) * np.linalg.norm(v)
        return float(u @ v / den) if den > 0 else 0.0

    if _cos(v0, v1) < _cos(v0, v2):
        quad = np.array([[x1, y1], [x2, y2], [x3, y3], [x4, y4]], np.float64)
    else:
        quad = np.array([[x1, y1], [x2, y2], [x4, y4], [x3, y3]], np.float64)
    return _fill_quad(quad, (img_h, img_w)) * 255.0


def _hand_region_masks(hand_keypoints, img_h=512, img_w=512):
    """(upper-arm mask, forearm mask) from shoulder/elbow/wrist keypoints.

    Reference get_hand_mask (dataset.py:732-751): dilate 35x35 / 28x28.
    """
    s_x, s_y, s_c = hand_keypoints[0]
    e_x, e_y, e_c = hand_keypoints[1]
    w_x, w_y, w_c = hand_keypoints[2]
    up_mask = np.ones((img_h, img_w, 1), np.float32)
    bottom_mask = np.ones((img_h, img_w, 1), np.float32)
    if s_c > 0.1 and e_c > 0.1:
        up_mask = _rectangle_mask(s_x, s_y, e_x, e_y, img_h, img_w)
        up_mask = cv2.dilate(up_mask, np.ones((35, 35), np.uint8), iterations=1)
        up_mask = (up_mask > 0).astype(np.float32)[..., np.newaxis]
    if e_c > 0.1 and w_c > 0.1:
        bottom_mask = _rectangle_mask(e_x, e_y, w_x, w_y, img_h, img_w)
        bottom_mask = cv2.dilate(bottom_mask, np.ones((28, 28), np.uint8),
                                 iterations=1)
        bottom_mask = (bottom_mask > 0).astype(np.float32)[..., np.newaxis]
    return up_mask, bottom_mask


def _palm_from_hand(hand_mask, up_mask, bottom_mask):
    """hand parsing minus arm regions (reference get_palm_mask,
    dataset.py:753-759)."""
    inter_up = ((hand_mask + up_mask) == 2).astype(np.float32)
    hand_mask = hand_mask - inter_up
    inter_bottom = ((hand_mask + bottom_mask) == 2).astype(np.float32)
    return hand_mask - inter_bottom


def get_palm_mask(keypoints, parsing):
    """Palm region: hand parsing labels (14/15) minus dilated arm rectangles.

    Reference get_palm (dataset.py:761-775).

    Args:
        keypoints: [18, 3] in padded-image coordinates.
        parsing:   [H, W, 1] integer parsing map.

    Returns:
        [H, W, 1] uint8 mask.
    """
    left_kps = keypoints[[5, 6, 7], :].copy()
    right_kps = keypoints[[2, 3, 4], :].copy()
    l_up, l_bottom = _hand_region_masks(left_kps)
    r_up, r_bottom = _hand_region_masks(right_kps)
    left_hand = (parsing == 14).astype(np.float32)
    right_hand = (parsing == 15).astype(np.float32)
    left_palm = _palm_from_hand(left_hand, l_up, l_bottom)
    right_palm = _palm_from_hand(right_hand, r_up, r_bottom)
    return ((left_palm + right_palm) > 0).astype(np.uint8)
