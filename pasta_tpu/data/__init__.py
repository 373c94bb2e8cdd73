"""Data pipeline: keypoint geometry, garment patch warps, try-on datasets.

Host side (numpy/cv2): decode, keypoint JSON, pose rasterization, patch
normalization — semantics ported from the reference UvitonDataset classes
(/root/reference/training/dataset.py), with the three ~800-line copy-paste
test variants collapsed into one parameterized pipeline.

Device side (jax): batched perspective warps + erosion + compositing for the
serving path (device_warp.py).
"""

from .pose import load_keypoints, draw_pose, get_palm_mask
from .geometry import get_perspective_transform, get_crop_matrices
from .preprocess import preprocess_pair, load_person
from .testsets import TryonPairDataset
