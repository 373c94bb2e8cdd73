"""Import reference torch weights into pasta_tpu flax variable trees.

The reference checkpoints are NCHW/OIHW torch modules
(GeneratorFull_v20 / Discriminator, /root/reference/training/networks.py).
Import = pure name mapping + layout transform:

  * conv weights  [O, I, kh, kw] -> [kh, kw, I, O]   (OIHW -> HWIO)
  * torch nn.Linear inside `Dense` ('linear.weight' [O, I]) -> flax
    nn.Dense kernel [I, O] (+ rename weight->kernel)
  * FullyConnectedLayer weights stay [O, I] (our layer stores torch layout)
  * the D-epilogue `fc` over flattened 4x4 features is permuted from the
    torch C-major (NCHW) flatten order to our HWC order
  * buffers (noise_const, w_avg) -> the 'buffers' collection
  * resample_filter buffers are dropped (recomputed constants)

Works on a {torch_key: np.ndarray} state dict; use `state_dict_to_numpy`
to produce one from a live torch module without keeping torch at runtime.
"""

from __future__ import annotations

import re
from typing import Dict, Any, Tuple

import numpy as np

# torch containers whose children are named by index ("model.0", ...); the
# flax side keeps the joined name as a single module key.
_SEQ_PREFIXES = ("model", "feat_enc", "spade_encoder")

_BUFFER_LEAVES = ("noise_const", "w_avg")


def state_dict_to_numpy(module) -> Dict[str, np.ndarray]:
    """torch module -> {key: float32 numpy} (test/converter helper)."""
    return {
        k: np.asarray(v.detach().cpu().numpy())
        for k, v in module.state_dict().items()
    }


def torch_key_to_flax_path(key: str) -> Tuple[Tuple[str, ...], str]:
    """Map a torch state-dict key to (flax path, collection).

    Returns ((...path segments..., leaf_name), 'params'|'buffers'), or
    (None, 'drop') for buffers that are recomputed on our side.
    """
    parts = key.split(".")
    merged = []
    i = 0
    while i < len(parts):
        if parts[i] in _SEQ_PREFIXES and i + 1 < len(parts) and parts[i + 1].isdigit():
            merged.append(parts[i] + "." + parts[i + 1])
            i += 2
        else:
            merged.append(parts[i])
            i += 1
    leaf = merged[-1]
    if leaf in ("resample_filter", "mask_weight"):
        return None, "drop"
    if leaf == "const":
        # Dead param: the reference's first synthesis block allocates a
        # learned const but feeds pose features instead (networks.py:2156-2161).
        return None, "drop"
    collection = "buffers" if leaf in _BUFFER_LEAVES else "params"
    # torch nn.Linear inside Dense -> flax nn.Dense naming
    if len(merged) >= 2 and merged[-2] == "linear":
        merged = merged[:-1] + [{"weight": "kernel", "bias": "bias"}[leaf]]
    return tuple(merged), collection


_EPILOGUE_RESOLUTION = 4  # DiscriminatorEpilogue always sits at 4x4


def _transform_leaf(path: Tuple[str, ...], value: np.ndarray,
                    permute_epilogue_fc: bool) -> np.ndarray:
    value = np.asarray(value)
    leaf = path[-1]
    if leaf == "kernel":  # Dense linear: [O, I] -> [I, O]
        return value.T
    if leaf in ("weight", "m_weight1", "m_weight2") and value.ndim == 4:
        return value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    if (
        permute_epilogue_fc
        and leaf == "weight"
        and value.ndim == 2
        and len(path) >= 3
        and path[-3] == "b4"
        and path[-2] == "fc"
    ):
        # D epilogue fc: torch flattens NCHW ([C,4,4] C-major); ours flattens
        # NHWC. Channel count is derived from the weight shape itself.
        out_f, in_f = value.shape
        side = _EPILOGUE_RESOLUTION
        c, rem = divmod(in_f, side * side)
        if rem != 0:
            raise ValueError(
                f"epilogue fc weight has in_features={in_f}, not divisible "
                f"by {side}x{side}")
        w = value.reshape(out_f, c, side, side)
        w = w.transpose(0, 2, 3, 1)  # [O, H, W, C]
        return w.reshape(out_f, in_f)
    return value


def _insert(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for seg in path[:-1]:
        node = node.setdefault(seg, {})
    node[path[-1]] = value


def _import_state(
    state: Dict[str, np.ndarray], permute_epilogue_fc: bool
) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    buffers: Dict[str, Any] = {}
    for key, value in state.items():
        path, collection = torch_key_to_flax_path(key)
        if collection == "drop":
            continue
        value = _transform_leaf(path, value, permute_epilogue_fc)
        _insert(params if collection == "params" else buffers, path, value)
    out = {"params": params}
    if buffers:
        out["buffers"] = buffers
    return out


def import_generator_state(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference GeneratorFull_v20 state dict -> flax variables dict."""
    return _import_state(state, permute_epilogue_fc=False)


def import_discriminator_state(
    state: Dict[str, np.ndarray], epilogue_channels: int | None = None
) -> Dict[str, Any]:
    """Reference Discriminator state dict -> flax variables dict.

    The flattened-fc permutation channel count is derived from the weight
    shape; `epilogue_channels` is accepted for backward compatibility and
    ignored.
    """
    del epilogue_channels
    return _import_state(state, permute_epilogue_fc=True)
