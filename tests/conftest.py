"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count) — the TPU-native replacement for the
reference's "multi-GPU without a cluster" gap (it had none; SURVEY.md §4).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

import pytest

# The container's sitecustomize imports jax (registering the TPU backend)
# before conftest runs, so the env vars above are too late for jax's config
# defaults — override the live config as well. Backends are created lazily,
# so this still takes effect as long as no array op ran yet.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by CPU jit compiles
# (one core here); repeat runs reuse compiled executables from disk. The
# min-entry-size/min-compile-time gates are lowered so small test programs
# cache too.
_cache_dir = os.environ.get(
    "PASTA_TEST_CACHE", os.path.join(os.path.dirname(__file__),
                                     ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REFERENCE_ROOT = "/root/reference"


def has_reference():
    return os.path.isdir(REFERENCE_ROOT)


@pytest.fixture(scope="session")
def ref_networks():
    """Import reference training.networks on CPU (oracle for model parity).

    Works around two reference import-time bugs (SURVEY.md §2):
    is_custom_kernel_supported crashes on CPU-only torch, and
    util_functions loads human_colormap.mat cwd-relative.
    """
    if not has_reference():
        pytest.skip("reference repo not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import torch

    if torch.version.cuda is None:
        torch.version.cuda = "0.0"
    cwd = os.getcwd()
    os.chdir(REFERENCE_ROOT)
    try:
        from training import networks
    finally:
        os.chdir(cwd)
    return networks


@pytest.fixture(scope="session")
def torch_ref():
    """Import the reference torch implementation as a numerical oracle.

    The reference repo is used read-only, for golden numerics in tests only —
    it is never shipped as part of this framework.
    """
    if not has_reference():
        pytest.skip("reference repo not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import torch  # noqa: F401

    from torch_utils.ops import upfirdn2d, bias_act, conv2d_resample

    class Ref:
        pass

    ref = Ref()
    ref.upfirdn2d = upfirdn2d
    ref.bias_act = bias_act
    ref.conv2d_resample = conv2d_resample
    return ref
