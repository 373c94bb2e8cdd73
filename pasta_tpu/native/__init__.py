"""Native (C++) host preprocessing plugin: threaded batch warp + erosion.

Build model mirrors the reference's runtime plugin builder
(torch_utils/custom_ops.py:46-124): compiled on first use with g++ into a
digest-keyed cache directory, loaded via ctypes. Falls back cleanly when no
toolchain is available — `available()` gates all call sites.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "warp.cpp")
_CACHE_DIR = os.path.expanduser(
    os.environ.get("PASTA_NATIVE_CACHE", "~/.cache/pasta_tpu"))

_lib = None
_lib_lock = threading.Lock()
_build_error: str | None = None


def _build():
    with open(_SRC, "rb") as f:
        src = f.read()
    digest = hashlib.md5(src).hexdigest()[:16]
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, f"pasta_native-{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
               _SRC, "-o", tmp, "-ljpeg", "-lpng"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)  # atomic: concurrent builders race safely
    return ctypes.CDLL(so_path)


def _get_lib():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    with _lib_lock:
        if _lib is None and _build_error is None:
            try:
                lib = _build()
                lib.pasta_warp_perspective_batch.argtypes = [
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
                lib.pasta_erode_batch.argtypes = [
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
                lib.pasta_decode_image.argtypes = [
                    ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
                    ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_void_p]
                lib.pasta_decode_image.restype = ctypes.c_int
                lib.pasta_decode_batch.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_void_p, ctypes.c_int]
                lib.pasta_native_version.restype = ctypes.c_int
                assert lib.pasta_native_version() == 2
                _lib = lib
            except Exception as e:  # toolchain missing, compile error, ...
                _build_error = str(e)
    return _lib


def available() -> bool:
    return _get_lib() is not None


def build_error():
    _get_lib()
    return _build_error


def warp_perspective_batch(src, matrices, out_h, out_w, num_threads=8):
    """Batched cv2-semantics perspective warp on uint8 images.

    Args:
        src:      [N, H, W, C] uint8 (C-contiguous).
        matrices: [N, 3, 3] float64 mapping OUTPUT pixel -> SOURCE pixel
                  (i.e. the inverse of the cv2.warpPerspective M argument).
    Returns [N, out_h, out_w, C] uint8.
    """
    lib = _get_lib()
    assert lib is not None, f"native plugin unavailable: {_build_error}"
    src = np.ascontiguousarray(src, np.uint8)
    matrices = np.ascontiguousarray(matrices, np.float64)
    n, h, w, c = src.shape
    assert matrices.shape == (n, 3, 3)
    dst = np.empty((n, out_h, out_w, c), np.uint8)
    lib.pasta_warp_perspective_batch(
        src.ctypes.data, n, h, w, c, matrices.ctypes.data, dst.ctypes.data,
        out_h, out_w, num_threads)
    return dst


def decode_image(data: bytes):
    """Decode JPEG/PNG bytes with PIL-equivalent channel semantics.

    Returns [H, W] uint8 for grayscale AND palette PNGs (index plane, like
    PIL 'P' mode), [H, W, C] for RGB/RGBA — i.e. what
    np.array(PIL.Image.open(...)) yields on the dataset's sidecars.
    Raises ValueError on undecodable input.
    """
    lib = _get_lib()
    assert lib is not None, f"native plugin unavailable: {_build_error}"
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.pasta_decode_image(buf.ctypes.data, len(data), None, 0,
                                ctypes.byref(h), ctypes.byref(w),
                                ctypes.byref(c))
    if rc != 0:
        raise ValueError(f"native decode failed (probe rc={rc})")
    dst = np.empty((h.value, w.value, c.value), np.uint8)
    rc = lib.pasta_decode_image(buf.ctypes.data, len(data), dst.ctypes.data,
                                dst.nbytes, ctypes.byref(h), ctypes.byref(w),
                                ctypes.byref(c))
    if rc != 0:
        raise ValueError(f"native decode failed (rc={rc})")
    return dst[..., 0] if c.value == 1 else dst


def decode_batch(blobs, h, w, c, num_threads=8):
    """Threaded batch decode of same-geometry images into [N, h, w, c] u8.

    Every blob must decode to exactly (h, w, c); raises ValueError listing
    the first failing index otherwise. This is the hot path for fixed-size
    dataset images (512x320 person JPEGs); threads run with the GIL
    released, unlike a PIL loop.
    """
    lib = _get_lib()
    assert lib is not None, f"native plugin unavailable: {_build_error}"
    n = len(blobs)
    arrs = [np.frombuffer(b, np.uint8) for b in blobs]
    ptrs = (ctypes.c_void_p * n)(*[a.ctypes.data for a in arrs])
    sizes = np.array([a.size for a in arrs], np.int64)
    dst = np.empty((n, h, w, c), np.uint8)
    rc = np.zeros(n, np.int32)
    lib.pasta_decode_batch(ptrs, sizes.ctypes.data, n, dst.ctypes.data,
                           h, w, c, rc.ctypes.data, num_threads)
    if rc.any():
        i = int(np.argmax(rc != 0))
        raise ValueError(f"native batch decode failed at {i} (rc={rc[i]})")
    return dst


def erode_batch(masks, k, num_threads=8):
    """Batched k x k erosion of [N, H, W] uint8 masks (cv2 border rules)."""
    lib = _get_lib()
    assert lib is not None, f"native plugin unavailable: {_build_error}"
    masks = np.ascontiguousarray(masks, np.uint8)
    n, h, w = masks.shape
    dst = np.empty_like(masks)
    lib.pasta_erode_batch(masks.ctypes.data, n, h, w, k, dst.ctypes.data,
                          num_threads)
    return dst
