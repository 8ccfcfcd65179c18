"""ctypes bindings for the native (C++) input-pipeline kernels.

``csrc/ray_gather.cpp`` implements the per-step ray-batch assembly
(the hot loop of :func:`avr_tpu.data.sampling.gather_rays`) with scene-
parallel threads, plus the uint8 -> [-1,1] image decode.  The library is
built on demand with the repo Makefile (``make -C csrc``); every entry
point has an exact-parity numpy fallback so the framework works without a
toolchain.

RNG (ray-index sampling) stays in numpy on the Python side so the native
and fallback paths produce bit-identical batches for the same seed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = ["load_native", "native_available", "gather_rays_native", "decode_images"]

_LIB = None
_LIB_TRIED = False


def _csrc_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "csrc",
    )


def load_native(build: bool = True):
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so_path = os.path.join(_csrc_dir(), "libavr_native.so")
    if not os.path.exists(so_path) and build:
        try:
            subprocess.run(
                ["make", "-C", _csrc_dir()],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            return None
    if not os.path.exists(so_path):
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.avr_gather_rays.restype = ctypes.c_int
    lib.avr_gather_rays.argtypes = [
        f32p, f32p, f32p, i64p, f32p, f32p, f32p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.avr_decode_images.restype = ctypes.c_int
    lib.avr_decode_images.argtypes = [u8p, f32p, ctypes.c_int64]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_native() is not None


def gather_rays_native(
    batch: Dict[str, np.ndarray],
    rays_idx: np.ndarray,  # (SB, R) int64 flat pixel indices
    num_threads: int = 0,
) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Native twin of sampling.gather_rays for precomputed ray indices."""
    lib = load_native()
    images = np.ascontiguousarray(batch["images"], np.float32)
    SB, NV, sl2, _ = images.shape
    R = rays_idx.shape[1]
    x_pix = np.ascontiguousarray(batch["x_pix"], np.float32).reshape(SB, NV * sl2, 2)
    c2w = np.ascontiguousarray(batch["cam2world"], np.float32).reshape(SB, NV, 16)
    idx = np.ascontiguousarray(rays_idx, np.int64)

    out_x = np.empty((SB, R, 2), np.float32)
    out_c = np.empty((SB, R, 16), np.float32)
    out_g = np.empty((SB, R, 3), np.float32)
    if lib is None:
        raise RuntimeError("native library unavailable; use gather_rays()")
    rc = lib.avr_gather_rays(
        x_pix, images.reshape(SB, NV * sl2, 3), c2w, idx,
        out_x, out_c, out_g, SB, NV, sl2, R,
        num_threads or os.cpu_count() or 1,
    )
    if rc != 0:
        raise RuntimeError(f"avr_gather_rays failed with code {rc}")
    model_input = {
        "x_pix": out_x,
        "cam2world": out_c.reshape(SB, R, 4, 4),
        "intrinsics": np.asarray(batch["intrinsics"][:, 0], np.float32),
    }
    return model_input, out_g


def decode_images(img_u8: np.ndarray) -> np.ndarray:
    """uint8 HWC image -> [-1, 1] float32 (native when available)."""
    lib = load_native()
    flat = np.ascontiguousarray(img_u8, np.uint8).reshape(-1)
    if lib is None:
        return (img_u8.astype(np.float32) / 127.5 - 1.0).astype(np.float32)
    out = np.empty(flat.shape, np.float32)
    rc = lib.avr_decode_images(flat, out, flat.size)
    if rc != 0:
        raise RuntimeError("avr_decode_images failed")
    return out.reshape(img_u8.shape)
