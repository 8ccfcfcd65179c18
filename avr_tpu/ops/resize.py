"""Bilinear resize with align_corners=True semantics.

The reference encoder upsamples every ResNet stage to the stage-1
resolution with ``F.interpolate(..., mode='bilinear', align_corners=True)``
(``/root/reference/models.py:317-324``).  ``jax.image.resize`` implements
the half-pixel convention, not align-corners, so we build the interpolation
as two small dense matrices applied with einsum — separable 1D
interpolation along H then W.  On TPU these are clean MXU matmuls that XLA
fuses with the surrounding concat, and the VJP is just the transposed
matmuls (exact).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np
import jax.numpy as jnp

__all__ = ["resize_bilinear_align_corners", "interp_matrix"]


@lru_cache(maxsize=64)
def _interp_matrix_np(out_size: int, in_size: int) -> np.ndarray:
    """Dense (out_size, in_size) align-corners bilinear interpolation matrix."""
    m = np.zeros((out_size, in_size), np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    if out_size == 1:
        # align_corners: single output sample lands on source index 0
        m[0, 0] = 1.0
        return m
    pos = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (pos - lo).astype(np.float32)
    m[np.arange(out_size), lo] += 1.0 - w
    m[np.arange(out_size), hi] += w
    return m


def interp_matrix(out_size: int, in_size: int) -> jnp.ndarray:
    return jnp.asarray(_interp_matrix_np(out_size, in_size))


def resize_bilinear_align_corners(
    x: jnp.ndarray, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Resize ``(B, H, W, C)`` (NHWC) to ``(B, H', W', C)``, align_corners=True."""
    H2, W2 = out_hw
    B, H, W, C = x.shape
    if (H, W) == (H2, W2):
        return x
    wy = interp_matrix(H2, H)
    wx = interp_matrix(W2, W)
    x = jnp.einsum("bhwc,Hh->bHwc", x, wy, precision="highest")
    x = jnp.einsum("bhwc,Ww->bhWc", x, wx, precision="highest")
    return x
