"""Bilinear feature-map sampling (the pixel-aligned "index" gather).

TPU-native equivalent of the reference's ``F.grid_sample(latent, uv,
align_corners=True, mode='bilinear', padding_mode='border')`` hot spot
(``/root/reference/models.py:245-274``), the gather at the core of every
field query (SURVEY.md §3.5).

Semantics match ``torch.nn.functional.grid_sample`` exactly for
``align_corners=True`` + border padding (verified against the torch CPU
oracle in ``tests/test_grid_sample.py``):

  * a grid coordinate ``g in [-1, 1]`` maps to pixel ``(g + 1) / 2 * (S-1)``,
  * out-of-range coordinates clamp to the border pixel,
  * 4-tap bilinear interpolation.

Layout is NHWC (TPU-preferred): features ``(B, H, W, C)``, query points
``(B, N, 2)`` in (x, y) order, output ``(B, N, C)``.  The implementation
flattens the spatial dims and uses one ``take_along_axis`` gather for the
four taps; XLA fuses the weight math around it.  A fused Pallas kernel for
this gather lives in ``avr_tpu.ops.pallas.gather`` and is used on TPU for
large point counts.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["grid_sample_2d"]


def grid_sample_2d(features: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample ``features`` at normalized ``coords``.

    Args:
      features: ``(B, H, W, C)`` feature maps.
      coords: ``(B, N, 2)`` query points, ``(x, y)`` in [-1, 1]
        (align_corners=True convention; out-of-range clamps to border).
    Returns:
      ``(B, N, C)`` sampled features.
    """
    B, H, W, C = features.shape
    x = (coords[..., 0] + 1.0) * 0.5 * (W - 1)  # (B, N)
    y = (coords[..., 1] + 1.0) * 0.5 * (H - 1)

    # Border padding: clamp the *continuous* coordinate first so weights are
    # computed against the clamped position (matches torch's border mode).
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)

    flat = features.reshape(B, H * W, C)

    def tap(yi, xi):
        idx = yi * W + xi  # (B, N)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, N, C)

    w00 = ((1.0 - wy) * (1.0 - wx))[..., None]
    w01 = ((1.0 - wy) * wx)[..., None]
    w10 = (wy * (1.0 - wx))[..., None]
    w11 = (wy * wx)[..., None]

    return (
        tap(y0i, x0i) * w00
        + tap(y0i, x1i) * w01
        + tap(y1i, x0i) * w10
        + tap(y1i, x1i) * w11
    )
