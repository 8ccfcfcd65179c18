"""Alpha-composited volume integration.

Functional counterpart of the reference compositing chain
(``/root/reference/renderers.py:69-119``), with every constant pinned for
numerical parity (SURVEY.md §2 "Volume integral"):

  * depth deltas use a ``1e10`` tail,
  * ``alpha = 1 - exp(-sigma * delta)``,
  * transmittance is the shifted cumulative product of ``1 - alpha + 1e-10``
    with a leading 1,
  * the distance map weights *shifted* z-values whose tail is the
    ``infinity`` constant (1.8 — the far plane — by default),
  * white-background compositing adds ``1 - sum(weights)``.

The whole chain is elementwise + a cumulative product along the samples
axis; under ``jit`` XLA fuses it into the surrounding ray math, and its VJP
is the standard reverse-mode scan.  The samples axis is innermost so the
rays axis stays free for mesh sharding.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = ["volume_integral"]


def volume_integral(
    z_vals: jnp.ndarray,  # (SB, R, n)
    sigmas: jnp.ndarray,  # (SB, R, n, 1)
    radiances: jnp.ndarray,  # (SB, R, n, 3)
    white_back: bool = True,
    infinity: float = 1.8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite per-sample (sigma, rgb) into pixel colour, distance, weights.

    Returns:
      rgb: ``(SB, R, 3)`` composited colour (white background if requested).
      distance: ``(SB, R, 1)`` expected distance along the ray (computed
        against shifted z-values with an ``infinity`` tail).
      weights: ``(SB, R, n, 1)`` per-sample compositing weights.
    """
    dists = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1], jnp.full_like(z_vals[..., :1], 1e10)],
        axis=-1,
    )  # (SB, R, n)

    alpha = 1.0 - jnp.exp(-sigmas * dists[..., None])  # (SB, R, n, 1)

    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-2)
    trans = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1, :]), trans[..., :-1, :]], axis=-2
    )  # (SB, R, n, 1)

    weights = alpha * trans  # (SB, R, n, 1)

    rgb = jnp.sum(weights * radiances, axis=-2)  # (SB, R, 3)

    zz_vals = jnp.concatenate(
        [z_vals[..., 1:], jnp.full_like(z_vals[..., :1], infinity)], axis=-1
    )
    distance = jnp.sum(weights * zz_vals[..., None], axis=-2)  # (SB, R, 1)

    if white_back:
        accum = jnp.sum(weights, axis=-2)  # (SB, R, 1)
        rgb = rgb + (1.0 - accum)

    return rgb, distance, weights
