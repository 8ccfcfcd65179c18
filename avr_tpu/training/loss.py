"""Training loss (reference ``utils.py:364-377``).

MSE on the coarse and/or fine image per ``loss_mode`` in
{coarse, fine, both}, a NaN -> 1e-6 guard, and an optional depth-range
hinge penalty ``max(near - d, 0) + max(d - far, 0)`` scaled by 10000
(near=0.5, far=2.0 — intentionally wider than the render bounds).

Implemented branch-free so the jitted train step never retraces on loss
configuration: the mode is baked in statically via :class:`LossParams`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from avr_tpu.renderers.base import RenderOutput

__all__ = ["LossParams", "loss_fn"]


@dataclass(frozen=True)
class LossParams:
    loss_mode: str = "both"  # coarse | fine | both
    depth_regularization: bool = False
    near: float = 0.5
    far: float = 2.0
    depth_penalty_scale: float = 10000.0
    # Opacity-weighted marcher<-integral depth-consistency weight (0 = off;
    # TPU-build stabilizer, not a reference term).  The adaptive marcher's
    # only training signal is the photometric loss *through the band*; when
    # a band drifts off-surface the photometric gradient w.r.t. the marched
    # distance goes flat and the marcher has nothing to pull it back.  This
    # term supervises the marched depth (depth_coarse) toward the band
    # integral's expected depth (depth_fine, detached), weighted per ray by
    # the integral's total opacity (detached) so empty bands — where the
    # integral depth is meaningless — contribute nothing.
    depth_consistency: float = 0.0


def loss_fn(out: RenderOutput, gt: jnp.ndarray, params: LossParams) -> jnp.ndarray:
    """Scalar training loss for a render against ``(SB, R, 3)`` ground truth."""
    loss = jnp.float32(0.0)
    if params.loss_mode != "fine":
        loss = loss + jnp.mean((out.rgb_coarse - gt) ** 2)
    if params.loss_mode != "coarse":
        if out.rgb_fine is None:
            raise ValueError(
                f"loss_mode={params.loss_mode!r} needs a fine image but the "
                "renderer produced none (raymarcher renders are coarse-only)"
            )
        loss = loss + jnp.mean((out.rgb_fine - gt) ** 2)
    loss = jnp.where(jnp.isnan(loss), 1e-6, loss)
    if params.depth_consistency:
        if out.acc is None:
            raise ValueError(
                "depth_consistency needs the renderer's band opacity "
                "(RenderOutput.acc) — the adaptive renderer with "
                "fused_integral='never' produces it; the fused integral "
                "kernel and the other renderers do not"
            )
        w = jax.lax.stop_gradient(out.acc)
        target = jax.lax.stop_gradient(out.depth_fine)
        loss = loss + params.depth_consistency * jnp.mean(
            w * (out.depth_coarse - target) ** 2
        )
    if params.depth_regularization:
        depth = out.depth_coarse
        penalty = jnp.maximum(params.near - depth, 0.0) + jnp.maximum(
            depth - params.far, 0.0
        )
        loss = loss + jnp.mean(penalty) * params.depth_penalty_scale
    return loss
