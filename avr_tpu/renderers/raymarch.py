"""LSTM differentiable ray-marching (SRN-style).

Functional counterpart of the reference ``Raymarcher``
(``/root/reference/renderers.py:292-358``): starting from a gaussian
initial distance, an LSTM repeatedly reads the pixel-aligned feature at the
current point (the field's ``return_features`` path) and emits a signed
step along the ray; the final point is queried once for colour.

TPU-first: the march is a ``lax.scan`` over the step axis — 10 dependent
steps whose per-step work (one bilinear gather + a 512->16 cell) is small,
so keeping it a scan avoids 10x code bloat in the compiled module while XLA
keeps the cell weights resident in VMEM across iterations.  The
hidden-state gradient clamp is a ``custom_vjp`` identity
(:func:`avr_tpu.renderers.lstm.clamp_grad`).

With multiple source views the reference implementation would shape-error
(it flattens ``SB*NS*B`` rows into a ``(SB, num_rays)`` view); here the NS
axis of the feature is mean-pooled before the cell, which is exact for the
reference-supported ``NS == 1`` case and well-defined beyond it.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from avr_tpu.renderers.base import RenderOutput
from avr_tpu.utils.geometry import depth_from_world, get_world_rays

__all__ = ["lstm_march", "render_raymarcher"]

# features(xyz, viewdirs) -> (SB, NS, N, C) pixel-aligned latents
FeatureFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
# cell(v, (h, c)) -> (h, c); step(h) -> signed distance
CellFn = Callable[..., Tuple[jnp.ndarray, jnp.ndarray]]
StepFn = Callable[[jnp.ndarray], jnp.ndarray]


def lstm_march(
    key: jax.Array,
    features: FeatureFn,
    cell: CellFn,
    step_head: StepFn,
    ros: jnp.ndarray,  # (SB, R, 3)
    rds: jnp.ndarray,  # (SB, R, 3)
    steps: int,
    hidden_size: int,
    grad_clamp: float = 10.0,
    init_mean: float = 0.8,
    init_std: float = 5e-2,
    early_stop_eps: float = 0.0,
) -> jnp.ndarray:
    """Run the LSTM march; returns the final world coordinates ``(SB, R, 3)``.

    ``early_stop_eps > 0`` enables per-ray early termination: once the
    predicted |step| drops below the threshold the ray is frozen for the
    remaining iterations (masked lanes — shapes stay static under SPMD;
    the adaptive sample-budget semantics from BASELINE.json config 4).
    ``0.0`` is the reference-exact always-march behaviour.
    """
    from avr_tpu.renderers.lstm import clamp_grad

    SB, R, _ = ros.shape
    # drawn 2D: trailing-1 layouts run the RNG chain slowly on the VPU
    # (same stream as the fused-march wrapper so the paths stay comparable);
    # _normal_2d also dispatches the sharding-invariant RaySeeds hash
    from avr_tpu.ops.sampling import _normal_2d

    init_distance = init_mean + init_std * _normal_2d(
        key, (SB, R), jnp.float32
    )[..., None]
    coords0 = ros + rds * init_distance
    h0 = jnp.zeros((SB, R, hidden_size), jnp.float32)
    c0 = jnp.zeros((SB, R, hidden_size), jnp.float32)
    active0 = jnp.ones((SB, R, 1), jnp.float32)

    def body(carry, _):
        coords, h, c, active = carry
        v = features(coords, rds)  # (SB, NS, R, C)
        v = jnp.mean(v, axis=1)  # exact for NS == 1
        h, c = cell(v, (h, c))
        h = clamp_grad(h, grad_clamp)
        signed_distance = step_head(h)  # (SB, R, 1)
        if early_stop_eps > 0.0:
            signed_distance = signed_distance * active
            converged = jnp.abs(signed_distance) < early_stop_eps
            active = active * (1.0 - converged.astype(jnp.float32))
        coords = coords + rds * signed_distance
        return (coords, h, c, active), None

    (coords, _, _, _), _ = jax.lax.scan(
        body, (coords0, h0, c0, active0), None, length=steps
    )
    return coords


def render_raymarcher(
    cfg,
    key: jax.Array,
    field,  # field(xyz, viewdirs, coarse) -> (SB, N, 4)
    features: FeatureFn,
    cell: CellFn,
    step_head: StepFn,
    xy_pix: jnp.ndarray,
    intrinsics: jnp.ndarray,
    cam2world: jnp.ndarray,
    march_fn=None,  # optional override: march_fn(key, ros, rds) -> coords
) -> RenderOutput:
    ros, rds = get_world_rays(xy_pix, intrinsics, cam2world)
    if march_fn is not None:
        # e.g. the fused Pallas march (avr_tpu.ops.pallas.march)
        coords = march_fn(key, ros, rds)
    else:
        coords = lstm_march(
            key, features, cell, step_head, ros, rds,
            steps=cfg.raymarch_steps, hidden_size=cfg.hidden_size,
            grad_clamp=cfg.grad_clamp, init_mean=cfg.init_distance_mean,
            init_std=cfg.init_distance_std,
            early_stop_eps=cfg.early_stop_eps,
        )
    out = field(coords, rds, True)
    rgb = out[..., :3]
    depth = depth_from_world(coords, cam2world)[..., None]
    return RenderOutput(rgb, None, depth, depth)
