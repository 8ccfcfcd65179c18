"""Classic coarse/fine hierarchical volume renderer.

Functional counterpart of the reference ``VolumeRenderer.forward``
(``/root/reference/renderers.py:121-289``), expressed as one pure function
over a field closure so the whole coarse->fine pipeline jits (and
differentiates) end-to-end:

  rays -> stratified coarse z -> field -> integral
       -> [coarse z  ∪  bucket-CDF importance z  ∪  depth-guided z] sorted
       -> field (fine) -> integral -> camera-z depth recompute

The fine pass re-queries the union of all three sample sets (96 evals/ray
at the default 64+16+16 budget), exactly like the reference.  The depth
recompute via :func:`depth_from_world` is required because ray directions
are unit-norm (reference renderers.py:273-275).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from avr_tpu.ops.integrate import volume_integral
from avr_tpu.ops.permute import permutation_take
from avr_tpu.ops.sampling import sample_coarse, sample_depth, sample_fine
from avr_tpu.renderers.base import RenderOutput, VolumeRendererConfig
from avr_tpu.utils.geometry import depth_from_world, get_world_rays

__all__ = ["render_volume"]

# field(xyz, viewdirs, coarse) -> (SB, N, 4) with rgb sigmoided / sigma relu'd
FieldFn = Callable[[jnp.ndarray, jnp.ndarray, bool], jnp.ndarray]


def _query(field: FieldFn, ros, rds, z_vals, coarse: bool, sort_key=None):
    """Evaluate the field at ``ro + rd * z`` for every sample.

    ``sort_key`` (points ``(SB, N, 3)`` -> ``(SB, N)`` source-view row)
    enables the point-level locality sort: unlike the adaptive band (whose
    queries cluster around each ray's surface row), the classic renderer's
    samples sweep [near, far] along every ray, so *ray*-level sorting can't
    make 512-point blocks row-coherent — but a global per-point sort can.
    Pure permutation: the big latent tensor is produced and consumed in
    sorted order; only (N, 3) inputs and the (N, 4) output are shuffled.

    Returns ``(sigma, rgb)`` shaped ``(SB, R, n, 1)`` / ``(SB, R, n, 3)``.
    """
    SB, R, n = z_vals.shape
    pts = ros[..., None, :] + rds[..., None, :] * z_vals[..., None]  # (SB, R, n, 3)
    vd = jnp.broadcast_to(rds[..., None, :], (SB, R, n, 3))
    pts = pts.reshape(SB, R * n, 3)
    vd = vd.reshape(SB, R * n, 3)
    if sort_key is None:
        out = field(pts, vd, coarse)
    else:
        order = jnp.argsort(sort_key(pts), axis=-1)  # (SB, N)
        inv = jnp.argsort(order, axis=-1)
        # scatter-free permutation: both directions are gathers (the VJP of
        # a take_along_axis here would be a 1.6 M-row scatter-add)
        out = permutation_take(
            field(
                permutation_take(pts, order, inv),
                permutation_take(vd, order, inv),
                coarse,
            ),
            inv, order,
        )
    out = out.reshape(SB, R, n, 4)
    return out[..., 3:4], out[..., :3]


def render_volume(
    cfg: VolumeRendererConfig,
    key: jax.Array,
    field: FieldFn,
    xy_pix: jnp.ndarray,  # (SB, R, 2)
    intrinsics: jnp.ndarray,  # (SB, 3, 3)
    cam2world: jnp.ndarray,  # (SB, R, 4, 4)
    sort_key_fn=None,  # optional: points (SB, N, 3) -> (SB, N) locality key
) -> RenderOutput:
    SB, R, _ = xy_pix.shape
    ros, rds = get_world_rays(xy_pix, intrinsics, cam2world)

    near = jnp.full((SB, R), cfg.near, jnp.float32)
    far = jnp.full((SB, R), cfg.far, jnp.float32)
    from avr_tpu.ops.hashrng import split_any

    k_coarse, k_fine, k_depth = split_any(key, 3)

    # --- coarse pass -----------------------------------------------------
    z_coarse = sample_coarse(k_coarse, near, far, cfg.n_coarse)
    sigma, rad = _query(field, ros, rds, z_coarse, coarse=True,
                        sort_key=sort_key_fn)
    rgb_coarse, dist_coarse, w_coarse = volume_integral(
        z_coarse, sigma, rad, white_back=cfg.white_back, infinity=cfg.far
    )

    # --- fine pass: coarse ∪ importance ∪ depth-guided -------------------
    z_fine = sample_fine(k_fine, near, far, cfg.n_fine - cfg.n_fine_depth, w_coarse)
    z_depth = sample_depth(
        k_depth, dist_coarse, cfg.n_fine_depth, cfg.depth_std,
        mode=cfg.depth_sample_mode,
    )
    z_depth = jnp.clip(z_depth, cfg.near, cfg.far)

    z_all = jnp.sort(jnp.concatenate([z_coarse, z_fine, z_depth], axis=-1), axis=-1)
    sigma, rad = _query(field, ros, rds, z_all, coarse=False,
                        sort_key=sort_key_fn)
    rgb_fine, dist_fine, _ = volume_integral(
        z_all, sigma, rad, white_back=cfg.white_back, infinity=cfg.far
    )

    # unit-norm ray dirs -> recompute camera-z depth
    world_fine = ros + rds * dist_fine
    depth_fine = depth_from_world(world_fine, cam2world)[..., None]

    return RenderOutput(rgb_coarse, rgb_fine, depth_fine, depth_fine)
