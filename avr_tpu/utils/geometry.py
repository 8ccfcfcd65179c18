"""Camera geometry and ray generation (pure jax.numpy).

Numerically mirrors the conventions of the reference implementation
(``/root/reference/utils.py:219-361``), which are deliberately nonstandard
and must be pinned for parity (SURVEY.md §7 "hard parts"):

  * pixel coordinates normalized to [0, 1), origin top-left, *both* axes
    stepped by ``1/x_resolution`` (reference ``utils.py:352-353``),
  * :func:`unproject` applies ``K^{-1}`` then flips the x coordinate and
    scales the whole homogeneous result by ``z`` (reference
    ``utils.py:263-266``),
  * ray directions are unit-normalized (reference ``utils.py:312``), so
    depth must be recomputed in camera-z via :func:`depth_from_world`
    (reference ``utils.py:358-361``, used at ``renderers.py:273-275``).

Everything here is shape-polymorphic over leading batch dims and safe to
call under ``jax.jit``; there is no RNG and no state.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = [
    "homogenize_points",
    "homogenize_vecs",
    "unproject",
    "transform_rigid",
    "transform_world2cam",
    "transform_cam2world",
    "get_normalized_cam_ray_directions",
    "get_world_rays",
    "get_opencv_pixel_coordinates",
    "depth_from_world",
    "look_at_rotation",
    "orbit_cam2world",
]


def homogenize_points(points: jnp.ndarray) -> jnp.ndarray:
    """Append a homogeneous ``1`` to points of shape ``(..., D)``."""
    ones = jnp.ones_like(points[..., :1])
    return jnp.concatenate([points, ones], axis=-1)


def homogenize_vecs(vectors: jnp.ndarray) -> jnp.ndarray:
    """Append a homogeneous ``0`` to vectors of shape ``(..., D)``."""
    zeros = jnp.zeros_like(vectors[..., :1])
    return jnp.concatenate([vectors, zeros], axis=-1)


def unproject(xy_pix: jnp.ndarray, z: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Lift normalized pixel coords + per-pixel z to 3D camera coordinates.

    Follows the reference's OpenCV-in-[0,1]-with-x-flip convention
    (reference ``utils.py:246-267``): after applying ``K^{-1}`` the x
    component is negated, then *all three* components are scaled by ``z``.

    Args:
      xy_pix: ``(..., N, 2)`` pixel coordinates in [0, 1].
      z: ``(..., N, 1)`` z coordinate per pixel (``-1`` for ray dirs).
      intrinsics: ``(..., 3, 3)`` normalized camera intrinsics.
    Returns:
      ``(..., N, 3)`` points in camera coordinates.
    """
    xy_hom = homogenize_points(xy_pix)  # (..., N, 3)
    k_inv = jnp.linalg.inv(intrinsics)
    xyz_cam = jnp.einsum("...ij,...kj->...ki", k_inv, xy_hom)
    xyz_cam = xyz_cam.at[..., 0].multiply(-1.0)
    return xyz_cam * z


def transform_rigid(xyz_hom: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply a ``(..., 4, 4)`` rigid transform to ``(..., 4)`` homogeneous points."""
    return jnp.einsum("...ij,...j->...i", T, xyz_hom)


def transform_world2cam(xyz_world_hom: jnp.ndarray, cam2world: jnp.ndarray) -> jnp.ndarray:
    return transform_rigid(xyz_world_hom, jnp.linalg.inv(cam2world))


def transform_cam2world(xyz_cam_hom: jnp.ndarray, cam2world: jnp.ndarray) -> jnp.ndarray:
    return transform_rigid(xyz_cam_hom, cam2world)


def get_normalized_cam_ray_directions(
    xy_pix: jnp.ndarray, intrinsics: jnp.ndarray
) -> jnp.ndarray:
    """Unit-norm camera-space ray directions through each pixel.

    Pixels are unprojected at ``z = -1`` and L2-normalized (reference
    ``utils.py:309-312``).
    """
    dirs = unproject(xy_pix, -jnp.ones_like(xy_pix[..., :1]), intrinsics)
    return dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)


def get_world_rays(
    xy_pix: jnp.ndarray,
    intrinsics: jnp.ndarray,
    cam2world: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World-space ray origins and unit directions for a batch of pixels.

    Mirrors reference ``utils.py:315-336``.

    Args:
      xy_pix: ``(SB, N, 2)`` pixel coordinates in [0, 1].
      intrinsics: ``(SB, 3, 3)`` normalized intrinsics.
      cam2world: ``(SB, N, 4, 4)`` per-ray camera-to-world poses (per-ray
        because training gathers rays across views; a single pose may be
        broadcast to all rays).
    Returns:
      ``(ray_origins, ray_dirs)`` of shapes ``(SB, N, 3)`` each; directions
      are unit-norm world vectors.
    """
    cam_origin_world = cam2world[..., :3, -1]
    ray_dirs_cam = get_normalized_cam_ray_directions(xy_pix, intrinsics)
    rd_world_hom = transform_cam2world(homogenize_vecs(ray_dirs_cam), cam2world)
    return cam_origin_world, rd_world_hom[..., :3]


def get_opencv_pixel_coordinates(y_resolution: int, x_resolution: int) -> jnp.ndarray:
    """Normalized pixel-center grid in [0, 1), origin top-left.

    Reproduces reference ``utils.py:339-356`` exactly, including the quirk
    that *both* linspaces use ``1 - 1/x_resolution`` as their endpoint
    (harmless for the square images used throughout, pinned for parity).

    Returns:
      ``(y_resolution, x_resolution, 2)`` grid where ``[r, c] = (x_c, y_r)``.
    """
    end = 1.0 - 1.0 / x_resolution
    xs = jnp.linspace(0.0, end, x_resolution, dtype=jnp.float32)
    ys = jnp.linspace(0.0, end, y_resolution, dtype=jnp.float32)
    grid_x, grid_y = jnp.meshgrid(xs, ys, indexing="xy")  # each (y_res, x_res)
    return jnp.stack([grid_x, grid_y], axis=-1)


def depth_from_world(world_coords: jnp.ndarray, cam2world: jnp.ndarray) -> jnp.ndarray:
    """Camera-space depth (``-z``) of world points under per-ray poses.

    Needed because ray directions are unit-norm rather than z=1, so the
    distance along the ray is not the camera depth (reference
    ``utils.py:358-361``).
    """
    points_hom = homogenize_points(world_coords)
    points_cam = transform_world2cam(points_hom, cam2world)
    return -points_cam[..., 2]


# ---------------------------------------------------------------------------
# Orbit-camera helpers for video/demo rendering (reference utils.py:464-513).
# ---------------------------------------------------------------------------


def look_at_rotation(x: float, y: float, z: float) -> jnp.ndarray:
    """Camera rotation looking from (x, y, z) at the origin, up = (0,0,-1).

    Matches reference ``get_R`` (``utils.py:464-479``) including its
    degenerate-x-axis fallback.
    """
    eps = 1e-5
    cam = jnp.asarray([x, y, z], dtype=jnp.float32).reshape(1, 3)
    at = jnp.zeros((1, 3), dtype=jnp.float32)
    up = jnp.asarray([[0.0, 0.0, -1.0]], dtype=jnp.float32)

    def _normalize(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), eps)

    z_axis = _normalize(at - cam)
    x_axis = _normalize(jnp.cross(up, z_axis))
    y_axis = _normalize(jnp.cross(z_axis, x_axis))
    degenerate = jnp.all(jnp.isclose(x_axis, 0.0, atol=5e-3), axis=1, keepdims=True)
    replacement = _normalize(jnp.cross(y_axis, z_axis))
    x_axis = jnp.where(degenerate, replacement, x_axis)
    R = jnp.concatenate([x_axis[:, None, :], y_axis[:, None, :], z_axis[:, None, :]], axis=1)
    return jnp.swapaxes(R, 1, 2)[0]  # (3, 3)


def orbit_cam2world(num_frames: int, radius: float, z_height: float = 0.4) -> jnp.ndarray:
    """Ring of cam2world poses orbiting the origin (reference utils.py:496-513).

    Returns ``(num_frames, 4, 4)`` poses already flipped into the OpenCV
    convention via ``diag(1, -1, -1, 1)``.
    """
    import numpy as np

    angles = (
        np.linspace(0.0, 2.0 * np.pi * (num_frames - 1) / num_frames, num_frames)
        + np.pi / num_frames
    )
    rr = float(np.sqrt(radius * radius - z_height * z_height))
    flip = jnp.diag(jnp.asarray([1.0, -1.0, -1.0, 1.0], dtype=jnp.float32))
    poses = []
    for angle in angles:
        tx = rr * float(np.sin(angle))
        ty = rr * float(np.cos(angle))
        tz = z_height
        R = look_at_rotation(tx, ty, tz)
        c2w = jnp.zeros((4, 4), dtype=jnp.float32)
        c2w = c2w.at[:3, :3].set(R)
        c2w = c2w.at[0, 3].set(tx)
        c2w = c2w.at[1, 3].set(ty)
        c2w = c2w.at[2, 3].set(tz)
        c2w = c2w.at[3, 3].set(1.0)
        poses.append(c2w @ flip)
    return jnp.stack(poses)
