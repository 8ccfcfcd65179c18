"""Synthetic SRN-schema scene generator (for tests and smoke training).

Renders simple lambertian-ish spheres analytically and writes them in the
exact HDF5 schema the reference consumes (``rgb/<k>``, ``pose/<k>``,
``intrinsics``; see ``/root/reference/dataset.py:38-96``), with cameras on
an orbit ring and white background.  This gives the test suite / CI a real
learnable multi-view dataset without the (multi-GB, non-redistributable)
SRN cars download, and exercises every dataset/geometry convention
(pose flip, normalized intrinsics, [0,1) pixel grid).
"""

from __future__ import annotations

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

__all__ = ["write_synthetic_hdf5", "render_sphere_view", "orbit_pose"]


def orbit_pose(angle: float, radius: float = 1.3, z_height: float = 0.4) -> np.ndarray:
    """On-disk-convention cam2world on an orbit ring looking at the origin.

    Mirrors the reference's look-at construction (``utils.py:464-513``):
    the stored pose has camera axes ``[x, y, z-towards-target]`` as
    columns; the dataset loader right-multiplies ``diag(1,-1,-1,1)``,
    after which the framework's z=-1 unprojection looks at the origin.
    """
    rr = np.sqrt(radius * radius - z_height * z_height)
    eye = np.array([rr * np.sin(angle), rr * np.cos(angle), z_height])
    at = np.zeros(3)
    up = np.array([0.0, 0.0, -1.0])

    z_axis = at - eye
    z_axis /= np.linalg.norm(z_axis)
    x_axis = np.cross(up, z_axis)
    x_axis /= np.linalg.norm(x_axis)
    y_axis = np.cross(z_axis, x_axis)

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.stack([x_axis, y_axis, z_axis], axis=1)
    pose[:3, 3] = eye
    return pose


def render_sphere_view(
    c2w_cv: np.ndarray,
    side: int,
    focal_pix: float,
    sphere_radius: float = 0.35,
    color: np.ndarray = None,
) -> np.ndarray:
    """Analytic render of a shaded sphere at the origin, white background.

    Uses the framework's own ray conventions (z=-1 unproject with x flip,
    unit-norm dirs) so renders are consistent with training geometry.
    """
    if color is None:
        color = np.array([0.8, 0.2, 0.2])
    end = 1.0 - 1.0 / side
    xs = np.linspace(0.0, end, side)
    gx, gy = np.meshgrid(xs, xs)
    f = focal_pix / side  # normalized focal
    # unproject at z=-1 with the x flip (mirrors utils geometry)
    x_cam = -(gx - 0.5) / f * -1.0
    y_cam = -(gy - 0.5) / f
    z_cam = -np.ones_like(x_cam)
    d = np.stack([x_cam, y_cam, z_cam], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d @ c2w_cv[:3, :3].T
    o = c2w_cv[:3, 3]

    # ray-sphere intersection |o + t d| = r
    b = 2.0 * (d @ o)
    c = float(o @ o) - sphere_radius**2
    disc = b * b - 4 * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / 2.0, 0.0)
    p = o + t[..., None] * d
    n = p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-8)
    light = np.array([0.5, 0.5, 0.8])
    light = light / np.linalg.norm(light)
    shade = np.clip(n @ light, 0.1, 1.0)
    rgb = color[None, None, :] * shade[..., None]
    img = np.where(hit[..., None], rgb, 1.0)
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def write_synthetic_hdf5(
    path: str,
    num_instances: int = 2,
    num_views: int = 8,
    side: int = 64,
    seed: int = 0,
) -> str:
    """Write a synthetic dataset in the SRN HDF5 schema; returns ``path``."""
    if h5py is None:
        raise ImportError("h5py is required")
    rng = np.random.default_rng(seed)
    focal_pix = 1.09375 * side
    with h5py.File(path, "w") as f:
        for i in range(num_instances):
            grp = f.create_group(f"instance_{i:04d}")
            grp.create_dataset(
                "intrinsics",
                data=np.array(
                    [focal_pix, side / 2, side / 2, side, side], np.float64
                ),
            )
            rgb_grp = grp.create_group("rgb")
            pose_grp = grp.create_group("pose")
            color = rng.uniform(0.2, 0.9, size=3)
            radius = rng.uniform(0.25, 0.4)
            for v in range(num_views):
                angle = 2 * np.pi * v / num_views + rng.uniform(0, 0.3)
                pose_gl = orbit_pose(angle)
                c2w_cv = pose_gl @ np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
                img = render_sphere_view(
                    c2w_cv, side, focal_pix, sphere_radius=radius, color=color
                )
                rgb_grp.create_dataset(f"{v:06d}", data=img)
                pose_grp.create_dataset(f"{v:06d}", data=pose_gl.astype(np.float64))
    return path
