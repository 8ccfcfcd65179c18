"""Golden tests for the geometry core against an independent numpy oracle.

The oracle reimplements the reference's conventions
(``/root/reference/utils.py:219-361``) directly from the math, in numpy, so
any drift in the JAX implementation is caught without importing torch.
"""

import numpy as np
import jax.numpy as jnp

from avr_tpu.utils import geometry as G


# ----------------------------- numpy oracle ------------------------------


def np_pixel_grid(y_res, x_res):
    end = 1.0 - 1.0 / x_res
    xs = np.linspace(0.0, end, x_res)
    ys = np.linspace(0.0, end, y_res)
    out = np.zeros((y_res, x_res, 2))
    for r in range(y_res):
        for c in range(x_res):
            out[r, c] = (xs[c], ys[r])
    return out


def np_unproject(xy, z, K):
    hom = np.concatenate([xy, np.ones_like(xy[..., :1])], -1)
    kinv = np.linalg.inv(K)
    cam = hom @ kinv.T
    cam[..., 0] *= -1.0
    return cam * z


def np_world_rays(xy, K, c2w):
    # c2w: (N, 4, 4) per-ray
    origins = c2w[..., :3, -1]
    d = np_unproject(xy, -np.ones_like(xy[..., :1]), K)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    d_hom = np.concatenate([d, np.zeros_like(d[..., :1])], -1)
    d_world = np.einsum("nij,nj->ni", c2w, d_hom)[..., :3]
    return origins, d_world


def random_pose(rng):
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    c2w = np.eye(4)
    c2w[:3, :3] = q
    c2w[:3, 3] = rng.normal(size=3)
    return c2w


def make_intrinsics():
    return np.array([[1.09375, 0.0, 0.5], [0.0, 1.09375, 0.5], [0.0, 0.0, 1.0]])


# ------------------------------- tests -----------------------------------


def test_pixel_grid_matches_oracle():
    got = np.asarray(G.get_opencv_pixel_coordinates(8, 8))
    want = np_pixel_grid(8, 8)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # corner conventions
    assert got[0, 0, 0] == 0.0 and got[0, 0, 1] == 0.0
    np.testing.assert_allclose(got[0, 7], [7 / 8, 0.0], atol=1e-6)
    np.testing.assert_allclose(got[7, 0], [0.0, 7 / 8], atol=1e-6)


def test_pixel_grid_nonsquare_uses_x_resolution_endpoint():
    # Parity quirk: both axes use 1 - 1/x_resolution as the endpoint.
    got = np.asarray(G.get_opencv_pixel_coordinates(4, 8))
    want = np_pixel_grid(4, 8)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_unproject_x_flip(rng):
    K = make_intrinsics()
    xy = rng.uniform(size=(16, 2))
    z = rng.uniform(0.5, 2.0, size=(16, 1))
    got = np.asarray(G.unproject(jnp.asarray(xy), jnp.asarray(z), jnp.asarray(K)))
    want = np_unproject(xy, z, K)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_world_rays_match_oracle(rng):
    K = make_intrinsics()
    n = 32
    xy = rng.uniform(size=(n, 2))
    c2w = np.stack([random_pose(rng) for _ in range(n)])
    ro_np, rd_np = np_world_rays(xy, K, c2w)
    ro, rd = G.get_world_rays(
        jnp.asarray(xy[None]), jnp.asarray(K[None]), jnp.asarray(c2w[None])
    )
    np.testing.assert_allclose(np.asarray(ro)[0], ro_np, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd)[0], rd_np, atol=1e-5)
    # unit norm
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rd)[0], axis=-1), 1.0, atol=1e-5)


def test_depth_from_world_roundtrip(rng):
    # A point at camera depth d must come back as depth d.
    c2w = random_pose(rng)
    d = 1.37
    p_cam = np.array([0.3, -0.2, -d, 1.0])  # -z forward convention
    p_world = (c2w @ p_cam)[:3]
    depth = G.depth_from_world(jnp.asarray(p_world[None]), jnp.asarray(c2w[None]))
    np.testing.assert_allclose(np.asarray(depth)[0], d, atol=1e-5)


def test_rays_point_away_from_camera():
    # For an identity pose with OpenCV-flipped convention, center-pixel ray
    # should have negative z in camera space (z=-1 unprojection).
    K = jnp.asarray(make_intrinsics()[None])
    xy = jnp.asarray(np.array([[[0.5, 0.5]]]))
    c2w = jnp.eye(4)[None, None]
    _, rd = G.get_world_rays(xy, K, c2w)
    assert float(rd[0, 0, 2]) < 0


def test_orbit_cam2world_shape_and_radius():
    poses = np.asarray(G.orbit_cam2world(num_frames=6, radius=1.3))
    assert poses.shape == (6, 4, 4)
    centers = poses[:, :3, 3]
    np.testing.assert_allclose(np.linalg.norm(centers, axis=-1), 1.3, atol=1e-5)
    np.testing.assert_allclose(centers[:, 2], 0.4, atol=1e-6)
