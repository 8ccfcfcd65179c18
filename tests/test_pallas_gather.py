"""Pallas bilinear-gather kernel: parity with the jnp/torch reference.

Runs in interpreter mode on CPU (the kernel itself targets TPU); the jnp
``grid_sample_2d`` is already pinned bit-exact against torch, so parity
with it transfers torch parity to the kernel.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from avr_tpu.ops.grid_sample import grid_sample_2d
from avr_tpu.ops.pallas.gather import gather_bilinear


def _case(rng, B=2, H=8, W=8, C=16, N=40, scale=1.3):
    feats = rng.normal(size=(B, H, W, C)).astype(np.float32)
    coords = rng.uniform(-scale, scale, size=(B, N, 2)).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(coords)


def test_forward_matches_reference(rng):
    feats, coords = _case(rng)
    got = np.asarray(gather_bilinear(feats, coords, True))
    want = np.asarray(grid_sample_2d(feats, coords))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_forward_nonaligned_point_count(rng):
    feats, coords = _case(rng, N=7)  # far below one block -> padding path
    got = np.asarray(gather_bilinear(feats, coords, True))
    want = np.asarray(grid_sample_2d(feats, coords))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_vjp_features_matches_reference(rng):
    feats, coords = _case(rng, B=1, N=24)
    cot = jnp.asarray(rng.normal(size=(1, 24, feats.shape[-1])).astype(np.float32))

    def loss_k(f):
        return jnp.sum(gather_bilinear(f, coords, True) * cot)

    def loss_r(f):
        return jnp.sum(grid_sample_2d(f, coords) * cot)

    gk = np.asarray(jax.grad(loss_k)(feats))
    gr = np.asarray(jax.grad(loss_r)(feats))
    np.testing.assert_allclose(gk, gr, rtol=1e-4, atol=1e-5)


def test_vjp_coords_matches_reference(rng):
    feats, coords = _case(rng, B=1, N=24, scale=0.9)  # interior points
    cot = jnp.asarray(rng.normal(size=(1, 24, feats.shape[-1])).astype(np.float32))

    def loss_k(c):
        return jnp.sum(gather_bilinear(feats, c, True) * cot)

    def loss_r(c):
        return jnp.sum(grid_sample_2d(feats, c) * cot)

    gk = np.asarray(jax.grad(loss_k)(coords))
    gr = np.asarray(jax.grad(loss_r)(coords))
    np.testing.assert_allclose(gk, gr, rtol=1e-3, atol=1e-4)


def test_vjp_coords_zero_in_clamp_zone(rng):
    feats, _ = _case(rng, B=1)
    coords = jnp.asarray(np.array([[[1.5, 1.5], [-1.5, 0.0]]], np.float32))
    g = jax.grad(
        lambda c: jnp.sum(gather_bilinear(feats, c, True))
    )(coords)
    # fully clamped x and y -> zero coordinate gradient there
    np.testing.assert_allclose(np.asarray(g)[0, 0], 0.0, atol=1e-6)


# ------------------- windowed gather (same semantics) ----------------------


def _wcase(rng, B=2, H=20, W=8, C=16, N=600, scale=1.3, coherent=False):
    feats = rng.normal(size=(B, H, W, C)).astype(np.float32)
    if coherent:
        # ray-sorted-like coords: y increases smoothly across the batch
        y = np.sort(rng.uniform(-scale, scale, size=(B, N)), axis=-1)
        x = rng.uniform(-scale, scale, size=(B, N))
        coords = np.stack([x, y], axis=-1).astype(np.float32)
    else:
        coords = rng.uniform(-scale, scale, size=(B, N, 2)).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(coords)


@pytest.mark.parametrize("coherent", [False, True], ids=["random", "sorted"])
def test_windowed_forward_matches_reference(rng, coherent):
    from avr_tpu.ops.pallas.gather import gather_bilinear_windowed

    feats, coords = _wcase(rng, coherent=coherent)
    got = np.asarray(gather_bilinear_windowed(feats, coords, True))
    want = np.asarray(grid_sample_2d(feats, coords))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("coherent", [False, True], ids=["random", "sorted"])
def test_windowed_vjp_matches_reference(rng, coherent):
    from avr_tpu.ops.pallas.gather import gather_bilinear_windowed

    feats, coords = _wcase(rng, coherent=coherent)
    cot = jnp.asarray(rng.normal(size=(2, 600, 16)).astype(np.float32))

    def loss_k(f, c):
        return jnp.sum(gather_bilinear_windowed(f, c, True) * cot)

    def loss_r(f, c):
        return jnp.sum(grid_sample_2d(f, c) * cot)

    gk = jax.grad(loss_k, argnums=(0, 1))(feats, coords)
    gr = jax.grad(loss_r, argnums=(0, 1))(feats, coords)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-4)


def test_windowed_small_map_single_window(rng):
    """H < window height: degenerates to one full-height window."""
    from avr_tpu.ops.pallas.gather import gather_bilinear_windowed

    feats, coords = _wcase(rng, H=8, N=40)
    got = np.asarray(gather_bilinear_windowed(feats, coords, True))
    want = np.asarray(grid_sample_2d(feats, coords))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Projected variant: world points + packed projection in, the whole
# world->cam -> perspective -> align-corners-grid chain in-kernel.
# ---------------------------------------------------------------------------


def test_projected_gather_matches_xla_chain():
    from avr_tpu.ops.pallas.gather import gather_bilinear_projected
    from avr_tpu.ops.pallas.march import pack_projection
    from avr_tpu.ops.grid_sample import grid_sample_2d

    rng = np.random.default_rng(0)
    B, H, W, C, N = 2, 16, 16, 64, 300
    feats = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    poses = []
    for b in range(B):
        Q, _ = np.linalg.qr(np.eye(3) + 0.1 * rng.normal(size=(3, 3)))
        t = np.array([0.05, -0.03, 1.2 + 0.1 * b])
        poses.append(np.concatenate([Q, t[:, None]], 1))
    poses = jnp.asarray(np.stack(poses).astype(np.float32))
    focal = jnp.asarray([[20.0, -20.0]] * B, jnp.float32)
    c = jnp.asarray([[8.0, 8.0]] * B, jnp.float32)
    scale = jnp.asarray([2.0 * W / (W - 1), 2.0 * H / (H - 1)], jnp.float32)
    img = jnp.asarray([float(W), float(H)], jnp.float32)
    proj = pack_projection(poses, focal, c, scale, img)
    pts = jnp.asarray((0.4 * rng.normal(size=(B, N, 3))).astype(np.float32))

    def ref(feats_, pts_):
        cam = jnp.einsum("bij,bnj->bni", poses[:, :, :3], pts_) + poses[:, None, :, 3]
        uv = -cam[..., :2] / cam[..., 2:3] * focal[:, None] + c[:, None]
        grid = uv * (scale / img)[None, None] - 1.0
        return grid_sample_2d(feats_, grid)

    def ker(feats_, pts_):
        return gather_bilinear_projected(feats_, pts_, proj, True)

    np.testing.assert_allclose(
        np.asarray(ker(feats, pts)), np.asarray(ref(feats, pts)),
        atol=2e-5, rtol=2e-5,
    )
    g = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    gr = jax.grad(lambda f, p: jnp.sum(ref(f, p) * g), argnums=(0, 1))(feats, pts)
    gk = jax.grad(lambda f, p: jnp.sum(ker(f, p) * g), argnums=(0, 1))(feats, pts)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               atol=5e-5, rtol=5e-4)
    # d-points passes through the -xy/z*f chain; f32 rounding scales with
    # the focal (values O(10-100))
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]),
                               atol=3e-3, rtol=3e-3)
