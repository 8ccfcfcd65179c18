"""grid_sample_2d vs the torch CPU oracle (F.grid_sample).

The reference's encoder.index is `F.grid_sample(..., align_corners=True,
mode='bilinear', padding_mode='border')` (models.py:267); our TPU gather
must match it bit-for-bit in fp32, including out-of-range border clamping
and its VJP into the feature map (BASELINE.md allclose target).
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from avr_tpu.ops.grid_sample import grid_sample_2d


def torch_oracle(feats_nhwc, coords):
    t_feat = torch.from_numpy(np.transpose(feats_nhwc, (0, 3, 1, 2)))  # NCHW
    t_grid = torch.from_numpy(coords[:, :, None, :])  # (B, N, 1, 2)
    out = F.grid_sample(
        t_feat, t_grid, align_corners=True, mode="bilinear", padding_mode="border"
    )
    return out[:, :, :, 0].permute(0, 2, 1).numpy()  # (B, N, C)


def _case(rng, B=2, H=9, W=7, C=5, N=64, scale=1.0):
    feats = rng.normal(size=(B, H, W, C)).astype(np.float32)
    coords = rng.uniform(-scale, scale, size=(B, N, 2)).astype(np.float32)
    return feats, coords


def test_in_range_matches_torch(rng):
    feats, coords = _case(rng)
    got = np.asarray(grid_sample_2d(jnp.asarray(feats), jnp.asarray(coords)))
    want = torch_oracle(feats, coords)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_out_of_range_border_clamp_matches_torch(rng):
    feats, coords = _case(rng, scale=1.6)  # plenty of out-of-range queries
    got = np.asarray(grid_sample_2d(jnp.asarray(feats), jnp.asarray(coords)))
    want = torch_oracle(feats, coords)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_exact_corners(rng):
    feats, _ = _case(rng)
    corners = np.array(
        [[[-1.0, -1.0], [1.0, -1.0], [-1.0, 1.0], [1.0, 1.0]]] * feats.shape[0],
        np.float32,
    )
    got = np.asarray(grid_sample_2d(jnp.asarray(feats), jnp.asarray(corners)))
    want = np.stack(
        [feats[:, 0, 0], feats[:, 0, -1], feats[:, -1, 0], feats[:, -1, -1]], axis=1
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_vjp_into_features_matches_torch(rng):
    feats, coords = _case(rng, B=1, N=32, scale=1.3)
    cot = rng.normal(size=(1, 32, feats.shape[-1])).astype(np.float32)

    # torch grad
    t_feat = torch.from_numpy(np.transpose(feats, (0, 3, 1, 2))).requires_grad_(True)
    t_grid = torch.from_numpy(coords[:, :, None, :])
    out = F.grid_sample(t_feat, t_grid, align_corners=True, mode="bilinear", padding_mode="border")
    out = out[:, :, :, 0].permute(0, 2, 1)
    out.backward(torch.from_numpy(cot))
    want = t_feat.grad.permute(0, 2, 3, 1).numpy()

    # jax grad
    def f(x):
        return jnp.sum(grid_sample_2d(x, jnp.asarray(coords)) * jnp.asarray(cot))

    got = np.asarray(jax.grad(f)(jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
