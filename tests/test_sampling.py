"""Property + golden tests for the ray samplers (reference renderers.py:4-66)."""

import numpy as np
import jax
import jax.numpy as jnp

from avr_tpu.ops.sampling import sample_coarse, sample_fine, sample_depth


def test_sample_coarse_stratification():
    key = jax.random.PRNGKey(0)
    near = jnp.full((2, 64), 0.8)
    far = jnp.full((2, 64), 1.8)
    z = np.asarray(sample_coarse(key, near, far, 64))
    assert z.shape == (2, 64, 64)
    # Sample i lies within bin i: [near + i/n * span, near + (i+1)/n * span]
    span = 1.0
    lo = 0.8 + np.arange(64) / 64 * span
    hi = lo + span / 64
    assert np.all(z >= lo - 1e-6) and np.all(z <= hi + 1e-6)
    # sorted per ray by construction
    assert np.all(np.diff(z, axis=-1) > 0)


def test_sample_coarse_per_ray_bounds():
    # Adaptive renderer uses per-ray near/far bands.
    key = jax.random.PRNGKey(1)
    near = jnp.asarray(np.random.default_rng(0).uniform(0.5, 1.0, size=(1, 16)))
    far = near + 0.3
    z = np.asarray(sample_coarse(key, near, far, 20))
    assert np.all(z >= np.asarray(near)[..., None] - 1e-6)
    assert np.all(z <= np.asarray(far)[..., None] + 1e-6)


def test_sample_coarse_infinity_tail():
    key = jax.random.PRNGKey(2)
    near = jnp.full((1, 4), 0.8)
    far = jnp.full((1, 4), 1.8)
    z = np.asarray(sample_coarse(key, near, far, 8, infinity=5.0))
    assert z.shape == (1, 4, 8)
    np.testing.assert_allclose(z[..., -1], 5.0)


def test_sample_fine_concentrates_on_heavy_bins():
    # All weight in bin 10 of 64 -> all fine z-values inside that coarse bin.
    key = jax.random.PRNGKey(3)
    n_coarse, n_fine = 64, 256
    weights = np.zeros((1, 8, n_coarse), np.float32)
    weights[..., 10] = 1.0
    near = jnp.full((1, 8), 0.8)
    far = jnp.full((1, 8), 1.8)
    z = np.asarray(sample_fine(key, near, far, n_fine, jnp.asarray(weights)))
    assert z.shape == (1, 8, n_fine)
    lo = 0.8 + 10 / n_coarse
    hi = 0.8 + 11 / n_coarse
    frac_in_bin = np.mean((z >= lo) & (z <= hi))
    # 1e-5 weight floor leaks a little mass to other bins; bulk must be in bin 10.
    assert frac_in_bin > 0.95


def test_sample_fine_cdf_bucket_semantics():
    # Golden check of the searchsorted-right-minus-one bucket selection with a
    # deterministic CDF: weights [1, 3] over 2 bins -> P(bin0)=0.25.
    key = jax.random.PRNGKey(4)
    weights = jnp.asarray(np.array([[[1.0, 3.0]]], np.float32))
    near = jnp.zeros((1, 1))
    far = jnp.ones((1, 1))
    z = np.asarray(sample_fine(key, near, far, 4096, weights))
    frac_bin0 = np.mean(z < 0.5)
    assert abs(frac_bin0 - 0.25) < 0.03


def test_sample_fine_uniform_within_bucket():
    key = jax.random.PRNGKey(5)
    weights = jnp.asarray(np.ones((1, 1, 4), np.float32))
    near = jnp.zeros((1, 1))
    far = jnp.ones((1, 1))
    z = np.asarray(sample_fine(key, near, far, 8192, weights)).ravel()
    # uniform weights + in-bucket jitter => overall uniform on [0, 1)
    hist, _ = np.histogram(z, bins=8, range=(0, 1))
    assert hist.min() > 0.8 * hist.mean()


def test_sample_depth_reference_drops_mean():
    key = jax.random.PRNGKey(6)
    depth = jnp.full((2, 16, 1), 1.3)
    z = np.asarray(sample_depth(key, depth, 16, 0.01, mode="reference"))
    # behaviour-as-written: N(0, std), mean dropped (renderers.py:62-66)
    assert abs(z.mean()) < 0.005
    assert abs(z.std() - 0.01) < 0.005


def test_sample_depth_intended_adds_mean():
    key = jax.random.PRNGKey(7)
    depth = jnp.full((2, 16, 1), 1.3)
    z = np.asarray(sample_depth(key, depth, 16, 0.01, mode="intended"))
    assert abs(z.mean() - 1.3) < 0.005


def test_samplers_jit_and_grad_safe():
    # sample_fine must not propagate gradients through weights (detached).
    def f(w):
        z = sample_fine(jax.random.PRNGKey(0), jnp.zeros((1, 2)), jnp.ones((1, 2)), 4, w)
        return jnp.sum(z)

    g = jax.grad(f)(jnp.ones((1, 2, 8)))
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_band_samples_monotone():
    """sample_coarse output is sorted by construction (sample k jitters
    inside bin k): the adaptive renderer relies on this to skip the
    reference's explicit sort of the band z-values (renderers.py:494),
    which is an exact no-op but cost 2.2 ms/step on TPU."""
    key = jax.random.PRNGKey(123)
    near = jnp.asarray(np.random.default_rng(3).uniform(0.5, 1.2, (4, 257)))
    far = near + 0.3
    z = sample_coarse(key, near.astype(jnp.float32), far.astype(jnp.float32), 20)
    diffs = np.diff(np.asarray(z), axis=-1)
    assert (diffs > 0).all()
