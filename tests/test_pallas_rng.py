"""Pallas uniform kernel: distribution, determinism, key/block sensitivity.

The core-PRNG primitives (`pltpu.prng_seed`/`prng_random_bits`) have no CPU
lowering (not even in interpret mode), so these tests only run on a real TPU
backend — CI covers them via `scripts/verify_kernels_tpu.py`; here they skip
on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avr_tpu.ops.pallas.rng import pallas_uniform_2d

pytestmark = pytest.mark.skipif(
    jax.default_backend() in ("cpu", "gpu"),
    reason="core-PRNG primitives lower only on TPU",
)


def _draw(key, shape):
    return np.asarray(pallas_uniform_2d(key, shape))


def test_uniform_range_and_moments():
    u = _draw(jax.random.PRNGKey(0), (4, 81920))
    assert u.shape == (4, 81920)
    assert u.min() >= 0.0 and u.max() < 1.0
    np.testing.assert_allclose(u.mean(), 0.5, atol=5e-3)
    np.testing.assert_allclose(u.var(), 1.0 / 12.0, atol=5e-3)


def test_uniform_deterministic_and_key_sensitive():
    a = _draw(jax.random.PRNGKey(7), (2, 4096))
    b = _draw(jax.random.PRNGKey(7), (2, 4096))
    c = _draw(jax.random.PRNGKey(8), (2, 4096))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0.1


def test_uniform_blocks_decorrelated():
    # columns from different grid blocks must not repeat each other
    u = _draw(jax.random.PRNGKey(3), (2, 16384))
    blk0 = u[:, :8192]
    blk1 = u[:, 8192:]
    assert np.abs(blk0 - blk1).max() > 0.1
    corr = np.corrcoef(blk0.ravel(), blk1.ravel())[0, 1]
    assert abs(corr) < 0.02


def test_uniform_ragged_cols():
    u = _draw(jax.random.PRNGKey(1), (3, 1000))  # not a block multiple
    assert u.shape == (3, 1000)
    assert u.min() >= 0.0 and u.max() < 1.0
