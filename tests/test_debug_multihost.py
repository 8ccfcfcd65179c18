"""Sanitizer + multihost helper tests (single-process semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avr_tpu.parallel.multihost import (
    gather_metrics,
    initialize,
    is_primary,
    process_count,
    process_index,
)
from avr_tpu.utils.debug import checked


def test_checked_raises_on_nan():
    def bad(x):
        return jnp.log(x) / jnp.sum(x - x)  # 0/0 -> nan

    f = checked(jax.jit(bad))
    with pytest.raises(Exception):
        f(jnp.ones((4,)))


def test_checked_passes_clean_fn():
    f = checked(jax.jit(lambda x: x * 2))
    np.testing.assert_allclose(np.asarray(f(jnp.ones((3,)))), 2.0)


def test_multihost_single_process_noops():
    initialize(num_processes=1)
    assert process_count() == 1
    assert process_index() == 0
    assert is_primary()
    out = gather_metrics({"loss": 1.5, "psnr": 30.0})
    assert out == {"loss": 1.5, "psnr": 30.0}
