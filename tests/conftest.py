"""Test configuration: run on CPU with 8 virtual devices.

Multi-device sharding semantics are tested without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md §4).  These env vars
must be set before JAX initializes, which conftest guarantees.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers (and pins) the axon TPU PJRT
# plugin before conftest runs; the config update below overrides it so the
# suite runs on the 8-device virtual CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _isolate_global_jax_config():
    """Keep process-global jax config from leaking across tests.

    The train CLI legitimately sets ``jax_default_prng_impl`` (rbg by
    default) for its process; when CLI tests run before numerical tests
    in the same process, later tests would otherwise see different
    random draws than when run alone (a real ordering flake, round 2).
    """
    impl = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != impl:
        jax.config.update("jax_default_prng_impl", impl)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
