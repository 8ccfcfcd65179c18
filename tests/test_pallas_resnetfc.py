"""Fused Pallas ResnetFC decoder vs the Flax module (values and grads).

Runs the kernel in interpret mode on CPU (conftest pins the cpu backend);
the Flax path with the identical parameters is the oracle — itself pinned
against a numpy re-implementation of the reference decoder in
``test_models.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avr_tpu.models.mlp import ResnetFC

D_IN, D_LATENT, D_HIDDEN, D_OUT = 13, 64, 128, 4
N_BLOCKS, COMBINE = 3, 2


def _make(fused, dtype=jnp.float32):
    return ResnetFC(
        d_in=D_IN, d_out=D_OUT, n_blocks=N_BLOCKS, d_latent=D_LATENT,
        d_hidden=D_HIDDEN, combine_layer=COMBINE, fused=fused, dtype=dtype,
    )


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    SB, NS, B = 2, 1, 37  # B=37 exercises the block padding path
    x = jnp.asarray(rng.normal(size=(SB, NS, B, D_IN)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(SB, NS, B, D_LATENT)).astype(np.float32))
    variables = _make("never").init(jax.random.PRNGKey(0), x, z)
    # break the zero-init of fc_1 so block outputs actually differ
    variables = jax.tree.map(
        lambda a: a + 0.01 * jnp.asarray(rng.normal(size=a.shape), a.dtype),
        variables,
    )
    return variables, x, z


def test_fused_forward_matches_flax(setup):
    variables, x, z = setup
    ref = _make("never").apply(variables, x, z)
    out = _make("always").apply(variables, x, z)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_grads_match_flax(setup):
    variables, x, z = setup

    def loss(fused, variables, x, z):
        out = _make(fused).apply(variables, x, z)
        return jnp.sum(jnp.sin(out))  # non-uniform cotangent

    g_ref = jax.grad(lambda v, x, z: loss("never", v, x, z), argnums=(0, 1, 2))(
        variables, x, z
    )
    g_fus = jax.grad(lambda v, x, z: loss("always", v, x, z), argnums=(0, 1, 2))(
        variables, x, z
    )
    flat_ref, _ = jax.tree.flatten(g_ref)
    flat_fus, tree = jax.tree.flatten(g_fus)
    assert len(flat_ref) == len(flat_fus)
    for a, b in zip(flat_ref, flat_fus):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4
        )


def test_fused_bf16_close_to_f32(setup):
    variables, x, z = setup
    ref = _make("never").apply(variables, x, z)
    out = _make("always", dtype=jnp.bfloat16).apply(variables, x, z)
    assert out.dtype == jnp.float32  # kernel returns fp32 regardless
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05, rtol=0.05)


@pytest.mark.parametrize("NS", [2, 3])
def test_fused_multiview_forward_matches_flax(setup, NS):
    """NS > 1 runs the kernel's in-VMEM mean pool at the combine layer
    (reference models.py:579-581); values must match the Flax module."""
    variables, x, z = setup
    rng = np.random.default_rng(11 + NS)
    SB, _, B, _ = x.shape
    xm = jnp.asarray(rng.normal(size=(SB, NS, B, D_IN)).astype(np.float32))
    zm = jnp.asarray(rng.normal(size=(SB, NS, B, D_LATENT)).astype(np.float32))
    ref = _make("never").apply(variables, xm, zm)
    out = _make("always").apply(variables, xm, zm)
    assert out.shape == ref.shape == (SB, B, D_OUT)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("NS", [2, 3])
def test_fused_multiview_grads_match_flax(setup, NS):
    variables, x, z = setup
    rng = np.random.default_rng(17 + NS)
    SB, _, B, _ = x.shape
    xm = jnp.asarray(rng.normal(size=(SB, NS, B, D_IN)).astype(np.float32))
    zm = jnp.asarray(rng.normal(size=(SB, NS, B, D_LATENT)).astype(np.float32))

    def loss(fused, variables, x, z):
        out = _make(fused).apply(variables, x, z)
        return jnp.sum(jnp.sin(out))

    g_ref = jax.grad(lambda v, x, z: loss("never", v, x, z), argnums=(0, 1, 2))(
        variables, xm, zm
    )
    g_fus = jax.grad(lambda v, x, z: loss("always", v, x, z), argnums=(0, 1, 2))(
        variables, xm, zm
    )
    flat_ref, _ = jax.tree.flatten(g_ref)
    flat_fus, _ = jax.tree.flatten(g_fus)
    assert len(flat_ref) == len(flat_fus)
    for a, b in zip(flat_ref, flat_fus):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4
        )


def test_fused_multiview_max_combine_falls_back(setup):
    """combine_type=max has no kernel path for NS > 1; the Flax fallback
    must produce it (no crash, exact values)."""
    variables, x, z = setup
    SB, _, B, _ = x.shape
    x2 = jnp.concatenate([x, 2.0 * x], axis=1)
    z2 = jnp.concatenate([z, 0.5 * z], axis=1)

    def make(fused):
        return ResnetFC(
            d_in=D_IN, d_out=D_OUT, n_blocks=N_BLOCKS, d_latent=D_LATENT,
            d_hidden=D_HIDDEN, combine_layer=COMBINE, combine_type="max",
            fused=fused,
        )

    ref = make("never").apply(variables, x2, z2)
    out = make("always").apply(variables, x2, z2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
