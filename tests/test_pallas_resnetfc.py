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


# ---------------------------------------------------------------------------
# In-kernel positional-encoding prologue + sigmoid/relu epilogue (round 2):
# the kernel takes raw [coded | passthrough] lanes and returns activated
# (rgb, sigma); the Flax fallback (_apply_code + activate_out) is the oracle.
# ---------------------------------------------------------------------------

from avr_tpu.ops.pallas.resnetfc import CodeSpec

_SPEC = CodeSpec(num_freqs=6, freq_factor=1.5, include_input=True,
                 d_coded=3, d_pass=3)


def _make_coded(fused, dtype=jnp.float32):
    return ResnetFC(
        d_in=_SPEC.d_enc, d_out=4, n_blocks=N_BLOCKS, d_latent=D_LATENT,
        d_hidden=D_HIDDEN, combine_layer=COMBINE, fused=fused,
        code_spec=_SPEC, activate_out=True, dtype=dtype,
    )


@pytest.fixture(scope="module")
def setup_coded():
    rng = np.random.default_rng(23)
    SB, NS, B = 2, 1, 37
    p = jnp.asarray(rng.normal(size=(SB, NS, B, _SPEC.d_raw)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(SB, NS, B, D_LATENT)).astype(np.float32))
    variables = _make_coded("never").init(jax.random.PRNGKey(0), p, z)
    variables = jax.tree.map(
        lambda a: a + 0.01 * jnp.asarray(rng.normal(size=a.shape), a.dtype),
        variables,
    )
    return variables, p, z


def test_coded_param_shapes(setup_coded):
    variables, _, _ = setup_coded
    # lin_in consumes the *encoded* width even though inputs are raw
    assert variables["params"]["lin_in"]["kernel"].shape == (_SPEC.d_enc, D_HIDDEN)
    assert _SPEC.d_enc == 3 + 2 * 6 * 3 + 3  # input + sin/cos + viewdirs


@pytest.mark.parametrize("NS", [1, 2])
def test_coded_forward_matches_flax(setup_coded, NS):
    variables, p, z = setup_coded
    rng = np.random.default_rng(29 + NS)
    SB, _, B, _ = p.shape
    pm = jnp.asarray(rng.normal(size=(SB, NS, B, _SPEC.d_raw)).astype(np.float32))
    zm = jnp.asarray(rng.normal(size=(SB, NS, B, D_LATENT)).astype(np.float32))
    ref = _make_coded("never").apply(variables, pm, zm)
    out = _make_coded("always").apply(variables, pm, zm)
    assert out.shape == ref.shape == (SB, B, 4)
    # activated outputs: rgb in (0, 1), sigma >= 0
    assert float(jnp.min(out[..., 3])) >= 0.0
    assert 0.0 < float(jnp.min(out[..., :3])) and float(jnp.max(out[..., :3])) < 1.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("NS", [1, 2])
def test_coded_grads_match_flax(setup_coded, NS):
    variables, p, z = setup_coded
    rng = np.random.default_rng(31 + NS)
    SB, _, B, _ = p.shape
    pm = jnp.asarray(rng.normal(size=(SB, NS, B, _SPEC.d_raw)).astype(np.float32))
    zm = jnp.asarray(rng.normal(size=(SB, NS, B, D_LATENT)).astype(np.float32))

    def loss(fused, variables, p_, z_):
        out = _make_coded(fused).apply(variables, p_, z_)
        return jnp.sum(jnp.sin(3.0 * out))

    g_ref = jax.grad(lambda v, a, b: loss("never", v, a, b), argnums=(0, 1, 2))(
        variables, pm, zm
    )
    g_fus = jax.grad(lambda v, a, b: loss("always", v, a, b), argnums=(0, 1, 2))(
        variables, pm, zm
    )
    flat_ref, _ = jax.tree.flatten(g_ref)
    flat_fus, _ = jax.tree.flatten(g_fus)
    assert len(flat_ref) == len(flat_fus)
    # the top positional-encoding frequency (freq_factor * 2^5 = 48) scales
    # f32 rounding in the cos chain into the input cotangent — tolerance is
    # relative to that amplification
    for a, b in zip(flat_ref, flat_fus):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-3, rtol=2e-3
        )


def test_coded_code_viewdirs_variant():
    """use_code_viewdirs=True layout: all 6 lanes coded, none passed through
    (reference models.py:773-775)."""
    spec = CodeSpec(num_freqs=2, freq_factor=1.5, include_input=True,
                    d_coded=6, d_pass=0)
    rng = np.random.default_rng(37)
    p = jnp.asarray(rng.normal(size=(1, 1, 16, 6)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(1, 1, 16, D_LATENT)).astype(np.float32))

    def make(fused):
        return ResnetFC(
            d_in=spec.d_enc, d_out=4, n_blocks=N_BLOCKS, d_latent=D_LATENT,
            d_hidden=D_HIDDEN, combine_layer=COMBINE, fused=fused,
            code_spec=spec, activate_out=True,
        )

    variables = make("never").init(jax.random.PRNGKey(1), p, z)
    ref = make("never").apply(variables, p, z)
    out = make("always").apply(variables, p, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_coded_kernel_reuse_across_jits(setup_coded):
    """The lru-cached kernel factory must not bake one trace's constants
    into another (regression: jnp code matrices created inside the first
    jit leaked as tracers into the second)."""
    variables, p, z = setup_coded
    mod = _make_coded("always")
    out1 = jax.jit(mod.apply)(variables, p, z)
    g = jax.jit(jax.grad(lambda v: jnp.sum(mod.apply(v, p, z) ** 2)))(variables)
    assert jnp.all(jnp.isfinite(out1))
    assert all(jnp.all(jnp.isfinite(l)) for l in jax.tree.leaves(g))


# ---------------------------------------------------------------------------
# Stash mode: the forward-under-grad streams activations to HBM and the
# backward consumes them instead of recomputing (fused='stash'/'always_stash').
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("NS,coded", [(1, False), (2, False), (1, True), (2, True)])
def test_stash_matches_recompute(NS, coded):
    rng = np.random.default_rng(41 + NS + 2 * coded)
    cs = _SPEC if coded else None
    d_raw = _SPEC.d_raw if coded else D_IN
    d_in = _SPEC.d_enc if coded else D_IN
    p = jnp.asarray(rng.normal(size=(2, NS, 37, d_raw)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(2, NS, 37, D_LATENT)).astype(np.float32))

    def mk(fused):
        return ResnetFC(d_in=d_in, d_out=4, n_blocks=N_BLOCKS,
                        d_latent=D_LATENT, d_hidden=D_HIDDEN,
                        combine_layer=COMBINE, fused=fused, code_spec=cs,
                        activate_out=coded)

    v = mk("never").init(jax.random.PRNGKey(0), p, z)
    v = jax.tree.map(
        lambda a: a + 0.01 * jnp.asarray(rng.normal(size=a.shape), a.dtype), v
    )

    np.testing.assert_allclose(
        np.asarray(mk("always_stash").apply(v, p, z)),
        np.asarray(mk("never").apply(v, p, z)), atol=2e-5, rtol=2e-5,
    )

    def loss(fused, v_, p_, z_):
        return jnp.sum(jnp.sin(3.0 * mk(fused).apply(v_, p_, z_)))

    g_ref = jax.grad(lambda *a: loss("never", *a), argnums=(0, 1, 2))(v, p, z)
    g_st = jax.grad(lambda *a: loss("always_stash", *a), argnums=(0, 1, 2))(v, p, z)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_st)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("NS,coded", [(1, True), (2, True)])
def test_stash_backward_interleave_matches(NS, coded, monkeypatch):
    """AVR_BWD_INTERLEAVE=2 (half-block interleaved dgrad chains in the
    stash backward) produces the same gradients as the plain chain — the
    split only reassociates the wgrad/row-sum accumulations."""
    rng = np.random.default_rng(17 + NS)
    cs = _SPEC if coded else None
    d_in = _SPEC.d_enc if coded else D_IN
    d_raw = _SPEC.d_raw if coded else D_IN
    p = jnp.asarray(rng.normal(size=(2, NS, 37, d_raw)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(2, NS, 37, D_LATENT)).astype(np.float32))

    def mk():
        return ResnetFC(d_in=d_in, d_out=4, n_blocks=N_BLOCKS,
                        d_latent=D_LATENT, d_hidden=D_HIDDEN,
                        combine_layer=COMBINE, fused="always_stash",
                        code_spec=cs, activate_out=coded)

    v = mk().init(jax.random.PRNGKey(0), p, z)
    v = jax.tree.map(
        lambda a: a + 0.01 * jnp.asarray(rng.normal(size=a.shape), a.dtype), v
    )

    def loss(v_, p_, z_):
        return jnp.sum(jnp.sin(3.0 * mk().apply(v_, p_, z_)))

    from avr_tpu.ops.pallas import resnetfc as mod

    grads = {}
    for h in ("1", "2"):
        monkeypatch.setenv("AVR_BWD_INTERLEAVE", h)
        mod._make_fused.cache_clear()
        grads[h] = jax.grad(loss, argnums=(0, 1, 2))(v, p, z)
    mod._make_fused.cache_clear()
    for a, b in zip(jax.tree.leaves(grads["1"]), jax.tree.leaves(grads["2"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4)
