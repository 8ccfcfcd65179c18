"""Golden tests for volume_integral vs an independent numpy oracle.

Oracle follows the compositing math of reference renderers.py:69-119
(1e10 delta tail, 1e-10 cumprod epsilon, shifted-z distance map with the
`infinity` tail, white-background compositing).
"""

import numpy as np
import jax
import jax.numpy as jnp

from avr_tpu.ops.integrate import volume_integral


def np_volume_integral(z, sigmas, rgbs, white_back=True, infinity=1.8):
    d = np.concatenate([z[..., 1:] - z[..., :-1], np.full_like(z[..., :1], 1e10)], -1)
    alpha = 1.0 - np.exp(-sigmas * d[..., None])
    t = np.cumprod(1.0 - alpha + 1e-10, axis=-2)
    t = np.concatenate([np.ones_like(alpha[..., :1, :]), t[..., :-1, :]], -2)
    w = alpha * t
    rgb = (w * rgbs).sum(-2)
    zz = np.concatenate([z[..., 1:], np.full_like(z[..., :1], infinity)], -1)
    dist = (w * zz[..., None]).sum(-2)
    if white_back:
        rgb = rgb + (1.0 - w.sum(-2))
    return rgb, dist, w


def _random_inputs(rng, SB=2, R=8, n=16):
    z = np.sort(rng.uniform(0.8, 1.8, size=(SB, R, n)), axis=-1).astype(np.float32)
    sig = rng.uniform(0.0, 30.0, size=(SB, R, n, 1)).astype(np.float32)
    rgb = rng.uniform(0.0, 1.0, size=(SB, R, n, 3)).astype(np.float32)
    return z, sig, rgb


def test_matches_oracle(rng):
    z, sig, rgb = _random_inputs(rng)
    for wb in (True, False):
        got = volume_integral(jnp.asarray(z), jnp.asarray(sig), jnp.asarray(rgb), white_back=wb)
        want = np_volume_integral(z, sig, rgb, white_back=wb)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5, atol=1e-5)


def test_empty_space_is_white():
    z = jnp.linspace(0.8, 1.8, 16)[None, None, :]
    sig = jnp.zeros((1, 1, 16, 1))
    rgb = jnp.zeros((1, 1, 16, 3))
    out, _, w = volume_integral(z, sig, rgb, white_back=True)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-9)


def test_opaque_first_sample_dominates():
    z = jnp.linspace(0.8, 1.8, 16)[None, None, :]
    sig = jnp.zeros((1, 1, 16, 1)).at[0, 0, 0, 0].set(1e4)
    rgb = jnp.zeros((1, 1, 16, 3)).at[0, 0, 0].set(jnp.asarray([0.2, 0.4, 0.6]))
    out, dist, w = volume_integral(z, sig, rgb, white_back=False)
    np.testing.assert_allclose(np.asarray(out)[0, 0], [0.2, 0.4, 0.6], atol=1e-4)
    # distance uses *shifted* z (the next z value), per reference semantics
    np.testing.assert_allclose(np.asarray(dist)[0, 0, 0], float(z[0, 0, 1]), atol=1e-4)


def test_closed_form_vjp_matches_autodiff(rng):
    """The custom (closed-form) VJP must equal plain autodiff of the same chain.

    Exercises every cotangent path (rgb, distance, weights) and every input
    (z, sigma, radiance), both white_back settings, in float64 so any adjoint
    derivation error shows up far above rounding noise.
    """
    from avr_tpu.ops.integrate import _volume_integral_cf, _volume_integral_impl

    jax.config.update("jax_enable_x64", True)
    try:
        z, sig, rgb = _random_inputs(rng, SB=2, R=6, n=12)
        z, sig, rgb = (jnp.asarray(a, dtype=jnp.float64) for a in (z, sig, rgb))
        for wb in (True, False):

            def scalarize(fn, wb=wb):
                def f(z, s, r):
                    out, dist, w = fn(z, s, r, wb, 1.8)
                    # distinct mixing coefficients so no cotangent path cancels
                    return (
                        jnp.sum(out * jnp.cos(out))
                        + 2.0 * jnp.sum(dist**2)
                        + 0.5 * jnp.sum(jnp.sin(3.0 * w))
                    )

                return f

            g_cf = jax.grad(scalarize(_volume_integral_cf), argnums=(0, 1, 2))(z, sig, rgb)
            g_ad = jax.grad(scalarize(_volume_integral_impl), argnums=(0, 1, 2))(z, sig, rgb)
            for a, b in zip(g_cf, g_ad):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-9)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_closed_form_vjp_finite_at_saturated_alpha_under_jit(rng):
    """Saturated alpha (sigma*delta large -> alpha == 1.0 in f32) must not NaN.

    Under jit, XLA's excess-precision reassociation turns ``(1 - alpha) + eps``
    into ``(1 + eps) - alpha`` == exactly 0 at saturated lanes, so a backward
    that divides by that expression hits 0/0.  Caught live: the VolumeRenderer
    CLI dryrun produced grad_norm=nan.  Must run JITTED — eagerly the
    reassociation never happens and the bug is invisible.
    """
    z, sig, rgb = _random_inputs(rng, SB=1, R=4, n=16)
    sig[..., 4:8, :] = 1e6  # saturate alpha mid-ray in f32

    @jax.jit
    def g(z, s, r):
        def loss(z, s, r):
            out, dist, w = volume_integral(z, s, r, white_back=True)
            return jnp.sum(out) + jnp.sum(dist) + jnp.sum(w)

        return jax.grad(loss, argnums=(0, 1, 2))(z, s, r)

    grads = g(jnp.asarray(z), jnp.asarray(sig), jnp.asarray(rgb))
    for a in grads:
        assert np.all(np.isfinite(np.asarray(a))), "NaN/inf grad at saturated alpha"


def test_closed_form_vjp_finite_when_expn_underflows_exactly(rng):
    """Divisor path pinned WITHOUT relying on XLA reassociation (advisor r4).

    The jitted test above only exercises the 0/0 regression if the backend's
    excess-precision reassociation actually fires.  Here ``sigma * delta`` is
    large enough that ``expn = exp(-sigma*delta)`` underflows to exactly 0.0
    in f32 *eagerly*, so the backward's ``suffix / (expn + eps)`` divisor hits
    its smallest value on every backend and mode.  Asserts the saturation
    premise itself, then finiteness of the closed-form grads both eager and
    jitted.
    """
    from avr_tpu.ops.integrate import _volume_integral_cf

    z, sig, rgb = _random_inputs(rng, SB=1, R=4, n=16)
    sig[..., 4:8, :] = 1e6
    z, sig, rgb = jnp.asarray(z), jnp.asarray(sig), jnp.asarray(rgb)

    # premise: alpha saturates to exactly 1.0 (expn exactly 0) on those lanes
    d = jnp.concatenate(
        [z[..., 1:] - z[..., :-1], jnp.full_like(z[..., :1], 1e10)], -1
    )
    expn = jnp.exp(-sig * d[..., None])
    assert np.all(np.asarray(expn)[..., 4:8, :] == 0.0)

    def loss(z, s, r):
        out, dist, w = _volume_integral_cf(z, s, r, True, 1.8)
        return jnp.sum(out) + jnp.sum(dist) + jnp.sum(w)

    for g_fn in (jax.grad(loss, argnums=(0, 1, 2)),
                 jax.jit(jax.grad(loss, argnums=(0, 1, 2)))):
        for a in g_fn(z, sig, rgb):
            assert np.all(np.isfinite(np.asarray(a)))


def test_integral_vjp_env_gate_rejects_typos(monkeypatch):
    """AVR_INTEGRAL_VJP must accept only 'closed'/'ad' (advisor r4: a typo
    like 'autodiff' silently selected the default path)."""
    import pytest

    z = jnp.linspace(0.8, 1.8, 8)[None, None, :]
    sig = jnp.ones((1, 1, 8, 1))
    rgb = jnp.ones((1, 1, 8, 3)) * 0.5
    monkeypatch.setenv("AVR_INTEGRAL_VJP", "autodiff")
    with pytest.raises(ValueError, match="AVR_INTEGRAL_VJP"):
        volume_integral(z, sig, rgb)
    monkeypatch.setenv("AVR_INTEGRAL_VJP", "ad")
    volume_integral(z, sig, rgb)  # valid fallback still works


def test_weights_sum_below_one_and_grads_finite(rng):
    z, sig, rgb = _random_inputs(rng)

    def loss(s):
        out, _, _ = volume_integral(jnp.asarray(z), s, jnp.asarray(rgb))
        return jnp.sum(out**2)

    g = jax.grad(loss)(jnp.asarray(sig))
    assert np.all(np.isfinite(np.asarray(g)))
    _, _, w = volume_integral(jnp.asarray(z), jnp.asarray(sig), jnp.asarray(rgb))
    assert np.all(np.asarray(w).sum(-2) <= 1.0 + 1e-5)
