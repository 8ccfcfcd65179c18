"""Fused Pallas volume integral vs avr_tpu.ops.integrate.volume_integral
(values and grads, interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from avr_tpu.ops.integrate import volume_integral
from avr_tpu.ops.pallas.integrate import fused_volume_integral

SB, R, N = 2, 300, 20  # R off the 512 block: exercises ray padding


def _data():
    rng = np.random.default_rng(0)
    z = np.sort(rng.uniform(0.6, 1.9, size=(SB, R, N)).astype(np.float32), -1)
    sig = np.abs(rng.normal(size=(SB, R, N, 1))).astype(np.float32) * 3.0
    sig[0, :50] = 0.0  # fully transparent rays: white-background branch
    rgb = jax.nn.sigmoid(
        jnp.asarray(rng.normal(size=(SB, R, N, 3)).astype(np.float32))
    )
    fo = jnp.concatenate([rgb, jnp.asarray(sig)], -1).reshape(SB, R * N, 4)
    g1 = jnp.asarray(rng.normal(size=(SB, R, 3)).astype(np.float32))
    g2 = jnp.asarray(rng.normal(size=(SB, R, 1)).astype(np.float32))
    return jnp.asarray(z), fo, g1, g2


def _ref(z, fo):
    f = fo.reshape(SB, R, N, 4)
    rgb, dist, _ = volume_integral(z, f[..., 3:4], f[..., :3], white_back=True)
    return rgb, dist


def _ker(z, fo):
    return fused_volume_integral(z, fo, white_back=True, interpret=True)


def test_fused_integral_forward():
    z, fo, _, _ = _data()
    (r_r, d_r), (r_k, d_k) = _ref(z, fo), _ker(z, fo)
    np.testing.assert_allclose(np.asarray(r_k), np.asarray(r_r), atol=2e-6)
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_r), atol=2e-6)
    # transparent rays composite to exactly the white background
    np.testing.assert_allclose(np.asarray(r_k[0, :50]), 1.0, atol=1e-6)


def test_fused_integral_grads():
    z, fo, g1, g2 = _data()

    def loss(f, z_, fo_):
        rgb, dist = f(z_, fo_)
        return jnp.sum(rgb * g1) + jnp.sum(dist * g2)

    gr = jax.grad(lambda a, b: loss(_ref, a, b), argnums=(0, 1))(z, fo)
    gk = jax.grad(lambda a, b: loss(_ker, a, b), argnums=(0, 1))(z, fo)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]), atol=1e-5)
    # d-sigma at saturated tail lanes scales with the 1e10 delta: compare
    # relative to the reference's magnitude
    scale = float(jnp.max(jnp.abs(gr[1])))
    np.testing.assert_allclose(
        np.asarray(gk[1]) / scale, np.asarray(gr[1]) / scale, atol=1e-6
    )
