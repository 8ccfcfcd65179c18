"""Alpha-composited volume integration.

Functional counterpart of the reference compositing chain
(``/root/reference/renderers.py:69-119``), with every constant pinned for
numerical parity (SURVEY.md §2 "Volume integral"):

  * depth deltas use a ``1e10`` tail,
  * ``alpha = 1 - exp(-sigma * delta)``,
  * transmittance is the shifted cumulative product of ``1 - alpha + 1e-10``
    with a leading 1,
  * the distance map weights *shifted* z-values whose tail is the
    ``infinity`` constant (1.8 — the far plane — by default),
  * white-background compositing adds ``1 - sum(weights)``.

The whole chain is elementwise + a cumulative product along the samples
axis; under ``jit`` XLA fuses it into the surrounding ray math.  The samples
axis is innermost so the rays axis stays free for mesh sharding.

Backward pass: the default VJP is closed-form (``jax.custom_vjp``) instead
of autodiff through ``cumprod``.  The compositing weights have an exact
adjoint — with ``u_j = 1 - alpha_j + eps``, ``T_i = prod_{j<i} u_j`` and
``w_i = alpha_i T_i``::

    dL/dalpha_k = G_k T_k - (1/u_k) * sum_{i>k} G_i w_i

where ``G_i = dL/dw_i`` collects the rgb / distance / weights cotangents.
That suffix sum is one reverse ``cumsum``; everything else is elementwise.
Autodiff of the same chain instead transposes the cumprod's associative
scan (a log-n pass stack inside ``transpose_jvp``), which is the dominant
piece of the render-backward glue measured in PERF.md round 4.  Set
``AVR_INTEGRAL_VJP=ad`` to fall back to plain autodiff (trace-time-bound:
flipping the env var after a step is compiled has no effect).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["volume_integral"]

_EPS = 1e-10


def _volume_integral_impl(
    z_vals: jnp.ndarray,  # (SB, R, n)
    sigmas: jnp.ndarray,  # (SB, R, n, 1)
    radiances: jnp.ndarray,  # (SB, R, n, 3)
    white_back: bool = True,
    infinity: float = 1.8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    dists = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1], jnp.full_like(z_vals[..., :1], 1e10)],
        axis=-1,
    )  # (SB, R, n)

    alpha = 1.0 - jnp.exp(-sigmas * dists[..., None])  # (SB, R, n, 1)

    trans = jnp.cumprod(1.0 - alpha + _EPS, axis=-2)
    trans = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1, :]), trans[..., :-1, :]], axis=-2
    )  # (SB, R, n, 1)

    weights = alpha * trans  # (SB, R, n, 1)

    rgb = jnp.sum(weights * radiances, axis=-2)  # (SB, R, 3)

    zz_vals = jnp.concatenate(
        [z_vals[..., 1:], jnp.full_like(z_vals[..., :1], infinity)], axis=-1
    )
    distance = jnp.sum(weights * zz_vals[..., None], axis=-2)  # (SB, R, 1)

    if white_back:
        accum = jnp.sum(weights, axis=-2)  # (SB, R, 1)
        rgb = rgb + (1.0 - accum)

    return rgb, distance, weights


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _volume_integral_cf(z_vals, sigmas, radiances, white_back=True, infinity=1.8):
    return _volume_integral_impl(z_vals, sigmas, radiances, white_back, infinity)


def _cf_fwd(z_vals, sigmas, radiances, white_back, infinity):
    dists = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1], jnp.full_like(z_vals[..., :1], 1e10)],
        axis=-1,
    )
    expn = jnp.exp(-sigmas * dists[..., None])  # (SB, R, n, 1) == 1 - alpha
    alpha = 1.0 - expn
    trans = jnp.cumprod(1.0 - alpha + _EPS, axis=-2)
    trans = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1, :]), trans[..., :-1, :]], axis=-2
    )
    weights = alpha * trans
    rgb = jnp.sum(weights * radiances, axis=-2)
    zz_vals = jnp.concatenate(
        [z_vals[..., 1:], jnp.full_like(z_vals[..., :1], infinity)], axis=-1
    )
    distance = jnp.sum(weights * zz_vals[..., None], axis=-2)
    if white_back:
        rgb = rgb + (1.0 - jnp.sum(weights, axis=-2))
    res = (sigmas, radiances, dists, zz_vals, expn, trans, weights)
    return (rgb, distance, weights), res


def _cf_bwd(white_back, infinity, res, cots):
    sigmas, radiances, dists, zz_vals, expn, trans, weights = res
    g_rgb, g_dist, g_w = cots  # (SB,R,3), (SB,R,1), (SB,R,n,1)

    # G_i = dL/dw_i, collecting every use of the weights downstream.
    G = jnp.sum(radiances * g_rgb[..., None, :], axis=-1, keepdims=True)
    if white_back:
        G = G - jnp.sum(g_rgb, axis=-1, keepdims=True)[..., None, :]
    G = G + g_dist[..., None, :] * zz_vals[..., None] + g_w  # (SB, R, n, 1)

    # dL/dalpha_k = G_k T_k - S_k / u_k with S_k the exclusive suffix sum of
    # G_i w_i (each later weight sees alpha_k through its transmittance).
    GW = G * weights
    suffix = jnp.flip(jnp.cumsum(jnp.flip(GW, axis=-2), axis=-2), axis=-2) - GW
    # u = 1 - alpha + eps, written as expn + eps: the subtraction form
    # reassociates under --xla_allow_excess_precision to (1 + eps) - alpha
    # == exactly 0 at saturated lanes (the round-2 PERF gotcha), making
    # suffix/u a 0/0 NaN.  expn == 1 - alpha exactly, with no subtraction.
    u = expn + _EPS
    dalpha = G * trans - suffix / u  # (SB, R, n, 1)

    # alpha = 1 - exp(-sigma * d):  d(alpha)/d(sigma) = expn * d,
    # d(alpha)/d(dists) = expn * sigma.  The dists tail (1e10) is constant.
    d_sigma = dalpha * expn * dists[..., None]
    dd = (dalpha * expn * sigmas)[..., 0]  # (SB, R, n) w.r.t. dists

    # z enters through dists (forward differences) and zz (shifted z with a
    # constant `infinity` tail).
    fwd_diff = dd[..., :-1]  # (SB, R, n-1)
    gw = (g_dist[..., None, :] * weights)[..., :-1, 0]
    zero = jnp.zeros_like(dd[..., :1])
    d_z = (
        jnp.concatenate([-fwd_diff, zero], axis=-1)
        + jnp.concatenate([zero, fwd_diff + gw], axis=-1)
    )

    d_rad = weights * g_rgb[..., None, :]  # (SB, R, n, 3)
    return d_z, d_sigma, d_rad


_volume_integral_cf.defvjp(_cf_fwd, _cf_bwd)


def volume_integral(
    z_vals: jnp.ndarray,  # (SB, R, n)
    sigmas: jnp.ndarray,  # (SB, R, n, 1)
    radiances: jnp.ndarray,  # (SB, R, n, 3)
    white_back: bool = True,
    infinity: float = 1.8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite per-sample (sigma, rgb) into pixel colour, distance, weights.

    Reference chain: ``/root/reference/renderers.py:69-119``.

    Returns:
      rgb: ``(SB, R, 3)`` composited colour (white background if requested).
      distance: ``(SB, R, 1)`` expected distance along the ray (computed
        against shifted z-values with an ``infinity`` tail).
      weights: ``(SB, R, n, 1)`` per-sample compositing weights.

    The backward pass uses the closed-form adjoint (module docstring) unless
    ``AVR_INTEGRAL_VJP=ad`` — read at trace time.
    """
    vjp = os.environ.get("AVR_INTEGRAL_VJP", "closed")
    if vjp == "ad":
        return _volume_integral_impl(z_vals, sigmas, radiances, white_back, infinity)
    if vjp != "closed":
        raise ValueError(
            f"AVR_INTEGRAL_VJP={vjp!r}: expected 'closed' (default) or 'ad' — "
            "refusing to silently run the default path on a typo"
        )
    return _volume_integral_cf(z_vals, sigmas, radiances, white_back, infinity)
