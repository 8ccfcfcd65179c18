"""Scatter-free permutation gathers.

``jnp.take_along_axis``'s VJP is a ``scatter-add`` — on TPU a serialized,
bandwidth-hostile op.  When the index array is a *permutation* (the sort /
un-sort pairs used for gather locality in the renderers), the adjoint of
"gather rows by ``order``" is exactly "gather rows by the inverse
permutation" — no scatter needed.  :func:`permutation_take` encodes that:
forward and backward are both plain gathers.

Used by the point-level locality sort in ``renderers/volume.py`` (1.6 M
rows at bench shapes — the scatter there is the expensive one), the
ray-level band sort in ``renderers/adaptive.py``, and the fused-march ray
sort in ``models/wrapper.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["permutation_take"]


def _take_rows(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis on axis 1 with ``idx`` (..., N) broadcast over
    trailing dims of ``a`` (..., N, *rest)."""
    expanded = idx.reshape(idx.shape + (1,) * (a.ndim - idx.ndim))
    return jnp.take_along_axis(a, expanded, axis=1)


@jax.custom_vjp
def permutation_take(a: jnp.ndarray, order: jnp.ndarray, inv: jnp.ndarray):
    """``a[:, order]`` where ``order`` is a permutation with inverse ``inv``.

    ``a``: (B, N, *rest); ``order``/``inv``: (B, N) with
    ``order[b][inv[b]] == arange(N)``.  Gradient flows to ``a`` only, as a
    gather by ``inv`` (never a scatter).  Callers already hold both
    directions (``inv = argsort(order)``), so passing both is free.

    **Reverse-mode only**: this is a ``jax.custom_vjp`` with no JVP rule, so
    forward-mode differentiation (``jax.jvp``, ``jax.hessian``-style HVPs)
    through any sorted renderer path raises.  Deliberate: routing the JVP
    through ``take_along_axis`` and letting JAX transpose it would bring the
    scatter-add adjoint back, which is the op this module exists to avoid.
    (The forward tangent, were one needed, is just ``_take_rows(t, order)``.)
    """
    return _take_rows(a, order)


def _fwd(a, order, inv):
    return _take_rows(a, order), (order, inv)


def _bwd(res, g):
    order, inv = res
    zeros = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return _take_rows(g, inv), zeros(order), zeros(inv)


permutation_take.defvjp(_fwd, _bwd)
