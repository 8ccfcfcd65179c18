"""Depth samplers along rays (stratified / importance / depth-guided).

Functional counterparts of the reference samplers
(``/root/reference/renderers.py:4-66``) with explicit PRNG keys.  The exact
numerical semantics are pinned (SURVEY.md §2, §7):

  * :func:`sample_coarse` — per-bin uniform jitter over a linspace of bins
    between per-ray near/far maps (reference ``renderers.py:12-14``).
  * :func:`sample_fine` — *bucket-level* inverse-CDF importance sampling:
    ``searchsorted(cdf, u, right) - 1`` selects a coarse bin, then a fresh
    uniform re-jitters inside that bin rather than interpolating the CDF
    (reference ``renderers.py:36-46``).  Weights are gradient-stopped.
  * :func:`sample_depth` — the reference *as written* returns
    ``randn * depth_std`` without adding the depth mean (reference
    ``renderers.py:62-66``); callers then clamp to [near, far], piling the
    samples at ``near``.  ``mode="intended"`` gives the NeRF-intended
    ``depth + randn * std`` behaviour behind a flag (default stays
    reference-exact for parity).

All samplers are shape-static and jit/vmap/shard-friendly: inputs are
``(SB, R)`` near/far maps and outputs are ``(SB, R, n)`` z-values, with the
rays axis free to be sharded across the mesh.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["sample_coarse", "sample_fine", "sample_depth"]


def _uniform_2d(key, shape, dtype=jnp.float32):
    """Uniform draw generated in a flat 2D ``(lead, rest)`` layout.

    ``key`` may be a PRNG key (legacy streams) or a
    :class:`~avr_tpu.ops.hashrng.RaySeeds` — the sharding-invariant per-ray
    counter hash, where the draw depends only on the ray's *global* id so
    any mesh/step-impl consumes identical randomness (``rng_mode`` knob).

    Key path: the samplers want ``(SB, R, n)`` with n ~ 20-32: the VPU
    processes the RNG's bits->float chain slowly in trailing-n /
    flattened-1D layouts (~2 ms/step at benchmark shapes, PERF.md lever 5).
    On TPU backends the bits come from the core PRNG via a Pallas kernel in
    a tiled 2D layout (XLA flattens the rbg chain to 1D regardless of the
    requested shape); elsewhere, a flat-2D ``jax.random`` draw.
    """
    from avr_tpu.ops.hashrng import RaySeeds, hash_uniform

    if isinstance(key, RaySeeds):
        return hash_uniform(key, shape).astype(dtype)
    flat = (shape[0], int(np.prod(shape[1:]))) if len(shape) > 2 else shape
    if (
        dtype == jnp.float32
        and len(flat) == 2
        and jax.default_backend() not in ("cpu", "gpu")
    ):
        from avr_tpu.ops.pallas.rng import pallas_uniform_2d

        return pallas_uniform_2d(key, flat).reshape(shape)
    return jax.random.uniform(key, flat, dtype=dtype).reshape(shape)


def _normal_2d(key, shape, dtype=jnp.float32):
    """Normal draw in a flat 2D layout (see :func:`_uniform_2d`)."""
    from avr_tpu.ops.hashrng import RaySeeds, hash_normal

    if isinstance(key, RaySeeds):
        return hash_normal(key, shape).astype(dtype)
    flat = (shape[0], int(np.prod(shape[1:]))) if len(shape) > 2 else shape
    return jax.random.normal(key, flat, dtype=dtype).reshape(shape)


def sample_coarse(
    key: jax.Array,
    near: jnp.ndarray,  # (SB, R)
    far: jnp.ndarray,  # (SB, R)
    num_samples: int,
    infinity: float = -1.0,
) -> jnp.ndarray:
    """Stratified z-values: ``n`` bins in [near, far], uniform jitter per bin.

    Returns ``(SB, R, num_samples)``.  ``infinity != -1`` shifts bins left by
    one and appends ``infinity`` (reference ``renderers.py:16-19``; unused by
    the in-repo callers but kept for surface parity).
    """
    steps = jnp.arange(num_samples, dtype=jnp.float32) / num_samples
    span = far - near  # (SB, R)
    z_vals = near[..., None] + span[..., None] * steps  # (SB, R, n)
    jitter = _uniform_2d(key, z_vals.shape, z_vals.dtype)
    z_vals = z_vals + jitter * span[..., None] / num_samples
    if infinity != -1.0:
        tail = jnp.full_like(z_vals[..., :1], infinity)
        z_vals = jnp.concatenate([z_vals[..., 1:], tail], axis=-1)
    return z_vals


def sample_fine(
    key: jax.Array,
    near: jnp.ndarray,  # (SB, R)
    far: jnp.ndarray,  # (SB, R)
    num_samples: int,
    weights: jnp.ndarray,  # (SB, R, n_coarse) or (SB, R, n_coarse, 1)
) -> jnp.ndarray:
    """Bucket-level inverse-CDF importance sampling over coarse weights.

    Semantics pinned to reference ``renderers.py:27-54``: weights are
    detached and floored by 1e-5, the CDF gets a 0 prepended, bins are
    selected with ``searchsorted(..., right) - 1`` clamped at 0, and the
    sample re-jitters *uniformly inside the selected coarse bin*.

    Returns ``(SB, R, num_samples)``.
    """
    if weights.ndim == 4:
        weights = weights[..., 0]
    n_coarse = weights.shape[-1]
    w = jax.lax.stop_gradient(weights) + 1e-5
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (SB, R, n+1)

    from avr_tpu.ops.hashrng import split_any

    k_u, k_jitter = split_any(key)
    u_shape = weights.shape[:-1] + (num_samples,)
    u = _uniform_2d(k_u, u_shape)
    # searchsorted is along the last axis; vmap over the leading dims.
    inds = jax.vmap(jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right")))(cdf, u)
    inds = jnp.maximum(inds.astype(jnp.float32) - 1.0, 0.0)

    z_steps = (inds + _uniform_2d(k_jitter, u_shape)) / n_coarse
    return near[..., None] + (far - near)[..., None] * z_steps


def sample_depth(
    key: jax.Array,
    depth: jnp.ndarray,  # (SB, R, 1)
    num_samples: int,
    depth_std: float,
    mode: str = "reference",
) -> jnp.ndarray:
    """Depth-guided gaussian samples.

    ``mode="reference"`` reproduces the reference behaviour-as-written
    (``renderers.py:56-66``): ``N(0, depth_std)`` with the depth mean
    dropped.  ``mode="intended"`` adds the mean (``depth + sigma * randn``),
    the behaviour the surrounding NeRF machinery intends.

    Returns ``(SB, R, num_samples)``.
    """
    SB, R, _ = depth.shape
    noise = _normal_2d(key, (SB, R, num_samples)) * depth_std
    if mode == "reference":
        return noise
    if mode == "intended":
        return depth + noise
    raise ValueError(f"unknown sample_depth mode: {mode!r}")
