"""Pallas TPU kernel: fused bilinear feature gather.

The pixel-aligned ``index`` gather (4 taps x C channels per query point)
is the memory-system hot spot of every field query (SURVEY.md §3.5).  XLA
lowers ``take_along_axis`` to a generic gather; this kernel instead keeps
the *entire* feature map resident in VMEM (64x64x512 bf16 = 4 MB — fits
comfortably) and turns the row-gather into an MXU matmul:

  1. build a one-hot (BLK, H) row-selector for the 4 taps' two rows and
     contract it with the (H, W*C) feature map on the MXU,
  2. per-point column selection + bilinear weighting on the VPU,

so the random-access pattern never touches HBM — each grid step streams
one block of query points through VMEM-resident features.

A ``custom_vjp`` supplies the backward pass: d/d-features is the transpose
one-hot matmul (a scatter-free MXU contraction), d/d-coords is the
analytic bilinear derivative.  Forward/backward parity with the jnp
reference implementation (and therefore with torch ``grid_sample``) is
pinned in ``tests/test_pallas_gather.py`` via interpret mode.

Use :func:`gather_bilinear` as a drop-in for
``avr_tpu.ops.grid_sample.grid_sample_2d`` on TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_bilinear"]

_BLK = 128  # query points per grid step (bounds the selector's VMEM use)


def _kernel(coords_ref, feat_ref, out_ref, *, H: int, W: int):
    """One block of query points against the full (H*W, C) feature map."""
    C = feat_ref.shape[-1]
    blk = coords_ref.shape[0]

    xy = coords_ref[...]  # (BLK, 2) in [-1, 1]
    x = jnp.clip((xy[:, 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    y = jnp.clip((xy[:, 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[:, None]  # (BLK, 1)
    wy = (y - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)

    # Bilinear interpolation as ONE MXU contraction: fold the 4 tap weights
    # into a (BLK, H*W) selector (4 nonzeros per row, built with flat-index
    # comparisons — no 3D reshapes, which Mosaic's layout inference
    # rejects) and contract with the pre-flattened (H*W, C) map.
    HW = feat_ref.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (blk, HW), 1)
    w00 = (1.0 - wy) * (1.0 - wx)  # (BLK, 1)
    w01 = (1.0 - wy) * wx
    w10 = wy * (1.0 - wx)
    w11 = wy * wx
    sel = (
        (pos == (y0i * W + x0i)[:, None]).astype(jnp.float32) * w00
        + (pos == (y0i * W + x1i)[:, None]).astype(jnp.float32) * w01
        + (pos == (y1i * W + x0i)[:, None]).astype(jnp.float32) * w10
        + (pos == (y1i * W + x1i)[:, None]).astype(jnp.float32) * w11
    )
    out = jnp.dot(
        sel.astype(feat_ref.dtype),
        feat_ref[...],
        preferred_element_type=jnp.float32,
    )
    out_ref[...] = out.astype(out_ref.dtype)


def _pad_to(n: int, blk: int) -> int:
    return (n + blk - 1) // blk * blk


def _forward_one(feat: jnp.ndarray, coords: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """(H, W, C), (N, 2) -> (N, C)."""
    H, W, C = feat.shape
    N = coords.shape[0]
    Np = _pad_to(max(N, 8), _BLK)
    coords_p = jnp.pad(coords, ((0, Np - N), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W),
        grid=(Np // _BLK,),
        in_specs=[
            pl.BlockSpec((_BLK, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H * W, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, C), feat.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(coords_p, feat.reshape(H * W, C))
    return out[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_bilinear(
    features: jnp.ndarray, coords: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Bilinear-sample ``(B, H, W, C)`` features at ``(B, N, 2)`` coords.

    Drop-in for ``grid_sample_2d`` (align_corners=True, border padding,
    (x, y) in [-1, 1]) backed by the VMEM-resident Pallas kernel.
    """
    return jax.vmap(lambda f, c: _forward_one(f, c, interpret))(features, coords)


def _fwd(features, coords, interpret):
    return gather_bilinear(features, coords, interpret), (features, coords)


def _bwd(interpret, res, g):
    """Analytic VJP (pure jnp — XLA's scatter-add handles d-features)."""
    features, coords = res
    B, H, W, C = features.shape

    x = jnp.clip((coords[..., 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    y = jnp.clip((coords[..., 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)

    def scatter(dflat, idx, w):
        # dflat: (N, C) cotangent contribution; idx: (N,) flat positions
        return jax.vmap(
            lambda df, ix, ww: jnp.zeros((H * W, C), df.dtype)
            .at[ix]
            .add(df * ww[:, None])
        )(dflat, idx, w)

    g = g.astype(jnp.float32)
    d00 = scatter(g, y0i * W + x0i, (1 - wy) * (1 - wx))
    d01 = scatter(g, y0i * W + x1i, (1 - wy) * wx)
    d10 = scatter(g, y1i * W + x0i, wy * (1 - wx))
    d11 = scatter(g, y1i * W + x1i, wy * wx)
    d_feat = (d00 + d01 + d10 + d11).reshape(B, H, W, C).astype(features.dtype)

    # d-coords: analytic bilinear derivative (gathers are cheap here)
    flat = features.reshape(B, H * W, C).astype(jnp.float32)

    def tap(yi, xi):
        return jnp.take_along_axis(flat, (yi * W + xi)[..., None], axis=1)

    f00 = tap(y0i, x0i)
    f01 = tap(y0i, x1i)
    f10 = tap(y1i, x0i)
    f11 = tap(y1i, x1i)
    gdot = lambda f: jnp.sum(g * f, axis=-1)
    # d/dwx and d/dwy of the bilinear blend
    d_wx = gdot((f01 - f00) * (1 - wy)[..., None] + (f11 - f10) * wy[..., None])
    d_wy = gdot((f10 - f00) * (1 - wx)[..., None] + (f11 - f01) * wx[..., None])
    # clamp zones have zero derivative w.r.t. the *unclamped* coordinate
    x_un = (coords[..., 0] + 1.0) * 0.5 * (W - 1)
    y_un = (coords[..., 1] + 1.0) * 0.5 * (H - 1)
    live_x = ((x_un > 0) & (x_un < W - 1)).astype(jnp.float32)
    live_y = ((y_un > 0) & (y_un < H - 1)).astype(jnp.float32)
    d_x = d_wx * live_x * 0.5 * (W - 1)
    d_y = d_wy * live_y * 0.5 * (H - 1)
    d_coords = jnp.stack([d_x, d_y], axis=-1).astype(coords.dtype)

    return d_feat, d_coords


gather_bilinear.defvjp(_fwd, _bwd)
