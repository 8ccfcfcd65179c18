"""Pallas TPU kernels: fused bilinear feature gather (fwd + bwd).

The pixel-aligned ``index`` gather (4 taps x C channels per query point)
is the memory-system hot spot of every field query (SURVEY.md §3.5), and
its *backward* is the single most pathological op in the XLA-lowered train
step: d/d-features is a 4-tap ``scatter-add`` which the TPU executes
serially (~29 ms/step at the benchmark shapes, measured — see PERF.md).

Both directions are therefore expressed as MXU contractions against the
VMEM-resident feature map (64x64x512 bf16 = 4 MB):

  * forward: build a (BLK, H*W) selector holding the 4 bilinear tap
    weights per point (flat-index comparisons — no 3D reshapes, which
    Mosaic's layout inference rejects) and contract with the (H*W, C)
    map: one matmul replaces the random-access gather.
  * backward d-features: the transpose contraction ``selᵀ @ g`` — a
    scatter-free (H*W, BLK) @ (BLK, C) matmul accumulated in an fp32 VMEM
    buffer across the sequential point grid.
  * backward d-coords: needs the per-tap dots ``<g, f_tap>``; computed
    from ``P = g @ featᵀ`` (one more MXU pass) + masked reductions, then
    the analytic bilinear weight derivative.

Batch is an explicit leading grid dimension (not ``vmap``) so the
accumulator-init predicate can use the point-grid index directly.

Forward/backward parity with the jnp reference implementation (and
therefore with torch ``grid_sample(align_corners=True, padding='border')``,
reference models.py:267) is pinned in ``tests/test_pallas_gather.py`` via
interpret mode.

Use :func:`gather_bilinear` as a drop-in for
``avr_tpu.ops.grid_sample.grid_sample_2d`` on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_bilinear", "gather_bilinear_windowed"]

_BLK = 512  # query points per grid step (bounds the selector's VMEM use)

def _mxu_precision(dtype):
    """f32 operands need HIGHEST (3-pass bf16) on the MXU: Mosaic's default
    single-pass runs f32 matmuls at bf16 precision (~1e-2 rel error, found
    by scripts/verify_kernels_tpu.py).  bf16 operands keep the default."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(dtype) == jnp.float32 else None)



def _taps(xy, H: int, W: int):
    """Shared fwd/bwd tap math: flat indices + interpolation weights."""
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
    idx = (
        (y0i * W + x0i)[:, None], (y0i * W + x1i)[:, None],
        (y1i * W + x0i)[:, None], (y1i * W + x1i)[:, None],
    )
    w = ((1.0 - wy) * (1.0 - wx), (1.0 - wy) * wx, wy * (1.0 - wx), wy * wx)
    return idx, w, wx, wy


def _selector(coords_ref, HW: int, H: int, W: int):
    blk = coords_ref.shape[0]
    idx, w, _, _ = _taps(coords_ref[...], H, W)
    pos = jax.lax.broadcasted_iota(jnp.int32, (blk, HW), 1)
    sel = (
        (pos == idx[0]).astype(jnp.float32) * w[0]
        + (pos == idx[1]).astype(jnp.float32) * w[1]
        + (pos == idx[2]).astype(jnp.float32) * w[2]
        + (pos == idx[3]).astype(jnp.float32) * w[3]
    )
    return sel


def _fwd_kernel(coords_ref, feat_ref, out_ref, *, H: int, W: int):
    """One block of query points against the full (H*W, C) feature map."""
    HW = feat_ref.shape[0]
    sel = _selector(coords_ref, HW, H, W)
    out = jnp.dot(
        sel.astype(feat_ref.dtype), feat_ref[...],
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(feat_ref.dtype),
    )
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel(coords_ref, feat_ref, g_ref, dfeat_ref, dcoords_ref,
                *, H: int, W: int):
    HW = feat_ref.shape[0]
    blk = coords_ref.shape[0]
    i = pl.program_id(1)

    xy = coords_ref[...]
    idx, w, wx, wy = _taps(xy, H, W)
    pos = jax.lax.broadcasted_iota(jnp.int32, (blk, HW), 1)
    m = [(pos == ix) for ix in idx]
    sel = (
        m[0].astype(jnp.float32) * w[0] + m[1].astype(jnp.float32) * w[1]
        + m[2].astype(jnp.float32) * w[2] + m[3].astype(jnp.float32) * w[3]
    )
    g = g_ref[...].astype(jnp.float32)

    # d-features: transpose one-hot contraction, accumulated across blocks.
    @pl.when(i == 0)
    def _init():
        dfeat_ref[...] = jnp.zeros_like(dfeat_ref)

    contrib = jax.lax.dot_general(
        sel.astype(feat_ref.dtype), g.astype(feat_ref.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(feat_ref.dtype),
    )  # (HW, C)
    dfeat_ref[...] += contrib

    # d-coords: per-tap dots <g, f_tap> via P = g @ featᵀ + masked sums.
    P = jax.lax.dot_general(
        g.astype(feat_ref.dtype), feat_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(feat_ref.dtype),
    )  # (BLK, HW)
    gf = [jnp.sum(jnp.where(mm, P, 0.0), axis=1, keepdims=True) for mm in m]
    d_wx = (gf[1] - gf[0]) * (1.0 - wy) + (gf[3] - gf[2]) * wy
    d_wy = (gf[2] - gf[0]) * (1.0 - wx) + (gf[3] - gf[1]) * wx

    # clamp zones have zero derivative w.r.t. the *unclamped* coordinate
    x_un = (xy[:, 0:1] + 1.0) * 0.5 * (W - 1)
    y_un = (xy[:, 1:2] + 1.0) * 0.5 * (H - 1)
    live_x = ((x_un > 0) & (x_un < W - 1)).astype(jnp.float32)
    live_y = ((y_un > 0) & (y_un < H - 1)).astype(jnp.float32)
    d_x = d_wx * live_x * (0.5 * (W - 1))
    d_y = d_wy * live_y * (0.5 * (H - 1))
    dcoords_ref[...] = jnp.concatenate([d_x, d_y], axis=1).astype(
        dcoords_ref.dtype
    )


def _pad_to(n: int, blk: int) -> int:
    return (n + blk - 1) // blk * blk


def _pad_pts(a, n_pad):
    n = a.shape[1]
    return a if n == n_pad else jnp.pad(a, ((0, 0), (0, n_pad - n), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_bilinear(
    features: jnp.ndarray, coords: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Bilinear-sample ``(B, H, W, C)`` features at ``(B, N, 2)`` coords.

    Drop-in for ``grid_sample_2d`` (align_corners=True, border padding,
    (x, y) in [-1, 1]) backed by the VMEM-resident Pallas kernels.
    """
    B, H, W, C = features.shape
    N = coords.shape[1]
    Np = _pad_to(max(N, 8), _BLK)
    coords_p = _pad_pts(coords, Np)

    def kernel(coords_ref, feat_ref, out_ref):
        _fwd_kernel(coords_ref.at[0], feat_ref.at[0], out_ref.at[0], H=H, W=W)

    out = pl.pallas_call(
        kernel,
        grid=(B, Np // _BLK),
        in_specs=[
            pl.BlockSpec((1, _BLK, 2), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H * W, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BLK, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), features.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * H * W * C, bytes_accessed=0, transcendentals=0,
        ),
    )(coords_p, features.reshape(B, H * W, C))
    return out[:, :N]


def _fwd(features, coords, interpret):
    return gather_bilinear(features, coords, interpret), (features, coords)


def _bwd(interpret, res, g):
    features, coords = res
    B, H, W, C = features.shape
    N = coords.shape[1]
    Np = _pad_to(max(N, 8), _BLK)
    coords_p = _pad_pts(coords, Np)
    g_p = _pad_pts(g, Np)

    def kernel(coords_ref, feat_ref, g_ref, dfeat_ref, dcoords_ref):
        _bwd_kernel(
            coords_ref.at[0], feat_ref.at[0], g_ref.at[0],
            dfeat_ref.at[0], dcoords_ref.at[0], H=H, W=W,
        )

    dfeat, dcoords = pl.pallas_call(
        kernel,
        grid=(B, Np // _BLK),
        in_specs=[
            pl.BlockSpec((1, _BLK, 2), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H * W, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLK, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H * W, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLK, 2), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H * W, C), jnp.float32),
            jax.ShapeDtypeStruct((B, Np, 2), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Np * H * W * C, bytes_accessed=0, transcendentals=0,
        ),
    )(coords_p, features.reshape(B, H * W, C), g_p)

    d_feat = dfeat.reshape(B, H, W, C).astype(features.dtype)
    d_coords = dcoords[:, :N].astype(coords.dtype)
    return d_feat, d_coords


gather_bilinear.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Windowed gather: per-block dynamic row windows.
#
# The one-hot contraction's flops scale with the selector width.  Queries
# from the adaptive renderer are spatially coherent (21 band samples per
# ray project into a few source-view rows; rays are pre-sorted by their
# marched point's row — see render_adaptive), so a block of 512 points
# usually touches a handful of the 64 feature-map rows.  This kernel
# contracts each block against 1..4 dynamically-positioned 16-row windows
# instead of the full map: coherent blocks run one window (4x fewer MXU
# and selector-build flops), incoherent blocks degrade to 4 windows =
# exactly the full-map cost.  Window placement is exact (computed from the
# block's own tap rows, windows tile a contiguous row range), so results
# are identical to the full-map kernel for every input.
# ---------------------------------------------------------------------------

_WIN_ROWS = 8  # rows per window; windows per block <= H / _WIN_ROWS


def _block_windows(coords, H, W, blk, wr):
    """Per-block (start_row, n_windows) covering every tap row exactly."""
    B, Np, _ = coords.shape
    y = jnp.clip((coords[..., 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    nblk = Np // blk
    lo = jnp.min(y0.reshape(B, nblk, blk), axis=-1)  # (B, nblk)
    hi = jnp.max(y1.reshape(B, nblk, blk), axis=-1)
    n_win = (hi - lo) // wr + 1
    # shift the start down so n_win windows stay inside [0, H)
    start = jnp.maximum(jnp.minimum(lo, H - n_win * wr), 0)
    return start.astype(jnp.int32), n_win.astype(jnp.int32)


def _win_selector(xy, rs_slice, rs_cover, H, W, blk, wr):
    """Selector over one window slice: (blk, wr * W) + tap masks.

    ``rs_slice`` is where the feature slice starts (capped to stay in
    bounds); ``rs_cover`` is the window's exclusive cover start — taps
    below it belong to an earlier window (prevents double counting when
    the last slice is shifted up because H % wr != 0).
    """
    WIN = wr * W
    idx, w, wx, wy = _taps(xy, H, W)
    pos = jax.lax.broadcasted_iota(jnp.int32, (blk, WIN), 1) + rs_slice * W
    cover = pos >= rs_cover * W
    m = [(pos == ix) & cover for ix in idx]
    sel = (
        m[0].astype(jnp.float32) * w[0] + m[1].astype(jnp.float32) * w[1]
        + m[2].astype(jnp.float32) * w[2] + m[3].astype(jnp.float32) * w[3]
    )
    return sel, m, w, wx, wy


def _wfwd_kernel(ws_ref, nw_ref, coords_ref, feat_ref, out_ref, *, H, W, wr):
    b = pl.program_id(0)
    i = pl.program_id(1)
    blk = coords_ref.shape[0]
    C = feat_ref.shape[1]
    WIN = wr * W
    xy = coords_ref[...]
    start = ws_ref[b, i]
    n_win = nw_ref[b, i]

    def body(wi, acc):
        rs_cover = start + wi * wr
        rs = jnp.minimum(rs_cover, H - wr)
        sel, _, _, _, _ = _win_selector(xy, rs, rs_cover, H, W, blk, wr)
        f = feat_ref[pl.ds(rs * W, WIN), :]
        return acc + jnp.dot(
            sel.astype(f.dtype), f, preferred_element_type=jnp.float32,
            precision=_mxu_precision(f.dtype),
        )

    acc = jax.lax.fori_loop(
        0, n_win, body, jnp.zeros((blk, C), jnp.float32)
    )
    out_ref[...] = acc.astype(out_ref.dtype)


def _wbwd_kernel(ws_ref, nw_ref, coords_ref, feat_ref, g_ref,
                 dfeat_ref, dcoords_ref, *, H, W, wr):
    b = pl.program_id(0)
    i = pl.program_id(1)
    blk = coords_ref.shape[0]
    WIN = wr * W
    xy = coords_ref[...]
    start = ws_ref[b, i]
    n_win = nw_ref[b, i]
    g = g_ref[...].astype(jnp.float32)

    @pl.when(i == 0)
    def _init():
        dfeat_ref[...] = jnp.zeros_like(dfeat_ref)

    _, w, wx, wy = _taps(xy, H, W)

    def body(wi, gf):
        rs_cover = start + wi * wr
        rs = jnp.minimum(rs_cover, H - wr)
        sel, m, _, _, _ = _win_selector(xy, rs, rs_cover, H, W, blk, wr)
        f = feat_ref[pl.ds(rs * W, WIN), :]
        dfeat_ref[pl.ds(rs * W, WIN), :] += jax.lax.dot_general(
            sel.astype(f.dtype), g.astype(f.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(f.dtype),
        )
        P = jax.lax.dot_general(
            g.astype(f.dtype), f,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(f.dtype),
        )  # (blk, WIN)
        return tuple(
            gf_t + jnp.sum(jnp.where(mm, P, 0.0), axis=1, keepdims=True)
            for gf_t, mm in zip(gf, m)
        )

    zero = jnp.zeros((blk, 1), jnp.float32)
    gf = jax.lax.fori_loop(0, n_win, body, (zero, zero, zero, zero))

    d_wx = (gf[1] - gf[0]) * (1.0 - wy) + (gf[3] - gf[2]) * wy
    d_wy = (gf[2] - gf[0]) * (1.0 - wx) + (gf[3] - gf[1]) * wx
    x_un = (xy[:, 0:1] + 1.0) * 0.5 * (W - 1)
    y_un = (xy[:, 1:2] + 1.0) * 0.5 * (H - 1)
    live_x = ((x_un > 0) & (x_un < W - 1)).astype(jnp.float32)
    live_y = ((y_un > 0) & (y_un < H - 1)).astype(jnp.float32)
    d_x = d_wx * live_x * (0.5 * (W - 1))
    d_y = d_wy * live_y * (0.5 * (H - 1))
    dcoords_ref[...] = jnp.concatenate([d_x, d_y], axis=1).astype(
        dcoords_ref.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_bilinear_windowed(
    features: jnp.ndarray, coords: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Windowed drop-in for :func:`gather_bilinear` (same exact semantics).

    Fast when query blocks are row-coherent (the adaptive band's
    ray-sorted queries); never slower than the full-map kernel by more
    than the per-window loop overhead.
    """
    B, H, W, C = features.shape
    N = coords.shape[1]
    Np = _pad_to(max(N, 8), _BLK)
    coords_p = _pad_pts(coords, Np)
    wr = min(_WIN_ROWS, H)
    ws, nw = _block_windows(coords_p, H, W, _BLK, wr)

    def kernel(ws_ref, nw_ref, coords_ref, feat_ref, out_ref):
        _wfwd_kernel(ws_ref, nw_ref, coords_ref.at[0], feat_ref.at[0],
                     out_ref.at[0], H=H, W=W, wr=wr)

    out = pl.pallas_call(
        kernel,
        grid=(B, Np // _BLK),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _BLK, 2), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H * W, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BLK, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), features.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * Np * wr * W * C, bytes_accessed=0,
            transcendentals=0,
        ),
    )(ws, nw, coords_p, features.reshape(B, H * W, C))
    return out[:, :N]


def _wfwd(features, coords, interpret):
    return gather_bilinear_windowed(features, coords, interpret), (
        features, coords,
    )


def _wbwd(interpret, res, g):
    features, coords = res
    B, H, W, C = features.shape
    N = coords.shape[1]
    Np = _pad_to(max(N, 8), _BLK)
    coords_p = _pad_pts(coords, Np)
    g_p = _pad_pts(g, Np)
    wr = min(_WIN_ROWS, H)
    ws, nw = _block_windows(coords_p, H, W, _BLK, wr)

    def kernel(ws_ref, nw_ref, coords_ref, feat_ref, g_ref, dfeat_ref,
               dcoords_ref):
        _wbwd_kernel(ws_ref, nw_ref, coords_ref.at[0], feat_ref.at[0],
                     g_ref.at[0], dfeat_ref.at[0], dcoords_ref.at[0],
                     H=H, W=W, wr=wr)

    dfeat, dcoords = pl.pallas_call(
        kernel,
        grid=(B, Np // _BLK),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _BLK, 2), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H * W, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLK, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H * W, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLK, 2), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H * W, C), jnp.float32),
            jax.ShapeDtypeStruct((B, Np, 2), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * wr * W * C, bytes_accessed=0,
            transcendentals=0,
        ),
    )(ws, nw, coords_p, features.reshape(B, H * W, C), g_p)

    d_feat = dfeat.reshape(B, H, W, C).astype(features.dtype)
    d_coords = dcoords[:, :N].astype(coords.dtype)
    return d_feat, d_coords


gather_bilinear_windowed.defvjp(_wfwd, _wbwd)


# ---------------------------------------------------------------------------
# Projected windowed gather: world points in, conditioning features out.
#
# The XLA glue between the renderers and the gather — world->cam rotation,
# perspective projection, align-corners grid normalization — costs a
# handful of (B, N, 2..3) fusions plus layout copies per step, and their
# backward again (PERF.md "band/uv build").  This variant moves the whole
# chain into the kernel: inputs are world points + the per-view packed
# projection scalars (march.pack_projection), the tap rows/windows are
# computed in-kernel (no host-side _block_windows pass), and the backward
# chains d_grid -> d_cam -> d_world in VMEM.
#
# Scope: the projection scalars are treated as conditioning constants
# (zero cotangent) — cameras are inputs, not parameters, here and in the
# reference.  Callers that need d/d-camera must use the grid-input path.
# ---------------------------------------------------------------------------


def _proj_grid(proj_ref, b, pts):
    """World points (blk, 3) -> align-corners grid via packed scalars.

    All math on 1-D ``(blk,)`` vectors, matching the march kernel's
    device-proven projection idiom (march.py ``_project``); verified
    against float64 to ~1e-6 on v5e.
    """
    p = lambda k: proj_ref[b, k]
    cx, cy, cz = pts[:, 0], pts[:, 1], pts[:, 2]
    camx = p(0) * cx + p(1) * cy + p(2) * cz + p(9)
    camy = p(3) * cx + p(4) * cy + p(5) * cz + p(10)
    camz = p(6) * cx + p(7) * cy + p(8) * cz + p(11)
    gx = -(camx / camz) * p(12) + p(14)
    gy = -(camy / camz) * p(13) + p(15)
    return gx, gy, camx, camy, camz


def _inkernel_window(gy, H, wr):
    """Per-block (start, n_win) from the block's own tap rows."""
    y = jnp.clip((gy + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    y0 = jnp.floor(y)
    lo = jnp.min(y0).astype(jnp.int32)
    hi = jnp.max(jnp.minimum(y0 + 1.0, H - 1)).astype(jnp.int32)
    n_win = (hi - lo) // wr + 1
    start = jnp.maximum(jnp.minimum(lo, H - n_win * wr), 0)
    return start, n_win


def _pfwd_kernel(proj_ref, pts_ref, feat_ref, out_ref, *, H, W, wr):
    b = pl.program_id(0)
    blk = pts_ref.shape[0]
    C = feat_ref.shape[1]
    WIN = wr * W
    gx, gy, _, _, _ = _proj_grid(proj_ref, b, pts_ref[...].astype(jnp.float32))
    xy = jnp.concatenate([gx[:, None], gy[:, None]], axis=1)
    start, n_win = _inkernel_window(gy, H, wr)

    def body(wi, acc):
        rs_cover = start + wi * wr
        rs = jnp.minimum(rs_cover, H - wr)
        sel, _, _, _, _ = _win_selector(xy, rs, rs_cover, H, W, blk, wr)
        f = feat_ref[pl.ds(rs * W, WIN), :]
        return acc + jnp.dot(
            sel.astype(f.dtype), f, preferred_element_type=jnp.float32,
            precision=_mxu_precision(f.dtype),
        )

    acc = jax.lax.fori_loop(0, n_win, body, jnp.zeros((blk, C), jnp.float32))
    out_ref[...] = acc.astype(out_ref.dtype)


def _pbwd_kernel(proj_ref, pts_ref, feat_ref, g_ref, dfeat_ref, dpts_ref,
                 *, H, W, wr):
    b = pl.program_id(0)
    i = pl.program_id(1)
    blk = pts_ref.shape[0]
    WIN = wr * W
    pts = pts_ref[...].astype(jnp.float32)
    gx, gy, camx, camy, camz = _proj_grid(proj_ref, b, pts)
    xy = jnp.concatenate([gx[:, None], gy[:, None]], axis=1)
    start, n_win = _inkernel_window(gy, H, wr)
    g = g_ref[...].astype(jnp.float32)

    @pl.when(i == 0)
    def _init():
        dfeat_ref[...] = jnp.zeros_like(dfeat_ref)

    _, w, wx, wy = _taps(xy, H, W)

    def body(wi, gf):
        rs_cover = start + wi * wr
        rs = jnp.minimum(rs_cover, H - wr)
        sel, m, _, _, _ = _win_selector(xy, rs, rs_cover, H, W, blk, wr)
        f = feat_ref[pl.ds(rs * W, WIN), :]
        dfeat_ref[pl.ds(rs * W, WIN), :] += jax.lax.dot_general(
            sel.astype(f.dtype), g.astype(f.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(f.dtype),
        )
        P = jax.lax.dot_general(
            g.astype(f.dtype), f,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(f.dtype),
        )  # (blk, WIN)
        return tuple(
            gf_t + jnp.sum(jnp.where(mm, P, 0.0), axis=1, keepdims=True)
            for gf_t, mm in zip(gf, m)
        )

    zero = jnp.zeros((blk, 1), jnp.float32)
    gf = jax.lax.fori_loop(0, n_win, body, (zero, zero, zero, zero))

    # d-grid (identical to the grid-input kernel)
    d_wx = (gf[1] - gf[0]) * (1.0 - wy) + (gf[3] - gf[2]) * wy
    d_wy = (gf[2] - gf[0]) * (1.0 - wx) + (gf[3] - gf[1]) * wx
    x_un = (xy[:, 0:1] + 1.0) * 0.5 * (W - 1)
    y_un = (xy[:, 1:2] + 1.0) * 0.5 * (H - 1)
    live_x = ((x_un > 0) & (x_un < W - 1)).astype(jnp.float32)
    live_y = ((y_un > 0) & (y_un < H - 1)).astype(jnp.float32)
    # to 1-D for the projection chain (see _proj_grid)
    d_gx = (d_wx * live_x * (0.5 * (W - 1)))[:, 0]
    d_gy = (d_wy * live_y * (0.5 * (H - 1)))[:, 0]

    # chain through the projection: gx = -(camx/camz)*fx + cx
    p = lambda k: proj_ref[b, k]
    d_camx = -d_gx * p(12) / camz
    d_camy = -d_gy * p(13) / camz
    d_camz = (d_gx * p(12) * camx + d_gy * p(13) * camy) / (camz * camz)
    # d_world = R^T d_cam (cam = R p + t)
    d_px = p(0) * d_camx + p(3) * d_camy + p(6) * d_camz
    d_py = p(1) * d_camx + p(4) * d_camy + p(7) * d_camz
    d_pz = p(2) * d_camx + p(5) * d_camy + p(8) * d_camz
    dpts_ref[...] = jnp.concatenate(
        [d_px[:, None], d_py[:, None], d_pz[:, None]], axis=1
    ).astype(dpts_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gather_bilinear_projected(
    features: jnp.ndarray, points: jnp.ndarray, proj: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Windowed bilinear gather at the projection of world points.

    Args:
      features: ``(B, H, W, C)`` per-view feature maps.
      points: ``(B, N, 3)`` world-space query points.
      proj: ``(B, 16)`` packed projection scalars
        (``avr_tpu.ops.pallas.march.pack_projection``).

    Equivalent to projecting outside (world->cam, ``-xy/z*f + c``,
    align-corners normalize) and calling :func:`gather_bilinear_windowed`,
    with the whole chain fused in VMEM.  ``proj`` receives a zero
    cotangent (cameras are conditioning constants).
    """
    B, H, W, C = features.shape
    N = points.shape[1]
    Np = _pad_to(max(N, 8), _BLK)
    pts_p = _pad_pts(points, Np)
    wr = min(_WIN_ROWS, H)

    def kernel(proj_ref, pts_ref, feat_ref, out_ref):
        _pfwd_kernel(proj_ref, pts_ref.at[0], feat_ref.at[0], out_ref.at[0],
                     H=H, W=W, wr=wr)

    out = pl.pallas_call(
        kernel,
        grid=(B, Np // _BLK),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _BLK, 3), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H * W, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BLK, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), features.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * Np * wr * W * C, bytes_accessed=0, transcendentals=0,
        ),
    )(proj.astype(jnp.float32), pts_p, features.reshape(B, H * W, C))
    return out[:, :N]


def _pfwd(features, points, proj, interpret):
    return gather_bilinear_projected(features, points, proj, interpret), (
        features, points, proj,
    )


def _pbwd(interpret, res, g):
    features, points, proj = res
    B, H, W, C = features.shape
    N = points.shape[1]
    Np = _pad_to(max(N, 8), _BLK)
    pts_p = _pad_pts(points, Np)
    g_p = _pad_pts(g, Np)
    wr = min(_WIN_ROWS, H)

    def kernel(proj_ref, pts_ref, feat_ref, g_ref, dfeat_ref, dpts_ref):
        _pbwd_kernel(proj_ref, pts_ref.at[0], feat_ref.at[0], g_ref.at[0],
                     dfeat_ref.at[0], dpts_ref.at[0], H=H, W=W, wr=wr)

    dfeat, dpts = pl.pallas_call(
        kernel,
        grid=(B, Np // _BLK),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _BLK, 3), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H * W, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLK, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H * W, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLK, 3), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H * W, C), jnp.float32),
            jax.ShapeDtypeStruct((B, Np, 3), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * wr * W * C, bytes_accessed=0, transcendentals=0,
        ),
    )(proj.astype(jnp.float32), pts_p, features.reshape(B, H * W, C), g_p)

    d_feat = dfeat.reshape(B, H, W, C).astype(features.dtype)
    d_pts = dpts[:, :N].astype(points.dtype)
    return d_feat, d_pts, jnp.zeros_like(proj)


gather_bilinear_projected.defvjp(_pfwd, _pbwd)
