"""Pallas TPU kernel: fully-fused LSTM ray-march (fwd + custom VJP).

The SRN-style march (reference ``/root/reference/renderers.py:292-358``;
``avr_tpu.renderers.raymarch.lstm_march``) is 10 *dependent* tiny steps:
project the current point into the source view, bilinearly gather a
512-channel pixel-aligned feature, run a 512->16 LSTM cell, and step along
the ray.  As a ``lax.scan`` of XLA ops this costs ~10 kernel round-trips
per direction plus an HBM round-trip for every per-step feature tensor
(16k x 512 each), and its backward re-runs the 4-tap gather VJP ten times
(PERF.md: ~18.6 ms/step fwd+bwd at benchmark shapes).

Here the *entire march* is one kernel per (scene, ray-block) grid cell:

  * the feature map (64x64x512 bf16 = 4 MB) and the LSTM weights stay
    VMEM-resident across all steps;
  * the per-step gather is the same MXU one-hot contraction as
    ``avr_tpu.ops.pallas.gather`` (flat-index selector, border-clamp
    semantics identical to ``grid_sample(align_corners=True)``);
  * per-step carries (coords, h, c) never touch HBM mid-march; the forward
    stashes (v_t, h_{t-1}, c_{t-1}, coords_t) so the backward kernel can
    replay each step without re-gathering;
  * the backward accumulates d-latent in an fp32 VMEM buffer (scatter-free,
    same trick as the gather kernel) and the LSTM/step-head weight grads in
    VMEM accumulators across the sequential grid;
  * the reference's hidden-state gradient clamp (autograd hook ±10,
    renderers.py:335-336) is applied in-kernel to the *combined* hidden
    cotangent, exactly like the ``clamp_grad`` custom-vjp it replaces.

Gradients: latent, coords0, rds, and all LSTM/step-head parameters get
exact cotangents.  The packed projection scalars (``proj``) get zeros —
camera poses/intrinsics are data, never trained, in every reference
configuration (train.py optimizes model parameters only).

Multi-view (NS > 1): all views' feature maps sit stacked in VMEM and each
step gathers from every view and mean-pools (matching the scan path's NS
pooling); the backward routes ``dv / NS`` into each view's gather.

Early termination (``early_stop_eps > 0``, BASELINE config 4): rays whose
|predicted step| drops below the threshold freeze (scan-path masked-lane
semantics, raymarch.py:81-85) — and because freezing is monotone and a
frozen ray's LSTM state can no longer reach any output, the kernel skips a
block's gather + cell entirely once *all* of its rays have frozen (a
``lax.cond`` around the step body; the ray sort makes convergence
spatially coherent).  Values and gradients are exactly the scan path's.

Parity (values + all grads) against the unfused jnp path is pinned in
``tests/test_pallas_march.py`` via interpret mode.

Restriction (callers gate and fall back to the scan path): pixel-aligned
conditioning (``use_encoder``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_lstm_march", "pack_projection"]

_BLK = 512  # rays per grid step


def _mxu_precision(dtype):
    """f32 operands need HIGHEST (3-pass bf16) on the MXU: Mosaic's default
    single-pass runs f32 matmuls at bf16 precision (~1e-2 rel error)."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(dtype) == jnp.float32 else None)


def pack_projection(poses_w2c, focal, c, latent_scaling, image_shape):
    """Pack per-scene projection scalars into a ``(SB, 16)`` fp32 array.

    ``grid_x = -cam_x/cam_z * fxg + cxg`` with ``fxg = fx * sx`` and
    ``cxg = cx * sx - 1`` folds the pixel projection (reference
    models.py:799-805; focal already fy-negated) and the align-corners grid
    normalization into 4 scalars per scene.
    """
    SB = poses_w2c.shape[0]
    R = poses_w2c[:, :3, :3].reshape(SB, 9)
    t = poses_w2c[:, :3, 3]
    scale = (latent_scaling / image_shape)[None, :]  # (1, 2)
    focal = jnp.broadcast_to(focal.reshape(-1, 2), (SB, 2))
    cc = jnp.broadcast_to(c.reshape(-1, 2), (SB, 2))
    fg = focal * scale
    cg = cc * scale - 1.0
    return jnp.concatenate([R, t, fg, cg], axis=-1).astype(jnp.float32)


def _project(proj_ref, row, base, cx, cy, cz):
    """World coords -> align-corners grid coords via the packed scalars.

    ``base`` offsets into the row for multi-view layouts (view v's 16
    scalars live at ``[v * 16, (v + 1) * 16)``).
    """
    p = lambda k: proj_ref[row, base + k]
    camx = p(0) * cx + p(1) * cy + p(2) * cz + p(9)
    camy = p(3) * cx + p(4) * cy + p(5) * cz + p(10)
    camz = p(6) * cx + p(7) * cy + p(8) * cz + p(11)
    gx = -(camx / camz) * p(12) + p(14)
    gy = -(camy / camz) * p(13) + p(15)
    return gx, gy


def _taps(gx, gy, H: int, W: int):
    """Bilinear tap flat indices + weights (border clamp, align corners)."""
    x = jnp.clip((gx + 1.0) * 0.5 * (W - 1), 0.0, W - 1)
    y = jnp.clip((gy + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[:, None]
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


def _cell_fwd(v, h, c, wih_ref, whh_ref, b_ref, cd):
    """One LSTM step (gate order i, f, g, o like torch's LSTMCell)."""
    prec = _mxu_precision(cd)
    gates = (
        jnp.dot(v.astype(cd), wih_ref[...],
                preferred_element_type=jnp.float32, precision=prec)
        + jnp.dot(h.astype(cd), whh_ref[...],
                  preferred_element_type=jnp.float32, precision=prec)
        + b_ref[...].astype(jnp.float32)
    )
    Hh = whh_ref.shape[0]
    ig = jax.nn.sigmoid(gates[:, 0 * Hh : 1 * Hh])
    fg = jax.nn.sigmoid(gates[:, 1 * Hh : 2 * Hh])
    gg = jnp.tanh(gates[:, 2 * Hh : 3 * Hh])
    og = jax.nn.sigmoid(gates[:, 3 * Hh : 4 * Hh])
    c_new = fg * c + ig * gg
    tanh_c = jnp.tanh(c_new)
    h_new = og * tanh_c
    return h_new, c_new, (ig, fg, gg, og, tanh_c)


def _xyz(a):
    return a[:, 0], a[:, 1], a[:, 2]


def _cat3(x, y, z):
    return jnp.concatenate([x[:, None], y[:, None], z[:, None]], axis=1)


def _gather_view(proj_ref, feat_ref, row, view, cx, cy, cz, *, H, W, blk,
                 wr):
    """One view's windowed bilinear gather at the current march points.

    Windowed gather (see gather.py): the block's own tap rows pick
    1..H/wr dynamically-positioned wr-row windows; ray-sorted blocks
    (wrapper sorts rays by initial source-view row) stay coherent
    through the march, so this usually runs one window.  ``wr`` (window
    rows) trades one-hot contraction width against window count: at
    bench coherence 8 rows halves the (blk, wr*W) sel/P work vs 16.
    """
    HW = H * W
    gx, gy = _project(proj_ref, row, view * 16, cx, cy, cz)
    idx, w, _, _ = _taps(gx, gy, H, W)
    wr = min(wr, H)
    y0i = idx[0][:, 0] // W
    y1i = idx[2][:, 0] // W
    lo = jnp.min(y0i)
    hi = jnp.max(y1i)
    n_win = (hi - lo) // wr + 1
    start = jnp.maximum(jnp.minimum(lo, H - n_win * wr), 0)

    def win_body(wi, acc):
        rs_cover = start + wi * wr
        rs = jnp.minimum(rs_cover, H - wr)
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (blk, wr * W), 1)
            + rs * W
        )
        cover = pos >= rs_cover * W
        sel = (
            ((pos == idx[0]) & cover).astype(jnp.float32) * w[0]
            + ((pos == idx[1]) & cover).astype(jnp.float32) * w[1]
            + ((pos == idx[2]) & cover).astype(jnp.float32) * w[2]
            + ((pos == idx[3]) & cover).astype(jnp.float32) * w[3]
        )
        f = feat_ref[pl.ds(view * HW + rs * W, wr * W), :]
        return acc + jnp.dot(
            sel.astype(f.dtype), f, preferred_element_type=jnp.float32,
            precision=_mxu_precision(f.dtype),
        )

    return jax.lax.fori_loop(
        0, n_win, win_body, jnp.zeros((blk, feat_ref.shape[1]), jnp.float32)
    )


def _fwd_kernel(proj_ref, coords_ref, rds_ref, feat_ref, wih_ref, whh_ref,
                b_ref, wout_ref, bout_ref,
                out_ref, vst_ref, aux_ref,
                *, steps, H, W, hidden, ns, eps, cd, wr, stash_gates):
    cx, cy, cz = _xyz(coords_ref[...])
    rx, ry, rz = _xyz(rds_ref[...])
    blk = cx.shape[0]
    h = jnp.zeros((blk, hidden), jnp.float32)
    c = jnp.zeros((blk, hidden), jnp.float32)
    active = jnp.ones((blk,), jnp.float32)

    # gate stash layout is 8-lane aligned (Mosaic lane-slices at offsets
    # that are multiples of 8 avoid dynamic lane-shuffle penalties):
    # [h | c | cx cy cz act | pad-to-8 | ig fg gg og tanh_c | s | pad]
    g0 = _stash_g0(hidden)
    n_state = (g0 + 5 * hidden + 1) if stash_gates else (2 * hidden + 4)
    pad = jnp.zeros((blk, 128 - n_state), jnp.float32)
    pad_g = jnp.zeros((blk, g0 - (2 * hidden + 4)), jnp.float32)
    row = pl.program_id(0)  # hoisted: program_id can't bind inside fori_loop

    # fori_loop (not an unrolled Python loop): one step's body is large —
    # unrolling 10x blows Mosaic compile time with zero runtime benefit
    # (the steps are data-dependent, nothing pipelines across them).
    def body(t, carry):
        cx, cy, cz, h, c, active = carry
        if not stash_gates:
            # per-step carries packed into one lane-aligned (blk, 128)
            # stash row: [h | c | cx cy cz | active | 0-pad] (Mosaic
            # requires 128-lane-aligned stores)
            aux_ref[pl.ds(t, 1)] = jnp.concatenate(
                [h, c, cx[:, None], cy[:, None], cz[:, None],
                 active[:, None], pad], axis=1
            )[None]

        def run_step(op):
            cx, cy, cz, h, c, active = op
            # NS > 1: per-view gathers pooled by mean (matches the scan
            # path's jnp.mean over the NS axis, raymarch.py)
            v = _gather_view(proj_ref, feat_ref, row, 0, cx, cy, cz,
                             H=H, W=W, blk=blk, wr=wr)
            for view in range(1, ns):
                v = v + _gather_view(proj_ref, feat_ref, row, view,
                                     cx, cy, cz, H=H, W=W, blk=blk, wr=wr)
            if ns > 1:
                v = v * (1.0 / ns)
            vst_ref[pl.ds(t, 1)] = v.astype(vst_ref.dtype)[None]
            h2, c2, (ig, fg, gg, og, tanh_c) = _cell_fwd(
                v, h, c, wih_ref, whh_ref, b_ref, cd
            )
            s = (
                jnp.dot(h2.astype(cd), wout_ref[...],
                        preferred_element_type=jnp.float32,
                        precision=_mxu_precision(cd))
                + bout_ref[...].astype(jnp.float32)
            )[:, 0]
            if stash_gates:
                # the (blk, 128) stash row has 92 unused lanes at hidden=16
                # — store the gates, tanh(c_t) and raw step there so the
                # backward never replays the cell (saves the v@wih matmul
                # and ~5 transcendental passes per step): [h_prev | c_prev
                # | cx cy cz | active_in | ig fg gg og | tanh_c | s | pad]
                aux_ref[pl.ds(t, 1)] = jnp.concatenate(
                    [h, c, cx[:, None], cy[:, None], cz[:, None],
                     active[:, None], pad_g, ig, fg, gg, og, tanh_c,
                     s[:, None], pad], axis=1
                )[None]
            if eps > 0.0:
                # per-ray early termination (raymarch.py:81-85): frozen
                # rays keep marching the LSTM but step zero; freezing is
                # monotone so their downstream gradients vanish too
                s = s * active
                converged = (jnp.abs(s) < eps).astype(jnp.float32)
                active = active * (1.0 - converged)
            return (cx + rx * s, cy + ry * s, cz + rz * s, h2, c2, active)

        def skip_step(op):
            if stash_gates:
                # keep the backward's active lane valid for skipped steps
                # (everything else in the row is dead — bwd skips on
                # active == 0)
                aux_ref[pl.ds(t, 1)] = jnp.zeros(
                    (1, blk, 128), jnp.float32
                )
            return op

        if eps > 0.0:
            # whole-block skip: once every ray in this block has converged
            # the remaining steps cost nothing (gather + cell both skipped;
            # exact — frozen lanes' h/c never reach the outputs)
            return jax.lax.cond(
                jnp.max(active) > 0.0, run_step, skip_step, carry
            )
        return run_step(carry)

    cx, cy, cz, h, c, active = jax.lax.fori_loop(
        0, steps, body, (cx, cy, cz, h, c, active)
    )
    out_ref[...] = _cat3(cx, cy, cz)


def _gather_bwd_view(proj_ref, feat_ref, dfeat_ref, b_idx, view, dvc,
                     cx, cy, cz, *, H, W, blk, cd, wr):
    """One view's gather backward: accumulate d-latent into the view's
    slice and return the world-coordinate cotangents (dcx, dcy, dcz)."""
    HW = H * W
    base = view * 16
    gx, gy = _project(proj_ref, b_idx, base, cx, cy, cz)
    idx, w, wx, wy = _taps(gx, gy, H, W)
    wr = min(wr, H)
    y0i = idx[0][:, 0] // W
    y1i = idx[2][:, 0] // W
    lo = jnp.min(y0i)
    hi = jnp.max(y1i)
    n_win = (hi - lo) // wr + 1
    start = jnp.maximum(jnp.minimum(lo, H - n_win * wr), 0)

    def win_body(wi, gf):
        rs_cover = start + wi * wr
        rs = jnp.minimum(rs_cover, H - wr)
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (blk, wr * W), 1)
            + rs * W
        )
        cover = pos >= rs_cover * W
        m = [(pos == ix) & cover for ix in idx]
        sel = (
            m[0].astype(jnp.float32) * w[0]
            + m[1].astype(jnp.float32) * w[1]
            + m[2].astype(jnp.float32) * w[2]
            + m[3].astype(jnp.float32) * w[3]
        )
        f = feat_ref[pl.ds(view * HW + rs * W, wr * W), :]
        dfeat_ref[pl.ds(view * HW + rs * W, wr * W), :] += jax.lax.dot_general(
            sel.astype(cd), dvc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(cd),
        )
        P = jax.lax.dot_general(
            dvc, f,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(cd),
        )  # (blk, wr * W)
        return tuple(
            gf_t
            + jnp.sum(jnp.where(mm, P, 0.0), axis=1, keepdims=True)
            for gf_t, mm in zip(gf, m)
        )

    zero = jnp.zeros((blk, 1), jnp.float32)
    gf = jax.lax.fori_loop(0, n_win, win_body, (zero, zero, zero, zero))
    d_wx = (gf[1] - gf[0]) * (1.0 - wy) + (gf[3] - gf[2]) * wy
    d_wy = (gf[2] - gf[0]) * (1.0 - wx) + (gf[3] - gf[1]) * wx
    x_un = (gx[:, None] + 1.0) * 0.5 * (W - 1)
    y_un = (gy[:, None] + 1.0) * 0.5 * (H - 1)
    live_x = ((x_un > 0) & (x_un < W - 1)).astype(jnp.float32)
    live_y = ((y_un > 0) & (y_un < H - 1)).astype(jnp.float32)
    dgx = (d_wx * live_x * (0.5 * (W - 1)))[:, 0]
    dgy = (d_wy * live_y * (0.5 * (H - 1)))[:, 0]

    # projection backward: grid -> cam -> world (R^T on the cam grads)
    p = lambda k: proj_ref[b_idx, base + k]
    camx = p(0) * cx + p(1) * cy + p(2) * cz + p(9)
    camy = p(3) * cx + p(4) * cy + p(5) * cz + p(10)
    camz = p(6) * cx + p(7) * cy + p(8) * cz + p(11)
    inv_z = 1.0 / camz
    dcamx = -dgx * p(12) * inv_z
    dcamy = -dgy * p(13) * inv_z
    dcamz = (dgx * p(12) * camx + dgy * p(13) * camy) * inv_z * inv_z
    dcx = p(0) * dcamx + p(3) * dcamy + p(6) * dcamz
    dcy = p(1) * dcamx + p(4) * dcamy + p(7) * dcamz
    dcz = p(2) * dcamx + p(5) * dcamy + p(8) * dcamz
    return dcx, dcy, dcz


def _bwd_kernel(proj_ref, rds_ref, feat_ref, wih_ref, whh_ref, b_ref,
                wout_ref, bout_ref, wihT_ref, whhT_ref,
                g_ref, vst_ref, aux_ref,
                dcoords_ref, drds_ref, dfeat_ref, dwih_ref, dwhh_ref, db_ref,
                dwout_ref, dbout_ref,
                *, steps, H, W, hidden, ns, eps, grad_clamp, cd, wr,
                stash_gates):
    b_idx = pl.program_id(0)
    i_idx = pl.program_id(1)

    rx, ry, rz = _xyz(rds_ref[...])
    blk = rx.shape[0]

    @pl.when(jnp.logical_and(b_idx == 0, i_idx == 0))
    def _init_w():
        dwih_ref[...] = jnp.zeros_like(dwih_ref)
        dwhh_ref[...] = jnp.zeros_like(dwhh_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)

    @pl.when(i_idx == 0)
    def _init_f():
        dfeat_ref[...] = jnp.zeros_like(dfeat_ref)

    def wgrad(a, g):
        return jax.lax.dot_general(
            a.astype(cd), g.astype(cd),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(cd),
        )

    gcx, gcy, gcz = _xyz(g_ref[...].astype(jnp.float32))
    gh = jnp.zeros((blk, hidden), jnp.float32)
    gcell = jnp.zeros((blk, hidden), jnp.float32)
    grx = jnp.zeros((blk,), jnp.float32)
    gry = jnp.zeros((blk,), jnp.float32)
    grz = jnp.zeros((blk,), jnp.float32)
    wout_row = wout_ref[...].astype(jnp.float32)[:, 0]  # (hidden,)

    def body(i, carry):
        t = steps - 1 - i
        aux = aux_ref[pl.ds(t, 1)][0]
        if eps > 0.0:
            active = aux[:, 2 * hidden + 3]
            return jax.lax.cond(
                jnp.max(active) > 0.0,
                lambda op: step_bwd(t, aux, active, op),
                lambda op: op,
                carry,
            )
        return step_bwd(t, aux, None, carry)

    def step_bwd(t, aux, active, carry):
        gcx, gcy, gcz, gh, gcell, grx, gry, grz = carry
        v = vst_ref[pl.ds(t, 1)][0].astype(jnp.float32)
        h_prev = aux[:, :hidden]
        c_prev = aux[:, hidden : 2 * hidden]
        cx = aux[:, 2 * hidden]
        cy = aux[:, 2 * hidden + 1]
        cz = aux[:, 2 * hidden + 2]

        if stash_gates:
            # gates/tanh_c/s were stashed by the forward — no cell replay
            g0 = _stash_g0(hidden)
            ig = aux[:, g0 : g0 + hidden]
            fg = aux[:, g0 + hidden : g0 + 2 * hidden]
            gg = aux[:, g0 + 2 * hidden : g0 + 3 * hidden]
            og = aux[:, g0 + 3 * hidden : g0 + 4 * hidden]
            tanh_c = aux[:, g0 + 4 * hidden : g0 + 5 * hidden]
            s = aux[:, g0 + 5 * hidden]
            h_t = og * tanh_c
        else:
            # replay the cell to recover gates, c_t, h_t, s_t
            h_t, c_t, (ig, fg, gg, og, tanh_c) = _cell_fwd(
                v, h_prev, c_prev, wih_ref, whh_ref, b_ref, cd
            )
            s = (
                jnp.dot(h_t.astype(cd), wout_ref[...],
                        preferred_element_type=jnp.float32,
                        precision=_mxu_precision(cd))
                + bout_ref[...].astype(jnp.float32)
            )[:, 0]

        # coords_{t+1} = coords_t + rds * s_eff, with s_eff = s * active
        # under early stopping (active is non-differentiable, so d(s) =
        # d(s_eff) * active and the rds cotangent sees the masked step)
        ds = gcx * rx + gcy * ry + gcz * rz  # (blk,)
        if active is not None:
            s = s * active
            ds = ds * active
        grx = grx + gcx * s
        gry = gry + gcy * s
        grz = grz + gcz * s

        # s_t = h_t @ wout + bout
        dwout_ref[...] += wgrad(h_t, ds[:, None])
        dbout_ref[...] += jnp.sum(ds[:, None], axis=0, keepdims=True)
        gh_total = gh + ds[:, None] * wout_row[None, :]
        # reference's ±clamp on the combined hidden cotangent
        gh_c = jnp.clip(gh_total, -grad_clamp, grad_clamp)

        # LSTM cell backward
        gc_t = gcell + gh_c * og * (1.0 - tanh_c * tanh_c)
        di = gc_t * gg * ig * (1.0 - ig)
        df = gc_t * c_prev * fg * (1.0 - fg)
        dg = gc_t * ig * (1.0 - gg * gg)
        do = gh_c * tanh_c * og * (1.0 - og)
        gcell = gc_t * fg
        dgates = jnp.concatenate([di, df, dg, do], axis=-1)  # (blk, 4H)

        dwih_ref[...] += wgrad(v, dgates)
        dwhh_ref[...] += wgrad(h_prev, dgates)
        db_ref[...] += jnp.sum(dgates, axis=0, keepdims=True)
        dv = jnp.dot(dgates.astype(cd), wihT_ref[...],
                     preferred_element_type=jnp.float32,
                     precision=_mxu_precision(cd))
        gh = jnp.dot(dgates.astype(cd), whhT_ref[...],
                     preferred_element_type=jnp.float32,
                     precision=_mxu_precision(cd))

        # gather backward per view: windowed d-latent contraction + masked P
        # per window (same window math as the forward); the mean pool routes
        # dv / NS into each view's gather
        dvc = (dv if ns == 1 else dv * (1.0 / ns)).astype(cd)
        for view in range(ns):
            dcx, dcy, dcz = _gather_bwd_view(
                proj_ref, feat_ref, dfeat_ref, b_idx, view, dvc,
                cx, cy, cz, H=H, W=W, blk=blk, cd=cd, wr=wr,
            )
            gcx = gcx + dcx
            gcy = gcy + dcy
            gcz = gcz + dcz
        return (gcx, gcy, gcz, gh, gcell, grx, gry, grz)

    gcx, gcy, gcz, gh, gcell, grx, gry, grz = jax.lax.fori_loop(
        0, steps, body, (gcx, gcy, gcz, gh, gcell, grx, gry, grz)
    )
    dcoords_ref[...] = _cat3(gcx, gcy, gcz)
    drds_ref[...] = _cat3(grx, gry, grz)


def _stash_g0(hidden: int) -> int:
    """First lane of the gate block in the stash row (8-lane aligned)."""
    return (2 * hidden + 4 + 7) // 8 * 8


def _pad_to(n: int, blk: int) -> int:
    return (n + blk - 1) // blk * blk


def _pad_pts(a, n_pad):
    n = a.shape[1]
    return a if n == n_pad else jnp.pad(a, ((0, 0), (0, n_pad - n), (0, 0)))


@functools.lru_cache(maxsize=None)
def _make_march(steps: int, H: int, W: int, C: int, hidden: int, ns: int,
                eps: float, grad_clamp: float, compute_dtype, interpret: bool,
                wr: int, stash_gates: bool):
    cd = compute_dtype
    HW = ns * H * W  # all views' feature maps stacked along the row axis

    _b0 = lambda b, i: (b, 0)
    _b00 = lambda b, i: (b, 0, 0)
    _blk = lambda b, i: (b, i, 0)
    _stash = lambda b, i: (b, 0, i, 0)
    _w = lambda b, i: (0, 0)

    def _forward(proj, coords0, rds, feat, wih, whh, b, wout, bout):
        B, N, _ = coords0.shape
        Np = _pad_to(max(N, 8), _BLK)
        coords0p = _pad_pts(coords0, Np)
        rdsp = _pad_pts(rds, Np)
        outs = pl.pallas_call(
            lambda proj_ref, c_ref, r_ref, f_ref, wih_ref, whh_ref, b_ref,
                   wo_ref, bo_ref, out_ref, vst, aux: _fwd_kernel(
                proj_ref, c_ref.at[0], r_ref.at[0], f_ref.at[0], wih_ref,
                whh_ref, b_ref, wo_ref, bo_ref, out_ref.at[0], vst.at[0],
                aux.at[0],
                steps=steps, H=H, W=W, hidden=hidden, ns=ns, eps=eps, cd=cd,
                wr=wr, stash_gates=stash_gates,
            ),
            grid=(B, Np // _BLK),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, _BLK, 3), _blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _BLK, 3), _blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HW, C), _b00, memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 4 * hidden), _w, memory_space=pltpu.VMEM),
                pl.BlockSpec((hidden, 4 * hidden), _w, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4 * hidden), _w, memory_space=pltpu.VMEM),
                pl.BlockSpec((hidden, 1), _w, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), _w, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, _BLK, 3), _blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, steps, _BLK, C), _stash,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, steps, _BLK, 128), _stash,
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, Np, 3), jnp.float32),
                jax.ShapeDtypeStruct((B, steps, Np, C), cd),
                jax.ShapeDtypeStruct((B, steps, Np, 128), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * Np * HW * C * steps,
                bytes_accessed=0, transcendentals=B * Np * steps * 5 * hidden,
            ),
        )(proj, coords0p, rdsp, feat.reshape(B, HW, C), wih.astype(cd),
          whh.astype(cd), b.reshape(1, -1).astype(cd), wout.astype(cd),
          bout.reshape(1, 1).astype(cd))
        coords, vst, aux = outs
        return coords[:, :N], (vst, aux)

    @jax.custom_vjp
    def march(proj, coords0, rds, feat, wih, whh, b, wout, bout):
        return _forward(proj, coords0, rds, feat, wih, whh, b, wout, bout)[0]

    def fwd(proj, coords0, rds, feat, wih, whh, b, wout, bout):
        coords, (vst, aux) = _forward(
            proj, coords0, rds, feat, wih, whh, b, wout, bout
        )
        return coords, (proj, rds, feat, wih, whh, b, wout, bout, vst, aux)

    def bwd(res, g):
        proj, rds, feat, wih, whh, b, wout, bout, vst, aux = res
        B, N, _ = rds.shape
        Np = vst.shape[2]
        rdsp = _pad_pts(rds, Np)
        gp = _pad_pts(g.astype(jnp.float32), Np)

        f32 = jnp.float32
        outs = pl.pallas_call(
            lambda proj_ref, r_ref, f_ref, wih_ref, whh_ref, b_ref, wo_ref,
                   bo_ref, wihT_ref, whhT_ref, g_ref, vst_ref, aux_ref,
                   dc_ref, dr_ref, df_ref, dwih_ref,
                   dwhh_ref, db_ref, dwo_ref, dbo_ref: _bwd_kernel(
                proj_ref, r_ref.at[0], f_ref.at[0], wih_ref, whh_ref, b_ref,
                wo_ref, bo_ref, wihT_ref, whhT_ref, g_ref.at[0],
                vst_ref.at[0], aux_ref.at[0],
                dc_ref.at[0], dr_ref.at[0], df_ref.at[0],
                dwih_ref, dwhh_ref, db_ref, dwo_ref, dbo_ref,
                steps=steps, H=H, W=W, hidden=hidden, ns=ns, eps=eps,
                grad_clamp=grad_clamp, cd=cd, wr=wr,
                stash_gates=stash_gates,
            ),
            grid=(B, Np // _BLK),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, _BLK, 3), _blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HW, C), _b00, memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 4 * hidden), _w, memory_space=pltpu.VMEM),
                pl.BlockSpec((hidden, 4 * hidden), _w, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4 * hidden), _w, memory_space=pltpu.VMEM),
                pl.BlockSpec((hidden, 1), _w, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), _w, memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * hidden, C), _w, memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * hidden, hidden), _w, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _BLK, 3), _blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, steps, _BLK, C), _stash,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, steps, _BLK, 128), _stash,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, _BLK, 3), _blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _BLK, 3), _blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HW, C), _b00, memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 4 * hidden), _w, memory_space=pltpu.VMEM),
                pl.BlockSpec((hidden, 4 * hidden), _w, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4 * hidden), _w, memory_space=pltpu.VMEM),
                pl.BlockSpec((hidden, 1), _w, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), _w, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, Np, 3), f32),
                jax.ShapeDtypeStruct((B, Np, 3), f32),
                jax.ShapeDtypeStruct((B, HW, C), f32),
                jax.ShapeDtypeStruct((C, 4 * hidden), f32),
                jax.ShapeDtypeStruct((hidden, 4 * hidden), f32),
                jax.ShapeDtypeStruct((1, 4 * hidden), f32),
                jax.ShapeDtypeStruct((hidden, 1), f32),
                jax.ShapeDtypeStruct((1, 1), f32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * Np * HW * C * steps,
                bytes_accessed=0, transcendentals=B * Np * steps * 8 * hidden,
            ),
        )(proj, rdsp, feat.reshape(B, HW, C), wih.astype(cd), whh.astype(cd),
          b.reshape(1, -1).astype(cd), wout.astype(cd),
          bout.reshape(1, 1).astype(cd),
          wih.astype(cd).T, whh.astype(cd).T,
          gp, vst, aux)

        dcoords, drds, dfeat, dwih, dwhh, db, dwout, dbout = outs
        return (
            jnp.zeros_like(proj),
            dcoords[:, :N].astype(jnp.float32),
            drds[:, :N].astype(jnp.float32),
            dfeat.reshape(feat.shape).astype(feat.dtype),
            dwih.astype(wih.dtype), dwhh.astype(whh.dtype),
            db.reshape(-1).astype(b.dtype),
            dwout.astype(wout.dtype),
            dbout.reshape(-1).astype(bout.dtype),
        )

    march.defvjp(fwd, bwd)
    return march


def fused_lstm_march(
    proj: jnp.ndarray,  # (SB, 16) or (SB, NS, 16) packed projections
    coords0: jnp.ndarray,  # (SB, R, 3) init world coords (ros + rds*d0)
    rds: jnp.ndarray,  # (SB, R, 3) unit ray dirs
    feat: jnp.ndarray,  # (SB, H, W, C) or (SB, NS, H, W, C) feature maps
    w_ih: jnp.ndarray,  # (C, 4H)
    w_hh: jnp.ndarray,  # (H, 4H)
    bias: jnp.ndarray,  # (4H,) combined b_ih + b_hh
    w_out: jnp.ndarray,  # (H, 1)
    b_out: jnp.ndarray,  # (1,)
    *,
    steps: int,
    grad_clamp: float = 10.0,
    early_stop_eps: float = 0.0,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    window_rows: int | None = None,
) -> jnp.ndarray:
    """Run the fused LSTM ray-march; returns final world coords (SB, R, 3).

    With an NS axis, per-step features are the mean of the per-view
    bilinear gathers (matching the scan path's NS pooling, raymarch.py).
    ``early_stop_eps > 0`` freezes rays whose |step| drops below the
    threshold (scan-path semantics) and skips a block's remaining steps
    entirely once every one of its rays has frozen.  ``window_rows``
    sets the gather window height (default 8, env ``AVR_MARCH_WR``):
    smaller windows shrink the per-window one-hot contractions but can
    run more windows per block if the block's rays spread further.
    """
    if window_rows is None:
        # device-trace truth (round 5, /tmp/trace_fi_wr{16,8,4}): 16 rows
        # wins — the march's ray blocks spread past 8 source rows mid-march,
        # so halving the window doubles the window count instead of the
        # work.  Wall-clock A/Bs through the relay said otherwise (+4% for
        # 8) — that was the documented ~10% relay noise; trust traces.
        window_rows = int(os.environ.get("AVR_MARCH_WR", "16"))
    hidden_ws = w_hh.shape[0]
    # gates + tanh_c + s fit in the stash row's free lanes only for small
    # cells; larger cells fall back to cell replay.  AVR_MARCH_STASH=0
    # forces replay everywhere (A/B lever).
    stash_gates = (
        _stash_g0(hidden_ws) + 5 * hidden_ws + 1 <= 128
        and os.environ.get("AVR_MARCH_STASH", "1") != "0"
    )
    if feat.ndim == 4:
        feat = feat[:, None]
    if proj.ndim == 2:
        proj = proj[:, None]
    B, ns, Hh, Ww, C = feat.shape
    hidden = w_hh.shape[0]
    if 2 * hidden + 4 > 128:
        raise ValueError(
            f"fused march packs (h, c, coords, active) into one 128-lane "
            f"stash row; hidden_size {hidden} > 62 is not supported — use "
            f"the scan path"
        )
    fn = _make_march(
        steps, Hh, Ww, C, hidden, ns, float(early_stop_eps),
        float(grad_clamp), jnp.dtype(compute_dtype).type, interpret,
        int(window_rows), stash_gates,
    )
    return fn(proj.reshape(B, ns * 16), coords0.astype(jnp.float32),
              rds.astype(jnp.float32), feat, w_ih, w_hh, bias, w_out, b_out)
