"""On-device kernel parity: compiled Mosaic kernels vs jnp references.

The test suite pins every Pallas kernel against jnp/torch math in
*interpreter* mode (CPU).  This script closes the remaining gap — that the
compiled Mosaic lowering behaves like the interpreter — by running each
kernel on the real chip at production-like shapes and comparing values and
gradients against the pure-jnp implementations.

Usage: python scripts/verify_kernels_tpu.py   (prints PASS/FAIL per check)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _check(name, got, want, rtol, atol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = np.max(np.abs(got - want) / (np.abs(want) + atol / rtol))
    ok = np.allclose(got, want, rtol=rtol, atol=atol)
    print(f"{'PASS' if ok else 'FAIL'}  {name:42s} max_rel_err={err:.2e}")
    return ok


def main():
    import jax
    import jax.numpy as jnp

    from avr_tpu.ops.grid_sample import grid_sample_2d
    from avr_tpu.ops.pallas.gather import (
        gather_bilinear, gather_bilinear_windowed,
    )

    rng = np.random.default_rng(0)
    ok = True

    # ---- gathers (f32 on device so the jnp reference is the exact oracle)
    B, H, W, C, N = 4, 64, 64, 512, 86016
    feats = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.2, 1.2, size=(B, N, 2)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))

    for name, fn in (("gather_bilinear", gather_bilinear),
                     ("gather_bilinear_windowed", gather_bilinear_windowed)):
        out = jax.jit(fn)(feats, coords)
        ref = grid_sample_2d(feats, coords)
        ok &= _check(f"{name} fwd", out, ref, 1e-4, 1e-4)

        gk = jax.jit(jax.grad(
            lambda f, c, ct: jnp.sum(fn(f, c) * ct), argnums=(0, 1)
        ))(feats, coords, cot)
        gr = jax.jit(jax.grad(
            lambda f, c, ct: jnp.sum(grid_sample_2d(f, c) * ct),
            argnums=(0, 1),
        ))(feats, coords, cot)
        ok &= _check(f"{name} d-feats", gk[0], gr[0], 5e-3, 1e-2)
        ok &= _check(f"{name} d-coords", gk[1], gr[1], 5e-3, 1e-1)

    # ---- projected windowed gather (world points + packed projection in)
    from avr_tpu.ops.pallas.gather import gather_bilinear_projected
    from avr_tpu.ops.pallas.march import pack_projection

    Bp = 4
    posesp = []
    prng = np.random.default_rng(5)
    for b in range(Bp):
        Q, _ = np.linalg.qr(np.eye(3) + 0.1 * prng.normal(size=(3, 3)))
        t = np.array([0.05, -0.03, 1.2 + 0.05 * b])
        posesp.append(np.concatenate([Q, t[:, None]], 1))
    posesp = jnp.asarray(np.stack(posesp).astype(np.float32))
    focalp = jnp.asarray([[70.0, -70.0]] * Bp, jnp.float32)
    ccp = jnp.asarray([[32.0, 32.0]] * Bp, jnp.float32)
    scalep = jnp.asarray([2.0 * W / (W - 1), 2.0 * H / (H - 1)], jnp.float32)
    imgp = jnp.asarray([float(W), float(H)], jnp.float32)
    projp = pack_projection(posesp, focalp, ccp, scalep, imgp)
    # points bounded away from the camera plane: near cam-z = 0 the 1/z
    # amplifies f32 rounding unboundedly in ANY implementation
    ptsp = jnp.asarray((0.25 * prng.normal(size=(Bp, N, 3))).astype(np.float32))

    def _proj_ref(f, p):
        # HIGHEST precision like the production XLA path (pixelnerf._query):
        # a default-precision einsum loses ~8 bits on cam-z and the grid
        # error explodes near grazing rays — the kernel (measured against
        # float64) is the *more* accurate side
        cam = jnp.einsum("bij,bnj->bni", posesp[:, :, :3], p,
                         precision="highest") + posesp[:, None, :, 3]
        uv = -cam[..., :2] / cam[..., 2:3] * focalp[:, None] + ccp[:, None]
        grid = uv * (scalep / imgp)[None, None] - 1.0
        return grid_sample_2d(f, grid)

    out_p = jax.jit(lambda f, p: gather_bilinear_projected(f, p, projp))(feats, ptsp)
    ref_p = _proj_ref(feats, ptsp)
    ok &= _check("gather_bilinear_projected fwd", out_p, ref_p, 1e-4, 1e-3)
    gp_ = jax.jit(jax.grad(
        lambda f, p, ct: jnp.sum(gather_bilinear_projected(f, p, projp) * ct),
        argnums=(0, 1),
    ))(feats, ptsp, cot)
    gr_ = jax.jit(jax.grad(
        lambda f, p, ct: jnp.sum(_proj_ref(f, p) * ct), argnums=(0, 1),
    ))(feats, ptsp, cot)
    ok &= _check("gather_bilinear_projected d-feats", gp_[0], gr_[0], 5e-3, 1e-2)
    # d-points: the kernel computes its own (f64-verified) grid, so points
    # within f32 rounding of a bilinear cell edge land in different cells
    # than the XLA chain — the gradient is cell-local and those few points
    # legitimately disagree outright.  Compare robustly: cosine + fraction
    # of agreeing elements.
    a_ = np.asarray(gp_[1], np.float64).ravel()
    b_ = np.asarray(gr_[1], np.float64).ravel()
    cosd = float(a_ @ b_ / (np.linalg.norm(a_) * np.linalg.norm(b_) + 1e-30))
    scale_ref = np.abs(b_).max() + 1e-30
    frac = float((np.abs(a_ - b_) <= 5e-3 * scale_ref).mean())
    dp_ok = cosd > 0.999 and frac > 0.995
    ok &= dp_ok
    print(("PASS" if dp_ok else "FAIL") +
          f"  gather_bilinear_projected d-points (cos={cosd:.5f} "
          f"agree={frac:.4f}; cell-edge flips excluded)")

    # ---- fused decoder
    from avr_tpu.models.mlp import ResnetFC

    Nd, D_IN, D_L, D_H = 86016, 42, 512, 512
    x = jnp.asarray(rng.normal(size=(1, 1, Nd, D_IN)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(1, 1, Nd, D_L)).astype(np.float32))
    outs, grads = [], []
    for fused in ("never", "always"):
        mod = ResnetFC(d_in=D_IN, d_out=4, n_blocks=5, d_latent=D_L,
                       d_hidden=D_H, combine_layer=1000, fused=fused,
                       dtype=jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(0), x, z)

        def loss(p, x, z):
            return jnp.sum(mod.apply(p, x, z) ** 2)

        outs.append(jax.jit(mod.apply)(params, x, z))
        grads.append(jax.jit(jax.grad(loss, argnums=(0,)))(params, x, z)[0])
    # values: two bf16 implementations of the same math agree closely
    ok &= _check("fused decoder fwd (vs Flax bf16)", outs[1], outs[0],
                 5e-2, 5e-2)
    # grads: the fused kernel carries an fp32 trunk, the Flax path a bf16
    # one — per-layer cotangents legitimately diverge beyond elementwise
    # tolerances through 13 bf16 matmuls.  Compare direction instead
    # (exactness is pinned at f32 in tests/test_pallas_resnetfc.py).
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(grads[1]), jax.tree.leaves(grads[0])
    ):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na < 1e-12 and nb < 1e-12:
            continue  # e.g. fc_0 grads: exactly zero through zero-init fc_1
        cos = float(a @ b / (na * nb + 1e-30))
        if cos < 0.98:
            print(f"FAIL  decoder grad cos={cos:.4f} {jax.tree_util.keystr(path)}")
            ok = False
    print("PASS  fused decoder grads (cosine >= 0.98 vs Flax bf16)")

    # ---- fused decoder, NS=2 multi-view (in-kernel mean pool at block 3)
    Nm = 24576
    xm = jnp.asarray(rng.normal(size=(1, 2, Nm, D_IN)).astype(np.float32))
    zm = jnp.asarray(rng.normal(size=(1, 2, Nm, D_L)).astype(np.float32))
    outs_mv = []
    for fused in ("never", "always"):
        mod = ResnetFC(d_in=D_IN, d_out=4, n_blocks=5, d_latent=D_L,
                       d_hidden=D_H, combine_layer=3, fused=fused,
                       dtype=jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(0), xm, zm)
        outs_mv.append(jax.jit(mod.apply)(params, xm, zm))
    ok &= _check("fused decoder NS=2 fwd (vs Flax bf16)", outs_mv[1],
                 outs_mv[0], 5e-2, 5e-2)

    # ---- fused decoder with in-kernel positional encoding + epilogue
    # (raw [xyz | viewdirs] lanes in, activated (rgb, sigma) out)
    from avr_tpu.ops.pallas.resnetfc import CodeSpec

    spec = CodeSpec(num_freqs=6, freq_factor=1.5, include_input=True,
                    d_coded=3, d_pass=3)
    Nc = 24576
    pc = jnp.asarray(
        (0.7 * rng.normal(size=(1, 1, Nc, spec.d_raw))).astype(np.float32))
    zc = jnp.asarray(rng.normal(size=(1, 1, Nc, D_L)).astype(np.float32))
    outs_c, gin_c = [], []
    for fused in ("never", "always"):
        mod = ResnetFC(d_in=spec.d_enc, d_out=4, n_blocks=5, d_latent=D_L,
                       d_hidden=D_H, combine_layer=1000, fused=fused,
                       code_spec=spec, activate_out=True, dtype=jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(0), pc, zc)

        def loss_c(p_, params_):
            return jnp.sum(mod.apply(params_, p_, zc) ** 2)

        outs_c.append(jax.jit(mod.apply)(params, pc, zc))
        gin_c.append(jax.jit(jax.grad(loss_c))(pc, params))
    ok &= _check("fused decoder code+epilogue fwd (vs Flax bf16)",
                 outs_c[1], outs_c[0], 5e-2, 5e-2)
    a = np.asarray(gin_c[1], np.float64).ravel()
    b = np.asarray(gin_c[0], np.float64).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
    if cos < 0.98:
        print(f"FAIL  coded decoder d-input cos={cos:.4f}")
        ok = False
    else:
        print(f"PASS  coded decoder d-input (cosine {cos:.4f} vs Flax bf16)")

    # ---- stash-mode backward (activations stashed to HBM, no recompute):
    # must match the recompute kernel bitwise-ish — SAME bf16 operands on
    # both sides, so tight tolerances apply (not Flax-vs-kernel slop)
    def _mk_coded(fused):
        return ResnetFC(d_in=spec.d_enc, d_out=4, n_blocks=5, d_latent=D_L,
                        d_hidden=D_H, combine_layer=3, fused=fused,
                        code_spec=spec, activate_out=True, dtype=jnp.bfloat16)

    mod_r, mod_s = _mk_coded("always"), _mk_coded("always_stash")
    params_c = mod_r.init(jax.random.PRNGKey(0), pc, zc)

    def loss_r(params_):
        return jnp.sum(mod_r.apply(params_, pc, zc) ** 2)

    def loss_s(params_):
        return jnp.sum(mod_s.apply(params_, pc, zc) ** 2)

    ok &= _check("stash decoder fwd (vs recompute kernel)",
                 jax.jit(mod_s.apply)(params_c, pc, zc),
                 jax.jit(mod_r.apply)(params_c, pc, zc), 1e-6, 1e-6)
    gr = jax.jit(jax.grad(loss_r))(params_c)
    gs = jax.jit(jax.grad(loss_s))(params_c)
    stash_ok = True
    for (path, a_), b_ in zip(
        jax.tree_util.tree_leaves_with_path(gs), jax.tree.leaves(gr)
    ):
        a_ = np.asarray(a_, np.float64)
        b_ = np.asarray(b_, np.float64)
        denom = np.abs(b_).max() + 1e-12
        rel = np.abs(a_ - b_).max() / denom
        if rel > 2e-2:
            print(f"FAIL  stash grad rel={rel:.2e} {jax.tree_util.keystr(path)}")
            stash_ok = False
    ok &= stash_ok
    if stash_ok:
        print("PASS  stash decoder grads (vs recompute kernel)")

    # ---- Pallas uniform RNG (no CPU lowering — only verifiable here)
    from avr_tpu.ops.pallas.rng import pallas_uniform_2d

    u = np.asarray(pallas_uniform_2d(jax.random.PRNGKey(0), (4, 81920)))
    u2 = np.asarray(pallas_uniform_2d(jax.random.PRNGKey(0), (4, 81920)))
    u3 = np.asarray(pallas_uniform_2d(jax.random.PRNGKey(1), (4, 81920)))
    blocks = u.reshape(4, -1, 8192)
    corr = abs(float(np.corrcoef(blocks[:, 0].ravel(), blocks[:, 1].ravel())[0, 1]))
    rng_ok = (
        u.min() >= 0.0 and u.max() < 1.0
        and abs(u.mean() - 0.5) < 5e-3
        and abs(u.var() - 1.0 / 12.0) < 5e-3
        and np.array_equal(u, u2)
        and np.abs(u - u3).max() > 0.1
        and corr < 0.02
    )
    ok &= rng_ok
    print(("PASS" if rng_ok else "FAIL") +
          f"  pallas uniform RNG (mean={u.mean():.4f} var={u.var():.4f} "
          f"deterministic={np.array_equal(u, u2)} blockcorr={corr:.4f})")

    # ---- fused volume integral (band compositing, f32 exact oracle)
    from avr_tpu.ops.integrate import volume_integral
    from avr_tpu.ops.pallas.integrate import fused_volume_integral

    SBi, Ri, ni = 2, 4096, 20
    irng = np.random.default_rng(7)
    zi = jnp.asarray(np.sort(
        irng.uniform(0.6, 1.9, size=(SBi, Ri, ni)).astype(np.float32), -1))
    sigi = np.abs(irng.normal(size=(SBi, Ri, ni, 1))).astype(np.float32) * 3.0
    sigi[0, :500] = 0.0
    rgbi = jax.nn.sigmoid(jnp.asarray(
        irng.normal(size=(SBi, Ri, ni, 3)).astype(np.float32)))
    foi = jnp.concatenate([rgbi, jnp.asarray(sigi)], -1).reshape(SBi, Ri * ni, 4)
    gi1 = jnp.asarray(irng.normal(size=(SBi, Ri, 3)).astype(np.float32))
    gi2 = jnp.asarray(irng.normal(size=(SBi, Ri, 1)).astype(np.float32))

    def _int_ref(z_, fo_):
        f = fo_.reshape(SBi, Ri, ni, 4)
        rgb, dist, _ = volume_integral(z_, f[..., 3:4], f[..., :3],
                                       white_back=True)
        return rgb, dist

    ir, idist = jax.jit(lambda a, b: fused_volume_integral(a, b))(zi, foi)
    rr, rdist = jax.jit(_int_ref)(zi, foi)
    ok &= _check("fused integral rgb", ir, rr, 1e-4, 1e-4)
    ok &= _check("fused integral dist", idist, rdist, 1e-4, 1e-4)

    def _int_loss(f):
        def loss(z_, fo_):
            rgb, dist = f(z_, fo_)
            return jnp.sum(rgb * gi1) + jnp.sum(dist * gi2)
        return loss

    gk_i = jax.jit(jax.grad(_int_loss(
        lambda a, b: fused_volume_integral(a, b)), argnums=(0, 1)))(zi, foi)
    gr_i = jax.jit(jax.grad(_int_loss(_int_ref), argnums=(0, 1)))(zi, foi)
    ok &= _check("fused integral d-z", gk_i[0], gr_i[0], 1e-3, 1e-2)
    sc = float(jnp.max(jnp.abs(gr_i[1]))) + 1e-30
    ok &= _check("fused integral d-field (scaled)", gk_i[1] / sc,
                 gr_i[1] / sc, 1e-5, 1e-3)

    # ---- fused march (f32 compute so the jnp reference is exact-ish).
    # Checked at 2 steps: the march is a chaotic recurrence (LSTM + discrete
    # bilinear tap boundaries), so ~1e-7 per-step differences between the
    # kernel's and XLA's transcendental approximations amplify exponentially
    # with step count (measured: exact at 1 step, ~1e-4 max at 3, O(1) for a
    # third of rays at 10 on a random feature field).  Both evaluations are
    # correct within the model's own sensitivity; 2 steps verifies the
    # compiled lowering itself.
    from avr_tpu.ops.pallas.march import fused_lstm_march, pack_projection
    from avr_tpu.renderers.lstm import clamp_grad

    Br, R, HID, STEPS = 4, 4096, 16, 2
    poses = np.broadcast_to(
        np.concatenate([np.eye(3, dtype=np.float32),
                        np.array([[0.0], [0.0], [1.3]], np.float32)], 1),
        (Br, 3, 4)).copy()
    focal = jnp.asarray([[140.0, -140.0]], np.float32)
    cpt = jnp.asarray([[64.0, 64.0]], np.float32)
    ls = jnp.asarray([2.0, 2.0], jnp.float32)
    ish = jnp.asarray([128.0, 128.0], jnp.float32)
    proj = pack_projection(jnp.asarray(poses), focal, cpt, ls, ish)
    featm = feats  # reuse (4, 64, 64, 512)
    rds = rng.normal(size=(Br, R, 3)).astype(np.float32)
    rds[..., 2] = np.abs(rds[..., 2]) + 1.0
    rds = jnp.asarray(rds / np.linalg.norm(rds, axis=-1, keepdims=True))
    coords0 = rds * jnp.asarray(
        rng.normal(0.8, 0.05, (Br, R, 1)).astype(np.float32))
    wih = jnp.asarray(rng.normal(scale=0.05, size=(C, 4 * HID)).astype(np.float32))
    whh = jnp.asarray(rng.normal(scale=0.3, size=(HID, 4 * HID)).astype(np.float32))
    bias = jnp.asarray(rng.normal(scale=0.1, size=(4 * HID,)).astype(np.float32))
    wout = jnp.asarray(rng.normal(scale=0.5, size=(HID, 1)).astype(np.float32))
    bout = jnp.asarray([0.01], np.float32)

    got = jax.jit(lambda *a: fused_lstm_march(
        *a, steps=STEPS, grad_clamp=10.0, compute_dtype=jnp.float32,
    ))(proj, coords0, rds, featm, wih, whh, bias, wout, bout)

    Rm = jnp.asarray(poses)[:, :3, :3]
    t = jnp.asarray(poses)[:, :3, 3]
    scale = ls / ish
    fg = jnp.broadcast_to(focal, (Br, 2)) * scale[None, :]
    cg = jnp.broadcast_to(cpt, (Br, 2)) * scale[None, :] - 1.0

    def ref_march(coords0):
        # precision="highest" everywhere: XLA's default f32 matmul precision
        # on TPU is a bf16 pass, which perturbs tap indices and makes the
        # *reference* the imprecise side
        h = jnp.zeros((Br, R, HID), jnp.float32)
        cc = jnp.zeros((Br, R, HID), jnp.float32)
        coords = coords0
        for _ in range(STEPS):
            cam = jnp.einsum("bij,bnj->bni", Rm, coords,
                             precision="highest") + t[:, None, :]
            g = -cam[..., :2] / cam[..., 2:3] * fg[:, None, :] + cg[:, None, :]
            v = grid_sample_2d(featm, g)
            gates = (jnp.dot(v, wih, precision="highest")
                     + jnp.dot(h, whh, precision="highest") + bias)
            i, f, gg, o = jnp.split(gates, 4, axis=-1)
            cc = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(gg)
            h = jax.nn.sigmoid(o) * jnp.tanh(cc)
            h = clamp_grad(h, 10.0)
            coords = coords + rds * (
                jnp.dot(h, wout, precision="highest") + bout)
        return coords

    want = jax.jit(ref_march)(coords0)
    ok &= _check("fused march fwd (f32, 2 steps)", got, want, 1e-3, 1e-4)

    # ---- fused march, NS=2 (per-view gathers mean-pooled in-kernel)
    a = 0.15
    rotz = np.array(
        [[np.cos(a), -np.sin(a), 0.0], [np.sin(a), np.cos(a), 0.0],
         [0.0, 0.0, 1.0]], np.float32)
    poses2 = np.stack([poses, poses.copy()], axis=1)  # (Br, 2, 3, 4)
    poses2[:, 1, :3, :3] = rotz @ poses2[:, 1, :3, :3]
    poses2 = poses2.reshape(Br * 2, 3, 4)
    proj2 = pack_projection(
        jnp.asarray(poses2), focal, cpt, ls, ish
    ).reshape(Br, 2, 16)
    featm2 = jnp.stack([featm, featm[::-1]], axis=1)  # (Br, 2, H, W, C)

    got2 = jax.jit(lambda *args: fused_lstm_march(
        *args, steps=STEPS, grad_clamp=10.0, compute_dtype=jnp.float32,
    ))(proj2, coords0, rds, featm2, wih, whh, bias, wout, bout)

    Rm2 = jnp.asarray(poses2)[:, :3, :3].reshape(Br, 2, 3, 3)
    t2 = jnp.asarray(poses2)[:, :3, 3].reshape(Br, 2, 3)

    def ref_march_mv(coords0):
        h = jnp.zeros((Br, R, HID), jnp.float32)
        cc = jnp.zeros((Br, R, HID), jnp.float32)
        coords = coords0
        for _ in range(STEPS):
            cam = jnp.einsum("bvij,bnj->bvni", Rm2, coords,
                             precision="highest") + t2[:, :, None, :]
            g = (-cam[..., :2] / cam[..., 2:3] * fg[:, None, None, :]
                 + cg[:, None, None, :])
            v = grid_sample_2d(
                featm2.reshape(Br * 2, H, W, C), g.reshape(Br * 2, R, 2)
            ).reshape(Br, 2, R, C).mean(axis=1)
            gates = (jnp.dot(v, wih, precision="highest")
                     + jnp.dot(h, whh, precision="highest") + bias)
            i, f, gg, o = jnp.split(gates, 4, axis=-1)
            cc = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(gg)
            h = jax.nn.sigmoid(o) * jnp.tanh(cc)
            h = clamp_grad(h, 10.0)
            coords = coords + rds * (
                jnp.dot(h, wout, precision="highest") + bout)
        return coords

    want2 = jax.jit(ref_march_mv)(coords0)
    ok &= _check("fused march NS=2 fwd (f32, 2 steps)", got2, want2,
                 1e-3, 1e-4)

    # ---- fused march early stop (the in-kernel lax.cond block skip must
    # lower through Mosaic and reproduce the masked-lane reference)
    EPS = 0.05
    got3 = jax.jit(lambda *a: fused_lstm_march(
        *a, steps=STEPS, grad_clamp=10.0, early_stop_eps=EPS,
        compute_dtype=jnp.float32,
    ))(proj, coords0, rds, featm, wih, whh, bias, wout, bout)

    def ref_march_es(coords0):
        h = jnp.zeros((Br, R, HID), jnp.float32)
        cc = jnp.zeros((Br, R, HID), jnp.float32)
        active = jnp.ones((Br, R, 1), jnp.float32)
        coords = coords0
        for _ in range(STEPS):
            cam = jnp.einsum("bij,bnj->bni", Rm, coords,
                             precision="highest") + t[:, None, :]
            g = -cam[..., :2] / cam[..., 2:3] * fg[:, None, :] + cg[:, None, :]
            v = grid_sample_2d(featm, g)
            gates = (jnp.dot(v, wih, precision="highest")
                     + jnp.dot(h, whh, precision="highest") + bias)
            i, f, gg, o = jnp.split(gates, 4, axis=-1)
            cc = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(gg)
            h = jax.nn.sigmoid(o) * jnp.tanh(cc)
            h = clamp_grad(h, 10.0)
            s = (jnp.dot(h, wout, precision="highest") + bout) * active
            active = active * (1.0 - (jnp.abs(s) < EPS).astype(jnp.float32))
            coords = coords + rds * s
        return coords

    want3 = jax.jit(ref_march_es)(coords0)
    ok &= _check("fused march early-stop fwd (f32, 2 steps)", got3, want3,
                 1e-3, 1e-4)

    print("ALL PASS" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
