"""On-device (Mosaic-lowered) parity for the fused LSTM march kernel.

The round-5 march changes (8-lane-aligned gate stash replacing the
backward's cell replay; parametrized gather window) are interpret-mode
tested in tests/test_pallas_march.py, but interpret mode does not cover
Mosaic lowering (verify skill surface 4).  This is the march section of
scripts/verify_kernels_tpu.py as a standalone, so kernel edits can be
verified without the full ~19-check harness: values + grads (feature
map, coords, LSTM weights) vs the scan reference, f32 compute, 2 steps
(the recurrence is chaotic at 10), NS=1 and NS=2, early-stop on.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _check(name, got, want, rtol, atol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    ok = np.allclose(got, want, rtol=rtol, atol=atol)
    err = float(np.max(np.abs(got - want)))
    print(f"{'PASS' if ok else 'FAIL'}  {name:44s} max_abs_err={err:.3e}",
          flush=True)
    return ok


def main():
    print("devices:", jax.devices(), flush=True)
    from avr_tpu.ops.grid_sample import grid_sample_2d
    from avr_tpu.ops.pallas.march import fused_lstm_march, pack_projection
    from avr_tpu.renderers.lstm import clamp_grad

    B, R, H, W, C, HID, STEPS = 2, 1024, 64, 64, 512, 16, 2
    rng = np.random.default_rng(3)
    feat = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    poses = np.broadcast_to(
        np.concatenate([np.eye(3, dtype=np.float32),
                        np.array([[0.0], [0.0], [1.3]], np.float32)], 1),
        (B, 3, 4)).copy()
    focal = jnp.asarray([[140.0, -140.0]], np.float32)
    c = jnp.asarray([[64.0, 64.0]], np.float32)
    latent_scaling = jnp.asarray([2.0, 2.0], jnp.float32)
    image_shape = jnp.asarray([128.0, 128.0], jnp.float32)
    proj = pack_projection(jnp.asarray(poses), focal, c, latent_scaling,
                           image_shape)

    rds = rng.normal(size=(B, R, 3)).astype(np.float32)
    rds[..., 2] = np.abs(rds[..., 2]) + 1.0
    rds = jnp.asarray(rds / np.linalg.norm(rds, axis=-1, keepdims=True))
    coords0 = rds * jnp.asarray(
        rng.normal(0.8, 0.05, size=(B, R, 1)).astype(np.float32))
    wih = jnp.asarray(rng.normal(scale=0.05, size=(C, 4 * HID)).astype(np.float32))
    whh = jnp.asarray(rng.normal(scale=0.3, size=(HID, 4 * HID)).astype(np.float32))
    bias = jnp.asarray(rng.normal(scale=0.1, size=(4 * HID,)).astype(np.float32))
    wout = jnp.asarray(rng.normal(scale=0.5, size=(HID, 1)).astype(np.float32))
    bout = jnp.asarray([0.01], np.float32)
    probe = jnp.asarray(rng.normal(size=(B, R, 3)).astype(np.float32))

    Rm = jnp.asarray(poses)[:, :3, :3]
    t = jnp.asarray(poses)[:, :3, 3]
    scale = latent_scaling / image_shape
    fg = jnp.broadcast_to(focal, (B, 2)) * scale[None, :]
    cg = jnp.broadcast_to(c, (B, 2)) * scale[None, :] - 1.0

    def ref_march(feat, coords0, wih, whh, bias, wout, bout, eps=0.0):
        # precision="highest" everywhere: XLA's default f32 matmul on TPU
        # is a bf16 pass, which perturbs tap indices and makes the
        # *reference* the imprecise side (verify_kernels_tpu.py note; the
        # first run of this script omitted it and "failed" O(1))
        hp = jax.lax.Precision.HIGHEST

        def body(carry, _):
            coords, h, cc, act = carry
            cam = jnp.einsum("bij,bnj->bni", Rm, coords,
                             precision=hp) + t[:, None, :]
            g = -cam[..., :2] / cam[..., 2:3] * fg[:, None, :] + cg[:, None, :]
            v = grid_sample_2d(feat, g)
            gates = (jnp.dot(v, wih, precision=hp)
                     + jnp.dot(h, whh, precision=hp) + bias)
            i, f, gg_, o = jnp.split(gates, 4, axis=-1)
            cc = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(gg_)
            h = jax.nn.sigmoid(o) * jnp.tanh(cc)
            h = clamp_grad(h, 10.0)
            s = (jnp.dot(h, wout, precision=hp) + bout)[..., 0]
            if eps > 0.0:
                s = s * act
                act = act * (jnp.abs(s) >= eps).astype(jnp.float32)
            return (coords + rds * s[..., None], h, cc, act), None

        h0 = jnp.zeros((B, R, HID), jnp.float32)
        act0 = jnp.ones((B, R), jnp.float32)
        (coords, _, _, _), _ = jax.lax.scan(
            body, (coords0, h0, h0, act0), None, length=STEPS)
        return coords

    def fused(feat, coords0, wih, whh, bias, wout, bout, eps=0.0):
        return fused_lstm_march(
            proj, coords0, rds, feat, wih, whh, bias, wout, bout,
            steps=STEPS, grad_clamp=10.0, early_stop_eps=eps,
            compute_dtype=jnp.float32,
        )

    args = (feat, coords0, wih, whh, bias, wout, bout)
    ok = _check("march fwd (f32, 2 steps)",
                jax.jit(fused)(*args), jax.jit(ref_march)(*args), 1e-3, 1e-4)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) * probe)

    gf = jax.jit(jax.grad(loss(fused), argnums=(0, 1, 2, 3, 4, 5, 6)))(*args)
    gr = jax.jit(jax.grad(loss(ref_march), argnums=(0, 1, 2, 3, 4, 5, 6)))(*args)
    for name, a, b in zip(("dfeat", "dcoords0", "dwih", "dwhh", "dbias",
                           "dwout", "dbout"), gf, gr):
        sc = float(jnp.max(jnp.abs(b))) or 1.0
        ok &= _check(f"march grad {name} (scaled)", np.asarray(a) / sc,
                     np.asarray(b) / sc, 1e-3, 5e-4)

    ge = jax.jit(jax.grad(
        lambda *a: jnp.sum(fused(*a, eps=0.02) * probe), argnums=(0,)))(*args)
    gre = jax.jit(jax.grad(
        lambda *a: jnp.sum(ref_march(*a, eps=0.02) * probe), argnums=(0,)))(*args)
    sc = float(jnp.max(jnp.abs(gre[0]))) or 1.0
    ok &= _check("march early-stop dfeat (scaled)",
                 np.asarray(ge[0]) / sc, np.asarray(gre[0]) / sc, 1e-3, 5e-4)

    print("ALL PASS" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
