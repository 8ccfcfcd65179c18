"""Isolated LSTM-march microbenchmark: fused Pallas kernel vs lax.scan path.

Times forward+backward of the march alone at benchmark shapes (B=4 scenes,
R=4096 rays, 64x64x512 bf16 feature map, 10 steps), gradients flowing to
the feature map, ray inputs, and all LSTM/step-head weights.  Also reports
wall compile time for each variant (the axon relay has no persistent
executable cache, so compile latency is a real product cost).

Usage: python scripts/bench_march.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from avr_tpu.ops.grid_sample import grid_sample_2d
    from avr_tpu.ops.pallas.gather import gather_bilinear
    from avr_tpu.ops.pallas.march import fused_lstm_march, pack_projection
    from avr_tpu.renderers.lstm import clamp_grad

    B, R, H, W, C, HID, STEPS = 4, 4096, 64, 64, 512, 16, 10
    ITERS = int(os.environ.get("BENCH_ITERS", 20))
    CD = jnp.bfloat16

    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)).astype(CD)
    poses = np.broadcast_to(
        np.concatenate([np.eye(3, dtype=np.float32),
                        np.array([[0.0], [0.0], [1.3]], np.float32)], axis=1),
        (B, 3, 4),
    ).copy()
    focal = jnp.asarray([[140.0, -140.0]], np.float32)
    c = jnp.asarray([[64.0, 64.0]], np.float32)
    latent_scaling = jnp.asarray([2.0, 2.0], jnp.float32)
    image_shape = jnp.asarray([128.0, 128.0], jnp.float32)
    proj = pack_projection(jnp.asarray(poses), focal, c, latent_scaling,
                           image_shape)

    ros = jnp.zeros((B, R, 3), jnp.float32)
    rds = rng.normal(size=(B, R, 3)).astype(np.float32)
    rds[..., 2] = np.abs(rds[..., 2]) + 1.0
    rds = jnp.asarray(rds / np.linalg.norm(rds, axis=-1, keepdims=True))
    d0 = jnp.asarray(
        rng.normal(loc=0.8, scale=0.05, size=(B, R, 1)).astype(np.float32))
    coords0 = ros + rds * d0

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

    def scan_march(feat, coords0, rds, wih, whh, bias, wout, bout):
        def features(coords):
            cam = jnp.einsum("bij,bnj->bni", Rm, coords) + t[:, None, :]
            g = -cam[..., :2] / cam[..., 2:3] * fg[:, None, :] + cg[:, None, :]
            return gather_bilinear(feat, g)

        def body(carry, _):
            coords, h, cc = carry
            v = features(coords).astype(jnp.float32)
            gates = (
                v.astype(CD) @ wih.astype(CD)
                + h.astype(CD) @ whh.astype(CD) + bias.astype(CD)
            ).astype(jnp.float32)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            cc = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(cc)
            h = clamp_grad(h, 10.0)
            s = (h.astype(CD) @ wout.astype(CD)).astype(jnp.float32) + bout
            return (coords + rds * s, h, cc), None

        h0 = jnp.zeros((B, R, HID), jnp.float32)
        (coords, _, _), _ = jax.lax.scan(
            body, (coords0, h0, h0), None, length=STEPS)
        return coords

    def fused_march(feat, coords0, rds, wih, whh, bias, wout, bout):
        return fused_lstm_march(
            proj, coords0, rds, feat, wih, whh, bias, wout, bout,
            steps=STEPS, grad_clamp=10.0, compute_dtype=CD,
        )

    args = (feat, coords0, rds, wih, whh, bias, wout, bout)

    def bench(name, fn):
        def loss(*a):
            return jnp.sum(fn(*a) * probe)

        g = jax.jit(jax.grad(loss, argnums=tuple(range(len(args)))))
        t0 = time.perf_counter()
        out = g(*args)
        float(np.asarray(out[0]).ravel()[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = g(*args)
        float(np.asarray(out[0]).ravel()[0])
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:6s}: {ms:7.2f} ms/iter (fwd+bwd), compile {compile_s:.0f}s",
              flush=True)

    bench("scan", scan_march)
    bench("fused", fused_march)


if __name__ == "__main__":
    main()
