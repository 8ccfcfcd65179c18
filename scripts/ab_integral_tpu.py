"""On-device A/B for the point-major fused volume integral (round 3 lever 1).

One process (compiles are paid once each):
  1. parity: compiled fused_volume_integral vs the jnp volume_integral at
     bench shapes (values + both grads),
  2. full-train-step wall timing, fused_integral "never" vs "auto",
  3. device traces of both variants (TRACE_OUT_{never,auto}).

Usage: python scripts/ab_integral_tpu.py  (run from the repo root)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_default_prng_impl", "rbg")

from avr_tpu.config import parse_conf
from avr_tpu.models.pixelnerf import ModelConfig
from avr_tpu.models.wrapper import RadFieldRenderer
from avr_tpu.renderers.base import AdaptiveRendererConfig
from avr_tpu.training import LossParams, create_train_state, make_train_step

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ITERS = int(os.environ.get("AB_ITERS", 60))


def check(name, got, want, rtol, atol):
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    err = np.max(np.abs(got - want) / (np.abs(want) + atol / rtol))
    ok = np.allclose(got, want, rtol=rtol, atol=atol)
    print(f"{'PASS' if ok else 'FAIL'}  {name:40s} max_rel_err={err:.2e}",
          flush=True)
    return ok


def parity():
    from avr_tpu.ops.integrate import volume_integral
    from avr_tpu.ops.pallas.integrate import fused_volume_integral

    rng = np.random.default_rng(0)
    SB, R, n = 4, 4096, 20
    z = np.sort(rng.uniform(0.6, 1.9, (SB, R, n)).astype(np.float32), -1)
    sig = np.abs(rng.normal(size=(SB, R, n, 1))).astype(np.float32) * 3.0
    sig[0, :512] = 0.0
    rgb = 1.0 / (1.0 + np.exp(-rng.normal(size=(SB, R, n, 3)))).astype(np.float32)
    fo = np.concatenate([rgb, sig], -1).reshape(SB, R * n, 4).astype(np.float32)
    g1 = rng.normal(size=(SB, R, 3)).astype(np.float32)
    g2 = rng.normal(size=(SB, R, 1)).astype(np.float32)
    z, fo, g1, g2 = map(jnp.asarray, (z, fo, g1, g2))

    def ref(z_, fo_):
        f = fo_.reshape(SB, R, n, 4)
        r, d, _ = volume_integral(z_, f[..., 3:4], f[..., :3], white_back=True)
        return r, d

    def ker(z_, fo_):
        return fused_volume_integral(z_, fo_, white_back=True)

    (rr, rd) = jax.jit(ref)(z, fo)
    (kr, kd) = jax.jit(ker)(z, fo)
    ok = check("integral rgb", kr, rr, 1e-4, 1e-4)
    ok &= check("integral dist", kd, rd, 1e-4, 1e-4)

    def loss(f, a, b):
        r, d = f(a, b)
        return jnp.sum(r * g1) + jnp.sum(d * g2)

    gr = jax.jit(jax.grad(lambda a, b: loss(ref, a, b), argnums=(0, 1)))(z, fo)
    gk = jax.jit(jax.grad(lambda a, b: loss(ker, a, b), argnums=(0, 1)))(z, fo)
    ok &= check("integral d-z", gk[0], gr[0], 1e-3, 1e-2)
    sc = float(jnp.max(jnp.abs(gr[1])))
    ok &= check("integral d-field (scaled)", gk[1] / sc, gr[1] / sc, 1e-3, 1e-4)
    return ok


def build(fused_integral):
    SB, NS, SIDE, R = 4, 1, 128, 4096
    conf = parse_conf(os.path.join(ROOT, "conf", "default_mv.conf"))
    model_cfg = ModelConfig.from_conf(conf["model"])
    model = RadFieldRenderer(
        model_cfg=model_cfg,
        renderer_cfg=AdaptiveRendererConfig.from_conf(conf["adaptive_renderer"]),
        dtype=jnp.bfloat16, fused_integral=fused_integral,
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(SB, NS, SIDE, SIDE, 3)).astype(np.float32))
    c2w = np.eye(4, dtype=np.float32) @ np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    c2w[2, 3] = 1.3
    poses = jnp.asarray(np.broadcast_to(c2w, (SB, NS, 4, 4)).copy())
    focal = jnp.float32(1.09375 * SIDE)
    c = jnp.asarray([SIDE / 2.0, SIDE / 2.0], jnp.float32)
    xy = jnp.asarray(rng.uniform(0.05, 0.95, size=(SB, R, 2)).astype(np.float32))
    K = jnp.broadcast_to(
        jnp.asarray([[1.09375, 0, 0.5], [0, 1.09375, 0.5], [0, 0, 1]], jnp.float32),
        (SB, 3, 3),
    )
    rays_c2w = jnp.broadcast_to(jnp.asarray(c2w), (SB, R, 4, 4))
    gt = jnp.asarray(rng.uniform(size=(SB, R, 3)).astype(np.float32))
    model_input = {"x_pix": xy, "cam2world": rays_c2w, "intrinsics": K}
    variables = model.init(
        jax.random.PRNGKey(0), images, poses, focal, c, method=model.init_all
    )
    tx = optax.adam(1e-4)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, LossParams(loss_mode="both"))
    args = (images, poses, focal, c, model_input, gt)
    return step, state, args, SB * R


def time_variant(tag, step, state, args, rays):
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(state, *args, sub)
    float(np.asarray(metrics["loss"]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, *args, sub)
    float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0
    print(f"{tag}: {rays * ITERS / dt:,.0f} rays/s  ({dt / ITERS * 1e3:.1f} ms/step wall)",
          flush=True)

    out = os.environ.get(f"TRACE_OUT_{tag.upper()}", f"/tmp/trace_fi_{tag}")
    jax.profiler.start_trace(out)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(state, *args, sub)
    float(np.asarray(metrics["loss"]))
    jax.profiler.stop_trace()
    print(f"trace[{tag}] -> {out}", flush=True)
    return state


def main():
    print("devices:", jax.devices(), flush=True)
    ok = parity()
    for tag in ("never", "auto"):
        step, state, args, rays = build(tag)
        time_variant(tag, step, state, args, rays)
    print("PARITY", "OK" if ok else "FAILED", flush=True)


if __name__ == "__main__":
    main()
