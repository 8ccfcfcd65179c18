"""On-device A/B for the classic VolumeRenderer levers (round 3 task 5).

One process, compiles paid once each:
  1. full-train-step wall timing, point-level locality sort OFF vs ON
     (AVR_SORT knob; the sort's VJP is now a scatter-free gather —
     ops/permute.py — which is what this A/B evaluates on device),
  2. a device trace per variant (TRACE_OUT_SORT{0,1}).

VR budgets come from conf/default_mv.conf normal_renderer (the
reference's 64-coarse + 96-eval fine pass, renderers.py:252-277).

Usage: python scripts/ab_vr_tpu.py   (from the repo root)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")

from avr_tpu.config import parse_conf
from avr_tpu.models.pixelnerf import ModelConfig
from avr_tpu.models.wrapper import RadFieldRenderer
from avr_tpu.renderers.base import VolumeRendererConfig
from avr_tpu.training import (
    LossParams, create_train_state, make_optimizer, make_train_step,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ITERS = int(os.environ.get("AB_ITERS", 30))
RAY_CHUNKS = int(os.environ.get("AB_RAY_CHUNKS", "1"))


def build():
    SB, NS, SIDE, R = 4, 1, 128, 4096
    conf = parse_conf(os.path.join(ROOT, "conf", "default_mv.conf"))
    model_cfg = ModelConfig.from_conf(conf["model"])
    model = RadFieldRenderer(
        model_cfg=model_cfg,
        renderer_cfg=VolumeRendererConfig.from_conf(conf["normal_renderer"]),
        dtype=jnp.bfloat16,
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
    tx = make_optimizer(1e-4)
    state = create_train_state(variables, tx)
    step = make_train_step(
        model, tx, LossParams(loss_mode="both"), ray_chunks=RAY_CHUNKS
    )
    args = (images, poses, focal, c, model_input, gt)
    return step, state, args, SB * R


def time_variant(tag, step, state, args, rays):
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(state, *args, sub)
    float(np.asarray(metrics["loss"]))
    print(f"{tag}: warmup+compile {time.perf_counter() - t0:.0f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, *args, sub)
    float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0
    print(
        f"{tag}: {rays * ITERS / dt:,.0f} rays/s  "
        f"({dt / ITERS * 1e3:.1f} ms/step wall)", flush=True,
    )
    out = os.environ.get(f"TRACE_OUT_{tag.upper()}", f"/tmp/trace_vr_{tag}")
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
    variants = os.environ.get("AB_VARIANTS", "sort0,sort1").split(",")
    for tag in variants:
        os.environ["AVR_SORT"] = "1" if tag.endswith("1") else "0"
        step, state, args, rays = build()
        time_variant(tag, step, state, args, rays)


if __name__ == "__main__":
    main()
