"""VolumeRenderer chunked-call sweep (round-4 task: VR second pass).

Round 3 measured only chunks=8 on the fine pass (~neutral throughput,
25.6k vs 25.3k rays/s) and left two levers untried (VERDICT weak #4):

  * chunks=2: the smallest split that fits the 64-eval coarse pass's
    activation stash (~7 GB) inside the 6 GB auto budget — the coarse
    pass currently falls back to the recompute backward;
  * the compile-time story: the monolithic VR program cold-compiles in
    ~20 min through the relay; each chunked-call sub-program compiles in
    normal time.  This sweep records per-variant compile wall too.

Variants: the monolithic step (chunks=1, the r3 baseline shape) and the
N+2-dispatch chunked-call step at chunks in AB_CHUNK_LIST (default
2,4,8).  Usage: python scripts/ab_vr_chunks_tpu.py
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

import ab_vr_tpu as V  # noqa: E402  (VR build helper)
from avr_tpu.training import (  # noqa: E402
    LossParams, make_chunked_call_train_step, make_optimizer,
    create_train_state,
)

ITERS = int(os.environ.get("AB_ITERS", 30))
CHUNKS = [int(c) for c in os.environ.get("AB_CHUNK_LIST", "2,4,8").split(",")]
WITH_MONO = os.environ.get("AB_MONO", "0") == "1"  # 20-min cold compile


def time_variant(tag, step, state, args, rays):
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state, metrics = step(state, *args, key)
    float(np.asarray(metrics["loss"]))
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, metrics = step(state, *args, sub)
    float(np.asarray(metrics["loss"]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, *args, sub)
    float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0
    print(
        f"{tag}: {rays * ITERS / dt:,.0f} rays/s  ({dt / ITERS * 1e3:.1f} "
        f"ms/step wall; warm+compile {compile_s:.0f} s)",
        flush=True,
    )
    return state


def main():
    print("devices:", jax.devices(), flush=True)
    from avr_tpu.models.wrapper import RadFieldRenderer  # noqa: F401

    # one model/state/init shared; host snapshot guards against donation
    step0, state0, args, rays = V.build()
    params_host = jax.device_get(state0.params)
    stats_host = jax.device_get(state0.batch_stats) if state0.batch_stats else {}
    del step0, state0

    # rebuild the model exactly like V.build does (V.build closes over it)
    from avr_tpu.config import parse_conf
    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.renderers.base import VolumeRendererConfig

    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = parse_conf(os.path.join(ROOT, "conf", "default_mv.conf"))
    model = RadFieldRenderer(
        model_cfg=ModelConfig.from_conf(conf["model"]),
        renderer_cfg=VolumeRendererConfig.from_conf(conf["normal_renderer"]),
        dtype=jnp.bfloat16,
    )

    def fresh_state(tx):
        variables = {"params": jax.tree.map(jnp.asarray, params_host)}
        if stats_host:
            variables["batch_stats"] = jax.tree.map(jnp.asarray, stats_host)
        return create_train_state(variables, tx)

    if WITH_MONO:
        from avr_tpu.training import make_train_step

        tx = make_optimizer(1e-4)
        step = make_train_step(model, tx, LossParams(loss_mode="both"))
        time_variant("mono", step, fresh_state(tx), args, rays)
    for c in CHUNKS:
        tx = make_optimizer(1e-4)
        step = make_chunked_call_train_step(
            model, tx, LossParams(loss_mode="both"), ray_chunks=c
        )
        time_variant(f"calls{c}", step, fresh_state(tx), args, rays)


if __name__ == "__main__":
    main()
