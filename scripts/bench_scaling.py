"""Rays/s scaling-efficiency harness across mesh sizes.

Runs the sharded train step at mesh shapes (1, N) for increasing N over
the available devices and reports rays/s + efficiency vs the single-device
run (BASELINE.md gate #2: >=90% from 1 chip to a slice).  On real multi-
chip hardware this measures ICI scaling; on the virtual CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``)
it validates the mechanism and gives a rough software-overhead signal.

Usage: python scripts/bench_scaling.py [max_devices]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main(max_devices=None):
    import dataclasses

    import jax

    # SCALE_PLATFORM=cpu: the env's sitecustomize pins the axon TPU plugin,
    # so JAX_PLATFORMS alone doesn't stick — the config update does.  Use
    # with XLA_FLAGS=--xla_force_host_platform_device_count=8 for the
    # virtual mesh.
    plat = os.environ.get("SCALE_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp
    import optax

    from avr_tpu.config import parse_conf
    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.models.wrapper import RadFieldRenderer
    from avr_tpu.parallel import (make_mesh, make_sharded_train_step,
                                  make_shardmap_train_step, shard_train_inputs)
    from avr_tpu.renderers.base import AdaptiveRendererConfig
    from avr_tpu.training import LossParams, create_train_state

    n_avail = len(jax.devices())
    max_devices = min(max_devices or n_avail, n_avail)

    SB, NS, SIDE = 2, 1, int(os.environ.get("SCALE_SIDE", 64))
    R = int(os.environ.get("SCALE_RAYS", 1024))
    ITERS = int(os.environ.get("SCALE_ITERS", 3))
    DTYPE = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32

    conf = parse_conf(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "conf", "default_mv.conf")
    )
    rcfg = AdaptiveRendererConfig.from_conf(conf["adaptive_renderer"])
    model = RadFieldRenderer(
        model_cfg=ModelConfig.from_conf(conf["model"]),
        renderer_cfg=rcfg, dtype=DTYPE,
    )

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(SB, NS, SIDE, SIDE, 3)).astype(np.float32))
    c2w = np.eye(4, dtype=np.float32) @ np.diag([1., -1., -1., 1.]).astype(np.float32)
    c2w[2, 3] = 1.3
    poses = jnp.asarray(np.broadcast_to(c2w, (SB, NS, 4, 4)).copy())
    focal = jnp.float32(1.09375 * SIDE)
    c = jnp.asarray([SIDE / 2., SIDE / 2.], jnp.float32)
    xy = jnp.asarray(rng.uniform(0.05, 0.95, size=(SB, R, 2)).astype(np.float32))
    K = jnp.broadcast_to(
        jnp.asarray([[1.09375, 0, .5], [0, 1.09375, .5], [0, 0, 1]], jnp.float32),
        (SB, 3, 3),
    )
    rc2w = jnp.broadcast_to(jnp.asarray(c2w), (SB, R, 4, 4))
    gt = jnp.asarray(rng.uniform(size=(SB, R, 3)).astype(np.float32))
    mi = {"x_pix": xy, "cam2world": rc2w, "intrinsics": K}

    variables = model.init(
        jax.random.PRNGKey(0), images, poses, focal, c, method=model.init_all
    )
    tx = optax.adam(1e-4)

    sizes = []
    n = 1
    while n <= max_devices:
        sizes.append(n)
        n *= 2

    results = {}
    for n in sizes:
        mesh = make_mesh((1, n), devices=jax.devices()[:n])
        state = create_train_state(variables, tx)
        # SCALE_STEP=shardmap exercises the Pallas-safe production path
        make_step = (
            make_shardmap_train_step
            if os.environ.get("SCALE_STEP", "gspmd") == "shardmap"
            else make_sharded_train_step
        )
        step = make_step(
            model, tx, LossParams(loss_mode="both"), mesh, donate=False
        )
        args = shard_train_inputs(mesh, images, poses, focal, c, mi, gt)
        key = jax.random.PRNGKey(0)
        s, m = step(state, *args, key)  # warm/compile
        float(np.asarray(m["loss"]))
        t0 = time.perf_counter()
        for i in range(ITERS):
            s, m = step(s, *args, jax.random.fold_in(key, i))
        float(np.asarray(m["loss"]))
        dt = time.perf_counter() - t0
        rays_s = SB * R * ITERS / dt
        results[n] = rays_s
        # On real chips rays/s should grow ~n (strong scaling over ICI);
        # efficiency_vs_1 is the gate-#2 number.  On the virtual CPU mesh
        # every "device" shares the same cores, so the honest signal is
        # sharding_overhead: how much slower the N-way-partitioned program
        # runs than the single-program one at the SAME global batch
        # (1.0 = zero partitioning/collective software overhead).
        eff = rays_s / (results[1] * n) if 1 in results else 1.0
        overhead = results[1] / rays_s if 1 in results else 1.0
        print(
            json.dumps(
                {
                    "devices": n,
                    "rays_per_s": round(rays_s),
                    "efficiency_vs_1": round(eff, 3),
                    "sharding_overhead_vs_1": round(overhead, 3),
                }
            ),
            flush=True,
        )
    return results


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else None)
