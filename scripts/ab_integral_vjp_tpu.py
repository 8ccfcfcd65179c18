"""On-device A/B, round 4: closed-form volume_integral VJP vs plain autodiff.

The round-4 trace table puts 5.4 ms/step in `transpose_jvp(render)` glue
and names the integral/cumprod backward chain as the main suspect
(PERF.md).  `ops/integrate.py` now ships a closed-form adjoint
(custom_vjp: one reverse cumsum instead of the transposed cumprod scan);
this harness measures its cost like-for-like at bench shapes and the
round-4 production defaults (norm-gated guard, per-ray RNG).

Interleaved ABAB ordering (two timed passes per variant) so slow relay
drift cancels; state rebuilt per variant from a host snapshot of the init
(immune to step donation, the ab_safeopt_tpu.py lesson).  The
AVR_INTEGRAL_VJP env knob is trace-time-bound, so it is flipped BEFORE
each step build and each build traces fresh.

Usage: python scripts/ab_integral_vjp_tpu.py   (repo root; one TPU user)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")

import ab_integral_tpu as H  # noqa: E402
from avr_tpu.training import (  # noqa: E402
    LossParams, create_train_state, make_optimizer, make_train_step,
)

ITERS = int(os.environ.get("AB_ITERS", "60"))


def time_only(tag, step, state, args, rays, key):
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
    rate = rays * ITERS / dt
    print(f"{tag}: {rate:,.0f} rays/s  ({dt / ITERS * 1e3:.1f} ms/step wall)", flush=True)
    return rate, state, key


def main():
    print("devices:", jax.devices(), flush=True)
    _, state0, args, rays = H.build("never")
    params_host = jax.device_get(state0.params)
    stats_host = jax.device_get(state0.batch_stats) if state0.batch_stats else {}
    del state0

    import ab_r4_tpu  # noqa: F401  (same repo-root path trick)
    from avr_tpu.config import parse_conf
    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.models.wrapper import RadFieldRenderer
    from avr_tpu.renderers.base import AdaptiveRendererConfig

    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = parse_conf(os.path.join(ROOT, "conf", "default_mv.conf"))
    model_cfg = ModelConfig.from_conf(conf["model"])

    built = {}
    for tag, knob in (("ad", "ad"), ("closed", "closed")):
        os.environ["AVR_INTEGRAL_VJP"] = knob  # read at trace time of this build
        model = RadFieldRenderer(
            model_cfg=model_cfg,
            renderer_cfg=AdaptiveRendererConfig.from_conf(conf["adaptive_renderer"]),
            dtype=jnp.bfloat16,
        )
        tx = make_optimizer(1e-4, skip_impl="norm")
        variables = {"params": jax.tree.map(jnp.asarray, params_host)}
        if stats_host:
            variables["batch_stats"] = jax.tree.map(jnp.asarray, stats_host)
        state = create_train_state(variables, tx)
        step = make_train_step(model, tx, LossParams(loss_mode="both"),
                               rng_mode="per_ray")
        key = jax.random.PRNGKey(0)
        # compile now (inside the right env setting) so timing passes are warm
        key, sub = jax.random.split(key)
        state, metrics = step(state, *args, sub)
        float(np.asarray(metrics["loss"]))
        built[tag] = [step, state, key]

    rates = {"ad": [], "closed": []}
    for _ in range(2):  # ABAB
        for tag in ("ad", "closed"):
            step, state, key = built[tag]
            r, state, key = time_only(tag, step, state, args, rays, key)
            rates[tag].append(r)
            built[tag] = [step, state, key]

    for tag in ("ad", "closed"):
        step, state, key = built[tag]
        out = f"/tmp/trace_ivjp_{tag}"
        jax.profiler.start_trace(out)
        for _ in range(3):
            key, sub = jax.random.split(key)
            state, metrics = step(state, *args, sub)
        float(np.asarray(metrics["loss"]))
        jax.profiler.stop_trace()
        print(f"trace[{tag}] -> {out}", flush=True)

    for tag in ("ad", "closed"):
        print(f"{tag} mean: {np.mean(rates[tag]):,.0f} rays/s over {rates[tag]}",
              flush=True)


if __name__ == "__main__":
    main()
