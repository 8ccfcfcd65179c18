"""On-device A/B, round 4: optimizer guard cost + per-ray RNG cost.

Four full-train-step builds in one process, all at bench shapes
(SB=4, R=4096, 128^2, bf16):

  * ``adam``         — plain Adam, legacy RNG (the round-2 bench config),
  * ``safe_optax``   — optax.apply_if_finite (the round-3 bench default,
                       BENCH_SAFE_OPT=1): its delta vs ``adam`` is the
                       guard cost the round-3 harness crashed before
                       measuring,
  * ``safe_norm``    — the grad-norm-gated skip (skip_nonfinite_by_norm,
                       the round-4 default): same skip condition, no
                       per-leaf isfinite sweep,
  * ``safe_norm_pr`` — safe_norm + rng_mode='per_ray' (sharding-invariant
                       counter-hash sampler RNG): its delta vs safe_norm
                       is the hash cost vs the core-PRNG kernel, the gate
                       for flipping the production RNG default.

The round-3 harness (`ab_safeopt_tpu.py`) died re-wrapping donated
buffers: `make_train_step` donates the state, so after variant 1 the
shared `state0.params` were freed (RuntimeError: Array has been
deleted).  Here every variant rebuilds its state from a HOST copy of the
init (device_get once, re-upload per variant), which donation cannot
touch.

Usage: python scripts/ab_r4_tpu.py   (repo root; one TPU user at a time)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_default_prng_impl", "rbg")

import ab_integral_tpu as H  # noqa: E402  (build + time_variant helpers)
from avr_tpu.config import parse_conf  # noqa: E402
from avr_tpu.models.pixelnerf import ModelConfig  # noqa: E402
from avr_tpu.models.wrapper import RadFieldRenderer  # noqa: E402
from avr_tpu.renderers.base import AdaptiveRendererConfig  # noqa: E402
from avr_tpu.training import (  # noqa: E402
    LossParams, create_train_state, make_optimizer, make_train_step,
)


def main():
    print("devices:", jax.devices(), flush=True)
    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = parse_conf(os.path.join(ROOT, "conf", "default_mv.conf"))
    model_cfg = ModelConfig.from_conf(conf["model"])
    model = RadFieldRenderer(
        model_cfg=model_cfg,
        renderer_cfg=AdaptiveRendererConfig.from_conf(conf["adaptive_renderer"]),
        dtype=jnp.bfloat16,
    )
    _, state0, args, rays = H.build("never")
    # host snapshot: immune to the train step's buffer donation
    params_host = jax.device_get(state0.params)
    stats_host = jax.device_get(state0.batch_stats) if state0.batch_stats else {}
    del state0

    variants = [
        ("adam", optax.adam(1e-4), "legacy"),
        ("safe_optax", make_optimizer(1e-4, skip_impl="optax"), "legacy"),
        ("safe_norm", make_optimizer(1e-4, skip_impl="norm"), "legacy"),
        ("safe_norm_pr", make_optimizer(1e-4, skip_impl="norm"), "per_ray"),
    ]
    for tag, tx, rng_mode in variants:
        variables = {"params": jax.tree.map(jnp.asarray, params_host)}
        if stats_host:
            variables["batch_stats"] = jax.tree.map(jnp.asarray, stats_host)
        state = create_train_state(variables, tx)
        step = make_train_step(
            model, tx, LossParams(loss_mode="both"), rng_mode=rng_mode
        )
        H.time_variant(tag, step, state, args, rays)


if __name__ == "__main__":
    main()
