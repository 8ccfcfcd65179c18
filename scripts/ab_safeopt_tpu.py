"""On-device A/B: cost of the non-finite-update skip (apply_if_finite).

One process, two full-train-step builds: plain Adam vs make_optimizer's
apply_if_finite wrapper (the production default after the round-3 NaN
poisoning fix).  Usage: python scripts/ab_safeopt_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

import ab_integral_tpu as H  # noqa: E402
from avr_tpu.training import (  # noqa: E402
    LossParams, create_train_state, make_optimizer, make_train_step,
)


def main():
    print("devices:", jax.devices(), flush=True)
    from avr_tpu.config import parse_conf
    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.models.wrapper import RadFieldRenderer
    from avr_tpu.renderers.base import AdaptiveRendererConfig

    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = parse_conf(os.path.join(ROOT, "conf", "default_mv.conf"))
    model_cfg = ModelConfig.from_conf(conf["model"])
    model = RadFieldRenderer(
        model_cfg=model_cfg,
        renderer_cfg=AdaptiveRendererConfig.from_conf(conf["adaptive_renderer"]),
        dtype=jnp.bfloat16,
    )
    _, state0, args, rays = H.build("never")
    # Host snapshot of the init: the train step donates its state, so
    # re-wrapping state0's DEVICE buffers for the second variant dies with
    # "Array has been deleted" (the round-3 crash).  device_get once,
    # re-upload per variant.
    params_host = jax.device_get(state0.params)
    stats_host = jax.device_get(state0.batch_stats) if state0.batch_stats else {}
    del state0
    for skip in (False, True):
        tx = make_optimizer(1e-4, skip_nonfinite=skip)
        variables = {"params": jax.tree.map(jnp.asarray, params_host)}
        if stats_host:
            variables["batch_stats"] = jax.tree.map(jnp.asarray, stats_host)
        state = create_train_state(variables, tx)
        step = make_train_step(model, tx, LossParams(loss_mode="both"))
        H.time_variant(f"safe{int(skip)}", step, state, args, rays)


if __name__ == "__main__":
    main()
