"""Focused A/B: march backward gate-stash (8-lane-aligned) vs cell replay.

Both at window_rows=8 (the ab_r5 winner), full train step, bench shapes.
Decides AVR_MARCH_STASH's default.  Usage: python scripts/ab_r5b_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_default_prng_impl", "rbg")

import ab_integral_tpu as H  # noqa: E402
from avr_tpu.training import (  # noqa: E402
    LossParams, create_train_state, make_optimizer, make_train_step,
)
import jax.numpy as jnp  # noqa: E402


def main():
    print("devices:", jax.devices(), flush=True)
    os.environ["AVR_MARCH_WR"] = "8"
    _, state0, args, rays = H.build("never")
    params_host = jax.device_get(state0.params)
    del state0

    from avr_tpu.config import parse_conf
    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.models.wrapper import RadFieldRenderer
    from avr_tpu.renderers.base import AdaptiveRendererConfig

    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = parse_conf(os.path.join(ROOT, "conf", "default_mv.conf"))
    model_cfg = ModelConfig.from_conf(conf["model"])

    for tag, stash in (("stash_aligned", "1"), ("replay", "0"),
                       ("stash_aligned2", "1")):
        os.environ["AVR_MARCH_STASH"] = stash
        model = RadFieldRenderer(
            model_cfg=model_cfg,
            renderer_cfg=AdaptiveRendererConfig.from_conf(
                conf["adaptive_renderer"]
            ),
            dtype=jnp.bfloat16,
        )
        variables = {"params": jax.tree.map(jnp.asarray, params_host)}
        tx = make_optimizer(1e-4, skip_impl="norm")
        state = create_train_state(variables, tx)
        step = make_train_step(
            model, tx, LossParams(loss_mode="both"), rng_mode="per_ray"
        )
        H.time_variant(tag, step, state, args, rays)


if __name__ == "__main__":
    main()
