"""On-device A/B, round 5: march-backward levers + gather re-measure.

Variants, all full train steps at bench shapes (SB=4, R=4096, 128^2,
bf16, r4 production defaults: norm-gated guard + per-ray RNG):

  * ``wr16``        — new march kernel (gate-stash backward: no cell
                      replay) with the round-4 gather window (16 rows).
                      Delta vs BENCH_r04 (227.5k) isolates the gate stash.
  * ``wr8``         — gather window 8 rows: halves the per-window one-hot
                      sel/P contractions in the march fwd+bwd IF ray
                      blocks stay row-coherent (more windows otherwise).
  * ``wr4``         — the same trade pushed further.
  * ``gather_xla``  — band-decoder feature gather through plain XLA
                      (VERDICT r4 #3 re-measure at r4 defaults).
  * ``gather_proj`` — the projected windowed gather kernel (was +1.8 ms
                      in round 2 surroundings; re-measure).

Usage: python scripts/ab_r5_tpu.py   (repo root; one TPU user at a time)
"""

import dataclasses
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

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    print("devices:", jax.devices(), flush=True)
    _, state0, args, rays = H.build("never")
    params_host = jax.device_get(state0.params)
    stats_host = jax.device_get(state0.batch_stats) if state0.batch_stats else {}
    del state0

    conf = parse_conf(os.path.join(ROOT, "conf", "default_mv.conf"))
    base_cfg = ModelConfig.from_conf(conf["model"])

    variants = [
        ("wr16", "16", "auto"),
        ("wr8", "8", "auto"),
        ("wr4", "4", "auto"),
        ("gather_xla", "8", "xla"),
        ("gather_proj", "8", "pallas_proj"),
    ]
    for tag, wr, gather in variants:
        os.environ["AVR_MARCH_WR"] = wr  # read at kernel trace time
        model_cfg = dataclasses.replace(base_cfg, gather_impl=gather)
        model = RadFieldRenderer(
            model_cfg=model_cfg,
            renderer_cfg=AdaptiveRendererConfig.from_conf(
                conf["adaptive_renderer"]
            ),
            dtype=jnp.bfloat16,
        )
        variables = {"params": jax.tree.map(jnp.asarray, params_host)}
        if stats_host:
            variables["batch_stats"] = jax.tree.map(jnp.asarray, stats_host)
        tx = make_optimizer(1e-4, skip_impl="norm")
        state = create_train_state(variables, tx)
        step = make_train_step(
            model, tx, LossParams(loss_mode="both"), rng_mode="per_ray"
        )
        H.time_variant(tag, step, state, args, rays)


if __name__ == "__main__":
    main()
