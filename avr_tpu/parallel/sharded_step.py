"""Sharded train step: the single-chip step jitted over the mesh.

The same step function as ``avr_tpu.training.step`` with explicit
in/out shardings: state replicated, scenes on ``data``, rays on ``rays``.
XLA partitions the program (SPMD), inserts the gradient all-reduce over
ICI, and the latency-hiding scheduler overlaps it with the backward pass.

Works identically on a real TPU slice and on the 8-device virtual CPU mesh
the test-suite uses (``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import Mesh

from avr_tpu.parallel.mesh import batch_sharding, ray_sharding, replicated
from avr_tpu.training.loss import LossParams, loss_fn
from avr_tpu.training.state import TrainState

__all__ = ["make_sharded_train_step"]


def make_sharded_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_params: LossParams,
    mesh: Mesh,
    donate: bool = True,
) -> Callable:
    """Build the mesh-sharded jitted train step (same signature as the
    single-chip step from ``make_train_step``)."""

    def step(state: TrainState, src_images, src_poses, focal, c, model_input, gt, key):
        def compute_loss(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            if mutable:
                cond, new_model_state = model.apply(
                    variables, src_images, src_poses, focal, c, train=True,
                    method=model.encode, mutable=mutable,
                )
            else:
                cond = model.apply(
                    variables, src_images, src_poses, focal, c, train=True,
                    method=model.encode,
                )
                new_model_state = {}
            out = model.apply(
                variables, cond,
                model_input["x_pix"], model_input["intrinsics"],
                model_input["cam2world"], key, train=True,
                method=model.render,
            )
            return loss_fn(out, gt, loss_params), new_model_state

        (loss, new_model_state), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_model_state.get("batch_stats", state.batch_stats),
        )
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    rep = replicated(mesh)
    state_shardings = rep  # whole state pytree replicated
    in_shardings = (
        state_shardings,
        batch_sharding(mesh, 5),  # src_images (SB, NS, H, W, 3)
        batch_sharding(mesh, 4),  # src_poses (SB, NS, 4, 4)
        rep,  # focal
        rep,  # c
        {
            "x_pix": ray_sharding(mesh, 3),
            "cam2world": ray_sharding(mesh, 4),
            "intrinsics": batch_sharding(mesh, 3),
        },
        ray_sharding(mesh, 3),  # gt
        rep,  # rng key
    )
    out_shardings = (state_shardings, rep)
    return jax.jit(
        step,
        in_shardings=in_shardings,
        out_shardings=out_shardings,
        donate_argnums=(0,) if donate else (),
    )
