"""The jitted train / eval step functions.

One fused XLA program per optimizer step (encode -> render -> loss ->
grads -> Adam update), mirroring the reference hot loop
(``/root/reference/train.py:52-165``) but with everything device-side and
donated.  The step is built once per (model, optimizer, loss) combination;
all run-time variation (images, rays, RNG) flows through arguments so the
program never retraces.

Multi-chip: the same step function runs under a ``jax.sharding.Mesh`` by
annotating the batch with data/rays shardings and the state as replicated
(see ``avr_tpu.parallel``) — XLA inserts the ICI gradient all-reduce
automatically and overlaps it with the backward pass.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from avr_tpu.training.loss import LossParams, loss_fn
from avr_tpu.training.state import TrainState

__all__ = ["make_train_step", "make_eval_step", "make_encode_fn", "make_render_fn"]


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_params: LossParams,
    donate: bool = True,
) -> Callable:
    """Build the jitted train step.

    Step signature::

        state, metrics = step(state, src_images, src_poses, focal, c,
                              model_input, gt, key)

    where ``model_input = {x_pix, cam2world, intrinsics}`` holds the ray
    batch and ``gt`` the target colours in [0, 1].
    """
    has_bn = model.model_cfg.encoder.norm_type == "batch"

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
            loss = loss_fn(out, gt, loss_params)
            return loss, new_model_state

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
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    del has_bn
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_encode_fn(model) -> Callable:
    """Jitted eval-mode conditioning pass (frozen BatchNorm statistics)."""

    def encode(variables, src_images, src_poses, focal, c):
        return model.apply(
            variables, src_images, src_poses, focal, c, train=False,
            method=model.encode,
        )

    return jax.jit(encode)


def make_render_fn(model) -> Callable:
    """Jitted eval-mode render over a ray batch."""

    def render(variables, cond, x_pix, intrinsics, cam2world, key):
        return model.apply(
            variables, cond, x_pix, intrinsics, cam2world, key, train=False,
            method=model.render,
        )

    return jax.jit(render)


def make_eval_step(model, loss_params: LossParams) -> Callable:
    """Jitted eval step: encode + render + loss (no grads)."""
    render = make_render_fn(model)
    encode = make_encode_fn(model)

    def eval_step(variables, src_images, src_poses, focal, c, model_input, gt, key):
        cond = encode(variables, src_images, src_poses, focal, c)
        out = render(
            variables, cond, model_input["x_pix"], model_input["intrinsics"],
            model_input["cam2world"], key,
        )
        return out, loss_fn(out, gt, loss_params)

    return eval_step
