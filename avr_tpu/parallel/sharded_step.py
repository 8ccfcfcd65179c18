"""Sharded train steps over the ``(data, rays)`` mesh.

Two flavours:

* :func:`make_sharded_train_step` — the single-chip step jitted with
  explicit in/out shardings (GSPMD).  XLA partitions the program, inserts
  the gradient all-reduce over ICI, and the latency-hiding scheduler
  overlaps it with the backward pass.  Best when the program is pure XLA
  ops (the compiler can repartition everything freely).

* :func:`make_shardmap_train_step` — the step body runs under
  ``shard_map`` with *per-shard* shapes and an explicit ``pmean`` gradient
  sync.  This is the robust path when the program contains Pallas kernels
  (``gather_impl='pallas'``, the fused march/decoder): a Mosaic
  custom-call has no SPMD partitioning rule, so under GSPMD the partitioner
  must all-gather its operands onto every device — under ``shard_map`` each
  shard just runs the kernel on its local ray block.  Per-step RNG is
  decorrelated across shards by folding the shard index into the key.

Both work identically on a real TPU slice and on the 8-device virtual CPU
mesh the test-suite uses (``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avr_tpu.parallel.mesh import batch_sharding, ray_sharding, replicated
from avr_tpu.training.loss import LossParams, loss_fn
from avr_tpu.training.state import TrainState
from avr_tpu.training.step import apply_gradients

__all__ = ["make_sharded_train_step", "make_shardmap_train_step"]


def make_sharded_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_params: LossParams,
    mesh: Mesh,
    donate: bool = True,
    ema_decay: float = 0.999,
    rng_mode: str = "per_ray",
) -> Callable:
    """Build the mesh-sharded jitted train step (same signature as the
    single-chip step from ``make_train_step``).

    ``rng_mode='per_ray'`` (avr_tpu.ops.hashrng) draws sampler randomness
    from global ray ids: the iota-derived ids partition into globally
    consistent values under any sharding, so this step consumes the same
    stream as the single-chip and shard_map steps.
    """
    from avr_tpu.ops import hashrng

    def step(state: TrainState, src_images, src_poses, focal, c, model_input, gt, key):
        if rng_mode == "per_ray":
            SBg, Rg = gt.shape[:2]
            render_key = hashrng.derive(key, hashrng.global_ray_ids(SBg, Rg))
        else:
            render_key = key

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
                model_input["cam2world"], render_key, train=True,
                method=model.render,
            )
            return loss_fn(out, gt, loss_params), new_model_state

        (loss, new_model_state), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        new_state = apply_gradients(
            state, grads, tx,
            new_model_state.get("batch_stats", state.batch_stats), ema_decay,
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


def make_shardmap_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_params: LossParams,
    mesh: Mesh,
    donate: bool = True,
    ema_decay: float = 0.999,
    rng_mode: str = "per_ray",
) -> Callable:
    """Build a ``shard_map``-based train step (same signature as
    ``make_train_step``).

    Layout: state replicated; scenes sharded over ``data``; rays sharded
    over ``rays``.  The loss/grad body runs per-shard (Pallas kernels see
    local shapes), gradients and loss are ``pmean``-ed over the whole mesh
    (the all-reduce rides ICI), and the optimizer update runs on the synced
    grads, so parameters stay bitwise replicated.

    RNG: with ``rng_mode='legacy'`` the per-shard key is
    ``fold_in(key, linear_shard_index)`` — shards draw decorrelated
    stratified jitter / init distances (iid across the global ray batch,
    like the single-chip step; not bitwise identical to it).  With
    ``'per_ray'`` (avr_tpu.ops.hashrng) each ray's draws hash its *global*
    id reconstructed from the mesh axis indices, so this step consumes the
    exact stream of the GSPMD and single-chip steps.
    """
    from jax.experimental.shard_map import shard_map

    from avr_tpu.ops import hashrng

    def local_loss_and_grads(params, batch_stats, src_images, src_poses,
                             focal, c, model_input, gt, key):
        if rng_mode == "per_ray":
            SBl, Rl = gt.shape[:2]
            key = hashrng.derive(
                key, hashrng.shard_ray_ids(SBl, Rl, "data", "rays")
            )
        else:
            di = jax.lax.axis_index("data")
            ri = jax.lax.axis_index("rays")
            key = jax.random.fold_in(
                key, di * jax.lax.axis_size("rays") + ri
            )

        def compute_loss(params):
            variables = {"params": params}
            mutable = []
            if batch_stats:
                variables["batch_stats"] = batch_stats
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
        )(params)
        # explicit ICI all-reduce; equal shard sizes make pmean exact
        grads = jax.lax.pmean(grads, ("data", "rays"))
        loss = jax.lax.pmean(loss, ("data", "rays"))
        new_stats = new_model_state.get("batch_stats", batch_stats)
        if new_stats:
            # encoder stats vary over data shards only (rays shards see the
            # same scenes); pmean over the mesh re-replicates them
            new_stats = jax.lax.pmean(new_stats, ("data", "rays"))
        return loss, grads, new_stats

    rep_spec = P()
    data_spec = P("data")
    rays_spec = P("data", "rays")
    body = shard_map(
        local_loss_and_grads,
        mesh=mesh,
        in_specs=(
            rep_spec,  # params
            rep_spec,  # batch_stats
            data_spec,  # src_images
            data_spec,  # src_poses
            rep_spec,  # focal
            rep_spec,  # c
            {
                "x_pix": rays_spec,
                "cam2world": rays_spec,
                "intrinsics": data_spec,
            },
            rays_spec,  # gt
            rep_spec,  # key
        ),
        out_specs=(rep_spec, rep_spec, rep_spec),
        check_rep=False,
    )

    def step(state: TrainState, src_images, src_poses, focal, c,
             model_input, gt, key):
        loss, grads, new_stats = body(
            state.params, state.batch_stats, src_images, src_poses,
            focal, c, model_input, gt, key,
        )
        new_state = apply_gradients(state, grads, tx, new_stats, ema_decay)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    rep = replicated(mesh)
    in_shardings = (
        rep,
        batch_sharding(mesh, 5),
        batch_sharding(mesh, 4),
        rep,
        rep,
        {
            "x_pix": ray_sharding(mesh, 3),
            "cam2world": ray_sharding(mesh, 4),
            "intrinsics": batch_sharding(mesh, 3),
        },
        ray_sharding(mesh, 3),
        rep,
    )
    return jax.jit(
        step,
        in_shardings=in_shardings,
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )
