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
from avr_tpu.training.state import TrainState, ema_update

__all__ = [
    "make_train_step",
    "make_chunked_call_train_step",
    "make_eval_step",
    "make_encode_fn",
    "make_render_fn",
    "apply_gradients",
]


def apply_gradients(
    state: TrainState, grads, tx, new_stats, ema_decay: float
) -> TrainState:
    """Optimizer update + step/stats bump + (optional) params-EMA update.

    Shared by every train-step flavour (single-chip, chunked, GSPMD,
    shard_map) so the EMA semantics can't drift between them.  The EMA is
    maintained only when the state carries ``ema_params`` (see
    ``create_train_state(ema=True)``).
    """
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_ema = state.ema_params
    if new_ema is not None and ema_decay > 0.0:
        new_ema = ema_update(new_ema, new_params, ema_decay)
    return state.replace(
        step=state.step + 1,
        params=new_params,
        opt_state=new_opt_state,
        batch_stats=new_stats,
        ema_params=new_ema,
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_params: LossParams,
    donate: bool = True,
    ray_chunks: int = 1,
    ema_decay: float = 0.999,
    rng_mode: str = "per_ray",
    sampler: Optional[Callable] = None,
    sampler_key: Optional[jax.Array] = None,
) -> Callable:
    """Build the jitted train step.

    Step signature::

        state, metrics = step(state, src_images, src_poses, focal, c,
                              model_input, gt, key)

    where ``model_input = {x_pix, cam2world, intrinsics}`` holds the ray
    batch and ``gt`` the target colours in [0, 1].

    With ``sampler`` (see ``avr_tpu.data.device.make_device_sampler``) the
    signature collapses to ``step(state)``: the batch is drawn from the
    device-resident dataset inside the same XLA program, keyed by
    ``fold_in(sampler_key, state.step)`` — so a step costs zero per-step
    host work, zero argument upload, and zero host-side key derivation
    (measured ~8 ms/call for a host ``fold_in`` through the TPU relay,
    scripts/bench_overhead_tpu.py).  Deterministic resume holds because
    the stream depends only on (sampler_key, state.step).

    ``ray_chunks > 1`` accumulates gradients over that many sequential
    ray-chunks (encode runs once; each chunk renders R/ray_chunks rays,
    its grads summed into fp32 accumulators, the conditioning cotangent
    pulled back through the encoder once at the end).  Per-ray work is
    independent, so the update equals the unchunked one up to summation
    order — the point is *memory*: each chunk's backward residuals (e.g.
    the fused decoder's activation stash, ~11 KB/point) only live for one
    chunk, which keeps the stash backward inside its HBM budget at the
    classic VolumeRenderer's 1.6 M fine points/step.  Deviations from the
    unchunked step, both documented knobs: the loss NaN-guard applies
    per chunk, and (in ``rng_mode='legacy'``) each chunk draws its own
    sampler RNG stream.

    ``rng_mode='per_ray'`` derives every sampler draw from the ray's
    global id via the counter hash (``avr_tpu.ops.hashrng``): the stream
    is then identical for any mesh shape, step implementation (GSPMD /
    shard_map / single chip), and ray-chunk count.  ``'legacy'`` keeps the
    per-step-key streams.
    """
    if rng_mode not in ("legacy", "per_ray"):
        raise ValueError(f"unknown rng_mode {rng_mode!r}")
    has_bn = model.model_cfg.encoder.norm_type == "batch"
    from avr_tpu.ops import hashrng

    def step(state: TrainState, src_images, src_poses, focal, c, model_input, gt, key):
        def enc(params):
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
            return cond, new_model_state

        if rng_mode == "per_ray":
            SBg, Rg = gt.shape[:2]
            render_key = hashrng.derive(key, hashrng.global_ray_ids(SBg, Rg))
        else:
            render_key = key

        def compute_loss(params):
            cond, new_model_state = enc(params)
            out = model.apply(
                {"params": params, **(
                    {"batch_stats": state.batch_stats} if state.batch_stats else {}
                )},
                cond,
                model_input["x_pix"], model_input["intrinsics"],
                model_input["cam2world"], render_key, train=True,
                method=model.render,
            )
            loss = loss_fn(out, gt, loss_params)
            return loss, new_model_state

        if ray_chunks == 1:
            (loss, new_model_state), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(state.params)
        else:
            C = ray_chunks
            R = gt.shape[1]
            if R % C:
                raise ValueError(f"ray batch {R} not divisible by ray_chunks {C}")
            cond, enc_vjp, new_model_state = jax.vjp(
                enc, state.params, has_aux=True
            )

            def chunk(a):  # (SB, R, ...) -> (C, SB, R/C, ...)
                SB = a.shape[0]
                return a.reshape(SB, C, R // C, *a.shape[2:]).swapaxes(0, 1)

            intr = model_input["intrinsics"]
            if rng_mode == "per_ray":
                # one global seed map chunked like the other per-ray arrays:
                # the chunked stream equals the unchunked one exactly
                chunk_keys = chunk(render_key.seeds)
            else:
                chunk_keys = jax.random.split(key, C)
            xs = (
                chunk(model_input["x_pix"]),
                chunk(model_input["cam2world"]),
                chunk(gt),
                chunk_keys,
            )

            def chunk_loss(params, cond_, x_pix, c2w, gt_k, k):
                if rng_mode == "per_ray":
                    k = hashrng.RaySeeds(seeds=k)
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                out = model.apply(
                    variables, cond_, x_pix, intr, c2w, k, train=True,
                    method=model.render,
                )
                return loss_fn(out, gt_k, loss_params)

            def body(carry, x):
                gp, gc, lacc = carry
                x_pix, c2w, gt_k, k = x
                l, (dgp, dgc) = jax.value_and_grad(chunk_loss, argnums=(0, 1))(
                    state.params, cond, x_pix, c2w, gt_k, k
                )
                gp = jax.tree.map(jnp.add, gp, dgp)
                gc = jax.tree.map(jnp.add, gc, dgc)
                return (gp, gc, lacc + l), None

            zeros = lambda t: jax.tree.map(jnp.zeros_like, t)
            (gp, gc, lsum), _ = jax.lax.scan(
                body, (zeros(state.params), zeros(cond), jnp.float32(0.0)), xs
            )
            # total loss = mean over rays = mean of (equal-size) chunk means
            loss = lsum / C
            scale = 1.0 / C
            gc = jax.tree.map(lambda t: t * scale, gc)
            gp_enc = enc_vjp(gc)[0]
            grads = jax.tree.map(
                lambda a, b: a * scale + b, gp, gp_enc
            )
        new_state = apply_gradients(
            state, grads, tx,
            new_model_state.get("batch_stats", state.batch_stats), ema_decay,
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        # apply_if_finite (make_optimizer): count of skipped (non-finite)
        # updates — the TPU-native version of the reference's NaN detach
        if hasattr(new_state.opt_state, "total_notfinite"):
            metrics["notfinite"] = new_state.opt_state.total_notfinite
        return new_state, metrics

    del has_bn
    if sampler is not None:
        if sampler_key is None:
            sampler_key = jax.random.PRNGKey(0)

        def dd_step(state: TrainState):
            key = jax.random.fold_in(sampler_key, state.step)
            k_batch, k_render = jax.random.split(key)
            batch = sampler(k_batch)
            return step(state, *batch, k_render)

        return jax.jit(dd_step, donate_argnums=(0,) if donate else ())
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_chunked_call_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_params: LossParams,
    ray_chunks: int,
    ema_decay: float = 0.999,
    rng_mode: str = "per_ray",
) -> Callable:
    """The ``ray_chunks`` update as N+2 *small* jitted programs.

    Same math as ``make_train_step(..., ray_chunks=N)`` (encode once,
    render/backward per chunk, conditioning cotangent pulled back through
    the encoder once, fp32 grad accumulation — equal up to summation
    order), but dispatched as separate device calls instead of one
    scan-of-vjp program:

      1. ``encode``:   params -> conditioning (train-mode BatchNorm),
      2. ``chunk`` xN: render + backward of R/N rays, accumulators donated
         so each chunk's residuals (the fused decoder's ~11 KB/point
         activation stash) die with its call,
      3. ``finish``:   encoder pullback (cheap encode recompute under
         ``jax.vjp`` at the same params/stats -> identical linearization)
         + optimizer update.

    Exists because the monolithic scan program with Pallas kernels inside
    stalled >25 min in compilation through the TPU relay (PERF.md round
    3) while each of these pieces compiles in normal time.  The chunk
    program's peak memory is the point of the whole exercise: it bounds
    the stash at (points/N), which puts the classic VolumeRenderer's
    1.6 M fine points back inside the stash backward's HBM budget.

    ``rng_mode`` as in :func:`make_train_step`; ``'per_ray'`` makes the
    chunked stream bitwise equal to the unchunked one.
    """
    if rng_mode not in ("legacy", "per_ray"):
        raise ValueError(f"unknown rng_mode {rng_mode!r}")
    from avr_tpu.ops import hashrng

    C = ray_chunks

    @jax.jit
    def encode_j(params, batch_stats, src_images, src_poses, focal, c):
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
        return cond, new_model_state

    def chunk_loss(params, batch_stats, cond, x_pix, intr, c2w, gt_k, k):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(
            variables, cond, x_pix, intr, c2w, k, train=True,
            method=model.render,
        )
        return loss_fn(out, gt_k, loss_params)

    @partial(jax.jit, donate_argnums=(8, 9, 10))
    def chunk_j(params, batch_stats, cond, x_pix, intr, c2w, gt_k, k,
                gp, gc, lacc):
        l, (dgp, dgc) = jax.value_and_grad(chunk_loss, argnums=(0, 2))(
            params, batch_stats, cond, x_pix, intr, c2w, gt_k, k
        )
        gp = jax.tree.map(jnp.add, gp, dgp)
        gc = jax.tree.map(jnp.add, gc, dgc)
        return gp, gc, lacc + l

    @partial(jax.jit, donate_argnums=(0,))
    def finish_j(state, src_images, src_poses, focal, c, gp, gc, lsum,
                 new_model_state):
        def enc(params):
            cond, _ = encode_j.__wrapped__(
                params, state.batch_stats, src_images, src_poses, focal, c
            )
            return cond

        scale = 1.0 / C
        gc = jax.tree.map(lambda t: t * scale, gc)
        _, enc_vjp = jax.vjp(enc, state.params)
        gp_enc = enc_vjp(gc)[0]
        grads = jax.tree.map(lambda a, b: a * scale + b, gp, gp_enc)
        new_state = apply_gradients(
            state, grads, tx,
            new_model_state.get("batch_stats", state.batch_stats), ema_decay,
        )
        metrics = {"loss": lsum / C, "grad_norm": optax.global_norm(grads)}
        if hasattr(new_state.opt_state, "total_notfinite"):
            metrics["notfinite"] = new_state.opt_state.total_notfinite
        return new_state, metrics

    def step(state: TrainState, src_images, src_poses, focal, c,
             model_input, gt, key):
        R = gt.shape[1]
        if R % C:
            raise ValueError(f"ray batch {R} not divisible by ray_chunks {C}")
        cond, new_model_state = encode_j(
            state.params, state.batch_stats, src_images, src_poses, focal, c
        )
        intr = model_input["intrinsics"]

        def chunk(a, i):  # (SB, R, ...) -> (SB, R/C, ...), chunk i
            SB = a.shape[0]
            return a.reshape(SB, C, R // C, *a.shape[2:])[:, i]

        if rng_mode == "per_ray":
            SBg = gt.shape[0]
            seeds = hashrng.derive(key, hashrng.global_ray_ids(SBg, R)).seeds
            keys = [hashrng.RaySeeds(seeds=chunk(seeds, i)) for i in range(C)]
        else:
            keys = jax.random.split(key, C)
        gp = jax.tree.map(jnp.zeros_like, state.params)
        gc = jax.tree.map(jnp.zeros_like, cond)
        lacc = jnp.float32(0.0)
        for i in range(C):
            gp, gc, lacc = chunk_j(
                state.params, state.batch_stats, cond,
                chunk(model_input["x_pix"], i),
                intr,
                chunk(model_input["cam2world"], i),
                chunk(gt, i),
                keys[i],
                gp, gc, lacc,
            )
        return finish_j(
            state, src_images, src_poses, focal, c, gp, gc, lacc,
            new_model_state,
        )

    return step


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
