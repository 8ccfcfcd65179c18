"""Train state: parameters + BatchNorm stats + optimizer state, one pytree.

The whole state is a single pytree so it checkpoints/shards/donates
cleanly.  ``apply_fn``/``tx`` live outside the pytree (static).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import optax
from flax import struct

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "ema_update",
    "skip_nonfinite_by_norm",
]


class SkipByNormState(NamedTuple):
    inner_state: Any
    # cumulative skipped updates; named to match optax.apply_if_finite's
    # counter so the train-step metrics surface either implementation
    total_notfinite: jax.Array


def skip_nonfinite_by_norm(
    inner: optax.GradientTransformation,
) -> optax.GradientTransformation:
    """Skip the whole update when the gradient NORM is non-finite.

    Cheaper equivalent of ``optax.apply_if_finite``: that wrapper runs an
    elementwise ``isfinite`` + tree-reduce over every gradient leaf (a full
    extra HBM pass over the gradient tree) and then selects between the
    applied and zero update trees.  The global L2 norm is already computed
    by every train step for the ``grad_norm`` metric, and XLA CSEs the two
    identical reductions — so this guard's marginal cost is one scalar
    ``isfinite`` plus a ``lax.cond``.  Any NaN/inf anywhere in the tree
    makes the norm NaN/inf (sum of squares propagates both), so the skip
    condition is identical; the one behavioural difference is deliberate:
    there is NO ``max_consecutive_errors`` escape — a run bad enough to hit
    it needs fixing, not a silently poisoned update (see ``make_optimizer``
    notes).
    """

    def init(params):
        import jax.numpy as jnp

        return SkipByNormState(inner.init(params), jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        import jax.numpy as jnp

        ok = jnp.isfinite(optax.global_norm(grads))

        def do(_):
            return inner.update(grads, state.inner_state, params)

        def skip(_):
            return jax.tree.map(jnp.zeros_like, grads), state.inner_state

        updates, new_inner = jax.lax.cond(ok, do, skip, None)
        return updates, SkipByNormState(
            new_inner, state.total_notfinite + (1 - ok.astype(jnp.int32))
        )

    return optax.GradientTransformation(init, update)


def make_optimizer(
    lr: float = 1e-4,
    skip_nonfinite: bool = True,
    schedule: str = "constant",
    total_steps: Optional[int] = None,
    warmup_steps: int = 500,
    skip_impl: str = "norm",
) -> optax.GradientTransformation:
    """Adam with non-finite-update skipping (the production optimizer).

    The reference's NaN guard (``/root/reference/utils.py:372-373``)
    rebinds a NaN loss to the float ``1e-6`` — which *detaches* the torch
    graph, so a NaN batch contributes zero gradient and training sails on.
    A ``jnp.where`` guard on the loss value cannot reproduce that: the
    cotangent through the untaken branch is ``0 * NaN = NaN``, so one bad
    batch (e.g. a transient ``near > far`` ε-band while the marcher is
    unconverged) poisons the parameters forever.  ``optax.apply_if_finite``
    is the TPU-native equivalent of the detach: grads are checked for
    non-finite values inside the fused step and the whole update (params
    AND Adam moments) is skipped for that batch, exactly like a detached
    backward.  ``total_notfinite`` is surfaced in the train metrics.

    ``schedule="cosine"`` (opt-in; constant matches the reference's fixed
    Adam lr) uses linear warmup + cosine decay to lr/20 over
    ``total_steps`` — long constant-lr NeRF runs intermittently collapse
    on late grad spikes (observed: val PSNR 23 -> 13 in the last 500 of
    10k steps), which decay prevents.

    Two guard implementations (``skip_impl``): ``"norm"`` (default) gates
    on ``isfinite(global_norm(grads))`` — the norm is already computed for
    the ``grad_norm`` metric and XLA CSEs the reduction, so the guard is
    nearly free, and it never force-applies a poisoned update.
    ``"optax"`` is ``optax.apply_if_finite(max_consecutive_errors=1000)``,
    which runs a per-leaf isfinite sweep and applies the inner update
    *anyway* after 1000 consecutive non-finite batches (optax's escape
    hatch).  Either way ``fit`` watches the ``notfinite`` metric and warns
    when it grows across consecutive logging intervals.
    """
    if schedule == "cosine":
        if not total_steps:
            raise ValueError("schedule='cosine' needs total_steps")
        warmup = min(warmup_steps, max(total_steps // 10, 1))
        lr = optax.warmup_cosine_decay_schedule(
            init_value=lr / 10.0, peak_value=lr, warmup_steps=warmup,
            decay_steps=total_steps, end_value=lr / 20.0,
        )
    elif schedule != "constant":
        raise ValueError(f"unknown lr schedule {schedule!r}")
    tx = optax.adam(lr)
    if skip_nonfinite:
        if skip_impl == "norm":
            # default: gate on the (already-computed, CSE'd) gradient norm
            # instead of optax's per-leaf isfinite sweep — same skip
            # condition, one less full HBM pass over the gradient tree
            tx = skip_nonfinite_by_norm(tx)
        elif skip_impl == "optax":
            tx = optax.apply_if_finite(tx, max_consecutive_errors=1000)
        else:
            raise ValueError(f"unknown skip_impl {skip_impl!r}")
    return tx


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any  # {} when the model has no BatchNorm collections
    opt_state: Any
    # Exponential moving average of ``params`` (None = EMA disabled).
    # Maintained inside the fused train step when the step was built with
    # ``ema_decay > 0``; evaluation reads it via :meth:`eval_variables`.
    # The marched-surface renderer's val quality swings +-7 dB between
    # consecutive evals under raw params (PERF.md round 3: tiny parameter
    # motion flips whether whole scenes' epsilon-bands land on-surface);
    # the EMA is the stabilizer.
    ema_params: Any = None

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def eval_variables(self):
        """Variables for evaluation: EMA params when maintained, else raw."""
        v = {"params": self.ema_params if self.ema_params is not None else self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(
    variables, tx: optax.GradientTransformation, ema: bool = False
) -> TrainState:
    import jax.numpy as jnp

    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.array, params) if ema else None,
    )


def ema_update(ema_params, new_params, decay: float):
    """One EMA step: ``ema <- decay * ema + (1 - decay) * params``."""
    import jax.numpy as jnp

    d = jnp.float32(decay)
    return jax.tree.map(
        lambda e, p: (e * d + p.astype(e.dtype) * (1.0 - d)).astype(e.dtype),
        ema_params, new_params,
    )
