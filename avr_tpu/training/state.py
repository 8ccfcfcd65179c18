"""Train state: parameters + BatchNorm stats + optimizer state, one pytree.

The whole state is a single pytree so it checkpoints/shards/donates
cleanly.  ``apply_fn``/``tx`` live outside the pytree (static).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import struct

__all__ = ["TrainState", "create_train_state"]


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any  # {} when the model has no BatchNorm collections
    opt_state: Any

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(variables, tx: optax.GradientTransformation) -> TrainState:
    import jax.numpy as jnp

    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )
