"""LSTM cell for the differentiable ray-marcher.

A from-scratch Flax cell matching the torch ``nn.LSTMCell`` semantics the
reference marcher uses (``/root/reference/renderers.py:292-310``), because
the initialization scheme is part of the algorithm:

  * input-hidden weights: Kaiming normal; hidden-hidden: orthogonal;
    biases zero (reference ``utils.py:109-118``),
  * forget-gate bias set to 1 in *both* bias vectors (effective forget
    bias 2.0; reference ``utils.py:121-126``),
  * gate ordering (i, f, g, o) matches torch so checkpoints can be
    translated 1:1.

The hidden-state gradient clamp (reference's ``register_hook(lambda x:
x.clamp(-10, 10))`` at ``renderers.py:335-336``) is a ``custom_vjp``
identity — the functional replacement for an autograd hook.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["MarchLSTMCell", "clamp_grad"]


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def clamp_grad(x: jnp.ndarray, limit: float = 10.0) -> jnp.ndarray:
    """Identity whose cotangent is clamped elementwise to [-limit, limit]."""
    return x


def _clamp_grad_fwd(x, limit):
    return x, None


def _clamp_grad_bwd(limit, _, g):
    return (jnp.clip(g, -limit, limit),)


clamp_grad.defvjp(_clamp_grad_fwd, _clamp_grad_bwd)


def _forget_bias_init(key, shape, dtype=jnp.float32):
    """Zeros with the forget-gate quarter set to 1 (gate order i,f,g,o)."""
    b = jnp.zeros(shape, dtype)
    n = shape[0]
    return b.at[n // 4 : n // 2].set(1.0)


class MarchLSTMCell(nn.Module):
    """torch-compatible LSTMCell: gates = x @ W_ih^T + b_ih + h @ W_hh^T + b_hh."""

    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, state: Tuple[jnp.ndarray, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Step the cell: ``(..., input)`` + ``((..., H), (..., H))`` -> new state."""
        h, c = state
        H = self.hidden_size
        in_features = x.shape[-1]

        kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
        # Params stored fp32 (and transposed, (in, 4H), so the forward is a
        # plain matmul); compute runs in self.dtype.
        w_ih = self.param("w_ih", kaiming, (in_features, 4 * H), jnp.float32)
        w_hh = self.param(
            "w_hh", nn.initializers.orthogonal(column_axis=0), (H, 4 * H), jnp.float32
        )
        b_ih = self.param("b_ih", _forget_bias_init, (4 * H,), jnp.float32)
        b_hh = self.param("b_hh", _forget_bias_init, (4 * H,), jnp.float32)

        x = x.astype(self.dtype)
        h = h.astype(self.dtype)
        c = c.astype(self.dtype)
        gates = (
            x @ w_ih.astype(self.dtype)
            + b_ih.astype(self.dtype)
            + h @ w_hh.astype(self.dtype)
            + b_hh.astype(self.dtype)
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h_new = nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, c_new

    def zero_state(self, leading_shape: Tuple[int, ...]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = jnp.zeros(leading_shape + (self.hidden_size,), self.dtype)
        return z, z
