"""Plain MLP decoder (the ``type = mlp`` path).

The reference's factory dispatches ``type=mlp`` to ``ImplicitNet.from_conf``
(reference ``models.py:18-21``) but never defines ``ImplicitNet`` — the
path NameErrors and no shipped config uses it.  We provide a working
implementation with the standard NeRF/IDR shape so the config surface is
complete: a Dense stack with a skip connection re-injecting the input at
configurable layers, latent concatenated to the input.

Interface matches :class:`avr_tpu.models.mlp.ResnetFC`: ``(x, z, train)``
with ``(SB, NS, B, d)`` inputs, NS mean/max-pooled at ``combine_layer``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from avr_tpu.models.mlp import _activation, _combine, _kaiming

__all__ = ["ImplicitNet"]


class ImplicitNet(nn.Module):
    d_in: int
    d_out: int = 4
    n_layers: int = 8
    d_hidden: int = 256
    d_latent: int = 0
    skip_in: Tuple[int, ...] = (4,)
    beta: float = 0.0
    combine_layer: int = 1000
    combine_type: str = "average"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (SB, NS, B, d_in)
        z: Optional[jnp.ndarray] = None,  # (SB, NS, B, d_latent)
        train: bool = False,
    ) -> jnp.ndarray:
        act = _activation(self.beta)
        inp = x if z is None else jnp.concatenate([z, x], axis=-1)
        h = inp
        combined = False
        for i in range(self.n_layers):
            if i == self.combine_layer:
                h = _combine(h, self.combine_type, axis=1)
                inp = _combine(inp, self.combine_type, axis=1)
                combined = True
            if i in self.skip_in and i > 0:
                h = jnp.concatenate([h, inp], axis=-1) / jnp.sqrt(2.0).astype(h.dtype)
            width = self.d_out if i == self.n_layers - 1 else self.d_hidden
            h = nn.Dense(width, kernel_init=_kaiming, dtype=self.dtype,
                         name=f"lin_{i}")(h)
            if i < self.n_layers - 1:
                h = act(h)
        if not combined:
            h = _combine(h, self.combine_type, axis=1)
        return h

    @classmethod
    def from_conf(cls, conf, d_in: int, d_latent: int = 0, **kwargs):
        return cls(
            d_in=d_in,
            d_latent=d_latent,
            n_layers=conf.get_int("n_layers", 8),
            d_hidden=conf.get_int("d_hidden", 256),
            skip_in=tuple(),
            beta=conf.get_float("beta", 0.0),
            combine_layer=conf.get_int("combine_layer", 1000),
            combine_type=conf.get_string("combine_type", "average"),
            **kwargs,
        )
