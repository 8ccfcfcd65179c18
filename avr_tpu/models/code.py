"""NeRF sinusoidal positional encoding.

Matches the reference's buffer-trick implementation
(``/root/reference/models.py:41-87``) bit-for-bit in fp32, including its
output *ordering*: frequencies are interleaved ``sin(f0 x), cos(f0 x),
sin(f1 x), cos(f1 x), ...`` and flattened as ``(freq_pair, dim)`` —
i.e. channel ``k * d_in + d`` — with the raw input (optionally) prepended.
Ordering parity matters because downstream MLP weights are indexed by it.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["PositionalEncoding"]


class PositionalEncoding(nn.Module):
    num_freqs: int = 6
    d_in: int = 3
    freq_factor: float = float(np.pi)
    include_input: bool = True

    @property
    def d_out(self) -> int:
        out = self.num_freqs * 2 * self.d_in
        return out + self.d_in if self.include_input else out

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Encode ``(..., d_in)`` -> ``(..., d_out)``."""
        freqs = self.freq_factor * 2.0 ** jnp.arange(self.num_freqs, dtype=x.dtype)
        freqs = jnp.repeat(freqs, 2)  # f0 f0 f1 f1 ...
        phases = jnp.zeros((2 * self.num_freqs,), x.dtype)
        phases = phases.at[1::2].set(0.5 * jnp.pi)  # sin -> cos on odd slots
        # (..., 2F, d_in): one sin evaluation covers both sin and cos.
        emb = jnp.sin(x[..., None, :] * freqs[:, None] + phases[:, None])
        emb = emb.reshape(*x.shape[:-1], 2 * self.num_freqs * self.d_in)
        if self.include_input:
            emb = jnp.concatenate([x, emb], axis=-1)
        return emb
