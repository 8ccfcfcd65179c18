"""Latent-conditioned fully-connected ResNet decoder.

TPU-native counterpart of the reference decoder
(``/root/reference/models.py:407-606``): pre-activation residual blocks
with Kaiming-initialised first linears and zero-initialised second linears,
per-block latent injection (``x += lin_z[i](z)``, or SPADE-style
``sz * x + tz``), and cross-view pooling at ``combine_layer``.

Design differences from the reference (intentional, TPU-first):

  * shapes are explicit: inputs are ``(SB, NS, B, d)`` with the source-view
    axis ``NS`` pooled at the combine layer (the reference flattens to
    ``(SB*NS*B, d)`` and un-flattens inside ``combine_interleaved``,
    reference ``utils.py:71-81``) — keeping ``B`` (rays x samples) a clean
    trailing matmul axis lets the MXU see one big ``(..., d) @ (d, d)``
    contraction and lets the rays axis shard over the mesh untouched,
  * compute dtype is configurable (bf16 compute / fp32 params).

If ``combine_layer >= n_blocks`` the pool is applied after the last block
so the output is always ``(SB, B, d_out)``; with ``NS == 1`` (every
reference configuration that reaches this path) this is an exact no-op.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ResnetBlockFC", "ResnetFC"]

_kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def _activation(beta: float):
    if beta > 0:
        return lambda x: nn.softplus(beta * x) / beta
    return nn.relu


def _combine(x: jnp.ndarray, combine_type: str, axis: int = 1) -> jnp.ndarray:
    if combine_type == "average":
        return jnp.mean(x, axis=axis)
    if combine_type == "max":
        return jnp.max(x, axis=axis)
    raise NotImplementedError(f"Unsupported combine type {combine_type}")


class ResnetBlockFC(nn.Module):
    """Pre-activation 2-linear residual block (reference models.py:407-470).

    ``fc_1`` is zero-initialised so a fresh block is the identity; when
    ``bn`` is on, a single BatchNorm is applied before *both* linears with
    shared parameters, mirroring the reference's reuse of ``bn_0``
    (reference models.py:456-460).
    """

    size_in: int
    size_out: Optional[int] = None
    size_h: Optional[int] = None
    bn: bool = False
    beta: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        size_out = self.size_out or self.size_in
        size_h = self.size_h or min(self.size_in, size_out)
        act = _activation(self.beta)

        if self.bn:
            norm = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn_0",
            )
            net = nn.Dense(size_h, kernel_init=_kaiming, dtype=self.dtype, name="fc_0")(
                act(norm(x))
            )
            dx = nn.Dense(
                size_out, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="fc_1"
            )(act(norm(net)))
        else:
            net = nn.Dense(size_h, kernel_init=_kaiming, dtype=self.dtype, name="fc_0")(
                act(x)
            )
            dx = nn.Dense(
                size_out, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="fc_1"
            )(act(net))

        if self.size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(
                size_out, use_bias=False, kernel_init=_kaiming, dtype=self.dtype,
                name="shortcut",
            )(x)
        return x_s + dx


class ResnetFC(nn.Module):
    """Stack of latent-injected ResnetBlockFCs with cross-view pooling.

    Args (configured from the ``mlp_coarse``/``mlp_fine`` conf subtrees,
    reference models.py:594-606):
      d_in: point-feature input width (0 disables the input linear).
      d_out: output width (4: rgb + sigma).
      n_blocks: number of residual blocks.
      d_latent: conditioning latent width (0 disables injection).
      d_hidden: hidden width.
      beta: softplus beta; <= 0 selects ReLU.
      combine_layer: block index at which the NS axis is pooled.
      combine_type: 'average' | 'max'.
      use_spade: scale-and-shift latent injection instead of additive.
      fused: 'never' | 'auto' | 'always' | 'stash' | 'always_stash' — use
        the fused Pallas decoder kernel (``avr_tpu.ops.pallas.resnetfc``)
        when the configuration allows it ('auto' enables it on TPU
        backends only; 'always' also runs it on CPU via interpret mode,
        for tests).  The '*stash' variants stream the forward activations
        to HBM so the backward skips its recompute matmuls (more HBM, 2/3
        the backward MXU work).
      code_spec: when set, inputs ``x`` are *raw* point features and the
        NeRF positional encoding (reference models.py:791-793) runs inside
        this module — in VMEM on the fused path, as the exact
        ``PositionalEncoding`` math otherwise.
      activate_out: apply the field head's ``sigmoid(rgb)/relu(sigma)``
        split (reference models.py:856-862) inside this module (in-kernel
        on the fused path).
    """

    d_in: int
    d_out: int = 4
    n_blocks: int = 5
    d_latent: int = 0
    d_hidden: int = 128
    bn: bool = False
    beta: float = 0.0
    combine_layer: int = 1000
    combine_type: str = "average"
    use_spade: bool = False
    fused: str = "never"
    code_spec: Optional[Any] = None  # avr_tpu.ops.pallas.resnetfc.CodeSpec
    activate_out: bool = False
    dtype: Any = jnp.float32

    def _apply_code(self, x: jnp.ndarray) -> jnp.ndarray:
        """XLA fallback for ``code_spec``: bitwise the PositionalEncoding
        module's math (coded dims first, interleaved sin/cos, passthrough
        appended)."""
        cs = self.code_spec
        coded = x[..., : cs.d_coded]
        freqs = cs.freq_factor * 2.0 ** jnp.arange(cs.num_freqs, dtype=x.dtype)
        freqs = jnp.repeat(freqs, 2)
        phases = jnp.zeros((2 * cs.num_freqs,), x.dtype)
        phases = phases.at[1::2].set(0.5 * jnp.pi)
        emb = jnp.sin(coded[..., None, :] * freqs[:, None] + phases[:, None])
        emb = emb.reshape(*coded.shape[:-1], 2 * cs.num_freqs * cs.d_coded)
        parts = ([coded] if cs.include_input else []) + [emb]
        if cs.d_pass:
            parts.append(x[..., cs.d_coded :])
        return jnp.concatenate(parts, axis=-1)

    def _use_fused(self, x, z) -> bool:
        from avr_tpu.ops.pallas.resnetfc import supports

        if self.fused == "never" or self.is_initializing():
            return False
        if self.use_spade or z is None or x is None:
            return False
        if x.ndim != 4:
            return False
        if not supports(
            n_blocks=self.n_blocks,
            n_lin_z=min(self.combine_layer, self.n_blocks),
            d_hidden=self.d_hidden, d_latent=self.d_latent,
            d_in=self.d_in, bn=self.bn, beta=self.beta,
            ns=x.shape[1], combine_type=self.combine_type,
        ):
            return False
        import jax

        on_accel = jax.default_backend() not in ("cpu", "gpu")
        return self.fused in ("always", "always_stash") or on_accel

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (SB, NS, B, d_in)
        z: Optional[jnp.ndarray] = None,  # (SB, NS, B, d_latent)
        train: bool = False,
    ) -> jnp.ndarray:
        """Returns ``(SB, B, d_out)`` (NS pooled at the combine layer)."""
        if self._use_fused(x, z):
            import jax

            from avr_tpu.ops.pallas.resnetfc import fused_resnetfc

            SB, NS, B, _ = x.shape
            # (SB, NS, B, d) -> (NS, SB*B, d): a point's views share a grid
            # block so the kernel's in-VMEM mean pool sees them together.
            # With NS == 1 the swap is a pure reshape (same linear order),
            # spelled as one.
            if NS == 1:
                xt = x.reshape(1, SB * B, x.shape[-1])
                zt = z.reshape(1, SB * B, z.shape[-1])
            else:
                xt = jnp.swapaxes(x, 0, 1).reshape(NS, SB * B, x.shape[-1])
                zt = jnp.swapaxes(z, 0, 1).reshape(NS, SB * B, z.shape[-1])
            out = fused_resnetfc(
                xt, zt,
                self.variables["params"],
                n_blocks=self.n_blocks,
                n_lin_z=min(self.combine_layer, self.n_blocks),
                compute_dtype=self.dtype,
                interpret=jax.default_backend() == "cpu",
                code=self.code_spec,
                activate_out=self.activate_out,
                # 'auto': stash backward while it fits the HBM budget
                # (forced on by '*stash', off by plain 'always'/'never')
                stash=(True if self.fused in ("stash", "always_stash")
                       else "auto" if self.fused == "auto" else False),
            )
            return out.reshape(SB, B, self.d_out)

        act = _activation(self.beta)

        if self.code_spec is not None:
            x = self._apply_code(x)

        if self.d_in > 0:
            h = nn.Dense(
                self.d_hidden, kernel_init=_kaiming, dtype=self.dtype, name="lin_in"
            )(x)
        else:
            h = jnp.zeros(z.shape[:-1] + (self.d_hidden,), self.dtype)

        n_lin_z = min(self.combine_layer, self.n_blocks)
        combined = False
        for blkid in range(self.n_blocks):
            if blkid == self.combine_layer:
                h = _combine(h, self.combine_type, axis=1)
                combined = True
            if self.d_latent > 0 and blkid < n_lin_z:
                tz = nn.Dense(
                    self.d_hidden, kernel_init=_kaiming, dtype=self.dtype,
                    name=f"lin_z_{blkid}",
                )(z)
                if self.use_spade:
                    sz = nn.Dense(
                        self.d_hidden, kernel_init=_kaiming, dtype=self.dtype,
                        name=f"scale_z_{blkid}",
                    )(z)
                    h = sz * h + tz
                else:
                    h = h + tz
            h = ResnetBlockFC(
                self.d_hidden, bn=self.bn, beta=self.beta, dtype=self.dtype,
                name=f"block_{blkid}",
            )(h, train=train)

        if not combined:
            h = _combine(h, self.combine_type, axis=1)

        out = nn.Dense(
            self.d_out, kernel_init=_kaiming, dtype=self.dtype, name="lin_out"
        )(act(h))
        if self.activate_out:
            out = jnp.concatenate(
                [nn.sigmoid(out[..., :3]), nn.relu(out[..., 3:])], axis=-1
            )
        return out
