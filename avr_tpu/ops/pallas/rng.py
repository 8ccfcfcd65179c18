"""Pallas TPU uniform-random kernel for the samplers' jitter draws.

The stratified samplers draw ``(SB, R * n)`` uniforms per step (the band
jitter alone is 327,680 floats at benchmark shapes).  XLA lowers the rbg
``RngBitGenerator`` + bits->float chain into a flattened 1-D ``T(1024)``
layout no matter what shape is requested, and the VPU processes 1-D
layouts slowly — a measured 2.2 ms/step (PERF.md).  This kernel draws the
bits with the core PRNG (`pltpu.prng_random_bits`) directly in a
(8, 128)-tiled 2-D layout and converts in-register.

Stream semantics: values are deterministic in (key, shape) but are a
*different* stream from ``jax.random.uniform`` — fine for the samplers,
whose contract is "fresh uniform jitter", not a particular stream (RNG
parity with the torch reference is impossible anyway, SURVEY.md §7).
Per-block decorrelation folds the grid index into the seed.

Bits -> [0, 1): the standard 24-bit mantissa trick ``(bits >> 8) * 2^-24``
— exactly uniform over the 2^24 grid, never returns 1.0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_uniform_2d"]

_BLK = 8192  # columns per grid step


def _kernel(seed_ref, out_ref):
    i = pl.program_id(0)
    # fold all four key words + the block index into the per-core seed
    # (Knuth multiplicative constants keep neighbouring blocks decorrelated)
    pltpu.prng_seed(
        seed_ref[0]
        + seed_ref[1] * jnp.int32(-1640531527)   # 2654435769 as int32
        + seed_ref[2] * jnp.int32(97)
        + seed_ref[3] * jnp.int32(1013904223)
        + i * jnp.int32(362437)
    )
    bits = pltpu.bitcast(pltpu.prng_random_bits(out_ref.shape), jnp.uint32)
    # Mosaic has no uint32->f32 cast; after >>8 the value fits in 24 bits,
    # so the int32 bitcast is value-preserving and int32->f32 lowers fine
    mant = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    out_ref[...] = mant.astype(jnp.float32) * (1.0 / (1 << 24))


@functools.partial(jax.jit, static_argnums=(1, 2))
def pallas_uniform_2d(key, shape, interpret: bool = False):
    """Uniform [0, 1) floats of 2-D ``shape = (rows, cols)`` from ``key``."""
    rows, cols = shape
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(key)
    else:
        data = key
    data = data.reshape(-1).astype(jnp.uint32)
    seed = jnp.zeros((4,), jnp.int32)
    seed = seed.at[: data.shape[0]].set(data.astype(jnp.int32)[:4])

    blk = min(_BLK, max(cols, 128))
    cols_pad = max(pl.cdiv(cols, blk), 1) * blk
    out = pl.pallas_call(
        _kernel,
        grid=(cols_pad // blk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((rows, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols_pad), jnp.float32),
        interpret=interpret,
    )(seed)
    return out[:, :cols]
