"""On-device A/B: stash-backward block size (AVR_STASH_BLK).

The decoder stash backward sits at 28.4 ms vs a 22.6 ms roofline; the
half-block interleave A/B pointed at the stash DMA reads rather than MXU
drains.  Block size is the remaining free variable: smaller blocks give
the Mosaic pipeliner more double-buffer slots (better DMA overlap),
larger ones amortize grid overhead but are VMEM-capped.

One process, one full-train-step build per block size.
Usage: [AB_BLKS=1024,2048,4096] python scripts/ab_stashblk_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_default_prng_impl", "rbg")

from ab_integral_tpu import build, time_variant  # noqa: E402


def main():
    print("devices:", jax.devices(), flush=True)
    for blk in os.environ.get("AB_BLKS", "2048,1024").split(","):
        os.environ["AVR_STASH_BLK"] = blk
        step, state, args, rays = build("never")
        time_variant(f"blk{blk}", step, state, args, rays)


if __name__ == "__main__":
    main()
