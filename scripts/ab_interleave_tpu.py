"""On-device A/B: stash-backward half-block interleave (round-2 lever 4).

One process, two full-train-step builds: AVR_BWD_INTERLEAVE=1 vs 2.
Usage: python scripts/ab_interleave_tpu.py
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
    for h in ("1", "2"):
        os.environ["AVR_BWD_INTERLEAVE"] = h
        step, state, args, rays = build("never")
        time_variant(f"ilv{h}", step, state, args, rays)


if __name__ == "__main__":
    main()
