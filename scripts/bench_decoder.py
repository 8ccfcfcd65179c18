"""Isolated decoder microbenchmark: XLA chain vs fused Pallas kernel.

Times forward+backward of the ResnetFC decoder alone at the benchmark's
band-query shapes (N = SB * R * (n_band + 1) points), on the real chip.
Wall-clock forces a value fetch per measurement (relay semantics); use
enough iters that the relay noise (~10%) is visible as a range.

Usage: python scripts/bench_decoder.py [N_POINTS]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from avr_tpu.models.mlp import ResnetFC

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4 * 4096 * 21
    D_IN, D_LATENT, D_HIDDEN, N_BLOCKS = 42, 512, 512, 5
    ITERS = int(os.environ.get("BENCH_ITERS", 20))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 1, N, D_IN)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(1, 1, N, D_LATENT)).astype(np.float32))

    def build(fused):
        mod = ResnetFC(
            d_in=D_IN, d_out=4, n_blocks=N_BLOCKS, d_latent=D_LATENT,
            d_hidden=D_HIDDEN, combine_layer=1000, fused=fused,
            dtype=jnp.bfloat16,
        )
        params = mod.init(jax.random.PRNGKey(0), x, z)

        def loss(p, x, z):
            out = mod.apply(p, x, z)
            return jnp.sum(out * out)

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2))), params

    def timeit(fn, params):
        out = fn(params, x, z)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn(params, x, z)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        return (time.perf_counter() - t0) / ITERS * 1e3

    for fused in ("never", "always"):
        fn, params = build(fused)
        ms = timeit(fn, params)
        print(f"fused={fused:7s} N={N}: {ms:7.2f} ms/iter (fwd+bwd)")


if __name__ == "__main__":
    main()
