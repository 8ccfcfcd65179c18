"""Measure the per-step host-side overheads of the training loop.

Round-5 wall-clock diagnosis: fit() at 4 x 1024 rays/step sustains ~46 k
rays/s while the pure device step at 4 x 4096 does 227 k — a fixed
~50-60 ms/step gap.  This isolates the candidates:

  1. argument upload: one step's host->device payload (source images,
     per-ray poses, pixels, gt) timed synchronously,
  2. dispatch latency: tiny jitted op, queued asynchronously then drained
     (per-call cost when pipelined) and called with block_until_ready
     (round-trip cost),
  3. host batch assembly: the prefetch pipeline's _assemble on synthetic
     data (numpy gathers).

Usage: python scripts/bench_overhead_tpu.py  (TPU idle)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print("devices:", jax.devices(), flush=True)
    SB, NS, SIDE, R = 4, 1, 128, 1024
    rng = np.random.default_rng(0)
    payload = {
        "src_images": rng.normal(size=(SB, NS, SIDE, SIDE, 3)).astype(np.float32),
        "poses": rng.normal(size=(SB, NS, 4, 4)).astype(np.float32),
        "x_pix": rng.uniform(size=(SB, R, 2)).astype(np.float32),
        "cam2world": rng.normal(size=(SB, R, 4, 4)).astype(np.float32),
        "intrinsics": rng.normal(size=(SB, 3, 3)).astype(np.float32),
        "gt": rng.uniform(size=(SB, R, 3)).astype(np.float32),
    }
    nbytes = sum(a.nbytes for a in payload.values())
    # warm
    for _ in range(3):
        up = {k: jnp.asarray(v) for k, v in payload.items()}
        jax.block_until_ready(up)
    N = 30
    t0 = time.perf_counter()
    for _ in range(N):
        up = {k: jnp.asarray(v) for k, v in payload.items()}
        jax.block_until_ready(up)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"upload {nbytes/1e6:.2f} MB/step ({len(payload)} arrays): "
          f"{dt:.2f} ms/step", flush=True)

    f = jax.jit(lambda x: x * 2.0 + 1.0)
    x = jnp.zeros((8, 128))
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    y = x
    for _ in range(200):
        y = f(y)
    jax.block_until_ready(y)
    print(f"tiny dispatch, pipelined: "
          f"{(time.perf_counter()-t0)/200*1e3:.3f} ms/call", flush=True)
    t0 = time.perf_counter()
    for _ in range(50):
        jax.block_until_ready(f(x))
    print(f"tiny dispatch, round-trip: "
          f"{(time.perf_counter()-t0)/50*1e3:.3f} ms/call", flush=True)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    ks = [jax.random.fold_in(key, i) for i in range(100)]
    jax.block_until_ready(ks)
    print(f"fold_in x100 queued+drain: "
          f"{(time.perf_counter()-t0)/100*1e3:.3f} ms/call", flush=True)

    # host assembly cost on the actual synthetic dataset, if present
    wd = os.path.join("logs", "quality_r5", "data", "train.hdf5")
    if os.path.exists(wd):
        from avr_tpu.data.dataset import SceneClassDataset
        from avr_tpu.training.loop import assemble_step_inputs, step_rng

        dset = SceneClassDataset(wd, samples_per_instance=8)
        batches = dset.batches(4, shuffle=True, epoch_seed=0)
        batch = next(batches)
        for _ in range(2):
            assemble_step_inputs(step_rng(0, 0), batch, R, 1, False)
        t0 = time.perf_counter()
        for i in range(20):
            assemble_step_inputs(step_rng(0, i), batch, R, 1, False)
        print(f"host assemble_step_inputs: "
              f"{(time.perf_counter()-t0)/20*1e3:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
