"""Component cost breakdown on the real chip.

Varies one knob at a time (march steps, band samples, fwd-only vs train
step, encode resolution) and prints per-step millisecond costs, so kernel
work targets the real bottleneck.  Timing forces a value fetch (the remote
relay's block_until_ready returns early).
"""

import os
import sys
import time
import dataclasses

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=3):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = fn(*args)
    _force(o)
    return (time.perf_counter() - t0) / iters


def _force(tree):
    import jax

    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from avr_tpu.config import parse_conf
    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.models.wrapper import RadFieldRenderer
    from avr_tpu.renderers.base import AdaptiveRendererConfig
    from avr_tpu.training import LossParams, create_train_state, make_train_step
    from avr_tpu.training.step import make_encode_fn, make_render_fn

    SB, NS, SIDE, R = 4, 1, 128, 4096
    DTYPE = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    conf = parse_conf(os.path.join(os.path.dirname(os.path.dirname(__file__)), "conf", "default_mv.conf"))
    model_cfg = ModelConfig.from_conf(conf["model"])
    base_rcfg = AdaptiveRendererConfig.from_conf(conf["adaptive_renderer"])

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(SB, NS, SIDE, SIDE, 3)).astype(np.float32))
    c2w = np.eye(4, dtype=np.float32) @ np.diag([1., -1., -1., 1.]).astype(np.float32)
    c2w[2, 3] = 1.3
    poses = jnp.asarray(np.broadcast_to(c2w, (SB, NS, 4, 4)).copy())
    focal = jnp.float32(1.09375 * SIDE)
    c = jnp.asarray([64., 64.], jnp.float32)
    xy = jnp.asarray(rng.uniform(0.05, 0.95, size=(SB, R, 2)).astype(np.float32))
    K = jnp.broadcast_to(jnp.asarray([[1.09375, 0, .5], [0, 1.09375, .5], [0, 0, 1]], jnp.float32), (SB, 3, 3))
    rc2w = jnp.broadcast_to(jnp.asarray(c2w), (SB, R, 4, 4))
    gt = jnp.asarray(rng.uniform(size=(SB, R, 3)).astype(np.float32))
    mi = {"x_pix": xy, "cam2world": rc2w, "intrinsics": K}
    key = jax.random.PRNGKey(0)

    def build(rcfg):
        m = RadFieldRenderer(model_cfg=model_cfg, renderer_cfg=rcfg, dtype=DTYPE)
        v = m.init(jax.random.PRNGKey(0), images, poses, focal, c, method=m.init_all)
        return m, v

    model, variables = build(base_rcfg)

    # encode cost
    enc = make_encode_fn(model)
    t_enc = timeit(enc, variables, images, poses, focal, c)
    print(f"encode 4x128x128:            {t_enc*1e3:8.1f} ms", flush=True)

    cond = enc(variables, images, poses, focal, c)
    rend = make_render_fn(model)
    t_r10_20 = timeit(rend, variables, cond, xy, K, rc2w, key)
    print(f"render fwd (10 march, 20 band): {t_r10_20*1e3:6.1f} ms", flush=True)

    m2, _ = build(dataclasses.replace(base_rcfg, raymarch_steps=2))
    t_r2_20 = timeit(make_render_fn(m2), variables, cond, xy, K, rc2w, key)
    print(f"render fwd (2 march, 20 band):  {t_r2_20*1e3:6.1f} ms  -> per march step {(t_r10_20-t_r2_20)/8*1e3:.1f} ms", flush=True)

    m3, _ = build(dataclasses.replace(base_rcfg, n_coarse=5))
    t_r10_5 = timeit(make_render_fn(m3), variables, cond, xy, K, rc2w, key)
    print(f"render fwd (10 march, 5 band):  {t_r10_5*1e3:6.1f} ms  -> per band sample {(t_r10_20-t_r10_5)/15*1e3:.2f} ms", flush=True)

    # full train step
    tx = optax.adam(1e-4)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, LossParams(loss_mode="both"), donate=False)
    t_step = timeit(step, state, images, poses, focal, c, mi, gt, key)
    print(f"train step (fwd+bwd+adam):   {t_step*1e3:8.1f} ms  -> bwd+update {(t_step - t_r10_20 - t_enc)*1e3:.1f} ms", flush=True)
    print(f"rays/s train: {SB*R/t_step:,.0f}", flush=True)


if __name__ == "__main__":
    main()
