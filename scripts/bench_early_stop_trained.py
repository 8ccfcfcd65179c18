"""March early-stop on a TRAINED marcher (PERF round-2 lever 5).

With a freshly initialized marcher the in-kernel early-stop predicate
almost never fires (whole 512-ray blocks must converge), so round 2
measured it ~neutral.  This script re-measures on a converged checkpoint
from the quality run (scripts/quality_ab.py): for each eps it reports the
train-step rays/s AND the quality cost — PSNR of the eps-render against
the eps=0 render of the same validation view.

    python scripts/bench_early_stop_trained.py \
        --workdir /root/repo/logs/quality_r3 --renderer AVR_q --epoch N \
        [--eps 0,0.01,0.02,0.05] [--iters 30]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--renderer", default="AVR_q")
    p.add_argument("--epoch", type=int, required=True)
    p.add_argument("--sl", type=int, default=128)
    p.add_argument("--eps", type=str, default="0,0.01,0.02,0.05")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--norm_type", default="group")
    opt = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_default_prng_impl", "rbg")

    from avr_tpu.config import parse_conf
    from avr_tpu.data.dataset import SceneClassDataset
    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.models.wrapper import RadFieldRenderer
    from avr_tpu.renderers.base import AdaptiveRendererConfig
    from avr_tpu.training import (
        LossParams, create_train_state, make_train_step, restore_checkpoint,
    )
    from avr_tpu.training.loop import make_encode_fn, make_render_fn, validate

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = parse_conf(os.path.join(root, "conf", "default_mv.conf"))
    model_cfg = dataclasses.replace(
        ModelConfig.from_conf(conf["model"]),
        encoder=dataclasses.replace(
            ModelConfig.from_conf(conf["model"]).encoder,
            norm_type=opt.norm_type,
        ),
    )
    base_rcfg = AdaptiveRendererConfig.from_conf(conf["adaptive_renderer"])

    val_h5 = os.path.join(opt.workdir, "data", "val.hdf5")
    val_dset = SceneClassDataset(val_h5, img_sidelength=opt.sl,
                                 samples_per_instance=2)
    val_batch = next(val_dset.batches(1, shuffle=False))

    # bench-style step inputs (SIDE = sl, bench ray batch)
    SB, NS, SIDE, R = 4, 1, opt.sl, 4096
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(SB, NS, SIDE, SIDE, 3)).astype(np.float32))
    c2w = np.eye(4, dtype=np.float32) @ np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    c2w[2, 3] = 1.3
    poses = jnp.asarray(np.broadcast_to(c2w, (SB, NS, 4, 4)).copy())
    focal = jnp.float32(1.09375 * SIDE)
    cc = jnp.asarray([SIDE / 2.0, SIDE / 2.0], jnp.float32)
    xy = jnp.asarray(rng.uniform(0.05, 0.95, size=(SB, R, 2)).astype(np.float32))
    K = jnp.broadcast_to(
        jnp.asarray([[1.09375, 0, 0.5], [0, 1.09375, 0.5], [0, 0, 1]], jnp.float32),
        (SB, 3, 3),
    )
    rays_c2w = jnp.broadcast_to(jnp.asarray(c2w), (SB, R, 4, 4))
    gt = jnp.asarray(rng.uniform(size=(SB, R, 3)).astype(np.float32))
    model_input = {"x_pix": xy, "cam2world": rays_c2w, "intrinsics": K}

    results = []
    for eps in [float(e) for e in opt.eps.split(",")]:
        rcfg = dataclasses.replace(base_rcfg, early_stop_eps=eps)
        model = RadFieldRenderer(model_cfg=model_cfg, renderer_cfg=rcfg,
                                 dtype=jnp.bfloat16)
        variables = model.init(
            jax.random.PRNGKey(0), images, poses, focal, cc,
            method=model.init_all,
        )
        from avr_tpu.training import make_optimizer

        tx = make_optimizer(1e-4)  # production optimizer (matches bench.py)
        template = create_train_state(variables, tx)
        state = restore_checkpoint(opt.workdir, opt.renderer, opt.epoch, template)

        step = make_train_step(model, tx, LossParams(loss_mode="both"),
                               donate=False)
        key = jax.random.PRNGKey(0)
        for _ in range(3):
            key, sub = jax.random.split(key)
            _, metrics = step(state, images, poses, focal, cc, model_input, gt, sub)
        float(np.asarray(metrics["loss"]))
        t0 = time.perf_counter()
        for _ in range(opt.iters):
            key, sub = jax.random.split(key)
            _, metrics = step(state, images, poses, focal, cc, model_input, gt, sub)
        float(np.asarray(metrics["loss"]))
        dt = time.perf_counter() - t0
        rays_s = SB * R * opt.iters / dt

        # full-image validation render with this eps
        encode_fn = make_encode_fn(model)
        render_fn = make_render_fn(model)
        psnr_v, ssim_v, _ = validate(
            model, state, encode_fn, render_fn, val_batch,
            LossParams(loss_mode="both"), 4096,
        )
        entry = {"eps": eps, "rays_per_s": round(rays_s, 1),
                 "val_psnr": round(float(psnr_v), 3),
                 "val_ssim": round(float(ssim_v), 4)}
        results.append(entry)
        print(json.dumps(entry), flush=True)

    out = os.path.join(opt.workdir, "early_stop_sweep.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
