"""Fused-vs-unfused training equivalence + synthetic PSNR plateau runs.

VERDICT round-1 item 10: the strongest evidence that the Pallas kernels
*train* correctly (not just match forward/VJP unit tests) is two full
training runs from the same init on the same data stream — one on the
fused kernel paths, one on the plain XLA paths — with overlapping loss
curves.  This script runs both and writes per-step JSONL artifacts.

Modes:
  equivalence (default): N steps (default 500) fused vs unfused, same
    init, identical precomputed step inputs.  Prints a JSON summary with
    the mean/max relative loss gap and whether both runs improved.
  plateau: one long run on the fused path, logging loss + periodic
    full-image validation PSNR until the curve flattens, to back the
    "PSNR parity at 128x128"-style quality claims with a recorded curve.

Usage:
  python scripts/train_equivalence.py --steps 500 --out logs/equiv
  EQ_PLATFORM=cpu python scripts/train_equivalence.py --steps 60 --side 32

On CPU the fused run uses the kernels' interpret mode for the march and
decoder but keeps the XLA gather (the windowed gather kernel is
TPU-layout specific); on TPU all three Pallas paths are live.
"""

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(side, dtype_name, fused, backend):
    import jax.numpy as jnp

    from avr_tpu.config import parse_conf
    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.models.wrapper import RadFieldRenderer
    from avr_tpu.renderers.base import AdaptiveRendererConfig

    conf = parse_conf(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "conf", "default_mv.conf",
        )
    )
    model_cfg = ModelConfig.from_conf(conf["model"])
    # synthetic data has no pretrained stats; group norm keeps the trunk
    # deterministic across the two runs
    model_cfg = dataclasses.replace(
        model_cfg,
        encoder=dataclasses.replace(model_cfg.encoder, norm_type="group",
                                    pretrained=False),
        gather_impl=("pallas" if fused and backend == "tpu" else "xla"),
        fused_mlp="always" if fused else "never",
    )
    renderer_cfg = AdaptiveRendererConfig.from_conf(conf["adaptive_renderer"])
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    model = RadFieldRenderer(
        model_cfg=model_cfg,
        renderer_cfg=renderer_cfg,
        dtype=dtype,
        fused_march="always" if fused else "never",
    )
    return model


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["equivalence", "plateau"],
                   default="equivalence")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--side", type=int, default=64)
    p.add_argument("--rays", type=int, default=512)
    p.add_argument("--sb", type=int, default=2)
    p.add_argument("--dtype", default="bf16")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--val_every", type=int, default=200)
    p.add_argument("--tol", type=float, default=0.15,
                   help="max allowed relative gap of smoothed loss curves")
    p.add_argument("--out", default=None, help="JSONL prefix")
    opt = p.parse_args(argv)

    import jax

    plat = os.environ.get("EQ_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_default_prng_impl", "rbg")

    import jax.numpy as jnp
    import optax

    from avr_tpu.data.dataset import SceneClassDataset
    from avr_tpu.data.synthetic import write_synthetic_hdf5
    from avr_tpu.training import (
        LossParams, create_train_state, make_train_step,
    )
    from avr_tpu.training.loop import assemble_step_inputs

    backend = jax.default_backend()
    tmp = tempfile.mkdtemp(prefix="avr_equiv_")
    h5 = write_synthetic_hdf5(
        os.path.join(tmp, "train.hdf5"), num_instances=4, num_views=8,
        side=opt.side,
    )
    dset = SceneClassDataset(h5, img_sidelength=opt.side,
                             samples_per_instance=4)

    # Precompute the full input stream once: both runs consume bit-identical
    # host batches, so any divergence is purely kernel-path numerics.
    rng = np.random.default_rng(opt.seed)
    stream = []
    epoch = 0
    gen = dset.batches(opt.sb, epoch_seed=opt.seed)
    while len(stream) < opt.steps:
        try:
            batch = next(gen)
        except StopIteration:
            epoch += 1
            gen = dset.batches(opt.sb, epoch_seed=opt.seed + epoch)
            batch = next(gen)
        stream.append(assemble_step_inputs(rng, batch, opt.rays))

    loss_params = LossParams(loss_mode="both")
    tx = optax.adam(1e-4)

    def run(fused):
        model = build(opt.side, opt.dtype, fused, backend)
        src_images, src_poses, focal, c, _, _ = stream[0]
        variables = model.init(
            jax.random.PRNGKey(opt.seed),
            jnp.asarray(src_images), jnp.asarray(src_poses),
            jnp.asarray(focal), jnp.asarray(c), method=model.init_all,
        )
        state = create_train_state(variables, tx)
        step = make_train_step(model, tx, loss_params)
        key = jax.random.PRNGKey(opt.seed)
        losses = []
        t0 = time.perf_counter()
        for inputs in stream:
            si, sp, focal, c, mi, gt = inputs
            key, sub = jax.random.split(key)
            state, metrics = step(
                state, jnp.asarray(si), jnp.asarray(sp), jnp.asarray(focal),
                jnp.asarray(c), mi, gt, sub,
            )
            losses.append(float(metrics["loss"]))
        dt = time.perf_counter() - t0
        return state, losses, dt

    def smooth(xs, w=25):
        xs = np.asarray(xs)
        k = min(w, len(xs))
        return np.convolve(xs, np.ones(k) / k, mode="valid")

    if opt.mode == "equivalence":
        _, loss_fused, dt_f = run(True)
        _, loss_plain, dt_p = run(False)
        sf, sp = smooth(loss_fused), smooth(loss_plain)
        rel = np.abs(sf - sp) / np.maximum(np.abs(sp), 1e-8)
        w = max(1, len(loss_fused) // 10)
        improved_f = np.mean(loss_fused[-w:]) < np.mean(loss_fused[:w])
        improved_p = np.mean(loss_plain[-w:]) < np.mean(loss_plain[:w])
        summary = {
            "mode": "equivalence",
            "backend": backend,
            "dtype": opt.dtype,
            "steps": opt.steps,
            "loss_fused_first": round(float(sf[0]), 6),
            "loss_fused_last": round(float(sf[-1]), 6),
            "loss_plain_first": round(float(sp[0]), 6),
            "loss_plain_last": round(float(sp[-1]), 6),
            "rel_gap_mean": round(float(rel.mean()), 4),
            "rel_gap_max": round(float(rel.max()), 4),
            "both_improved": bool(improved_f and improved_p),
            "pass": bool(improved_f and improved_p
                         and float(rel.mean()) <= opt.tol),
            "sec_fused": round(dt_f, 1),
            "sec_plain": round(dt_p, 1),
        }
        if opt.out:
            os.makedirs(os.path.dirname(opt.out) or ".", exist_ok=True)
            with open(opt.out + "_fused.jsonl", "w") as f:
                for i, l in enumerate(loss_fused):
                    f.write(json.dumps({"step": i, "loss": l}) + "\n")
            with open(opt.out + "_plain.jsonl", "w") as f:
                for i, l in enumerate(loss_plain):
                    f.write(json.dumps({"step": i, "loss": l}) + "\n")
        print(json.dumps(summary))
        return 0 if summary["pass"] else 1

    # plateau mode: fused path only, log PSNR periodically
    from avr_tpu.training import make_encode_fn, make_render_fn, validate

    model = build(opt.side, opt.dtype, True, backend)
    src_images0, src_poses0, focal0, c0, _, _ = stream[0]
    variables = model.init(
        jax.random.PRNGKey(opt.seed),
        jnp.asarray(src_images0), jnp.asarray(src_poses0),
        jnp.asarray(focal0), jnp.asarray(c0), method=model.init_all,
    )
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, loss_params)
    encode_fn, render_fn = make_encode_fn(model), make_render_fn(model)
    key = jax.random.PRNGKey(opt.seed)
    val_batch = next(dset.batches(1))
    records = []
    i = 0
    while i < opt.steps:
        si, sp, focal, c, mi, gt = stream[i % len(stream)]
        key, sub = jax.random.split(key)
        state, metrics = step(
            state, jnp.asarray(si), jnp.asarray(sp), jnp.asarray(focal),
            jnp.asarray(c), mi, gt, sub,
        )
        rec = {"step": i, "loss": float(metrics["loss"])}
        if (i + 1) % opt.val_every == 0 or i == opt.steps - 1:
            psnr_v, ssim_v, vloss = validate(
                model, state, encode_fn, render_fn, val_batch, loss_params,
                chunk=4096,
            )
            # param_l2 distinguishes "render frozen" from "params frozen"
            # when the PSNR curve flatlines
            pl2 = float(
                sum(float(jnp.sum(jnp.square(l)))
                    for l in jax.tree.leaves(state.params))
            )
            rec.update(psnr=float(psnr_v), ssim=float(ssim_v),
                       val_loss=float(vloss), param_l2=round(pl2, 6))
            print(json.dumps(rec), flush=True)
        records.append(rec)
        i += 1
    if opt.out:
        os.makedirs(os.path.dirname(opt.out) or ".", exist_ok=True)
        with open(opt.out + "_plateau.jsonl", "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
    vals = [r["psnr"] for r in records if "psnr" in r]
    print(json.dumps({
        "mode": "plateau", "backend": backend, "steps": opt.steps,
        "psnr_first": round(vals[0], 2) if vals else None,
        "psnr_last": round(vals[-1], 2) if vals else None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
