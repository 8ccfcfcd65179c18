"""Training CLI.

Flag-compatible with the reference driver (``/root/reference/train.py:
175-320``): the same experiment knobs with the same defaults (renderer
selected by name prefix, epoch-tagged resume, bbox sampling, ...), plus the
TPU-native additions (mesh shape, compute dtype, encoder norm type,
multi-view conditioning).

Example::

    python -m avr_tpu.cli.train --root_dir ./runs --loss_mode both \
        --renderer AVR_run1 --starting_epoch 0 --data ./data/cars_train.hdf5 \
        --val_data ./data/cars_val.hdf5
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # reference-compatible knobs (train.py:176-222)
    p.add_argument("--root_dir", type=str, required=True, help="Run/checkpoint root")
    p.add_argument("--loss_mode", type=str, required=True,
                   choices=["coarse", "fine", "both"], help="Loss mode")
    p.add_argument("--depth_regularization", action="store_true",
                   help="Apply the depth-range hinge penalty")
    p.add_argument("--renderer", type=str, required=True,
                   help="Experiment name; prefix picks the renderer "
                        "(Raymarcher*/VR*/else adaptive)")
    p.add_argument("--starting_epoch", type=int, required=True,
                   help="Epoch to resume from (0 = fresh)")
    p.add_argument("--sl", type=int, default=128, help="Image sidelength")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--schedule_total_epochs", type=int, default=0,
                   help="cosine-horizon override in epochs (default: "
                        "--epochs).  A resumed run passes the ORIGINAL "
                        "total here so the restored optimizer step count "
                        "continues the same decay instead of compressing "
                        "the schedule into the remaining epochs")
    p.add_argument("--lr_schedule", type=str, default="constant",
                   choices=["constant", "cosine"],
                   help="constant (reference parity) or warmup+cosine decay")
    p.add_argument("--sigma_bias_init", type=float, default=0.0,
                   help="added to the decoders' raw-density output bias at "
                        "init; a small positive value (e.g. 0.5) starts the "
                        "field 'foggy' so training carves out free space "
                        "instead of dying in the all-background relu-dead "
                        "regime (grad_norm == 0 exactly). 0 = reference "
                        "parity.")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="params-EMA decay for validation/eval (0 = off). "
                        "The adaptive marcher's val quality swings several "
                        "dB between consecutive evals under raw params; the "
                        "EMA (e.g. 0.999) is the stabilizer. Saved in "
                        "checkpoints as ema_params.")
    p.add_argument("--depth_consistency", type=float, default=0.0,
                   help="opacity-weighted marcher<-integral depth-"
                        "consistency loss weight (adaptive renderer only; "
                        "0 = off = reference parity). Gives the marcher a "
                        "direct depth gradient when the photometric signal "
                        "through the band goes flat.")
    p.add_argument("--no_save_best", action="store_true",
                   help="disable saving {renderer}_best at every new best "
                        "val PSNR")
    p.add_argument("--encoder_weights", type=str, default=None,
                   help="npz of a torchvision resnet18/34 state dict "
                        "(np.savez(path, **{k: v.numpy() for k, v in "
                        "sd.items()})) to warm-start the spatial encoder — "
                        "the reference trains from ImageNet-pretrained "
                        "ResNet34 (models.py:227). Requires "
                        "--norm_type batch (the weights carry BatchNorm "
                        "statistics). See docs/pretrained.md.")
    p.add_argument("--max_num_instances", type=int, default=-1)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--with_bbox", action="store_true")
    p.add_argument("--samples_per_instance", type=int, default=50)
    p.add_argument("--ray_batch_size", type=int, default=512)
    p.add_argument("--raymarch_steps", type=int, default=10)
    p.add_argument("--stop_encoder_grad", action="store_true")
    p.add_argument("--anomaly_detection", action="store_true",
                   help="Enable jax_debug_nans")
    p.add_argument("--bn", action="store_true", help="BatchNorm in the decoder MLP")
    p.add_argument("--no_visualization", action="store_true", default=True)
    p.add_argument("--steps_print", type=int, default=5)
    p.add_argument("--steps_val", type=int, default=50)
    p.add_argument("--epochs_save", type=int, default=10)
    # data paths (the reference hardcodes {root}/data/cars_*.hdf5)
    p.add_argument("--data", type=str, default=None,
                   help="Train HDF5 (default {root_dir}/data/cars_train.hdf5)")
    p.add_argument("--val_data", type=str, default=None,
                   help="Val HDF5 (default {root_dir}/data/cars_val.hdf5)")
    p.add_argument("--conf", type=str, default=None,
                   help="Config file (default conf/default_mv.conf)")
    # TPU-native additions
    p.add_argument("--mesh", type=str, default=None,
                   help="Mesh shape 'data,rays' e.g. '2,4'; default single-program")
    p.add_argument("--step_impl", type=str, default="shardmap",
                   choices=["shardmap", "gspmd"],
                   help="Mesh step flavour: shard_map with explicit pmean "
                        "(Pallas-safe, default) or GSPMD jit shardings")
    p.add_argument("--multihost", action="store_true",
                   help="Initialize the multi-host runtime "
                        "(jax.distributed) and shard instances per host")
    p.add_argument("--device_data", action="store_true",
                   help="upload the whole scene set to HBM once and draw "
                        "batches inside the jitted step (zero per-step "
                        "host/upload cost; single-chip, uniform sampling)")
    p.add_argument("--prefetch", type=int, default=2,
                   help="Host input batches assembled ahead on a worker "
                        "thread; 0 = synchronous")
    p.add_argument("--num_source_views", type=int, default=1)
    p.add_argument("--norm_type", type=str, default="batch",
                   choices=["batch", "group", "instance", "none"],
                   help="Encoder norm (group recommended without pretrained weights)")
    p.add_argument("--dtype", type=str, default="f32", choices=["f32", "bf16"],
                   help="Compute dtype (params stay f32; integration/geometry f32)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="Capture a jax.profiler trace of the first training "
                        "steps into this directory (view with xprof/tensorboard)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--rng_mode", type=str, default="per_ray",
                   choices=["legacy", "per_ray"],
                   help="sampler randomness: 'per_ray' hashes global ray "
                        "ids so any mesh shape / step impl / chunking "
                        "consumes an identical stream; 'legacy' draws from "
                        "the per-step key")
    p.add_argument("--prng_impl", type=str, default="rbg",
                   choices=["rbg", "threefry2x32"],
                   help="PRNG bit generator. 'rbg' is the TPU-native choice "
                        "(XLA RngBitGenerator; threefry costs ~2 ms/step in "
                        "counter math at default shapes, PERF.md); "
                        "'threefry2x32' gives JAX's portable default streams")
    p.add_argument("--gather_impl", type=str, default="auto",
                   choices=["auto", "pallas", "pallas_proj", "xla"],
                   help="Pixel-aligned feature gather: Pallas one-hot MXU "
                        "kernel (TPU), the projected variant (projection "
                        "in-kernel; measured slower, PERF.md), or XLA "
                        "take_along_axis")
    p.add_argument("--fused_mlp", type=str, default="auto",
                   choices=["auto", "never", "always", "stash", "always_stash"],
                   help="Fused Pallas decoder kernel. 'stash' additionally "
                        "streams forward activations to HBM so the backward "
                        "skips its recompute matmuls (PERF.md)")
    p.add_argument("--fused_march", type=str, default="auto",
                   choices=["auto", "never", "always"],
                   help="Fully-fused Pallas LSTM ray-march kernel")
    return p


def main(argv=None):
    opt = build_parser().parse_args(argv)

    import dataclasses

    import jax
    import optax

    if opt.anomaly_detection:
        jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_default_prng_impl", opt.prng_impl)

    from avr_tpu.parallel import multihost

    if opt.multihost:
        multihost.initialize()

    from avr_tpu.config import parse_conf
    from avr_tpu.data.dataset import SceneClassDataset
    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.models.wrapper import RadFieldRenderer
    from avr_tpu.renderers.base import renderer_config_from_conf
    from avr_tpu.training import (
        FitConfig, LossParams, create_train_state, fit, make_optimizer,
        restore_checkpoint,
    )
    from avr_tpu.utils.logging import MetricsLogger
    from avr_tpu.utils.viz import plot_losses

    conf_path = opt.conf or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "conf", "default_mv.conf",
    )
    conf = parse_conf(conf_path)

    model_cfg = ModelConfig.from_conf(
        conf["model"], stop_encoder_grad=opt.stop_encoder_grad, bn=opt.bn
    )
    model_cfg = dataclasses.replace(
        model_cfg,
        encoder=dataclasses.replace(model_cfg.encoder, norm_type=opt.norm_type),
        gather_impl=opt.gather_impl,
        fused_mlp=opt.fused_mlp,
    )
    renderer_cfg = renderer_config_from_conf(conf, opt.renderer, opt.raymarch_steps)
    import jax.numpy as _jnp

    dtype = _jnp.bfloat16 if opt.dtype == "bf16" else _jnp.float32
    model = RadFieldRenderer(model_cfg=model_cfg, renderer_cfg=renderer_cfg,
                             dtype=dtype, fused_march=opt.fused_march)

    mesh = None
    if opt.mesh:
        from avr_tpu.parallel import make_mesh

        shape = tuple(int(x) for x in opt.mesh.split(","))
        if len(shape) != 2:
            raise SystemExit(f"--mesh wants 'data,rays', got {opt.mesh!r}")
        mesh = make_mesh(shape)

    train_path = opt.data or os.path.join(opt.root_dir, "data", "cars_train.hdf5")
    val_path = opt.val_data or os.path.join(opt.root_dir, "data", "cars_val.hdf5")
    train_dset = SceneClassDataset(
        train_path, img_sidelength=opt.sl, max_num_instances=opt.max_num_instances,
        samples_per_instance=opt.samples_per_instance, seed=opt.seed,
        shard_index=multihost.process_index(),
        num_shards=multihost.process_count(),
    )
    val_dset = None
    if os.path.exists(val_path):
        val_dset = SceneClassDataset(
            val_path, img_sidelength=opt.sl, max_num_instances=opt.max_num_instances,
            specific_observation_idcs=[min(64, 0)], samples_per_instance=2,
            seed=opt.seed,
        )

    # init params with a representative shape batch
    import numpy as np
    import jax.numpy as jnp

    images0 = jnp.zeros((opt.batch_size, opt.num_source_views, opt.sl, opt.sl, 3))
    poses0 = jnp.broadcast_to(
        jnp.eye(4), (opt.batch_size, opt.num_source_views, 4, 4)
    )
    variables = model.init(
        jax.random.PRNGKey(opt.seed), images0, poses0,
        jnp.float32(1.09375 * opt.sl), jnp.asarray([opt.sl / 2.0, opt.sl / 2.0]),
        method=model.init_all,
    )
    if opt.encoder_weights:
        # warm-start the encoder trunk from a converted torch checkpoint
        # (reference models.py:227 `pretrained=True` equivalence)
        if opt.norm_type != "batch":
            raise SystemExit(
                "--encoder_weights carries BatchNorm statistics; run with "
                "--norm_type batch (the reference's pretrained configuration)"
            )
        from avr_tpu.models.torch_import import import_torchvision_resnet

        sd = dict(np.load(opt.encoder_weights))
        backbone = model_cfg.encoder.backbone
        bps = (2, 2, 2, 2) if backbone == "resnet18" else (3, 4, 6, 3)
        imported = import_torchvision_resnet(
            sd, blocks_per_stage=bps, num_layers=model_cfg.encoder.num_layers
        )
        trunk = variables["params"]["net"]["encoder"]["model"]
        t_have = jax.tree.structure(trunk)
        t_want = jax.tree.structure(imported["params"])
        if t_have != t_want:
            raise SystemExit(
                f"{opt.encoder_weights} does not match the configured "
                f"encoder ({backbone}, num_layers="
                f"{model_cfg.encoder.num_layers}): {t_want} vs {t_have}"
            )
        variables["params"]["net"]["encoder"]["model"] = jax.tree.map(
            jnp.asarray, imported["params"]
        )
        variables["batch_stats"]["net"]["encoder"]["model"] = jax.tree.map(
            jnp.asarray, imported["batch_stats"]
        )
        print(f"[train] encoder warm-started from {opt.encoder_weights}")

    if opt.sigma_bias_init:
        # start the density positive (see --sigma_bias_init help); channel 3
        # of lin_out is the raw sigma (models/mlp.py output convention)
        for head in ("mlp_coarse", "mlp_fine"):
            mlp = variables["params"]["net"].get(head)
            if mlp is not None and "lin_out" in mlp:
                b = mlp["lin_out"]["bias"]
                if b.shape[-1] == 4:  # rgb + raw sigma
                    mlp["lin_out"]["bias"] = b.at[3].add(opt.sigma_bias_init)

    # Adam + non-finite-update skip; optional warmup+cosine decay over the
    # run's total step budget (constant = reference parity)
    steps_per_epoch = max(len(train_dset) // max(opt.batch_size, 1), 1)
    tx = make_optimizer(
        opt.lr, schedule=opt.lr_schedule,
        total_steps=(opt.schedule_total_epochs or opt.epochs)
        * steps_per_epoch,
    )
    state = create_train_state(variables, tx, ema=opt.ema_decay > 0)
    if opt.starting_epoch > 0:
        state = restore_checkpoint(
            opt.root_dir, opt.renderer, opt.starting_epoch, state
        )

    logger = MetricsLogger(os.path.join(opt.root_dir, "logs"), name=opt.renderer)
    fit_cfg = FitConfig(
        epochs=opt.epochs, batch_size=opt.batch_size,
        ray_batch_size=opt.ray_batch_size, with_bbox=opt.with_bbox,
        steps_print=opt.steps_print, steps_val=opt.steps_val,
        epochs_save=opt.epochs_save, starting_epoch=opt.starting_epoch,
        num_source_views=opt.num_source_views, save_root=opt.root_dir,
        run_name=opt.renderer, seed=opt.seed, step_impl=opt.step_impl,
        prefetch=opt.prefetch, ema_decay=opt.ema_decay,
        save_best=not opt.no_save_best, rng_mode=opt.rng_mode,
        device_data=opt.device_data,
    )
    loss_params = LossParams(
        loss_mode=opt.loss_mode, depth_regularization=opt.depth_regularization,
        depth_consistency=opt.depth_consistency,
    )

    if opt.profile_dir:
        import contextlib

        @contextlib.contextmanager
        def _trace():
            jax.profiler.start_trace(opt.profile_dir)
            try:
                yield
            finally:
                jax.profiler.stop_trace()

        trace_cm = _trace()
    else:
        import contextlib

        trace_cm = contextlib.nullcontext()

    with trace_cm:
        state, mean_losses = fit(
            model, state, tx, train_dset, val_dset, loss_params, fit_cfg, logger,
            mesh=mesh,
        )
    os.makedirs(os.path.join(opt.root_dir, "logs"), exist_ok=True)
    plot_losses(
        mean_losses, opt.starting_epoch,
        os.path.join(
            opt.root_dir, "logs",
            f"losses_{opt.renderer}_epoch{opt.starting_epoch}.png",
        ),
    )
    return state


if __name__ == "__main__":
    main()
