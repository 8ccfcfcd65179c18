"""Evaluation CLI: PSNR/SSIM/(LPIPS)/loss means over a test split.

Counterpart of the reference ``test.py`` driver.

Example::

    python -m avr_tpu.cli.test --root_dir ./runs --renderer AVR_run1 \
        --epoch 50 --loss_mode both --data ./data/cars_val.hdf5
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root_dir", type=str, required=True)
    p.add_argument("--renderer", type=str, required=True)
    p.add_argument("--epoch", type=str, required=True,
                   help="checkpoint epoch number, or 'best' for the "
                        "best-val-PSNR checkpoint fit saves")
    p.add_argument("--loss_mode", type=str, default="both")
    p.add_argument("--data", type=str, required=True, help="Test HDF5")
    p.add_argument("--sl", type=int, default=128)
    p.add_argument("--raymarch_steps", type=int, default=10)
    p.add_argument("--norm_type", type=str, default="batch")
    p.add_argument("--conf", type=str, default=None)
    p.add_argument("--lpips_weights", type=str, default=None)
    p.add_argument("--max_instances", type=int, default=None)
    p.add_argument("--num_source_views", type=int, default=1,
                   help="condition on the first NS views (multi-view "
                        "pooling, reference default_mv config)")
    p.add_argument("--use_ema", action="store_true",
                   help="evaluate the checkpoint's EMA parameters "
                        "(runs trained with --ema_decay)")
    p.add_argument("--eps_scale", type=float, default=1.0,
                   help="adaptive renderer only: widen the eval-time "
                        "epsilon-band by this factor (tolerates marcher "
                        "depth error at eval; 1.0 = training band)")
    p.add_argument("--band_samples", type=int, default=None,
                   help="adaptive renderer only: override the band sample "
                        "count at eval (e.g. scale with --eps_scale to "
                        "keep sample density)")
    opt = p.parse_args(argv)
    epoch = int(opt.epoch) if opt.epoch.lstrip("-").isdigit() else opt.epoch

    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from avr_tpu.config import parse_conf
    from avr_tpu.data.dataset import SceneClassDataset
    from avr_tpu.evaluation import test_approximate
    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.models.wrapper import RadFieldRenderer
    from avr_tpu.renderers.base import renderer_config_from_conf
    from avr_tpu.training import (
        LossParams, create_train_state, make_optimizer, restore_checkpoint,
    )

    conf_path = opt.conf or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "conf", "default_mv.conf",
    )
    conf = parse_conf(conf_path)
    model_cfg = ModelConfig.from_conf(conf["model"])
    model_cfg = dataclasses.replace(
        model_cfg,
        encoder=dataclasses.replace(model_cfg.encoder, norm_type=opt.norm_type),
    )
    renderer_cfg = renderer_config_from_conf(conf, opt.renderer, opt.raymarch_steps)
    from avr_tpu.renderers.base import AdaptiveRendererConfig

    if isinstance(renderer_cfg, AdaptiveRendererConfig) and (
        opt.eps_scale != 1.0 or opt.band_samples
    ):
        renderer_cfg = dataclasses.replace(
            renderer_cfg,
            epsilon=renderer_cfg.epsilon * opt.eps_scale,
            n_coarse=opt.band_samples or renderer_cfg.n_coarse,
        )
    model = RadFieldRenderer(model_cfg=model_cfg, renderer_cfg=renderer_cfg)

    dset = SceneClassDataset(opt.data, img_sidelength=opt.sl, samples_per_instance=2)

    images0 = jnp.zeros((1, 1, opt.sl, opt.sl, 3))
    poses0 = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    variables = model.init(
        jax.random.PRNGKey(0), images0, poses0, jnp.float32(1.09375 * opt.sl),
        jnp.asarray([opt.sl / 2.0, opt.sl / 2.0]), method=model.init_all,
    )
    state = create_train_state(variables, make_optimizer(1e-4), ema=opt.use_ema)
    state = restore_checkpoint(opt.root_dir, opt.renderer, epoch, state, strict=True)

    return test_approximate(
        model, state, dset, LossParams(loss_mode=opt.loss_mode),
        lpips_weights=opt.lpips_weights, max_instances=opt.max_instances,
        use_ema=opt.use_ema, num_source_views=opt.num_source_views,
    )


if __name__ == "__main__":
    main()
