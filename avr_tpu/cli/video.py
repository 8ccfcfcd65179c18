"""Video/demo CLI: orbit-camera render of a trained model.

Counterpart of the reference's ``generate_video`` driver cell.

Example::

    python -m avr_tpu.cli.video --root_dir ./runs --renderer AVR_run1 \
        --epoch 50 --data ./data/cars_val.hdf5 --num_frames 60 --radius 1.3 \
        --out ./video.mp4
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root_dir", type=str, required=True)
    p.add_argument("--renderer", type=str, required=True)
    p.add_argument("--epoch", type=int, required=True)
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--instance", type=int, default=0)
    p.add_argument("--num_frames", type=int, default=60)
    p.add_argument("--radius", type=float, default=1.3)
    p.add_argument("--sl", type=int, default=128)
    p.add_argument("--raymarch_steps", type=int, default=10)
    p.add_argument("--norm_type", type=str, default="batch")
    p.add_argument("--conf", type=str, default=None)
    p.add_argument("--out", type=str, default="video.mp4")
    p.add_argument("--fps", type=int, default=15)
    opt = p.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from avr_tpu.config import parse_conf
    from avr_tpu.data.dataset import SceneClassDataset, collate_observations
    from avr_tpu.evaluation import generate_video
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
    model = RadFieldRenderer(model_cfg=model_cfg, renderer_cfg=renderer_cfg)

    dset = SceneClassDataset(
        opt.data, img_sidelength=opt.sl, samples_per_instance=2,
        specific_observation_idcs=[0],
    )
    batch = collate_observations([dset[opt.instance]])

    images0 = jnp.zeros((1, 1, opt.sl, opt.sl, 3))
    poses0 = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    variables = model.init(
        jax.random.PRNGKey(0), images0, poses0, jnp.float32(1.09375 * opt.sl),
        jnp.asarray([opt.sl / 2.0, opt.sl / 2.0]), method=model.init_all,
    )
    state = create_train_state(variables, make_optimizer(1e-4))
    state = restore_checkpoint(opt.root_dir, opt.renderer, opt.epoch, state, strict=True)

    frames = generate_video(model, state, batch, opt.num_frames, opt.radius)
    try:
        import imageio

        imageio.mimsave(opt.out, frames, fps=opt.fps)
        print(f"wrote {opt.out} ({len(frames)} frames)")
    except Exception as e:  # pragma: no cover
        import numpy as np

        alt = os.path.splitext(opt.out)[0] + ".npz"
        np.savez_compressed(alt, frames=np.stack(frames))
        print(f"imageio failed ({e}); wrote raw frames to {alt}")
    return frames


if __name__ == "__main__":
    main()
