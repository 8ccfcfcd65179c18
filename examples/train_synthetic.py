"""End-to-end demo: train the adaptive renderer on synthetic scenes.

Writes a synthetic multi-view dataset (SRN HDF5 schema), trains the
flagship adaptive renderer for a few epochs, validates with full-image
renders (PSNR/SSIM), saves a checkpoint, and renders a small orbit video —
the whole framework surface in one script, runnable on CPU or TPU.

    python examples/train_synthetic.py --workdir /tmp/avr_demo --epochs 4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", type=str, required=True)
    p.add_argument("--side", type=int, default=64)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--num_instances", type=int, default=6)
    p.add_argument("--ray_batch_size", type=int, default=512)
    p.add_argument("--dtype", type=str, default="bf16", choices=["f32", "bf16"])
    p.add_argument("--renderer", type=str, default="AVR_demo")
    p.add_argument("--video_frames", type=int, default=8)
    opt = p.parse_args(argv)

    os.makedirs(os.path.join(opt.workdir, "data"), exist_ok=True)
    from avr_tpu.data.synthetic import write_synthetic_hdf5

    train_h5 = os.path.join(opt.workdir, "data", "cars_train.hdf5")
    val_h5 = os.path.join(opt.workdir, "data", "cars_val.hdf5")
    if not os.path.exists(train_h5):
        write_synthetic_hdf5(
            train_h5, num_instances=opt.num_instances, num_views=12, side=opt.side
        )
        write_synthetic_hdf5(val_h5, num_instances=2, num_views=6, side=opt.side, seed=9)

    from avr_tpu.cli.train import main as train_main

    state = train_main(
        [
            "--root_dir", opt.workdir,
            "--loss_mode", "both",
            "--renderer", opt.renderer,
            "--starting_epoch", "0",
            "--sl", str(opt.side),
            "--batch_size", "2",
            "--epochs", str(opt.epochs),
            "--epochs_save", str(opt.epochs),
            "--ray_batch_size", str(opt.ray_batch_size),
            "--samples_per_instance", "8",
            "--steps_print", "5",
            "--steps_val", "20",
            "--norm_type", "group",
            "--dtype", opt.dtype,
            "--data", train_h5,
            "--val_data", val_h5,
        ]
    )

    from avr_tpu.cli.video import main as video_main

    video_main(
        [
            "--root_dir", opt.workdir,
            "--renderer", opt.renderer,
            "--epoch", str(opt.epochs),
            "--sl", str(opt.side),
            "--norm_type", "group",
            "--data", val_h5,
            "--num_frames", str(opt.video_frames),
            "--radius", "1.3",
            "--out", os.path.join(opt.workdir, "orbit.mp4"),
        ]
    )
    print(f"demo complete; artifacts in {opt.workdir}")
    return state


if __name__ == "__main__":
    main()
