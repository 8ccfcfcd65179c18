"""AVR-vs-VR quality at matched budgets — the reference method's thesis.

The point of AdaptiveVolumeRenderer (reference renderers.py:360-557) is
VolumeRenderer-comparable quality at ~1/3 the field-eval budget (31 vs
~160 evals/ray).  This script measures that claim end to end on synthetic
data through the production CLI (VERDICT round-2 missing #4 + task 10's
long-run evidence): identical dataset, seeds, optimizer, and step budget
for both renderers; PSNR/SSIM/LPIPS from the eval CLI afterwards.

    python scripts/quality_ab.py --workdir /root/repo/logs/quality_r3 \
        --steps 10000 --side 128 --instances 64

Artifacts: <workdir>/logs/{AVR_q,VR_q}.jsonl training/val curves,
<workdir>/eval_{AVR_q,VR_q}.json test metrics, checkpoints under
<workdir>/checkpoints/experiments/.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--side", type=int, default=128)
    p.add_argument("--instances", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--ray_batch_size", type=int, default=512)
    p.add_argument("--renderers", type=str, default="AVR_q,VR_q",
                   help="comma-separated run names (prefix selects renderer)")
    p.add_argument("--steps_val", type=int, default=250)
    opt = p.parse_args(argv)

    # QAB_PLATFORM=cpu for smoke tests (the env's sitecustomize pins the
    # axon TPU plugin, so the env var alone doesn't stick — this does)
    plat = os.environ.get("QAB_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    os.makedirs(os.path.join(opt.workdir, "data"), exist_ok=True)
    os.makedirs(os.path.join(opt.workdir, "logs"), exist_ok=True)
    from avr_tpu.data.synthetic import write_synthetic_hdf5

    train_h5 = os.path.join(opt.workdir, "data", "train.hdf5")
    val_h5 = os.path.join(opt.workdir, "data", "val.hdf5")
    if not os.path.exists(train_h5):
        write_synthetic_hdf5(train_h5, num_instances=opt.instances,
                             num_views=12, side=opt.side, seed=0)
        write_synthetic_hdf5(val_h5, num_instances=8, num_views=6,
                             side=opt.side, seed=9)

    spe = max(opt.instances // opt.batch_size, 1)
    epochs = max((opt.steps + spe - 1) // spe, 1)

    from avr_tpu.cli.test import main as test_main
    from avr_tpu.cli.train import main as train_main

    summary = {}
    for name in opt.renderers.split(","):
        t0 = time.time()
        train_main([
            "--root_dir", opt.workdir,
            "--loss_mode", "both",
            "--renderer", name,
            "--starting_epoch", "0",
            "--sl", str(opt.side),
            "--batch_size", str(opt.batch_size),
            "--ray_batch_size", str(opt.ray_batch_size),
            "--epochs", str(epochs),
            "--epochs_save", str(epochs),
            "--samples_per_instance", "8",
            "--steps_print", "50",
            "--steps_val", str(opt.steps_val),
            "--norm_type", "group",
            "--dtype", "bf16",
            # warmup+cosine for BOTH arms: constant-lr NeRF runs collapse
            # intermittently on late grad spikes (PSNR 23 -> 13 in the
            # last 500 steps of the first 10k-step attempt), and the A/B
            # evaluates the final checkpoint
            "--lr_schedule", "cosine",
            # Per-arm density init, each arm at its trainable best: the
            # classic VR arm dies relu-dead from the reference init on this
            # background-dominated data (grad_norm == 0.0 exactly by ~2k
            # steps), so it starts slightly foggy; the AVR arm trains fine
            # from the reference init and measurably *worse* foggy (train
            # loss 0.12 vs 0.05 at matched steps — the fog blurs the
            # marcher's depth signal), so it keeps the reference init.
            "--sigma_bias_init", "0.5" if name.startswith("VR") else "0.0",
            "--seed", "0",
            "--data", train_h5,
            "--val_data", val_h5,
        ])
        train_s = time.time() - t0
        metrics = test_main([
            "--root_dir", opt.workdir,
            "--renderer", name,
            "--epoch", str(epochs),
            "--data", val_h5,
            "--sl", str(opt.side),
            "--norm_type", "group",
        ])
        entry = {
            "steps": epochs * spe, "train_seconds": round(train_s, 1),
            "rays_per_s_train": round(
                epochs * spe * opt.batch_size * opt.ray_batch_size / train_s, 1
            ),
        }
        if isinstance(metrics, dict):
            entry.update({k: float(v) for k, v in metrics.items()})
        summary[name] = entry
        with open(os.path.join(opt.workdir, f"eval_{name}.json"), "w") as f:
            json.dump(entry, f, indent=1)
        print(f"[quality_ab] {name}: {entry}", flush=True)

    with open(os.path.join(opt.workdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
