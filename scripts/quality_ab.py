"""AVR-vs-VR quality at matched budgets — the reference method's thesis.

The point of AdaptiveVolumeRenderer (reference renderers.py:360-557) is
VolumeRenderer-comparable quality at ~1/3 the field-eval budget (31 vs
~160 evals/ray).  This script measures that claim end to end on synthetic
data through the production CLI: identical dataset, seeds, optimizer, and
step budget for both renderers; PSNR/SSIM/(LPIPS) from the eval CLI.

Round-4 protocol (VERDICT round-3 weak #3: final-checkpoint evaluation
made the numbers a lottery):

  * every arm trains with a params-EMA (``--ema_decay``) and validation
    renders the EMA — the marched-surface arms' raw-param val quality
    swings +-7 dB between consecutive evals;
  * fit saves ``{name}_best`` at every new best val PSNR, and the A/B
    reports BOTH the final and the best-val checkpoint (each evaluated
    with the EMA params);
  * optional ``--depth_consistency`` applies the opacity-weighted
    marcher<-integral depth loss to the adaptive arms only;
  * optional ``--eps_scales`` evaluates the adaptive arms' best checkpoint
    with the epsilon-band widened by each factor (band samples scaled to
    keep density).

    python scripts/quality_ab.py --workdir /root/repo/logs/quality_r4 \
        --steps 10000 --side 128 --instances 64

Artifacts: <workdir>/logs/{ARM}.jsonl training/val curves,
<workdir>/eval_{ARM}.json test metrics, checkpoints under
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
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--depth_consistency", type=float, default=0.0,
                   help="applied to the adaptive arms only")
    p.add_argument("--num_source_views", type=int, default=1,
                   help=">1 trains/evaluates multi-view conditioning "
                        "(cross-view pooling at combine_layer)")
    p.add_argument("--eps_scales", type=str, default="",
                   help="comma-separated band-widening factors to sweep at "
                        "eval on the adaptive arms' best checkpoint, e.g. "
                        "'1.5,2,3'")
    p.add_argument("--lpips_weights", type=str, default="auto_rand",
                   help="LPIPS archive path; 'auto_rand' generates the "
                        "deterministic random-VGG archive (reported as "
                        "lpips_rand — see scripts/make_lpips_weights.py); "
                        "'' disables")
    p.add_argument("--train_views", type=int, default=12)
    p.add_argument("--device_data", action="store_true",
                   help="train with the device-resident dataset (zero "
                        "per-step host/upload overhead; see "
                        "avr_tpu/data/device.py)")
    p.add_argument("--epochs_save", type=int, default=0,
                   help="save a checkpoint every N epochs (0 = final only); "
                        "periodic checkpoints let the analysis evaluate "
                        "test metrics vs wall-clock, not just at the end")
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
                             num_views=opt.train_views, side=opt.side, seed=0)
        write_synthetic_hdf5(val_h5, num_instances=8, num_views=6,
                             side=opt.side, seed=9)

    if opt.lpips_weights == "auto_rand":
        opt.lpips_weights = os.path.join(opt.workdir, "lpips_rand.npz")
        if not os.path.exists(opt.lpips_weights):
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from make_lpips_weights import main as make_lpips

            make_lpips(["--random", "--out", opt.lpips_weights])

    spe = max(opt.instances // opt.batch_size, 1)
    epochs = max((opt.steps + spe - 1) // spe, 1)

    from avr_tpu.cli.test import main as test_main
    from avr_tpu.cli.train import main as train_main

    def eval_args(name, epoch, use_ema=False, extra=()):
        args = [
            "--root_dir", opt.workdir,
            "--renderer", name,
            "--epoch", str(epoch),
            "--data", val_h5,
            "--sl", str(opt.side),
            "--norm_type", "group",
            "--num_source_views", str(opt.num_source_views),
        ]
        if use_ema:
            args.append("--use_ema")
        if opt.lpips_weights:
            args += ["--lpips_weights", opt.lpips_weights]
        return args + list(extra)

    summary = {}
    for name in opt.renderers.split(","):
        adaptive = not (name.startswith("VR") or "Raymarcher" in name)
        t0 = time.time()
        train_args = [
            "--root_dir", opt.workdir,
            # the raymarcher renders coarse-only (reference
            # renderers.py:351: fine image is None) — 'both' would raise
            "--loss_mode", "coarse" if "Raymarcher" in name else "both",
            "--renderer", name,
            "--starting_epoch", "0",
            "--sl", str(opt.side),
            "--batch_size", str(opt.batch_size),
            "--ray_batch_size", str(opt.ray_batch_size),
            "--epochs", str(epochs),
            "--epochs_save", str(opt.epochs_save or epochs),
            "--samples_per_instance", "8",
            "--steps_print", "50",
            "--steps_val", str(opt.steps_val),
            "--norm_type", "group",
            "--dtype", "bf16",
            "--num_source_views", str(opt.num_source_views),
            # warmup+cosine for BOTH arms: constant-lr NeRF runs collapse
            # intermittently on late grad spikes (round-3 finding)
            "--lr_schedule", "cosine",
            # Per-arm density init, each arm at its trainable best (round-3
            # finding: VR dies relu-dead from the reference init on this
            # background-dominated data; AVR trains worse foggy).
            "--sigma_bias_init", "0.5" if name.startswith("VR") else "0.0",
            "--ema_decay", str(opt.ema_decay),
            # pinned to the legacy streams so every arm in the round-3/4
            # series stays bitwise comparable (the production default moved
            # to per_ray, which draws a different — equally distributed —
            # stream)
            "--rng_mode", "legacy",
            "--seed", "0",
            "--data", train_h5,
            "--val_data", val_h5,
        ]
        if adaptive and opt.depth_consistency:
            train_args += ["--depth_consistency", str(opt.depth_consistency)]
        if opt.device_data:
            train_args += ["--device_data"]
        train_main(train_args)
        train_s = time.time() - t0

        entry = {
            "steps": epochs * spe, "train_seconds": round(train_s, 1),
            "rays_per_s_train": round(
                epochs * spe * opt.batch_size * opt.ray_batch_size / train_s, 1
            ),
        }
        # final x best, raw x EMA — measured round 4: the EMA *hurt* the
        # adaptive arm by ~3 dB at test (the marcher and field co-adapt;
        # averaging them independently breaks the coupling), so neither
        # view is assumed — both are recorded and the table reports each
        # arm at its honest best.
        for tag, epoch in (("final", epochs), ("best", "best")):
            for ema_tag, use_ema in (("raw", False), ("ema", True)):
                if opt.ema_decay <= 0 and use_ema:
                    continue
                m = test_main(eval_args(name, epoch, use_ema))
                if isinstance(m, dict):
                    entry[f"{tag}_{ema_tag}"] = {
                        k: float(v) for k, v in m.items()
                    }
        # headline keys stay flat for continuity with earlier rounds
        entry.update(entry.get("final_raw", {}))
        if adaptive and opt.eps_scales:
            entry["eps_sweep"] = {}
            from avr_tpu.renderers.base import AdaptiveRendererConfig

            n0 = AdaptiveRendererConfig().n_coarse
            for s in opt.eps_scales.split(","):
                s = float(s)
                m = test_main(eval_args(
                    name, "best", False,
                    ["--eps_scale", str(s),
                     "--band_samples", str(int(round(n0 * s)))],
                ))
                if isinstance(m, dict):
                    entry["eps_sweep"][s] = {k: float(v) for k, v in m.items()}
        summary[name] = entry
        with open(os.path.join(opt.workdir, f"eval_{name}.json"), "w") as f:
            json.dump(entry, f, indent=1)
        print(f"[quality_ab] {name}: {entry}", flush=True)

    with open(os.path.join(opt.workdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
