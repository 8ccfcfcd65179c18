"""Backfill evaluation for phase-1 AVR_bb (its in-run eval crashed on the
missing final checkpoint — loop.py now always saves the last epoch).

Evaluates the best checkpoint (raw + EMA), the eps sweep on it, and every
periodic checkpoint (5k-step cadence) for the test-PSNR-vs-wall-clock
curve, writing logs/quality_r5/eval_AVR_bb.json in quality_ab's format.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

from avr_tpu.cli.test import main as test_main

W = "logs/quality_r5"
NAME = "AVR_bb"


def ev(epoch, use_ema=False, extra=()):
    args = [
        "--root_dir", W, "--renderer", NAME, "--epoch", str(epoch),
        "--data", os.path.join(W, "data", "val.hdf5"), "--sl", "128",
        "--norm_type", "group", "--num_source_views", "1",
        "--lpips_weights", os.path.join(W, "lpips_rand.npz"),
    ]
    if use_ema:
        args.append("--use_ema")
    m = test_main(args + list(extra))
    return {k: float(v) for k, v in m.items()} if isinstance(m, dict) else None


def main():
    entry = {"steps": 25008, "train_seconds": 3019.3,
             "note": "final ckpt missing (pre-fix epochs_save cadence); "
                     "'final' fields are the best ckpt (step 22500)"}
    entry["best_raw"] = ev("best")
    entry["best_ema"] = ev("best", True)
    entry["eps_sweep"] = {}
    from avr_tpu.renderers.base import AdaptiveRendererConfig

    n0 = AdaptiveRendererConfig().n_coarse
    for s in (1.5, 2.0):
        entry["eps_sweep"][s] = ev(
            "best", False,
            ["--eps_scale", str(s), "--band_samples", str(int(round(n0 * s)))],
        )
    entry["per_epoch"] = {}
    for e in (313, 626, 939, 1252):
        entry["per_epoch"][e] = ev(e)
    entry.update(entry["best_raw"] or {})
    with open(os.path.join(W, f"eval_{NAME}.json"), "w") as f:
        json.dump(entry, f, indent=1)
    print(json.dumps(entry, indent=1))


if __name__ == "__main__":
    main()
