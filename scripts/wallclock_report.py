"""Wall-clock efficiency report for a quality-A/B workdir (VERDICT r4 #1).

The adaptive renderer's whole point (reference renderers.py:360-557) is
classic-VR quality at ~1/3 the field evals per ray — which only matters if
it shows up at *wall-clock*, not just per-step budgets.  The round-4 runs
trained at 512 rays/step where both arms were overhead-bound and the
advantage vanished.  This report reads each arm's training jsonl (val
events carry ``t`` seconds since fit() start and ``psnr``) and emits:

  * time-to-quality: first wall-clock second at which each arm's val PSNR
    reached each threshold (the honest matched-wall-clock comparison);
  * steady-state training throughput per arm (median of the step-window
    rays/s prints, excluding compile);
  * the final/best val PSNR and total seconds per arm.

Usage: python scripts/wallclock_report.py --workdir logs/quality_r5 \
          [--thresholds 25,28,29.5,30,31] [--out ...md]
"""

import argparse
import glob
import json
import os


def load_events(path):
    train, val = [], []
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if e.get("event") == "val":
                val.append(e)
            elif e.get("event") == "train":
                train.append(e)
    return train, val


def fmt_s(s):
    return f"{s:,.0f}s" if s is not None else "—"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--thresholds", default="25,28,29,30,31,32")
    p.add_argument("--out", default=None)
    opt = p.parse_args(argv)

    thresholds = [float(x) for x in opt.thresholds.split(",")]
    arms = {}
    for path in sorted(glob.glob(os.path.join(opt.workdir, "logs", "*.jsonl"))):
        arm = os.path.splitext(os.path.basename(path))[0]
        train, val = load_events(path)
        if not val:
            continue
        # median instantaneous rays/s over the second half (post-compile,
        # post-warmup; the first window includes the jit compile)
        rs = sorted(e["rays_per_s"] for e in train[len(train) // 2:])
        info = {
            "steady_rays_per_s": rs[len(rs) // 2] if rs else float("nan"),
            "final_val": val[-1]["psnr"],
            "best_val": max(e["psnr"] for e in val),
            "total_s": val[-1]["t"],
            "final_step": val[-1]["step"],
            "reach": {},
        }
        for th in thresholds:
            hit = next((e for e in val if e["psnr"] >= th), None)
            info["reach"][th] = (hit["t"], hit["step"]) if hit else None
        arms[arm] = info

    lines = [
        "# Wall-clock efficiency report — "
        + os.path.basename(opt.workdir.rstrip("/")),
        "",
        "Time-to-val-quality per arm (seconds since fit() start, jit compile",
        "included; steps in parentheses).  Source: logs/<ARM>.jsonl val events.",
        "",
        "| Arm | steady rays/s | " + " | ".join(
            f"t(val≥{th:g}dB)" for th in thresholds
        ) + " | best val | final val @ step | total |",
        "|---" * (len(thresholds) + 5) + "|",
    ]
    for arm, a in sorted(arms.items()):
        cells = []
        for th in thresholds:
            r = a["reach"][th]
            cells.append(f"{fmt_s(r[0])} ({r[1]:.0f})" if r else "—")
        lines.append(
            f"| {arm} | {a['steady_rays_per_s']:,.0f} | " + " | ".join(cells)
            + f" | {a['best_val']:.2f} | {a['final_val']:.2f} @ "
            f"{a['final_step']:.0f} | {fmt_s(a['total_s'])} |"
        )
    lines.append("")
    text = "\n".join(lines)
    out = opt.out or os.path.join(opt.workdir, "WALLCLOCK.md")
    with open(out, "w") as f:
        f.write(text)
    print(text)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
