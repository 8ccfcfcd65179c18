"""Consolidate a quality-A/B workdir's eval_*.json into one markdown table.

Usage: python scripts/summarize_quality.py --workdir logs/quality_r4b \
           [--out logs/quality_r4b/SUMMARY.md]
"""

import argparse
import glob
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--out", default=None)
    opt = p.parse_args(argv)

    rows = []
    for path in sorted(glob.glob(os.path.join(opt.workdir, "eval_*.json"))):
        arm = os.path.basename(path)[5:-5]
        d = json.load(open(path))

        def cell(key):
            m = d.get(key)
            if not m:
                return "—"
            s = f"{m['psnr']:.2f} / {m['ssim']:.3f}"
            if "lpips_rand" in m:
                s += f" / {m['lpips_rand']:.2e}"
            return s

        eps = d.get("eps_sweep") or {}
        eps_s = "; ".join(
            f"{k}x: {v['psnr']:.2f}" for k, v in sorted(
                eps.items(), key=lambda kv: float(kv[0])
            )
        ) or "—"
        rows.append(
            f"| {arm} | {d.get('steps', '?')} | {cell('final_raw')} | "
            f"{cell('best_raw')} | {cell('final_ema')} | {eps_s} |"
        )

    lines = [
        "# Quality A/B summary — " + os.path.basename(opt.workdir.rstrip("/")),
        "",
        "PSNR / SSIM (/ lpips_rand where evaluated).  All arms share data,",
        "seeds, optimizer and the production CLI; see PERF.md for analysis.",
        "",
        "| Arm | steps | final (raw) | best-val (raw) | final (EMA) | eps sweep (best ckpt) |",
        "|---|---|---|---|---|---|",
        *rows,
        "",
    ]
    out = opt.out or os.path.join(opt.workdir, "SUMMARY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
