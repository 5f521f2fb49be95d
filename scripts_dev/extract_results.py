"""Extract the eval-metric table of a run's tensorboard log as markdown.

Usage: python scripts_dev/extract_results.py runs/m3_full_recipe
"""

import glob
import os
import sys


def main():
    run = sys.argv[1]
    files = sorted(glob.glob(os.path.join(run, "tensorboard", "events*")),
                   key=os.path.getmtime)
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    tags = ["eval_train/psnr", "eval_train/ssim", "eval_val/psnr",
            "eval_val/ssim", "eval_val_cc/psnr", "eval_val_cc/ssim"]
    rows = {}
    counts = {}
    for f in files:
        ea = EventAccumulator(f, size_guidance={"scalars": 0,
                                                "histograms": 1,
                                                "images": 1})
        ea.Reload()
        for t in tags:
            try:
                for e in ea.Scalars(t):
                    rows.setdefault(e.step, {})[t] = e.value
            except KeyError:
                pass
        for t in ("densify/n", "train/step_rate"):
            try:
                for e in ea.Scalars(t):
                    counts.setdefault(e.step, {})[t] = e.value
            except KeyError:
                pass

    def n_at(step):
        cand = [s for s in counts if s <= step + 50 and "densify/n" in counts[s]]
        return int(counts[max(cand)]["densify/n"]) if cand else None

    print("| step | points | train PSNR | train SSIM | val PSNR | val SSIM "
          "| val_cc PSNR |")
    print("|---|---|---|---|---|---|---|")
    for s in sorted(rows):
        r = rows[s]
        n = n_at(s)
        print(f"| {s} | {n if n else '—'} "
              f"| {r.get('eval_train/psnr', 0):.2f} "
              f"| {r.get('eval_train/ssim', 0):.3f} "
              f"| {r.get('eval_val/psnr', 0):.2f} "
              f"| {r.get('eval_val/ssim', 0):.3f} "
              f"| {r.get('eval_val_cc/psnr', 0):.2f} |")
    rates = [v["train/step_rate"] for v in counts.values()
             if "train/step_rate" in v]
    if rates:
        print(f"\nmean step rate: {sum(rates)/len(rates):.2f} steps/s")


if __name__ == "__main__":
    main()
