"""Distill a 518px curriculum run's metrics.jsonl into TRAIN_CURVE_r04.json.

Reads the trainer's jsonl metrics (incl. the r4 plateau-diagnosis fields:
per-subsystem grad norms + log-residual quantiles) and writes the curve
artifact with windowed summaries. The analysis prose is authored in
``ANALYSIS`` below from the measured numbers.

Run:  python tools/train_curve_summary.py <results_dir> [--out TRAIN_CURVE_r04.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def window(rows, key, lo, hi):
    v = [r[key] for r in rows if lo <= r["step"] <= hi and key in r]
    return round(float(np.mean(v)), 4) if v else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results_dir")
    ap.add_argument("--out", default=os.path.join(REPO, "TRAIN_CURVE_r04.json"))
    ap.add_argument("--switch-step", type=int, default=1200)
    args = ap.parse_args()

    path = os.path.join(args.results_dir, "tensorboard", "metrics.jsonl")
    rows = [json.loads(l) for l in open(path)]
    train = [r for r in rows if r.get("prefix", "train") == "train"]
    sanity = [r for r in rows if r.get("prefix") == "sanity"]
    last = train[-1]["step"]
    W = 100  # summary window width (steps)

    def series(key, n=8):
        """n windowed means across the run."""
        edges = np.linspace(1, last, n + 1).astype(int)
        return {
            f"steps_{a}_{b}": window(train, key, a, b)
            for a, b in zip(edges[:-1], edges[1:])
        }

    out = {
        "config": {
            "depth": 12, "vit_depth": 12, "img": 518, "frames_per_scene": 2,
            "rank": 300, "scenes": 4, "steps": last,
            "max_lr": 2e-4, "warmup": 100,
            "loss_max_val_schedule": f"25 -> 15 at step {args.switch_step}",
            "data": "corner_rand (per-seed randomized walls + texture; the r3 "
                    "run used the FIXED corner, which has no cross-scene "
                    "distribution shift)",
            "init": "random (no pretrained checkpoint exists in this env)",
        },
        "mean_log_residual": series("mean_log_residual"),
        "log_residual_quantiles_first_vs_last_100": {
            q: [window(train, q, 1, W), window(train, q, last - W, last)]
            for q in ("log_residual_p10", "log_residual_p50", "log_residual_p90")
        },
        "grad_norms_last_quarter": {
            k: window(train, k, int(last * 0.75), last)
            for k in ("grad_norm", "grad_norm_camera", "grad_norm_agg",
                      "grad_norm_vit", "grad_norm_depth", "grad_norm_point")
        },
        "loss_windows": {
            "step0": train[0]["loss"],
            "pre_switch": window(train, "loss", args.switch_step - W,
                                 args.switch_step),
            "post_switch": window(train, "loss", args.switch_step,
                                  args.switch_step + W),
            "final": window(train, "loss", last - W, last),
        },
        "sanity_offsets": [
            {k: round(float(v), 4) if isinstance(v, float) else v
             for k, v in r.items()} for r in sanity
        ],
        "curve_file": os.path.relpath(path, REPO),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
