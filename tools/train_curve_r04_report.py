"""Build TRAIN_CURVE_r04.json: the 518px from-random curve with the plateau
DIAGNOSED, plus the coarse-to-fine attempt and the saturation-cliff failure
mode — VERDICT r3 next-round #3 ("if it plateaus, diagnose ... and write the
finding").

Inputs (all committed under artifacts/):
  train_conv_r04b/        2400-step 518px curriculum run (corner_rand)
  train_c2f_phaseA_dead/  154px run WITHOUT grad clipping (died at ~4700)
  train_c2f_phaseA/       154px run with clip 1.0, max_val 25 (6000 steps)
  train_c2f_phaseB/       518px run seeded from phaseA params (1400 steps)

Run:  python tools/train_curve_r04_report.py
"""

import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(run):
    path = os.path.join(REPO, "artifacts", run, "tensorboard", "metrics.jsonl")
    rows = [json.loads(l) for l in open(path)]
    return [r for r in rows if r.get("prefix", "train") == "train"]


def win(rows, key, lo, hi):
    v = [r[key] for r in rows if lo <= r["step"] <= hi and key in r]
    return round(float(np.mean(v)), 3) if v else None


def traj(rows, key, n=8):
    last = rows[-1]["step"]
    edges = np.linspace(1, last, n + 1).astype(int)
    return {f"{a}-{b}": win(rows, key, a, b)
            for a, b in zip(edges[:-1], edges[1:])}


def main():
    main518 = load("train_conv_r04b")
    dead154 = load("train_c2f_phaseA_dead")
    a154 = load("train_c2f_phaseA")
    b518 = load("train_c2f_phaseB")
    L = main518[-1]["step"]

    out = {
        "config": {
            "depth": 12, "vit_depth": 12, "img": 518, "frames_per_scene": 2,
            "rank": 300, "scenes": 4, "steps": L, "max_lr": 2e-4,
            "warmup": 100, "loss_max_val_schedule": "25 -> 15 at step 1200",
            "data": "corner_rand (per-seed randomized walls+texture; the r3 "
                    "curve used the FIXED corner, which offers no cross-scene "
                    "distribution shift)",
            "init": "random (no pretrained checkpoint exists in this env)",
        },
        "mean_log_residual_trajectory": traj(main518, "mean_log_residual"),
        "plateau_diagnosis": {
            "residual_quantiles_first100_vs_last100": {
                q: [win(main518, q, 1, 100), win(main518, q, L - 100, L)]
                for q in ("log_residual_p10", "log_residual_p50",
                          "log_residual_p90")
            },
            "quantile_finding": (
                "p10/p50/p90 move TOGETHER (10.9/12.2/13.2 at the end, from "
                "15.7/17.0/18.0): the plateau is the WHOLE distribution "
                "sitting at ~e^12 px, not an outlier tail — poses are "
                "globally uninformative, so this is 'the model never learned "
                "the task', not 'a few bad pairs'."
            ),
            "grad_norms_last_quarter": {
                k: win(main518, k, int(L * 0.75), L)
                for k in ("grad_norm", "grad_norm_camera", "grad_norm_agg",
                          "grad_norm_vit", "grad_norm_depth",
                          "grad_norm_point")
            },
            "grad_finding": (
                "~99% of the gradient norm lands on the camera head; the "
                "aggregator gets ~1/8th of that, the ViT ~1/60th, and the "
                "DPT heads get EXACTLY zero (the loss reprojects "
                "correspondences through the PRECOMPUTED depth prior — "
                "reference design, train/losses.py — so depth/point heads "
                "are trained by nothing in this objective). The trunk "
                "features the camera head reads never improve: a "
                "chicken-and-egg the concentration-statistic CDF objective "
                "cannot break from random init at this parameter count "
                "(~0.7B). The SAME objective fully converges at small scale "
                "— TRAIN_EVAL_r04.json's 6M/25M-param models reach ~1 px "
                "residuals and measurably improve held-out poses — and the "
                "reference never trains from random init either: its "
                "protocol is pretrained sailrecon.pt + per-scene fine-tune "
                "(train_imc.py:464-468). From-random 518px convergence is "
                "outside the reference's own operating envelope; this "
                "artifact records how far the objective carries (mean "
                "residual 2.1e8 -> 3.2e5 px over 100-step windows, ~675x) "
                "and exactly why it stalls."
            ),
        },
        "saturation_cliff_failure_mode": {
            "run": "artifacts/train_c2f_phaseA_dead (154px, no grad clip, "
                   "max_val 25 -> 15 at step 3000)",
            "trajectory": traj(dead154, "mean_log_residual"),
            "loss_after_death": win(dead154, "loss",
                                    dead154[-1]["step"] - 400,
                                    dead154[-1]["step"]),
            "finding": (
                "After the switch to the narrow max_val=15 range, a "
                "grad-spike-driven bad step (~step 4700; unclipped spikes "
                "20-55x the typical norm) pushed the whole residual "
                "distribution past e^15, where the CDF loss saturates at "
                "2.0 with ZERO gradient — unrecoverable by construction: "
                "the narrow histogram offers no downhill signal from "
                "outside its range. Fix: opt-in global-norm grad clipping "
                "(TrainConfig.grad_clip_norm; the reference has no clipping "
                "anywhere). The clipped rerun (train_c2f_phaseA) survives "
                "identical spikes (measured up to 330x) for 6000 steps."
            ),
        },
        "coarse_to_fine_attempt": {
            "protocol": (
                "VERDICT r3 #3's suggested resolution schedule: 6000 steps "
                "at 154px (11x11 patch grid, ~11x cheaper steps, grad clip "
                "1.0, max_val 25), then --init-params-from hand-off to "
                "518px (ViT pos embed resampled 121 -> 1369 tokens at "
                "load) for 1400 steps."
            ),
            "phaseA_154px": traj(a154, "mean_log_residual"),
            "phaseB_518px": traj(b518, "mean_log_residual", n=6),
            "phaseB_step1_residual": round(
                float(b518[0]["mean_log_residual"]), 3),
            "finding": (
                "The hand-off TRANSFERS: phase B opens at log-residual "
                "~10.7 at 518px — the from-scratch 518 run needed ~900 "
                "steps to first reach 12.4 — so low-res training buys a "
                "real head start. But both phases then settle into the "
                "same ~12 basin: the floor is set by the objective/model "
                "scale (see plateau_diagnosis), not by resolution or "
                "schedule. Coarse-to-fine is the right tool for cutting "
                "warm-up cost, not for escaping the from-random basin."
            ),
        },
        "why_the_in_range_loss_is_not_a_monotone_signal": (
            "unchanged from TRAIN_CURVE_r03.json: the CDF loss value is a "
            "concentration statistic bounded near 0.5 once residuals are "
            "in range; the residual is the progress metric."
        ),
        "curve_files": {
            "main": "artifacts/train_conv_r04b/tensorboard/metrics.jsonl",
            "cliff": "artifacts/train_c2f_phaseA_dead/tensorboard/metrics.jsonl",
            "c2f_A": "artifacts/train_c2f_phaseA/tensorboard/metrics.jsonl",
            "c2f_B": "artifacts/train_c2f_phaseB/tensorboard/metrics.jsonl",
        },
    }
    dst = os.path.join(REPO, "TRAIN_CURVE_r04.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["mean_log_residual_trajectory"], indent=1))
    print("wrote", dst)


if __name__ == "__main__":
    main()
