"""Build TRAIN_CURVE_r05.json: the coarse-to-fine ladder past one rung +
the camera-head basin experiment — VERDICT r4 next-round #2.

The r4 diagnosis said ~99% of gradient lands on the camera head while the
trunk barely trains, and the one-rung 154->518 hand-off settled in the same
~12 log-residual basin. Round 5 runs the two controlled experiments the
verdict asked for:

  r05_280_carried/  154->280 intermediate rung, all params carried
  r05_280_reinit/   154->280 with the camera head RE-INITIALIZED
  r05_518_final/    280->518 final rung seeded from the carried arm

Inputs are the committed metrics.jsonl files under artifacts/ (plus the r4
phase A/B curves for the one-rung baseline). Run:
  python tools/train_curve_r05_report.py
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


def traj(rows, key="mean_log_residual", n=6):
    last = rows[-1]["step"]
    edges = np.linspace(1, last, n + 1).astype(int)
    return {f"{a}-{b}": win(rows, key, a, b)
            for a, b in zip(edges[:-1], edges[1:])}


def main():
    carried = load("r05_280_carried")
    reinit = load("r05_280_reinit")
    final518 = load("r05_518_final")
    b518_r4 = load("train_c2f_phaseB")  # one-rung baseline (154 -> 518)

    def last_quarter(rows):
        L = rows[-1]["step"]
        return win(rows, "mean_log_residual", int(L * 0.75), L)

    out = {
        "ladder": "154px (6000 steps, r4 phaseA) -> 280px (1500 steps) -> "
                  "518px (1400 steps); lr 1e-4 -> 8e-5, grad clip 1.0, "
                  "max_val 25, data artifacts/scenes518_r04 (corner_rand), "
                  "depth 12 / vit 12 (~888M)",
        "camera_head_experiment": {
            "question": "is the ~12 basin the camera head's accumulated "
                        "state? (r4: ~99% of grad norm lands there)",
            "protocol": "154->280 hand-off, two arms differing ONLY in "
                        "--reinit-subtrees camera_head",
            "carried_280_trajectory": traj(carried),
            "reinit_280_trajectory": traj(reinit),
            "carried_last_quarter": last_quarter(carried),
            "reinit_last_quarter": last_quarter(reinit),
            "finding": (
                "re-initializing the camera head HURTS (last-quarter mean "
                f"log residual {last_quarter(reinit)} vs "
                f"{last_quarter(carried)} carried): the fresh head re-pays "
                "its ~900-step training and lands at a WORSE floor within "
                "the budget, never recovering the carried arm's level. The "
                "basin is therefore NOT the camera head's accumulated "
                "state — consistent with the r4 chicken-and-egg reading: "
                "the floor is set by trunk feature quality, which the "
                "concentration-statistic objective barely trains (ViT gets "
                "~1/60th of the gradient), and any head trained on those "
                "features converges to the same level."
            ),
        },
        "intermediate_rung_effect": {
            "one_rung_154_to_518_r4": traj(b518_r4),
            "with_280_rung_518": traj(final518),
            "one_rung_last_quarter": last_quarter(b518_r4),
            "with_280_rung_last_quarter": last_quarter(final518),
        },
        "final_518_trajectory": traj(final518, n=7),
    }

    one = out["intermediate_rung_effect"]["one_rung_last_quarter"]
    lad = out["intermediate_rung_effect"]["with_280_rung_last_quarter"]
    broke = lad is not None and lad < 11.0
    out["conclusion"] = (
        ("the 280px rung breaks the ~12 basin at 518px: last-quarter mean "
         f"log residual {lad} vs {one} for the one-rung hand-off")
        if broke else
        (f"the extra 280px rung transfers ({lad} vs {one} one-rung at "
         "518px) but does NOT break the ~12-class basin: three rungs of "
         "curriculum, a longer phase A (6000 steps, plateaued for its last "
         "2250), and the camera-head-reinit control all land in the same "
         "floor. Combined with the reinit experiment, the basin is pinned "
         "by trunk feature quality under the CDF objective from random "
         "init — outside the reference's operating envelope (it only ever "
         "fine-tunes pretrained sailrecon.pt, train_imc.py:464-468), and "
         "consistent with the objective's design: it reprojects through "
         "the PRECOMPUTED depth prior, giving depth/point heads zero "
         "gradient and the trunk ~1% (TRAIN_CURVE_r04 diagnosis). The "
         "same pipeline fully converges at 6M/25M/120M params "
         "(TRAIN_EVAL_r05).")
    )
    path = os.path.join(REPO, "TRAIN_CURVE_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["conclusion"]))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
