"""ATE-improvement artifact: does self-supervised fine-tuning improve poses?

The reference's purpose is per-scene self-supervised adaptation: fine-tune a
model on a target scene's correspondences with the CDF reprojection objective
and the reconstruction of that scene improves (``/root/reference/train/
train_imc.py:141-268`` — the loss never sees ground-truth poses). This tool
closes that loop with measured pose error, on synthetic scenes where GT poses
are exact (``data/synthetic.py``):

  1. pretrain a model from random init on N_train synthetic scenes with the
     self-supervised objective only (generic prior);
  2. evaluate on an UNSEEN scene: feed-forward poses for all frames, Sim(3)
     ATE + relative-pose AUC vs GT ("before");
  3. fine-tune on a filtered copy of that scene containing only the first
     K_ft frames' images/correspondences (held-out frames never contribute
     loss);
  4. re-evaluate ("after"), including held-out-frame metrics computed in the
     fine-tune frames' gauge: Umeyama alignment is fit on the fine-tune
     frames only and the error is read off the held-out frames, plus
     gauge-free relative-pose errors restricted to pairs touching a held-out
     frame.

Success = pose error measurably drops from (3), at >=2 model scales.
Writes ``TRAIN_EVAL_r04.json``.

Run:  python tools/train_eval_ate.py [--scales tiny,small] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import h5py
import numpy as np

t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)


SCALES = {
    # mirrors the TRAIN_CURVE_TINY_r02 config that demonstrably converges
    "tiny": dict(
        img=28, raw=(40, 32), embed=64, depth=4, vit_depth=2, heads=4,
        taps=(0, 1, 2, 3), rank=2, pretrain_steps=1500, finetune_steps=900,
        pretrain_lr=1e-3, finetune_lr=3e-4, max_val=25.0,
    ),
    "small": dict(
        img=56, raw=(80, 60), embed=128, depth=6, vit_depth=4, heads=4,
        taps=(1, 3, 4, 5), rank=4, pretrain_steps=2500, finetune_steps=1200,
        pretrain_lr=7e-4, finetune_lr=1.5e-4, max_val=25.0,
    ),
    # VERDICT r4 #3: a third, larger scale (~120M params / 112px) — the
    # bridge between the converging 6M/25M configs and the plateauing 888M
    # 518px flagship class. Grad clipping on (from-random at this scale hits
    # the same CDF saturation cliff the 154px run died on, CLAUDE.md r4).
    "medium": dict(
        img=112, raw=(160, 120), embed=512, depth=8, vit_depth=8, heads=8,
        taps=(1, 3, 5, 7), rank=16, pretrain_steps=30000,
        finetune_steps=1500, pretrain_lr=4e-4, finetune_lr=1e-4,
        max_val=25.0, clip=1.0,
    ),
    # resolution-isolation probes: the SAME ~120M model at smaller image
    # sizes — if 84/56px converge where 112px does not, the from-random
    # basin is resolution-driven, not parameter-count-driven
    "medium84": dict(
        img=84, raw=(120, 90), embed=512, depth=8, vit_depth=8, heads=8,
        taps=(1, 3, 5, 7), rank=16, pretrain_steps=15000,
        finetune_steps=1500, pretrain_lr=4e-4, finetune_lr=1e-4,
        max_val=25.0, clip=1.0,
    ),
    "medium56": dict(
        img=56, raw=(80, 60), embed=512, depth=8, vit_depth=8, heads=8,
        taps=(1, 3, 5, 7), rank=8, pretrain_steps=15000,
        finetune_steps=1500, pretrain_lr=4e-4, finetune_lr=1e-4,
        max_val=25.0, clip=1.0,
    ),
}

N_TRAIN_SCENES = 6
FRAMES_PER_SCENE = 8
FT_FRAMES = 6  # fine-tune on frames 0..5; 6,7 held out
SAMPLE_NUM = 512
EVAL_KEY = 7  # fixed subsample key for every evaluation forward


def filter_scene_h5(src_h5: str, dst_dir: str, keep: list[str]) -> str:
    """Copy ``src_h5`` keeping only frames named in ``keep`` (no extension)
    and the correspondence pairs internal to that subset."""
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, "scene.hdf5")
    keep_set = set(keep)
    with h5py.File(src_h5, "r") as f, h5py.File(dst, "w") as g:
        for grp, ext in (("rgb", ".jpg"), ("depth_pr", ".png"),
                         ("intrinsic_gt", ".txt"), ("pose_w2c_gt", ".txt")):
            gg = g.create_group(grp)
            for name in keep:
                key = name + ext
                gg.create_dataset(key, data=np.array(f[grp][key]))
        gc = g.create_group("corres_i2j")
        for pair in f["corres_i2j"]:
            a, b = pair.split("_")[:2]
            if a in keep_set and b in keep_set:
                src_grp = f["corres_i2j"][pair]
                dst_grp = gc.create_group(pair)
                for k in src_grp:
                    dst_grp.create_dataset(k, data=np.array(src_grp[k]))
    return dst


def heldout_metrics(pred_e, gt_e, train_ids, held_ids):
    """Held-out-frame pose error in the fine-tune frames' gauge."""
    from self_supervise_sfm_tpu.utils.evaluation import (
        camera_centers, umeyama_alignment)

    cp = camera_centers(np.asarray(pred_e))
    cg = camera_centers(np.asarray(gt_e))
    s, R, t = umeyama_alignment(cp[train_ids], cg[train_ids])
    aligned = (s * (R @ cp.T)).T + t
    err_held = np.linalg.norm(aligned[held_ids] - cg[held_ids], axis=-1)
    err_train = np.linalg.norm(aligned[train_ids] - cg[train_ids], axis=-1)
    return {
        "heldout_ate_rmse": float(np.sqrt((err_held ** 2).mean())),
        "heldout_ate_mean": float(err_held.mean()),
        "trainframe_ate_rmse": float(np.sqrt((err_train ** 2).mean())),
    }


def heldout_relative_errors(pred_e, gt_e, held_ids):
    """Gauge-free relative rotation/translation errors over ordered pairs
    that touch at least one held-out frame."""
    Ep = np.asarray(pred_e)
    Eg = np.asarray(gt_e)
    n = Ep.shape[0]
    held = set(int(h) for h in held_ids)
    rot, tra = [], []
    for i in range(n):
        for j in range(n):
            if i == j or (i not in held and j not in held):
                continue
            Rp = Ep[j, :3, :3] @ Ep[i, :3, :3].T
            Rg = Eg[j, :3, :3] @ Eg[i, :3, :3].T
            cos = np.clip((np.trace(Rp @ Rg.T) - 1) / 2, -1, 1)
            rot.append(np.degrees(np.arccos(cos)))
            tp = Ep[j, :3, 3] - Rp @ Ep[i, :3, 3]
            tg = Eg[j, :3, 3] - Rg @ Eg[i, :3, 3]
            na, nb = np.linalg.norm(tp), np.linalg.norm(tg)
            if na > 1e-9 and nb > 1e-9:
                cos_t = np.clip(tp @ tg / (na * nb), -1, 1)
                tra.append(np.degrees(np.arccos(cos_t)))
    return np.asarray(rot), np.asarray(tra)


def run_scale(name: str, sc: dict, workdir: str) -> dict:
    import jax
    from self_supervise_sfm_tpu.data.imc2021 import IMC2021Scenes, stack_scenes
    from self_supervise_sfm_tpu.data.synthetic import (
        make_synthetic_dataset, make_synthetic_scene)
    from self_supervise_sfm_tpu.models import sailrecon as M
    from self_supervise_sfm_tpu.train.loop import (
        TrainConfig, init_train_state, make_eval_forward, make_train_step,
        _BATCH_KEYS)
    from self_supervise_sfm_tpu.train.loss import LossConfig
    from self_supervise_sfm_tpu.utils.evaluation import (
        absolute_trajectory_error, pose_auc)

    log(f"=== scale {name}: {sc}")
    res = {"config": dict(sc, n_train_scenes=N_TRAIN_SCENES,
                          frames_per_scene=FRAMES_PER_SCENE,
                          finetune_frames=FT_FRAMES, sample_num=SAMPLE_NUM)}

    # --- data ------------------------------------------------------------
    train_root = os.path.join(workdir, f"{name}_train")
    eval_root = os.path.join(workdir, f"{name}_eval")
    ft_root = os.path.join(workdir, f"{name}_ft")
    # "corner_rand": the single-plane fixture is NOT pose-identifiable
    # (plane-induced homography family — measured: sub-pixel residuals with
    # ~10deg rotation error) and the FIXED corner has no cross-seed
    # distribution shift (the pretrained prior already sits at the
    # objective's optimum on an unseen seed: before-ATE 0.036, fine-tuning
    # only added SGD noise). Per-seed randomized walls + texture give the
    # eval scene genuine novelty for test-time adaptation to close.
    make_synthetic_dataset(train_root, num_scenes=N_TRAIN_SCENES,
                           num_images=FRAMES_PER_SCENE, image_size=sc["raw"],
                           geometry="corner_rand")
    eval_h5 = make_synthetic_scene(os.path.join(eval_root, "scene_eval"),
                                   num_images=FRAMES_PER_SCENE,
                                   image_size=sc["raw"], seed=99,
                                   geometry="corner_rand")
    keep = [f"{i:06d}" for i in range(FT_FRAMES)]
    filter_scene_h5(eval_h5, os.path.join(ft_root, "scene_ft"), keep)
    train_ids = np.arange(FT_FRAMES)
    held_ids = np.arange(FT_FRAMES, FRAMES_PER_SCENE)

    # --- model + train config -------------------------------------------
    mcfg = M.make_config(
        img_size=sc["img"], embed_dim=sc["embed"], depth=sc["depth"],
        num_heads=sc["heads"], vit_depth=sc["vit_depth"],
        intermediate_layer_idx=sc["taps"],
    )

    def tcfg(lr, steps):
        return TrainConfig(
            max_lr=lr, warmup_steps=min(100, steps // 10),
            total_steps=steps, rank=sc["rank"], num_images=2,
            loss=LossConfig(max_val=sc["max_val"]),
            grad_clip_norm=sc.get("clip", 0.0),
        )

    key = jax.random.PRNGKey(17)
    state = jax.jit(lambda k: init_train_state(k, mcfg, tcfg(
        sc["pretrain_lr"], sc["pretrain_steps"])))(key)

    # --- batch pools (synthetic loads are cheap; pregenerate + cycle) ----
    def batch_pool(root, pool, seed):
        ds = IMC2021Scenes(root, sample_num=SAMPLE_NUM, num_images=2,
                           target_size=sc["img"], use_native=False)
        rng = np.random.default_rng(seed)
        out = []
        for _ in range(pool):
            idx = int(rng.integers(len(ds)))
            scene = ds.load_scene(idx, rng)
            b = stack_scenes([scene])
            out.append({k: b[k] for k in _BATCH_KEYS})
        return out

    # --- evaluation forward ----------------------------------------------
    ds_eval = IMC2021Scenes(eval_root, sample_num=64,
                            num_images=FRAMES_PER_SCENE,
                            target_size=sc["img"], use_native=False)
    eval_scene = ds_eval.load_scene(0, np.random.default_rng(0))
    gt_e = eval_scene["poses_w2c_gt"][:, :3, :]
    eval_images = eval_scene["images"][None]  # (1, S, H, W, 3)
    fwd = make_eval_forward(mcfg, tcfg(sc["pretrain_lr"], 1))
    ekey = jax.random.PRNGKey(EVAL_KEY)

    # the scene residual the objective optimizes, measured on the eval scene
    from self_supervise_sfm_tpu.train.loss import (
        _masked_mean, scene_loss, scene_residuals)

    eval_batch_keys = {k: eval_scene[k] for k in _BATCH_KEYS if k != "images"}
    eval_loss = jax.jit(
        lambda e, i: scene_loss(e, i, eval_batch_keys,
                                LossConfig(max_val=sc["max_val"]))
    )

    # self-supervised held-out residual: pairs touching a held-out frame
    # only — the early-stopping signal (no GT anywhere, same contract as
    # the trainer's --eval-heldout-from)
    def _heldout_res(e, i):
        r = scene_residuals(e, i, eval_batch_keys,
                            LossConfig(max_val=sc["max_val"]))
        touch = (r["src_idx"] >= FT_FRAMES) | (r["dst_idx"] >= FT_FRAMES)
        w = r["weights"] * touch[:, None].astype(r["weights"].dtype)
        return _masked_mean(r["residuals"], w)

    heldout_res = jax.jit(_heldout_res)

    def evaluate(params, tag):
        preds = jax.device_get(fwd(params, eval_images, ekey))
        pred_e = preds["extrinsic"][0]  # (S, 3, 4)
        _, lm = eval_loss(preds["extrinsic"][0], preds["intrinsic"][0])
        ho_px = float(heldout_res(preds["extrinsic"][0],
                                  preds["intrinsic"][0]))
        full = absolute_trajectory_error(pred_e, gt_e)
        held = heldout_metrics(pred_e, gt_e, train_ids, held_ids)
        rot, tra = heldout_relative_errors(pred_e, gt_e, held_ids)
        m = {
            "full_scene_ate_rmse": full["ate_rmse"],
            **held,
            "heldout_rel_rot_mean_deg": float(rot.mean()),
            "heldout_rel_rot_median_deg": float(np.median(rot)),
            "heldout_rel_tra_mean_deg": float(tra.mean()) if len(tra) else None,
            "heldout_rot_auc": pose_auc(rot),
            "mean_px_residual": float(lm["mean_px_residual"]),
            "heldout_px_residual": ho_px,
        }
        log(f"  [{tag}] heldout ATE {m['heldout_ate_rmse']:.4f} "
            f"full ATE {m['full_scene_ate_rmse']:.4f} "
            f"rel-rot {m['heldout_rel_rot_mean_deg']:.2f}deg "
            f"residual {m['mean_px_residual']:.2f}px")
        return m

    def train(state, root, cfg, steps, seed, tag, step_fn=None):
        # one jitted step per phase — rebuilding it per segment recompiles
        step_fn = step_fn or make_train_step(mcfg, cfg)
        pool = batch_pool(root, min(steps, 160), seed)
        tstart = time.time()
        for i in range(steps):
            state, metrics = step_fn(state, pool[i % len(pool)])
            if i % max(1, steps // 6) == 0 or i == steps - 1:
                mm = jax.device_get(metrics)
                log(f"  [{tag} {i}] loss {float(mm['loss']):.4f} "
                    f"residual {float(mm['mean_px_residual']):.2f}px "
                    f"({(time.time()-tstart)/(i+1)*1000:.0f} ms/step)")
        return state

    # --- stage 1: pretrain on the train scenes ---------------------------
    log(f"[{name}] pretraining {sc['pretrain_steps']} steps on "
        f"{N_TRAIN_SCENES} scenes...")
    state = train(state, train_root,
                  tcfg(sc["pretrain_lr"], sc["pretrain_steps"]),
                  sc["pretrain_steps"], seed=1, tag=f"{name}-pre")
    res["before"] = evaluate(state["params"], f"{name}-before")

    # --- stage 2: self-supervised fine-tune on the unseen scene ----------
    log(f"[{name}] fine-tuning {sc['finetune_steps']} steps on the eval "
        f"scene's first {FT_FRAMES} frames (self-supervised only)...")
    ft_cfg = tcfg(sc["finetune_lr"], sc["finetune_steps"])
    # fresh optimizer state for the fine-tune phase, same params
    from self_supervise_sfm_tpu.train.loop import train_state_from_params

    state = train_state_from_params(
        state["params"], jax.random.PRNGKey(23), ft_cfg)
    ft_step_fn = make_train_step(mcfg, ft_cfg)
    # early stopping on the SELF-SUPERVISED held-out residual (the r4 study
    # measured TTA overfitting past an optimum; the trainer now finds it —
    # train/validate.BestTracker, same logic as --early-stop-patience)
    from self_supervise_sfm_tpu.train.validate import BestTracker

    tracker = BestTracker(patience=3, min_delta=0.0)
    best_params = state["params"]
    best_entry = None
    curve = []
    seg = max(1, sc["finetune_steps"] // 8)
    done = 0
    while done < sc["finetune_steps"]:
        n = min(seg, sc["finetune_steps"] - done)
        state = train(state, ft_root, ft_cfg, n, seed=100 + done,
                      tag=f"{name}-ft@{done}", step_fn=ft_step_fn)
        done += n
        m = evaluate(state["params"], f"{name}-ft-{done}")
        entry = {"finetune_step": done, **m}
        curve.append(entry)
        improved, should_stop = tracker.update(done, m["heldout_px_residual"])
        if improved:
            best_params = state["params"]
            best_entry = entry
        if should_stop:
            log(f"  [{name}] early stop at ft step {done} "
                f"(best {tracker.best:.3f}px @ {tracker.best_step})")
            break
    res["after"] = dict(best_entry)
    res["after_endpoint"] = curve[-1]
    res["early_stop"] = {
        "metric": "heldout_px_residual (self-supervised)",
        "patience_evals": 3,
        "best_step": tracker.best_step,
        "stopped_at_step": curve[-1]["finetune_step"],
        "ran_full_schedule": curve[-1]["finetune_step"]
        >= sc["finetune_steps"],
    }
    res["finetune_curve"] = curve
    del best_params

    b, a = res["before"], res["after"]
    res["improvement"] = {
        "heldout_ate_rmse": [b["heldout_ate_rmse"], a["heldout_ate_rmse"]],
        "full_scene_ate_rmse": [b["full_scene_ate_rmse"],
                                a["full_scene_ate_rmse"]],
        "heldout_rel_rot_mean_deg": [b["heldout_rel_rot_mean_deg"],
                                     a["heldout_rel_rot_mean_deg"]],
        "heldout_rot_auc@10": [b["heldout_rot_auc"]["auc@10"],
                               a["heldout_rot_auc"]["auc@10"]],
        "mean_px_residual": [b["mean_px_residual"],
                            a["mean_px_residual"]],
        # primary criterion: held-out trajectory error + the objective's
        # own residual (tiny-scale relative ROTATIONS collapse to a shared
        # value regardless of fine-tuning — capacity, reported not gated)
        "improved": bool(
            a["heldout_ate_rmse"] < b["heldout_ate_rmse"]
            and a["mean_px_residual"] < b["mean_px_residual"]
        ),
    }
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="tiny,small,medium")
    ap.add_argument("--out", default=os.path.join(REPO, "TRAIN_EVAL_r05.json"))
    ap.add_argument("--merge", action="store_true",
                    help="merge these scales into an existing --out file "
                         "(per-scale runs can then use different backends)")
    ap.add_argument("--platform", default="", help="e.g. cpu to force CPU")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    out = {
        "protocol": (
            "pretrain from random init on 6 synthetic scenes (self-supervised "
            "CDF objective only), then per-scene test-time adaptation on an "
            "unseen scene using only its first 6 frames' correspondences; "
            "held-out frames 6-7 never contribute loss. Fine-tuning "
            "early-stops on the SELF-SUPERVISED held-out reprojection "
            "residual (patience 3 evals — the r4 overfitting finding, "
            "productized in train/validate.py); 'after' is the early-stopped "
            "optimum, 'after_endpoint' the raw schedule end. Metrics: Sim(3) "
            "ATE (full scene, and held-out frames in the fine-tune frames' "
            "gauge), gauge-free relative-pose errors restricted to pairs "
            "touching a held-out frame, and the mean reprojection residual. "
            "Mirrors /root/reference/train/train_imc.py:141-268 (no GT poses "
            "in any loss)."
        ),
        "geometry": "corner_rand",
        "scales": {},
        "devices": {},
    }
    if args.merge and os.path.exists(args.out):
        prev = json.load(open(args.out))
        out["scales"] = prev.get("scales", {})
        out["devices"] = prev.get("devices", {})
    import jax
    dev = str(jax.devices()[0])
    with tempfile.TemporaryDirectory() as workdir:
        for name in args.scales.split(","):
            out["scales"][name] = run_scale(name, SCALES[name], workdir)
            out["devices"][name] = dev
    out["wall_seconds"] = round(time.time() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {args.out}")
    for name, r in out["scales"].items():
        log(f"{name}: improved={r['improvement']['improved']} "
            f"{r['improvement']}")


if __name__ == "__main__":
    main()
