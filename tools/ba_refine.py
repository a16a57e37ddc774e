"""BA refinement-value artifact: does bundle adjustment reduce pose error?

``BA_BENCH.json`` proves solver speed; this records the thing the reference's
pycolmap hand-off exists for (``/root/reference/sailrecon/dependency/
np_to_pycolmap.py:13-209``): starting from feed-forward-quality noisy poses
and triangulated points, BA measurably reduces trajectory error. A synthetic
ring scene with full covisibility (GT poses exact, observations = GT
projections + 0.5 px noise — see ``make_ring_scene`` for why the line
trajectory cannot show this), pose/point init perturbed at three noise levels;
pre/post Sim(3)-aligned ATE and relative-rotation error recorded for BOTH
the native C++ engine (block-sparse IC(0)-PCG and dense) and the on-device
JAX LM-Schur-PCG solver.

Writes ``BA_REFINE_r04.json``. Run:  python tools/ba_refine.py [--platform cpu]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


def make_ring_scene(rng, C=40, P=400, noise_px=0.5):
    """Ring of inward-looking cameras sharing one point cloud.

    ``ba_benchmark.make_scene``'s line trajectory with windowed covisibility
    is right for SOLVER benchmarks but has an intrinsic pose-uncertainty
    floor (~5% of span at 0.5 px noise: weak end-to-end coupling, drift) —
    measured ABOVE a mild init perturbation, so "BA improves poses" cannot
    be read off it. The ring + shared-cloud scene is strongly constrained
    (every pair covisible = loop closure everywhere): the floor sits 100x
    below the mildest perturbation level.
    """
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)
    Ks = np.tile(K, (C, 1, 1))
    pts = rng.uniform(-1.5, 1.5, size=(P, 3)).astype(np.float32)
    exts = []
    for c in range(C):
        ang = 2 * np.pi * c / C
        eye = np.array([5 * np.cos(ang), 5 * np.sin(ang),
                        rng.uniform(-0.5, 0.5)])
        z = -eye / np.linalg.norm(eye)  # look at the origin
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(z, up); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=0)
        t = -R @ eye
        exts.append(np.concatenate([R, t[:, None]], 1))
    exts = np.asarray(exts, np.float32)

    cam_idx, pt_idx, uv = [], [], []
    for c in range(C):
        pc = pts @ exts[c, :3, :3].T + exts[c, :3, 3]
        px = pc @ K.T
        px = px[:, :2] / px[:, 2:3]
        ok = (pc[:, 2] > 0.5) & (px[:, 0] > 0) & (px[:, 0] < 640) \
            & (px[:, 1] > 0) & (px[:, 1] < 480)
        sel = np.flatnonzero(ok)
        cam_idx += [c] * len(sel)
        pt_idx += list(sel)
        uv += list(px[sel])
    ci = np.asarray(cam_idx, np.int32)
    pi = np.asarray(pt_idx, np.int32)
    uv = np.asarray(uv, np.float32)
    uv = uv + rng.normal(scale=noise_px, size=uv.shape).astype(np.float32)
    return exts, Ks, pts, ci, pi, uv


NOISE_LEVELS = {
    # (rotation sigma deg, translation sigma as fraction of scene span,
    #  point sigma) — "mild" ~ a good feed-forward init, "severe" ~ a poor one
    "mild":   (0.3, 0.005, 0.01),
    "medium": (1.0, 0.02,  0.03),
    "severe": (3.0, 0.05,  0.08),
}
CAMS = 40
OBS_NOISE_PX = 0.5


def _axis_angle_mat(aa):
    from self_supervise_sfm_tpu.native.ba import _np_axis_angle_to_mat

    return _np_axis_angle_to_mat(aa[None])[0]


def perturb(rng, exts, pts, rot_deg, trans_frac, pt_sigma):
    span = float(np.ptp(exts[:, :3, 3], axis=0).max())
    e = exts.copy()
    for c in range(1, exts.shape[0]):  # camera 0 anchors the gauge
        aa = rng.normal(scale=np.radians(rot_deg), size=3)
        e[c, :3, :3] = _axis_angle_mat(aa.astype(np.float64)) @ e[c, :3, :3]
        e[c, :3, 3] += rng.normal(scale=trans_frac * span, size=3)
    p = pts + rng.normal(scale=pt_sigma, size=pts.shape).astype(np.float32)
    return e.astype(np.float32), p


def pose_metrics(pred, gt):
    from self_supervise_sfm_tpu.utils.evaluation import (
        absolute_trajectory_error, relative_rotation_angles_deg)

    ate = absolute_trajectory_error(pred, gt)
    rot = relative_rotation_angles_deg(pred, gt)
    return {"ate_rmse": round(ate["ate_rmse"], 6),
            "rel_rot_mean_deg": round(float(rot.mean()), 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--out", default=os.path.join(REPO, "BA_REFINE_r04.json"))
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from self_supervise_sfm_tpu.native import ba as NBA
    from self_supervise_sfm_tpu.ops import bundle_adjust as BA
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    exts_gt, Ks, pts_gt, ci, pi, uv = make_ring_scene(
        rng, CAMS, noise_px=OBS_NOISE_PX)
    log(f"scene: {CAMS} cams, {len(pts_gt)} points, {len(uv)} observations, "
        f"obs noise {OBS_NOISE_PX} px")

    out = {"config": {"cams": CAMS, "points": int(len(pts_gt)),
                      "observations": int(len(uv)),
                      "obs_noise_px": OBS_NOISE_PX,
                      "noise_levels": {k: {"rot_deg": v[0],
                                           "trans_frac_of_span": v[1],
                                           "point_sigma": v[2]}
                                       for k, v in NOISE_LEVELS.items()}},
           "levels": {}}

    for level, (rd, tf, ps) in NOISE_LEVELS.items():
        e0, p0 = perturb(rng, exts_gt, pts_gt, rd, tf, ps)
        pre = pose_metrics(e0, exts_gt)
        row = {"pre": pre, "post": {}}
        log(f"[{level}] pre: {pre}")

        for solver in ("pcg", "dense"):
            tS = time.perf_counter()
            e1, p1, info = NBA.ba_solve(
                e0, Ks, p0, ci, pi, uv, max_iters=50, solver=solver,
                huber_delta=4.0)
            m = pose_metrics(e1, exts_gt)
            m["seconds"] = round(time.perf_counter() - tS, 3)
            m["final_cost"] = round(float(info["final_cost"]), 4)
            row["post"][f"native_{solver}"] = m
            log(f"[{level}] native_{solver}: {m}")

        # JAX LM-Schur-PCG (jit; CPU here — the solver itself is the TPU
        # path benchmarked in BA_BENCH.json)
        prob = BA.make_problem(
            jnp.asarray(e0), jnp.asarray(Ks), jnp.asarray(p0),
            jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv))
        cfg = BA.BAConfig(max_iters=50, huber_delta=4.0)
        tS = time.perf_counter()
        sol, _info = BA.bundle_adjust(prob, cfg, BA.gauge_mask(prob, cfg))
        e1 = np.asarray(BA.extrinsics_from_params(sol.cam_params))
        m = pose_metrics(e1, exts_gt)
        m["seconds"] = round(time.perf_counter() - tS, 3)
        m["final_rmse_px"] = round(float(BA.reprojection_rmse(sol)), 4)
        row["post"]["jax_pcg"] = m
        log(f"[{level}] jax_pcg: {m}")

        row["improvement_factor"] = {
            k: round(pre["ate_rmse"] / max(v["ate_rmse"], 1e-12), 1)
            for k, v in row["post"].items()
        }
        out["levels"][level] = row

    out["wall_seconds"] = round(time.time() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
