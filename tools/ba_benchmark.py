"""Native BA scaling benchmark: dense Cholesky vs block-sparse PCG.

Synthetic COLMAP-scale scenes (cameras on a trajectory, windowed
covisibility — the regime the reference reaches through pycolmap,
``dependency/np_to_pycolmap.py:13-209``): each camera observes the points of
its window, tracks span ~``track_len`` cameras, so the reduced camera system
is block-sparse. Sweeps camera counts, times ``solver='dense'`` vs
``solver='pcg'`` on identical perturbed problems, records the crossover, and
runs a large PCG-only scene (dense is O(C^3)/O(C^2) and not attempted
there). Optionally also times the on-TPU LM-Schur-PCG solver
(``ops/bundle_adjust.bundle_adjust``) with ``--tpu``.

Writes ``BA_BENCH.json``. Run:  python tools/ba_benchmark.py [--tpu]
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


def make_scene(rng, C, pts_per_cam=40, track_len=6, noise_px=0.3):
    """Windowed-covisibility scene; returns (exts, Ks, pts, ci, pi, uv)."""
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)
    Ks = np.tile(K, (C, 1, 1))
    # points laid along the trajectory; point p is seen by ~track_len cameras
    P = C * pts_per_cam // (track_len // 2)
    pts = rng.uniform(-1, 1, size=(P, 3)).astype(np.float32)
    pts[:, 0] += np.linspace(-1, C * 0.1 + 1, P)  # spread along the path
    pts[:, 2] += 6.0
    exts = np.tile(np.eye(3, 4, dtype=np.float32), (C, 1, 1))
    exts[:, 0, 3] = -np.linspace(0, C * 0.1, C)  # camera translates along x

    cam_idx, pt_idx, uv = [], [], []
    pts_per_window = pts_per_cam
    for c in range(C):
        # the window of points in front of camera c
        center = int(c / max(C - 1, 1) * (P - pts_per_window))
        sel = np.arange(center, min(center + pts_per_window, P))
        pc = pts[sel] @ exts[c, :3, :3].T + exts[c, :3, 3]
        ok = pc[:, 2] > 0.5
        sel = sel[ok]
        px = pc[ok] @ K.T
        px = px[:, :2] / px[:, 2:3]
        cam_idx += [c] * len(sel)
        pt_idx += list(sel)
        uv += list(px)
    ci = np.asarray(cam_idx, np.int32)
    pi = np.asarray(pt_idx, np.int32)
    uv = np.asarray(uv, np.float32)
    if noise_px > 0:
        uv = uv + rng.normal(scale=noise_px, size=uv.shape).astype(np.float32)
    # drop unobserved points (keep indices compact)
    used = np.unique(pi)
    remap = -np.ones(P, np.int32)
    remap[used] = np.arange(len(used), dtype=np.int32)
    return exts, Ks, pts[used], ci, remap[pi], uv


def perturb(rng, exts, pts):
    e = exts.copy()
    e[1:, :3, 3] += rng.normal(scale=0.01, size=(exts.shape[0] - 1, 3)).astype(
        np.float32)
    p = pts + rng.normal(scale=0.02, size=pts.shape).astype(np.float32)
    return e, p


def run_native(NBA, solver, exts, Ks, pts, ci, pi, uv, max_iters):
    t0 = time.perf_counter()
    ext_o, pts_o, info = NBA.ba_solve(
        exts, Ks, pts, ci, pi, uv, max_iters=max_iters, solver=solver,
        huber_delta=4.0)
    dt = time.perf_counter() - t0
    return dt, info, ext_o, pts_o


def rmse_of(ext_o, Ks, pts_o, ci, pi, uv):
    import jax.numpy as jnp

    from self_supervise_sfm_tpu.ops import bundle_adjust as BA

    prob = BA.make_problem(
        jnp.asarray(ext_o), jnp.asarray(Ks), jnp.asarray(pts_o),
        jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv))
    return float(BA.reprojection_rmse(prob))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="also time the on-TPU PCG solver")
    ap.add_argument("--max-iters", type=int, default=10)
    args = ap.parse_args()

    from self_supervise_sfm_tpu.native import ba as NBA

    assert NBA.available()
    rng = np.random.default_rng(0)
    results = {"max_lm_iters": args.max_iters, "sweep": []}

    for C in (50, 150, 300, 500):
        exts, Ks, pts, ci, pi, uv = make_scene(rng, C)
        e0, p0 = perturb(rng, exts, pts)
        row = {"cams": C, "points": int(pts.shape[0]), "obs": int(len(uv))}
        td, infod, ed, pd = run_native(
            NBA, "dense", e0, Ks, p0, ci, pi, uv, args.max_iters)
        ts, infos, es, ps = run_native(
            NBA, "pcg", e0, Ks, p0, ci, pi, uv, args.max_iters)
        row.update({
            "dense_seconds": round(td, 3),
            "pcg_seconds": round(ts, 3),
            "speedup": round(td / ts, 2),
            "nnz_blocks": infos["nnz_blocks"],
            "density": round(infos["nnz_blocks"] / (C * C), 4),
            "cg_iters_total": infos["cg_iterations"],
            "dense_rmse_px": round(rmse_of(ed, Ks, pd, ci, pi, uv), 4),
            "pcg_rmse_px": round(rmse_of(es, Ks, ps, ci, pi, uv), 4),
        })
        print(json.dumps(row), flush=True)
        results["sweep"].append(row)

    # large scene: PCG only (dense S at C=2000 is 1.15 GB, solve O(C^3));
    # denser point coverage: ~100k points / 300k observations
    C = 2000
    exts, Ks, pts, ci, pi, uv = make_scene(rng, C, pts_per_cam=150)
    e0, p0 = perturb(rng, exts, pts)
    ts, infos, es, ps = run_native(
        NBA, "pcg", e0, Ks, p0, ci, pi, uv, args.max_iters)
    big = {
        "cams": C, "points": int(pts.shape[0]), "obs": int(len(uv)),
        "pcg_seconds": round(ts, 3),
        "nnz_blocks": infos["nnz_blocks"],
        "density": round(infos["nnz_blocks"] / (C * C), 4),
        "cg_iters_total": infos["cg_iterations"],
        "pcg_rmse_px": round(rmse_of(es, Ks, ps, ci, pi, uv), 4),
        "dense_seconds": None,
        "dense_note": "not attempted: S alone is 1.15 GB dense, solve O(C^3)",
    }
    print(json.dumps(big), flush=True)
    results["large_scene"] = big

    if args.tpu:
        import jax
        import jax.numpy as jnp

        from self_supervise_sfm_tpu.ops import bundle_adjust as BA

        C = 300
        exts, Ks, pts, ci, pi, uv = make_scene(rng, C)
        e0, p0 = perturb(rng, exts, pts)
        prob = BA.make_problem(
            jnp.asarray(e0), jnp.asarray(Ks), jnp.asarray(p0),
            jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv))
        cfg = BA.BAConfig(max_iters=args.max_iters)
        t0 = time.perf_counter()
        refined, _ = BA.bundle_adjust(prob, cfg)
        jax.block_until_ready(refined.cam_params)
        tpu_first = time.perf_counter() - t0  # includes compile
        t0 = time.perf_counter()
        refined, _ = BA.bundle_adjust(prob, cfg)
        jax.block_until_ready(refined.cam_params)
        tpu_warm = time.perf_counter() - t0
        results["tpu_pcg"] = {
            "cams": C,
            "first_call_seconds": round(tpu_first, 3),
            "warm_seconds": round(tpu_warm, 3),
            "device": str(jax.devices()[0]),
        }
        print(json.dumps(results["tpu_pcg"]), flush=True)

    out_path = os.path.join(REPO, "BA_BENCH.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
