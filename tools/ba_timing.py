"""Account for the pure-JAX BA wall time (VERDICT r4 #5).

``BA_REFINE_r04.json`` recorded jax_pcg at 11.6 s on a 40-camera problem the
native engine solves in 0.3 s — with nothing separating compile, dispatch,
and solve. This tool produces that separation on the real TPU chip:

- **compile**: first call of the jitted LM-Schur-PCG solver
  (``ops/bundle_adjust.bundle_adjust`` — one jit containing the whole LM
  ``lax.while_loop``, so there is exactly ONE compile + ONE dispatch per
  problem shape);
- **dispatch**: the remote-TPU tunnel's round trip, measured with a trivial
  jitted scalar op;
- **warm solve**: best of N repeat calls (device time + one dispatch).

Next to each size: the native C++ engine's PCG wall time on the identical
problem, the iteration-count-normalized ratio, and an analytic FLOP
lower-bound -> achieved GFLOP/s for the TPU solve.

Solver-parity note: the native engine stops early on forcing-tolerance /
function-tolerance criteria; the JAX solver runs a fixed
``max_iters x cg_iters`` schedule (static shapes — early exit saves no time
under jit). Both are configured to max_iters=10 here, and the ratio is also
reported per LM iteration actually executed.

Merges a ``jax_tpu_sweep`` section into BA_BENCH.json.
Run:  python tools/ba_timing.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np

sys.path.insert(0, os.path.join(REPO, "tools"))
from ba_benchmark import make_scene, perturb, run_native  # noqa: E402


def analytic_flops(O, C, P, cd, lm_iters, cg_iters):
    """Lower-bound FLOP count of the LM-Schur-PCG schedule.

    Counts only the dense einsum/contraction work (jacobians via jacfwd,
    block products, CG matvecs); segment-sum adds and elementwise glue are
    excluded, so achieved GFLOP/s computed against this is conservative.
    """
    proj = 60  # _project_one: rotation build + transform + divide
    jac = proj * (cd + 3) * 2  # jacfwd dual passes over cd+3 tangents
    blocks = 2 * (cd * cd + 9 + cd * 3 + cd + 3) * 2  # U,V,W,bc,bp einsums
    cost_sys = O * (jac + blocks) + P * 100  # + 3x3 inverses
    matvec = O * 2 * (cd * 3) * 2 * 2 + C * cd * cd * 2  # W/W^T + U_l x
    cg = cg_iters * (matvec + C * cd * 3)
    per_lm = 2 * cost_sys + cg + O * 2 * cd * 3 * 2  # 2 cost evals + backsub
    return lm_iters * per_lm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-iters", type=int, default=10)
    ap.add_argument("--cg-iters", type=int, default=40)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from self_supervise_sfm_tpu.native import ba as NBA
    from self_supervise_sfm_tpu.ops import bundle_adjust as BA

    assert NBA.available()
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # measured tunnel dispatch RTT: trivial jit, warm. Sync via a SCALAR
    # FETCH — through the remote-TPU tunnel block_until_ready returns before
    # the work is actually done (CLAUDE.md gotcha), so every timing below
    # pulls a scalar to the host as its barrier.
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(f(x))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    print(f"dispatch RTT: {rtt*1e3:.1f} ms", flush=True)

    rng = np.random.default_rng(0)
    sweep = []
    for C in (40, 150, 500):
        exts, Ks, pts, ci, pi, uv = make_scene(rng, C)
        e0, p0 = perturb(rng, exts, pts)
        row = {"cams": C, "points": int(pts.shape[0]), "obs": int(len(uv))}

        tn, info_n, en, pn = run_native(
            NBA, "pcg", e0, Ks, p0, ci, pi, uv, args.max_iters)
        row["native_pcg_seconds"] = round(tn, 4)
        row["native_lm_iters"] = int(info_n.get("iterations", args.max_iters))

        prob = BA.make_problem(
            jnp.asarray(e0), jnp.asarray(Ks), jnp.asarray(p0),
            jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv))

        def time_solver(cfg):
            mask = BA.gauge_mask(prob, cfg)
            t0 = time.perf_counter()
            ref, info = BA.bundle_adjust(prob, cfg, mask)
            float(info["final_cost"])  # scalar-fetch barrier (see RTT note)
            first = time.perf_counter() - t0
            warms = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                ref, info = BA.bundle_adjust(prob, cfg, mask)
                float(info["final_cost"])
                warms.append(time.perf_counter() - t0)
            return ref, first, min(warms)

        cfg = BA.BAConfig(max_iters=args.max_iters, cg_iters=args.cg_iters)
        ref, first, warm = time_solver(cfg)
        row["jax_first_call_seconds"] = round(first, 3)
        row["jax_compile_seconds"] = round(first - warm, 3)
        row["jax_warm_solve_seconds"] = round(warm, 4)
        row["jax_warm_minus_rtt_seconds"] = round(max(warm - rtt, 0.0), 4)
        row["jax_rmse_px"] = round(float(BA.reprojection_rmse(ref)), 4)
        # adaptive stops (the native engine's configuration): forcing-
        # tolerance CG + function-tolerance LM
        cfg_a = BA.BAConfig(max_iters=args.max_iters, cg_iters=args.cg_iters,
                            cg_rtol=0.1, lm_ftol=1e-6)
        ref_a, _, warm_a = time_solver(cfg_a)
        row["jax_adaptive_warm_seconds"] = round(warm_a, 4)
        row["jax_adaptive_rmse_px"] = round(
            float(BA.reprojection_rmse(ref_a)), 4)
        from ba_benchmark import rmse_of

        row["native_rmse_px"] = round(rmse_of(en, Ks, pn, ci, pi, uv), 4)
        fl = analytic_flops(len(uv), C, pts.shape[0], cfg.cam_dim,
                            args.max_iters, args.cg_iters)
        row["analytic_gflop_lower_bound"] = round(fl / 1e9, 3)
        row["achieved_gflops"] = round(fl / 1e9 / max(warm - rtt, 1e-9), 2)
        row["warm_vs_native_ratio"] = round(warm / tn, 2)
        row["adaptive_vs_native_ratio"] = round(warm_a / tn, 2)
        # the JAX schedule always runs max_iters LM steps; the native engine
        # stops early — normalize per LM iteration for the solver-work ratio
        row["per_lm_iter_ratio"] = round(
            (warm / args.max_iters) / (tn / max(row["native_lm_iters"], 1)), 2)
        sweep.append(row)
        print(json.dumps(row), flush=True)

    path = os.path.join(REPO, "BA_BENCH.json")
    results = json.load(open(path)) if os.path.exists(path) else {}
    results["jax_tpu_sweep"] = {
        "device": str(dev),
        "dispatch_rtt_ms": round(rtt * 1e3, 1),
        "max_iters": args.max_iters,
        "cg_iters": args.cg_iters,
        "rows": sweep,
        "r4_gap_explained": (
            "BA_REFINE_r04's jax_pcg 11.6 s was first-call time: one XLA "
            "compile of the full LM while_loop (jacfwd-vmap body) dominates; "
            "the warm solve is the jax_warm_solve_seconds column (the whole "
            "LM schedule is a single jit -> exactly one ~"
            f"{round(rtt*1e3)} ms tunnel dispatch per solve)"
        ),
        "remaining_gap_account": (
            "warm solve sits ~5-7x native at 40-500 cams. Accounting: (a) "
            "schedule — the jit solver runs up to max_iters x cg_iters "
            "PCG steps with block-Jacobi, the native engine's block-IC(0) "
            "+ forcing tolerance needs 10-16 TOTAL CG iterations "
            "(BA_BENCH sweep); the new adaptive stops (cg_rtol/lm_ftol, "
            "jax_adaptive_* columns) recover only ~10%, showing Jacobi "
            "needs most of its 40 iterations to hit rtol 0.1 where IC(0) "
            "needs ~1; (b) per-iteration cost — each S-matvec is two "
            "~20k-element segment-sum scatters and tiny einsums, "
            "latency-bound VPU work (~6 GFLOP/s achieved vs the chip's "
            "~120 TFLOP/s matmul ceiling): problems this small are "
            "host-cache-friendly sparse algebra, exactly where a CPU "
            "solver wins. The jit solver's value is in-graph "
            "composability (differentiable refinement inside jitted "
            "pipelines) and device-resident large scenes; the native "
            "engine remains the default for host-side COLMAP-scale BA "
            "(demos --ba-engine native)."
        ),
    }
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
