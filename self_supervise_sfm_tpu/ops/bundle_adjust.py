"""Bundle adjustment: Levenberg-Marquardt with Schur-complement PCG, on-TPU.

The reference defers all bundle adjustment to COLMAP's C++ solver through
``pycolmap`` (``sailrecon/dependency/np_to_pycolmap.py:13-209`` — the
BA hand-off of the dormant track path). This module is the TPU-native
replacement (BASELINE north star): the whole solver is jit-compiled JAX with
static shapes, so it runs on-device next to the model.

Structure (classic sparse BA):
- parameters: per-camera [axis-angle (3) ‖ translation (3) ‖ log-focal (1,
  optional)] and per-point xyz; observations are (cam_idx, pt_idx, uv, w).
- normal equations in block form  [U  W; W^T V] [dc; dp] = [-bc; -bp];
  the point blocks V are 3x3 and eliminated in closed form (Schur).
- the reduced camera system S dc = rhs is solved **matrix-free** with
  preconditioned conjugate gradients: each S-matvec is two segment_sums and
  batched 3x3/6x6 contractions over the observation list — O(#obs) work that
  maps onto the MXU/VPU, no sparse matrix assembly. Block-Jacobi (U^-1)
  preconditioning.
- LM outer loop with multiplicative damping and accept/reject steps
  (``lax.while_loop``), all fp32 with fp64-free stability tricks.

A C++ host engine implementing the same math lives in ``cpp/ba`` for
large scenes / CPU-side pipelines; both are golden-tested against each other.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import geometry as G


@dataclass(frozen=True)
class BAConfig:
    max_iters: int = 30
    cg_iters: int = 40
    init_lambda: float = 1e-3
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    min_lambda: float = 1e-9
    max_lambda: float = 1e6
    optimize_focal: bool = False
    huber_delta: float = 0.0  # 0 => plain least squares
    # adaptive stopping (0 disables both => the fixed max_iters x cg_iters
    # schedule). The native engine's speed comes from its forcing-tolerance
    # CG + function-tolerance LM stops (cpp/ba: ~10-16 TOTAL CG iterations
    # where the fixed schedule runs max_iters*cg_iters); under jit the same
    # early exits are lax.while_loop dynamic trip counts — they save real
    # wall time, only shapes must stay static.
    cg_rtol: float = 0.0  # CG stop: sqrt(r'Mr) <= rtol * sqrt(r0'Mr0)
    lm_ftol: float = 0.0  # LM stop: accepted rel. cost decrease < ftol

    @property
    def cam_dim(self) -> int:
        return 7 if self.optimize_focal else 6


class BAProblem(NamedTuple):
    """Static-shape BA problem.

    cam_params: (C, 7) = [axis-angle(3), t(3), log_f(1)]
    intrinsics: (C, 3, 3) base intrinsics (focal scaled by exp(log_f))
    points: (P, 3)
    cam_idx / pt_idx: (O,) int32
    uv: (O, 2) pixel observations
    weight: (O,) observation weights (0 => padded/ignored)
    """

    cam_params: jax.Array
    intrinsics: jax.Array
    points: jax.Array
    cam_idx: jax.Array
    pt_idx: jax.Array
    uv: jax.Array
    weight: jax.Array


def make_problem(
    extrinsics: jax.Array,  # (C, 3, 4) w2c
    intrinsics: jax.Array,  # (C, 3, 3)
    points: jax.Array,  # (P, 3)
    cam_idx: jax.Array,
    pt_idx: jax.Array,
    uv: jax.Array,
    weight: Optional[jax.Array] = None,
) -> BAProblem:
    aa = G.mat_to_axis_angle(extrinsics[..., :3, :3])
    t = extrinsics[..., :3, 3]
    logf = jnp.zeros((extrinsics.shape[0], 1), extrinsics.dtype)
    cam_params = jnp.concatenate([aa, t, logf], axis=-1)
    if weight is None:
        weight = jnp.ones(uv.shape[0], uv.dtype)
    return BAProblem(
        cam_params, intrinsics, points,
        cam_idx.astype(jnp.int32), pt_idx.astype(jnp.int32),
        uv, weight,
    )


def extrinsics_from_params(cam_params: jax.Array) -> jax.Array:
    R = G.axis_angle_to_mat(cam_params[..., :3])
    return jnp.concatenate([R, cam_params[..., 3:6, None]], axis=-1)


def _project_one(cam, K, point):
    """cam: (7,), K: (3,3), point: (3,) -> (2,) pixel."""
    R = G.axis_angle_to_mat(cam[:3])
    pc = R @ point + cam[3:6]
    f_scale = jnp.exp(cam[6])
    x = pc[0] / jnp.maximum(pc[2], 1e-6)
    y = pc[1] / jnp.maximum(pc[2], 1e-6)
    u = K[0, 0] * f_scale * x + K[0, 2]
    v = K[1, 1] * f_scale * y + K[1, 2]
    return jnp.stack([u, v])


def _residuals(problem: BAProblem):
    """Per-observation weighted residual (O, 2) + robust weight."""
    cams = problem.cam_params[problem.cam_idx]
    Ks = problem.intrinsics[problem.cam_idx]
    pts = problem.points[problem.pt_idx]
    pred = jax.vmap(_project_one)(cams, Ks, pts)
    return (pred - problem.uv) * problem.weight[:, None]


@G.f32_matmul
def reprojection_rmse(problem: BAProblem) -> jax.Array:
    r = _residuals(problem)
    w = problem.weight
    n = jnp.maximum(jnp.sum(w > 0), 1)
    return jnp.sqrt(jnp.sum(jnp.sum(r * r, -1)) / n)


def _robust_scale(r2, delta):
    """Triggs-style Huber IRLS weight on squared residual norms."""
    if delta <= 0:
        return jnp.ones_like(r2)
    r = jnp.sqrt(r2 + 1e-12)
    return jnp.where(r <= delta, 1.0, delta / r)


def gauge_mask(
    problem: BAProblem,
    cfg: BAConfig = BAConfig(),
    fix_first_camera: bool = True,
    fix_scale: bool = True,
) -> jax.Array:
    """(C, cam_dim) free-parameter mask removing the BA gauge freedom.

    Free bundle adjustment has a 7-dof null space (global SE(3) + scale):
    COLMAP's solver handles this by fixing the first camera's pose and one
    translation component of the second camera
    (the reference hands BA to pycolmap, ``dependency/np_to_pycolmap.py``).
    Same convention here: camera 0 fully frozen; if ``fix_scale``, camera 1's
    largest-|t| translation component is frozen too, pinning global scale so
    refined poses stay metrically comparable to the initial ones.
    """
    C = problem.cam_params.shape[0]
    mask = jnp.ones((C, cfg.cam_dim), problem.cam_params.dtype)
    if fix_first_camera:
        mask = mask.at[0].set(0.0)
    if fix_scale and C > 1:
        comp = jnp.argmax(jnp.abs(problem.cam_params[1, 3:6]))
        mask = mask.at[1, 3 + comp].set(0.0)
    return mask


@partial(jax.jit, static_argnums=(1,))
@G.f32_matmul
def bundle_adjust(
    problem: BAProblem,
    cfg: BAConfig = BAConfig(),
    free_mask: Optional[jax.Array] = None,
) -> Tuple[BAProblem, dict]:
    """Run LM; returns (refined problem, info dict).

    free_mask: optional (C, cam_dim) 0/1 mask of free camera parameters
    (see :func:`gauge_mask`); masked dims receive zero update, which
    constrains the CG solve to the gauge-fixed subspace.
    """
    O = problem.uv.shape[0]
    C = problem.cam_params.shape[0]
    P = problem.points.shape[0]
    cd = cfg.cam_dim
    fmask = None if free_mask is None else free_mask.astype(problem.cam_params.dtype)

    def cost_and_system(cam_params, points):
        prob = problem._replace(cam_params=cam_params, points=points)

        # jacobians per observation wrt the cd camera dims and the point
        def one_obs(cam7, K, pt, uv, w):
            def f(cam_sub, p):
                cam_full = (
                    cam_sub if cfg.optimize_focal
                    else jnp.concatenate([cam_sub, cam7[6:7]])
                )
                return (_project_one(cam_full, K, p) - uv) * w

            cam_sub = cam7[:cd]
            r = f(cam_sub, pt)
            Jc = jax.jacfwd(f, argnums=0)(cam_sub, pt)  # (2, cd)
            Jp = jax.jacfwd(f, argnums=1)(cam_sub, pt)  # (2, 3)
            return r, Jc, Jp

        cams = cam_params[prob.cam_idx]
        Ks = prob.intrinsics[prob.cam_idx]
        pts = points[prob.pt_idx]
        r, Jc, Jp = jax.vmap(one_obs)(cams, Ks, pts, prob.uv, prob.weight)

        rw = _robust_scale(jnp.sum(r * r, -1), cfg.huber_delta)
        sr = jnp.sqrt(rw)[:, None]
        r = r * sr
        Jc = Jc * sr[..., None]
        Jp = Jp * sr[..., None]

        cost = 0.5 * jnp.sum(r * r)
        # block terms
        U = jax.ops.segment_sum(
            jnp.einsum("oik,oil->okl", Jc, Jc), prob.cam_idx, C
        )  # (C, cd, cd)
        V = jax.ops.segment_sum(
            jnp.einsum("oik,oil->okl", Jp, Jp), prob.pt_idx, P
        )  # (P, 3, 3)
        bc = jax.ops.segment_sum(
            jnp.einsum("oik,oi->ok", Jc, r), prob.cam_idx, C
        )  # (C, cd)
        bp = jax.ops.segment_sum(
            jnp.einsum("oik,oi->ok", Jp, r), prob.pt_idx, P
        )  # (P, 3)
        W = jnp.einsum("oik,oil->okl", Jc, Jp)  # (O, cd, 3) per observation
        return cost, (U, V, bc, bp, W, Jc, Jp)

    def solve_schur(U, V, bc, bp, W, lam, cam_idx, pt_idx):
        eye_c = jnp.eye(cd)
        eye_p = jnp.eye(3)
        U_l = U + lam * eye_c[None]
        V_l = V + lam * eye_p[None]
        V_inv = jnp.linalg.inv(V_l + 1e-12 * eye_p[None])  # (P, 3, 3)

        # rhs = -bc + sum_obs W V^-1 bp
        t = jnp.einsum("okl,ol->ok", W, (V_inv @ bp[..., None])[pt_idx, :, 0])
        rhs = -bc + jax.ops.segment_sum(t, cam_idx, C)
        if fmask is not None:
            rhs = rhs * fmask

        def S_matvec(x):  # x: (C, cd)
            if fmask is not None:
                x = x * fmask
            # z_p = V^-1 sum_obs W^T x_cam
            wtx = jnp.einsum("okl,ok->ol", W, x[cam_idx])  # (O, 3)
            zp = (V_inv @ jax.ops.segment_sum(wtx, pt_idx, P)[..., None])[..., 0]
            # S x = U_l x - sum_obs W z_p
            wz = jnp.einsum("okl,ol->ok", W, zp[pt_idx])
            Sx = jnp.einsum("ckl,cl->ck", U_l, x) - jax.ops.segment_sum(
                wz, cam_idx, C
            )
            # projected operator: identity on fixed dims keeps CG well-posed
            if fmask is not None:
                Sx = Sx * fmask + x * (1.0 - fmask)
            return Sx

        # block-Jacobi preconditioner
        U_inv = jnp.linalg.inv(U_l + 1e-12 * eye_c[None])

        def precond(x):
            z = jnp.einsum("ckl,cl->ck", U_inv, x)
            if fmask is not None:
                z = z * fmask + x * (1.0 - fmask)
            return z

        def cg_body(state):
            x, rr, p, rz, i = state
            Ap = S_matvec(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-20)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            p = z + beta * p
            return x, rr, p, rz_new, i + 1

        x0 = jnp.zeros_like(rhs)
        r0 = rhs
        z0 = precond(r0)
        rz0 = jnp.sum(r0 * z0)
        state = (x0, r0, z0, rz0, jnp.asarray(0, jnp.int32))
        if cfg.cg_rtol > 0:
            # forcing tolerance: stop once the preconditioned residual norm
            # drops by cg_rtol (dynamic trip count — saves real device time
            # under jit, unlike unrolled/fori schedules)
            tol2 = (cfg.cg_rtol**2) * rz0

            def cg_cond(state):
                return (state[4] < cfg.cg_iters) & (state[3] > tol2)

            x, *_ = jax.lax.while_loop(cg_cond, cg_body, state)
        else:
            x, *_ = jax.lax.while_loop(
                lambda s: s[4] < cfg.cg_iters, cg_body, state
            )
        dc = x  # (C, cd)

        # back-substitute points: dp = V^-1 (-bp - W^T dc)
        wtdc = jnp.einsum("okl,ok->ol", W, dc[cam_idx])
        dp = (V_inv @ (-bp - jax.ops.segment_sum(wtdc, pt_idx, P))[..., None])[..., 0]
        return dc, dp

    def apply_step(cam_params, points, dc, dp):
        if cfg.optimize_focal:
            cam_new = cam_params + dc
        else:
            cam_new = cam_params.at[:, :6].add(dc)
        return cam_new, points + dp

    def lm_body(state):
        cam_params, points, lam, it, cost, done = state
        cost0, (U, V, bc, bp, W, Jc, Jp) = cost_and_system(cam_params, points)
        dc, dp = solve_schur(
            U, V, bc, bp, W, lam, problem.cam_idx, problem.pt_idx
        )
        cam_new, pts_new = apply_step(cam_params, points, dc, dp)
        cost_new, _ = cost_and_system(cam_new, pts_new)
        accept = cost_new < cost0
        cam_params = jnp.where(accept, cam_new, cam_params)
        points = jnp.where(accept, pts_new, points)
        lam = jnp.clip(
            jnp.where(accept, lam * cfg.lambda_down, lam * cfg.lambda_up),
            cfg.min_lambda, cfg.max_lambda,
        )
        if cfg.lm_ftol > 0:
            # function tolerance: an ACCEPTED step that no longer moves the
            # cost means LM has converged (the native engine's stop)
            rel = (cost0 - cost_new) / jnp.maximum(cost0, 1e-30)
            done = accept & (rel < cfg.lm_ftol)
        return (cam_params, points, lam, it + 1,
                jnp.minimum(cost0, cost_new), done)

    def cond(state):
        return (state[3] < cfg.max_iters) & jnp.logical_not(state[5])

    init_cost, _ = cost_and_system(problem.cam_params, problem.points)
    state = (
        problem.cam_params, problem.points,
        jnp.asarray(cfg.init_lambda, jnp.float32), jnp.asarray(0),
        init_cost, jnp.asarray(False),
    )
    cam_params, points, lam, iters, cost, _ = jax.lax.while_loop(
        cond, lm_body, state
    )
    refined = problem._replace(cam_params=cam_params, points=points)
    info = {
        "initial_cost": init_cost,
        "final_cost": cost,
        "iterations": iters,
        "lambda": lam,
    }
    return refined, info
