"""Bundle-adjustment tests: synthetic recovery + robustness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_supervise_sfm_tpu.ops import bundle_adjust as BA
from self_supervise_sfm_tpu.ops import geometry as G


def make_ba_scene(rng, C=6, P=120, noise_px=0.0, outlier_frac=0.0):
    """Synthetic scene: cameras on a ring observing a 3D point blob."""
    pts = rng.uniform(-1, 1, size=(P, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    K = np.array([[300.0, 0, 128], [0, 300.0, 96], [0, 0, 1]], np.float32)
    Ks = np.tile(K, (C, 1, 1))
    exts = []
    for i in range(C):
        ang = 0.4 * np.sin(2 * np.pi * i / C)
        R = np.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]],
            np.float32,
        )
        t = np.array([0.5 * np.cos(2 * np.pi * i / C), 0.3 * np.sin(2 * np.pi * i / C), 0], np.float32)
        exts.append(np.concatenate([R, t[:, None]], axis=1))
    exts = np.stack(exts)

    cam_idx, pt_idx, uv = [], [], []
    for c in range(C):
        pc = pts @ exts[c, :3, :3].T + exts[c, :3, 3]
        px = pc @ K.T
        px = px[:, :2] / px[:, 2:3]
        for p in range(P):
            cam_idx.append(c)
            pt_idx.append(p)
            uv.append(px[p])
    uv = np.asarray(uv, np.float32)
    if noise_px > 0:
        uv = uv + rng.normal(scale=noise_px, size=uv.shape).astype(np.float32)
    if outlier_frac > 0:
        n_out = int(len(uv) * outlier_frac)
        sel = rng.choice(len(uv), n_out, replace=False)
        uv[sel] += rng.uniform(30, 80, size=(n_out, 2)).astype(np.float32)
    return exts, Ks, pts, np.asarray(cam_idx), np.asarray(pt_idx), uv


class TestBundleAdjust:
    def test_recovers_from_perturbation(self, rng):
        exts, Ks, pts, ci, pi, uv = make_ba_scene(rng)
        # perturb cameras (except cam 0, the gauge) and points
        exts_n = exts.copy()
        for c in range(1, exts.shape[0]):
            daa = rng.normal(scale=0.02, size=3).astype(np.float32)
            dR = np.asarray(G.axis_angle_to_mat(jnp.asarray(daa)))
            exts_n[c, :3, :3] = dR @ exts_n[c, :3, :3]
            exts_n[c, :3, 3] += rng.normal(scale=0.03, size=3).astype(np.float32)
        pts_n = pts + rng.normal(scale=0.05, size=pts.shape).astype(np.float32)

        prob = BA.make_problem(
            jnp.asarray(exts_n), jnp.asarray(Ks), jnp.asarray(pts_n),
            jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv),
        )
        rmse0 = float(BA.reprojection_rmse(prob))
        refined, info = BA.bundle_adjust(prob, BA.BAConfig(max_iters=25))
        rmse1 = float(BA.reprojection_rmse(refined))
        assert rmse0 > 1.0  # perturbation is visible
        assert rmse1 < 0.05, (rmse0, rmse1)
        assert float(info["final_cost"]) < float(info["initial_cost"]) * 1e-3

    def test_noise_floor(self, rng):
        """With 0.5px observation noise BA converges to ~the noise floor."""
        exts, Ks, pts, ci, pi, uv = make_ba_scene(rng, noise_px=0.5)
        exts_n = exts.copy()
        exts_n[1:, :3, 3] += rng.normal(scale=0.02, size=(exts.shape[0] - 1, 3)).astype(
            np.float32
        )
        prob = BA.make_problem(
            jnp.asarray(exts_n), jnp.asarray(Ks), jnp.asarray(pts),
            jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv),
        )
        refined, _ = BA.bundle_adjust(prob, BA.BAConfig(max_iters=20))
        rmse = float(BA.reprojection_rmse(refined))
        assert rmse < 0.8

    def test_huber_resists_outliers(self, rng):
        exts, Ks, pts, ci, pi, uv = make_ba_scene(rng, outlier_frac=0.05)
        exts_n = exts.copy()
        exts_n[1:, :3, 3] += rng.normal(scale=0.03, size=(exts.shape[0] - 1, 3)).astype(
            np.float32
        )
        prob = BA.make_problem(
            jnp.asarray(exts_n), jnp.asarray(Ks), jnp.asarray(pts),
            jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv),
        )
        plain, _ = BA.bundle_adjust(prob, BA.BAConfig(max_iters=20))
        robust, _ = BA.bundle_adjust(prob, BA.BAConfig(max_iters=20, huber_delta=2.0))

        # compare recovered camera centres to GT (gauge: both share cam0)
        def centre_err(res):
            E = np.asarray(BA.extrinsics_from_params(res.cam_params))
            from self_supervise_sfm_tpu.utils.evaluation import (
                absolute_trajectory_error,
            )

            return absolute_trajectory_error(E, exts)["ate_rmse"]

        assert centre_err(robust) <= centre_err(plain) * 1.05

    def test_gauge_fix_pins_first_camera_and_scale(self, rng):
        """With gauge_mask, cam0 is bit-unchanged, global scale is pinned,
        and the constrained solve still reaches the same reprojection
        quality (the removed dofs are exactly the cost null space)."""
        exts, Ks, pts, ci, pi, uv = make_ba_scene(rng)
        exts_n = exts.copy()
        for c in range(1, exts.shape[0]):
            exts_n[c, :3, 3] += rng.normal(scale=0.03, size=3).astype(np.float32)
        pts_n = pts + rng.normal(scale=0.05, size=pts.shape).astype(np.float32)
        prob = BA.make_problem(
            jnp.asarray(exts_n), jnp.asarray(Ks), jnp.asarray(pts_n),
            jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv),
        )
        cfg = BA.BAConfig(max_iters=25)
        mask = BA.gauge_mask(prob, cfg)
        assert np.asarray(mask)[0].sum() == 0 and np.asarray(mask)[1].sum() == cfg.cam_dim - 1
        refined, _ = BA.bundle_adjust(prob, cfg, free_mask=mask)
        rmse = float(BA.reprojection_rmse(refined))
        assert rmse < 0.05, rmse
        np.testing.assert_array_equal(
            np.asarray(refined.cam_params[0]), np.asarray(prob.cam_params[0])
        )
        comp = int(np.argmax(np.abs(np.asarray(prob.cam_params)[1, 3:6])))
        assert float(refined.cam_params[1, 3 + comp]) == float(
            prob.cam_params[1, 3 + comp]
        )

    def test_padded_observations_ignored(self, rng):
        exts, Ks, pts, ci, pi, uv = make_ba_scene(rng)
        w = np.ones(len(uv), np.float32)
        # append garbage padded observations with zero weight
        pad = 50
        ci2 = np.concatenate([ci, np.zeros(pad, ci.dtype)])
        pi2 = np.concatenate([pi, np.zeros(pad, pi.dtype)])
        uv2 = np.concatenate([uv, rng.uniform(-1e3, 1e3, size=(pad, 2)).astype(np.float32)])
        w2 = np.concatenate([w, np.zeros(pad, np.float32)])
        prob = BA.make_problem(
            jnp.asarray(exts), jnp.asarray(Ks), jnp.asarray(pts),
            jnp.asarray(ci2), jnp.asarray(pi2), jnp.asarray(uv2), jnp.asarray(w2),
        )
        rmse = float(BA.reprojection_rmse(prob))
        assert rmse < 1e-3  # GT input, padded entries contribute nothing


class TestAxisAngle:
    def test_roundtrip(self, rng):
        from tests.test_geometry import random_rotations

        R = random_rotations(rng, 32).astype(np.float32)
        aa = G.mat_to_axis_angle(jnp.asarray(R))
        R2 = G.axis_angle_to_mat(aa)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)

    def test_small_angle(self):
        aa = jnp.asarray([1e-8, -1e-8, 1e-8])
        R = G.axis_angle_to_mat(aa)
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        g = jax.jacfwd(G.axis_angle_to_mat)(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))
