"""Native C++ BA engine tests: build, solve, golden vs the JAX solver."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_bundle_adjust import make_ba_scene


@pytest.fixture(scope="module")
def native():
    from self_supervise_sfm_tpu.native import ba as NBA

    if not NBA.available():
        pytest.skip("native BA engine not buildable")
    return NBA


class TestNativeBA:
    def test_recovers_from_perturbation(self, native, rng):
        from self_supervise_sfm_tpu.ops import geometry as G

        exts, Ks, pts, ci, pi, uv = make_ba_scene(rng)
        exts_n = exts.copy()
        for c in range(1, exts.shape[0]):
            daa = rng.normal(scale=0.02, size=3).astype(np.float32)
            dR = np.asarray(G.axis_angle_to_mat(jnp.asarray(daa)))
            exts_n[c, :3, :3] = dR @ exts_n[c, :3, :3]
            exts_n[c, :3, 3] += rng.normal(scale=0.03, size=3).astype(np.float32)
        pts_n = pts + rng.normal(scale=0.05, size=pts.shape).astype(np.float32)

        ext_out, pts_out, info = native.ba_solve(
            exts_n, Ks, pts_n, ci, pi, uv, max_iters=30
        )
        # final reprojection RMSE via the JAX problem evaluator
        from self_supervise_sfm_tpu.ops import bundle_adjust as BA

        prob = BA.make_problem(
            jnp.asarray(ext_out), jnp.asarray(Ks), jnp.asarray(pts_out),
            jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv),
        )
        rmse = float(BA.reprojection_rmse(prob))
        assert rmse < 0.05, (rmse, info)

    def test_matches_jax_solver(self, native, rng):
        """Both engines drive the same perturbed problem to the same optimum."""
        from self_supervise_sfm_tpu.ops import bundle_adjust as BA
        from self_supervise_sfm_tpu.utils.evaluation import absolute_trajectory_error

        exts, Ks, pts, ci, pi, uv = make_ba_scene(rng, noise_px=0.3)
        exts_n = exts.copy()
        exts_n[1:, :3, 3] += rng.normal(scale=0.02, size=(exts.shape[0] - 1, 3)).astype(
            np.float32
        )
        ext_cpp, pts_cpp, _ = native.ba_solve(exts_n, Ks, pts, ci, pi, uv, max_iters=25)

        prob = BA.make_problem(
            jnp.asarray(exts_n), jnp.asarray(Ks), jnp.asarray(pts),
            jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv),
        )
        refined, _ = BA.bundle_adjust(prob, BA.BAConfig(max_iters=25))
        ext_jax = np.asarray(BA.extrinsics_from_params(refined.cam_params))

        ate = absolute_trajectory_error(ext_cpp, ext_jax, with_scale=False)
        assert ate["ate_rmse"] < 5e-3, ate
