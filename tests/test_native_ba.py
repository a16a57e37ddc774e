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


class TestDistributedBA:
    """Point-partitioned multi-worker LM-Schur (SURVEY §7.1 step 10)."""

    def _perturbed(self, rng):
        from self_supervise_sfm_tpu.ops import geometry as G

        exts, Ks, pts, ci, pi, uv = make_ba_scene(rng, noise_px=0.2)
        exts_n = exts.copy()
        for c in range(1, exts.shape[0]):
            daa = rng.normal(scale=0.01, size=3).astype(np.float32)
            dR = np.asarray(G.axis_angle_to_mat(jnp.asarray(daa)))
            exts_n[c, :3, :3] = dR @ exts_n[c, :3, :3]
            exts_n[c, :3, 3] += rng.normal(scale=0.02, size=3).astype(np.float32)
        pts_n = pts + rng.normal(scale=0.03, size=pts.shape).astype(np.float32)
        return exts_n, Ks, pts_n, ci, pi, uv

    def test_sharded_matches_single(self, native, rng):
        """3-shard reduction == 1-shard reduction == monolithic ba_solve:
        the partials are additive, so every LM iterate must agree."""
        exts_n, Ks, pts_n, ci, pi, uv = self._perturbed(rng)
        kw = dict(max_iters=15, init_lambda=1e-3)
        e1, p1, i1 = native.ba_solve_distributed(
            exts_n, Ks, pts_n, ci, pi, uv, num_shards=1, **kw
        )
        e3, p3, i3 = native.ba_solve_distributed(
            exts_n, Ks, pts_n, ci, pi, uv, num_shards=3, **kw
        )
        em, pm, im = native.ba_solve(exts_n, Ks, pts_n.copy(), ci, pi, uv, **kw)
        np.testing.assert_allclose(e3, e1, atol=1e-6)
        np.testing.assert_allclose(p3, p1, atol=1e-6)
        np.testing.assert_allclose(e3, em, atol=1e-6)
        np.testing.assert_allclose(i3["final_cost"], im["final_cost"], rtol=1e-9)

    def test_gauge_fix(self, native, rng):
        """gauge_fix freezes camera 0 and one translation component of
        camera 1 (COLMAP convention) while still converging."""
        from self_supervise_sfm_tpu.ops import bundle_adjust as BA
        from self_supervise_sfm_tpu.ops import geometry as G

        exts_n, Ks, pts_n, ci, pi, uv = self._perturbed(rng)
        ext_out, pts_out, info = native.ba_solve_distributed(
            exts_n, Ks, pts_n, ci, pi, uv, num_shards=2, max_iters=25,
            gauge_fix=True,
        )
        # rotation passes through a float32 axis-angle roundtrip on output
        np.testing.assert_allclose(ext_out[0], exts_n[0], atol=3e-5)
        comp = int(np.argmax(np.abs(exts_n[1, :3, 3])))
        np.testing.assert_allclose(
            ext_out[1, comp, 3], exts_n[1, comp, 3], atol=3e-5
        )
        prob = BA.make_problem(
            jnp.asarray(ext_out), jnp.asarray(Ks), jnp.asarray(pts_out),
            jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv),
        )
        assert float(BA.reprojection_rmse(prob)) < 0.5, info

    def test_converges_with_huber(self, native, rng):
        from self_supervise_sfm_tpu.ops import bundle_adjust as BA

        exts_n, Ks, pts_n, ci, pi, uv = self._perturbed(rng)
        ext_out, pts_out, info = native.ba_solve_distributed(
            exts_n, Ks, pts_n, ci, pi, uv, num_shards=4, max_iters=25,
            huber_delta=3.0,
        )
        prob = BA.make_problem(
            jnp.asarray(ext_out), jnp.asarray(Ks), jnp.asarray(pts_out),
            jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv),
        )
        assert float(BA.reprojection_rmse(prob)) < 0.5, info

    def test_multiprocess_psum(self, native, tmp_path):
        """True multi-process run: 2 OS processes under jax.distributed,
        each owning half the points, partials psum'd across processes.
        Must match the single-process 2-shard solver exactly (same
        round-robin partition, same LM control)."""
        import os
        import socket
        import subprocess
        import sys

        from tests._ba_mh_worker import make_worker_problem

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]

        out = str(tmp_path / "mh.npz")
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # 1 CPU device per process
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
        procs = [
            subprocess.Popen(
                [sys.executable, "-m", "tests._ba_mh_worker",
                 str(port), "2", str(i), out],
                env=env, cwd=env["PYTHONPATH"],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for i in range(2)
        ]
        logs = [p.communicate(timeout=300)[0].decode() for p in procs]
        assert all(p.returncode == 0 for p in procs), logs

        exts_n, Ks, pts_n, ci, pi, uv = make_worker_problem()
        e_ref, p_ref, i_ref = native.ba_solve_distributed(
            exts_n, Ks, pts_n, ci, pi, uv, num_shards=2,
            max_iters=15, init_lambda=1e-3,
        )
        got = np.load(out)
        np.testing.assert_allclose(got["ext"], e_ref, atol=1e-6)
        np.testing.assert_allclose(got["pts"], p_ref, atol=1e-6)
        np.testing.assert_allclose(
            got["final_cost"], i_ref["final_cost"], rtol=1e-9
        )

    def test_jax_psum_reducer(self, native, rng):
        """The multi-host reduction path: each worker's (S_w, rhs_w, cost_w)
        lives on its own device and is summed by jax.lax.psum over the mesh
        — the collective that rides ICI/DCN in a real pod deployment."""
        import jax
        from jax.sharding import PartitionSpec as P
        from self_supervise_sfm_tpu.parallel.sharding import make_mesh

        num_shards = 4
        mesh = make_mesh(num_data=num_shards, num_context=1)

        def psum_partials(S_stack, rhs_stack, cost_stack):
            def body(S, rhs, cost):
                return (
                    jax.lax.psum(S, "data"),
                    jax.lax.psum(rhs, "data"),
                    jax.lax.psum(cost, "data"),
                )

            return jax.shard_map(
                body, mesh=mesh,
                in_specs=(P("data"), P("data"), P("data")),
                out_specs=(P("data"), P("data"), P("data")),
            )(S_stack, rhs_stack, cost_stack)

        def reduce_fn(S_list, rhs_list, cost_list):
            # f64 end to end: the reduced system's Cholesky needs it
            with jax.enable_x64():
                S, rhs, cost = psum_partials(
                    np.stack(S_list), np.stack(rhs_list),
                    np.asarray(cost_list, np.float64),
                )
            return (
                np.asarray(S[0], np.float64),
                np.asarray(rhs[0], np.float64),
                float(cost[0]),
            )

        exts_n, Ks, pts_n, ci, pi, uv = self._perturbed(rng)
        kw = dict(max_iters=12, init_lambda=1e-3)
        e_np, p_np, _ = native.ba_solve_distributed(
            exts_n, Ks, pts_n, ci, pi, uv, num_shards=num_shards, **kw
        )
        e_ps, p_ps, _ = native.ba_solve_distributed(
            exts_n, Ks, pts_n, ci, pi, uv, num_shards=num_shards,
            reduce_fn=reduce_fn, **kw
        )
        np.testing.assert_allclose(e_ps, e_np, atol=1e-6)
        np.testing.assert_allclose(p_ps, p_np, atol=1e-6)


class TestAxisAngleEdgeCases:
    def test_near_pi_rotation_roundtrips(self, native, rng):
        """apply_cam_step round-trips poses through R -> axis-angle each
        accepted step; at theta ~ pi the w-vector formula degenerates and
        the C++ path must use the symmetric-part axis recovery (matching
        _np_mat_to_axis_angle) or a 180-degree pose collapses to identity."""
        from self_supervise_sfm_tpu.native.ba import (
            _np_axis_angle_to_mat, _np_mat_to_axis_angle, apply_cam_step,
        )

        axes = np.asarray(
            [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0],
             [1.0, 1.0, 0], [-0.3, 0.5, 0.81]]
        )
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        for theta in (np.pi, np.pi - 1e-7, np.pi - 1e-5):
            cam = np.zeros((len(axes), 6))
            cam[:, :3] = axes * theta
            # zero step: the pose must survive the R -> aa -> R round-trip
            out = apply_cam_step(cam, np.zeros_like(cam))
            R_in = _np_axis_angle_to_mat(cam[:, :3])
            R_out = _np_axis_angle_to_mat(out[:, :3])
            # sqrt(eps)-conditioned near pi: ~1e-5 is the attainable
            # accuracy; the pre-fix failure mode was an O(1) collapse to
            # identity
            np.testing.assert_allclose(R_out, R_in, atol=1e-4)

    def test_cpp_matches_numpy_mat_to_aa(self, native, rng):
        """The C++ R_to_aa (via a zero apply_cam_step) agrees with the numpy
        converter across random rotations including near-pi ones."""
        from self_supervise_sfm_tpu.native.ba import (
            _np_axis_angle_to_mat, apply_cam_step,
        )

        aa = rng.normal(size=(50, 3))
        aa[:10] = (
            aa[:10] / np.linalg.norm(aa[:10], axis=1, keepdims=True)
        ) * (np.pi - 1e-6)
        cam = np.zeros((50, 6))
        cam[:, :3] = aa
        out = apply_cam_step(cam, np.zeros_like(cam))
        np.testing.assert_allclose(
            _np_axis_angle_to_mat(out[:, :3]), _np_axis_angle_to_mat(aa),
            atol=1e-6,
        )


class TestSparsePCG:
    """Block-sparse Schur + block-Jacobi PCG path (large-C scenes)."""

    def test_pcg_matches_dense(self, native, rng):
        exts, Ks, pts, ci, pi, uv = make_ba_scene(rng, C=8, P=150)
        exts_n = exts.copy()
        exts_n[1:, :3, 3] += rng.normal(
            scale=0.02, size=(exts.shape[0] - 1, 3)).astype(np.float32)
        pts_n = pts + rng.normal(scale=0.03, size=pts.shape).astype(np.float32)

        ext_d, pts_d, info_d = native.ba_solve(
            exts_n, Ks, pts_n, ci, pi, uv, max_iters=25, solver="dense")
        ext_s, pts_s, info_s = native.ba_solve(
            exts_n, Ks, pts_n, ci, pi, uv, max_iters=25, solver="pcg")
        assert info_s["solver"] == "pcg" and info_s["cg_iterations"] > 0
        # fully-dense covisibility: every block pair present
        assert info_s["nnz_blocks"] == exts.shape[0] ** 2
        # both reach the residual floor (the problem has gauge freedom, so
        # poses are only comparable up to a global similarity — compare the
        # objective, not raw parameters)
        from self_supervise_sfm_tpu.ops import bundle_adjust as BA

        for ext_o, pts_o in ((ext_d, pts_d), (ext_s, pts_s)):
            prob = BA.make_problem(
                jnp.asarray(ext_o), jnp.asarray(Ks), jnp.asarray(pts_o),
                jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv),
            )
            assert float(BA.reprojection_rmse(prob)) < 0.02
        assert abs(info_s["final_cost"] - info_d["final_cost"]) <= (
            1e-2 * max(info_d["final_cost"], 1e-6) + 1e-6)

    def test_pcg_sparse_covisibility_converges(self, native, rng):
        """Windowed visibility: camera c sees only points in its window, so
        the covisibility pattern (and nnz) is genuinely sparse."""
        from self_supervise_sfm_tpu.ops import bundle_adjust as BA

        C, PPW = 30, 40  # cameras, points per window
        K = np.array([[300.0, 0, 128], [0, 300.0, 96], [0, 0, 1]], np.float32)
        Ks = np.tile(K, (C, 1, 1))
        pts = rng.uniform(-1, 1, size=(C * PPW // 2, 3)).astype(np.float32)
        pts[:, 2] += 6.0
        exts = np.tile(np.eye(3, 4, dtype=np.float32), (C, 1, 1))
        exts[:, 0, 3] = np.linspace(-1, 1, C)
        cam_idx, pt_idx, uv = [], [], []
        for c in range(C):
            lo = c * PPW // 2
            sel = np.arange(lo, min(lo + PPW, pts.shape[0]))
            pc = pts[sel] @ exts[c, :3, :3].T + exts[c, :3, 3]
            px = pc @ K.T
            px = px[:, :2] / px[:, 2:3]
            cam_idx += [c] * len(sel)
            pt_idx += list(sel)
            uv += list(px)
        ci = np.asarray(cam_idx)
        pi = np.asarray(pt_idx)
        uv = np.asarray(uv, np.float32)

        exts_n = exts.copy()
        exts_n[1:, :3, 3] += rng.normal(
            scale=0.01, size=(C - 1, 3)).astype(np.float32)
        ext_s, pts_s, info = native.ba_solve(
            exts_n, Ks, pts, ci, pi, uv, max_iters=30, solver="pcg")
        assert info["nnz_blocks"] < C * C  # pattern actually sparse
        prob = BA.make_problem(
            jnp.asarray(ext_s), jnp.asarray(Ks), jnp.asarray(pts_s),
            jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv),
        )
        assert float(BA.reprojection_rmse(prob)) < 0.05
