"""Geometry core unit tests.

Strategy (SURVEY.md §4): analytic round-trips + cross-validation against the
reference torch implementations when the reference tree is importable.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_supervise_sfm_tpu.ops import geometry as G


def random_rotations(rng, n):
    """Uniform-ish random rotation matrices via QR decomposition."""
    A = rng.normal(size=(n, 3, 3))
    Q, R = np.linalg.qr(A)
    # Fix sign so det=+1
    D = np.sign(np.diagonal(R, axis1=-2, axis2=-1))
    Q = Q * D[:, None, :]
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1
    return Q


def random_extrinsics(rng, n):
    R = random_rotations(rng, n)
    t = rng.normal(size=(n, 3, 1))
    return np.concatenate([R, t], axis=-1).astype(np.float32)


def random_intrinsics(rng, n, H=518, W=518):
    f = rng.uniform(200, 800, size=(n,))
    K = np.zeros((n, 3, 3), dtype=np.float32)
    K[:, 0, 0] = f
    K[:, 1, 1] = f * rng.uniform(0.9, 1.1, size=(n,))
    K[:, 0, 2] = W / 2
    K[:, 1, 2] = H / 2
    K[:, 2, 2] = 1
    return K


class TestQuaternions:
    def test_quat_mat_roundtrip(self, rng):
        R = random_rotations(rng, 64).astype(np.float64)
        q = G.mat_to_quat(jnp.asarray(R))
        R2 = G.quat_to_mat(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-6)

    def test_mat_quat_roundtrip(self, rng):
        q = rng.normal(size=(64, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        # standardize: w >= 0
        q[q[:, 3] < 0] *= -1
        R = G.quat_to_mat(jnp.asarray(q))
        q2 = G.mat_to_quat(R)
        np.testing.assert_allclose(np.asarray(q2), q, atol=1e-6)

    def test_identity(self):
        q = jnp.asarray([0.0, 0.0, 0.0, 1.0])
        np.testing.assert_allclose(np.asarray(G.quat_to_mat(q)), np.eye(3), atol=1e-7)

    def test_unnormalized_quat(self, rng):
        q = rng.normal(size=(16, 4))
        Ra = G.quat_to_mat(jnp.asarray(q))
        Rb = G.quat_to_mat(jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True)))
        np.testing.assert_allclose(np.asarray(Ra), np.asarray(Rb), atol=1e-6)


class TestSE3:
    def test_inverse(self, rng):
        E = random_extrinsics(rng, 32)
        inv = np.asarray(G.se3_inverse(jnp.asarray(E)))
        E44 = np.asarray(G.pad_poses(jnp.asarray(E)))
        np.testing.assert_allclose(
            np.matmul(E44, inv), np.tile(np.eye(4), (32, 1, 1)), atol=1e-5
        )

    def test_relative_pose(self, rng):
        src = random_extrinsics(rng, 8)
        dst = random_extrinsics(rng, 8)
        rel = np.asarray(G.relative_pose(jnp.asarray(src), jnp.asarray(dst)))
        # rel maps src-cam coords to dst-cam coords: rel @ src44 == dst44
        src44 = np.asarray(G.pad_poses(jnp.asarray(src)))
        dst44 = np.asarray(G.pad_poses(jnp.asarray(dst)))
        np.testing.assert_allclose(rel @ src44, dst44, atol=1e-4)


class TestPoseEncoding:
    def test_roundtrip(self, rng):
        n = 16
        E = random_extrinsics(rng, n)[None]  # (1, n, 3, 4)
        K = random_intrinsics(rng, n)[None]
        enc = G.extri_intri_to_pose_encoding(jnp.asarray(E), jnp.asarray(K), (518, 518))
        assert enc.shape == (1, n, 9)
        E2, K2 = G.pose_encoding_to_extri_intri(enc, (518, 518))
        np.testing.assert_allclose(np.asarray(E2), E, atol=1e-4)
        np.testing.assert_allclose(np.asarray(K2), K, atol=1e-1)


class TestReprojection:
    def test_identity_pose_reprojects_to_self(self, rng):
        P, N = 4, 100
        K = random_intrinsics(rng, P)
        coords = rng.uniform(0, 518, size=(P, N, 2)).astype(np.float32)
        depth = rng.uniform(1, 10, size=(P, N)).astype(np.float32)
        rel = np.tile(np.eye(4, dtype=np.float32), (P, 1, 1))
        scale = np.ones((P, 1), np.float32)
        out, valid = G.backproject_and_reproject(
            jnp.asarray(coords), jnp.asarray(depth), jnp.asarray(K), jnp.asarray(K),
            jnp.asarray(rel), jnp.asarray(scale),
        )
        np.testing.assert_allclose(np.asarray(out), coords, rtol=1e-3, atol=0.05)
        assert np.asarray(valid).all()

    def test_consistent_geometry_zero_residual(self, rng):
        """Points generated from a consistent two-view geometry reproject exactly."""
        P, N = 3, 200
        K = random_intrinsics(rng, P)
        src_E = random_extrinsics(rng, P)
        dst_E = random_extrinsics(rng, P)
        # sample world points, project into both cameras
        world = rng.uniform(-2, 2, size=(P, N, 3)).astype(np.float32)
        world[..., 2] += 20  # keep sane depths after rotation

        def project(E, Km):
            Rt = E  # (P,3,4)
            pts_h = np.concatenate([world, np.ones_like(world[..., :1])], -1)
            cam = np.einsum("pij,pnj->pni", Rt, pts_h)
            pix = np.einsum("pij,pnj->pni", Km, cam)
            return pix[..., :2] / pix[..., 2:3], cam[..., 2]

        src_px, src_z = project(src_E, K)
        dst_px, _ = project(dst_E, K)
        rel = G.relative_pose(jnp.asarray(src_E), jnp.asarray(dst_E))
        out, _ = G.backproject_and_reproject(
            jnp.asarray(src_px.astype(np.float32)),
            jnp.asarray(src_z.astype(np.float32)),
            jnp.asarray(K), jnp.asarray(K), rel,
            jnp.ones((P, 1), np.float32),
        )
        res = G.compute_projective_residual(out, jnp.asarray(dst_px.astype(np.float32)))
        assert float(jnp.max(res)) < 0.1  # sub-0.1px over ~500px frames (fp32)

    def test_approximation_matches_exact_when_depth_exact(self, rng):
        """Approx variant equals the exact one when dst depth is the true projected z."""
        P, N = 2, 100
        K = random_intrinsics(rng, P)
        src_E = random_extrinsics(rng, P)
        dst_E = random_extrinsics(rng, P)
        world = rng.uniform(-2, 2, size=(P, N, 3)).astype(np.float32)
        world[..., 2] += 20

        pts_h = np.concatenate([world, np.ones_like(world[..., :1])], -1)
        src_cam = np.einsum("pij,pnj->pni", src_E, pts_h)
        dst_cam = np.einsum("pij,pnj->pni", dst_E, pts_h)
        src_px = np.einsum("pij,pnj->pni", K, src_cam)
        src_px = src_px[..., :2] / src_px[..., 2:3]

        rel = G.relative_pose(jnp.asarray(src_E), jnp.asarray(dst_E))
        ones = jnp.ones((P, 1), np.float32)
        exact, _ = G.backproject_and_reproject(
            jnp.asarray(src_px.astype(np.float32)), jnp.asarray(src_cam[..., 2].astype(np.float32)),
            jnp.asarray(K), jnp.asarray(K), rel, ones,
        )
        approx, _ = G.backproject_and_reproject_with_approximation(
            jnp.asarray(src_px.astype(np.float32)), jnp.asarray(src_cam[..., 2].astype(np.float32)),
            jnp.asarray(dst_cam[..., 2].astype(np.float32)),
            jnp.asarray(K), jnp.asarray(K), rel, ones, ones,
        )
        np.testing.assert_allclose(np.asarray(exact), np.asarray(approx), rtol=1e-3, atol=0.05)


class TestUnprojection:
    def test_unproject_project_roundtrip(self, rng):
        S, H, W = 2, 24, 32
        K = random_intrinsics(rng, S, H=H, W=W)
        E = random_extrinsics(rng, S)
        depth = rng.uniform(2, 8, size=(S, H, W)).astype(np.float32)
        world = G.unproject_depth_to_world(jnp.asarray(depth), jnp.asarray(E), jnp.asarray(K))
        assert world.shape == (S, H, W, 3)
        # re-project a few pixels
        wp = np.asarray(world).reshape(S, -1, 3)
        pts_h = np.concatenate([wp, np.ones_like(wp[..., :1])], -1)
        cam = np.einsum("sij,snj->sni", E, pts_h)
        pix = np.einsum("sij,snj->sni", K, cam)
        pix = pix[..., :2] / pix[..., 2:3]
        uu, vv = np.meshgrid(np.arange(W), np.arange(H))
        grid = np.stack([uu, vv], -1).reshape(-1, 2).astype(np.float32)
        for s in range(S):
            np.testing.assert_allclose(pix[s], grid, atol=5e-2)
        np.testing.assert_allclose(cam[..., 2].reshape(S, H, W), depth, rtol=1e-4)


class TestDistortion:
    def test_undistort_roundtrip(self, rng):
        for n_params in (1, 2, 4):
            params = jnp.asarray(
                rng.uniform(-0.05, 0.05, size=(n_params,)).astype(np.float32)
            )
            uv = jnp.asarray(rng.uniform(-0.5, 0.5, size=(64, 2)).astype(np.float32))
            u_d, v_d = G.apply_distortion(params, uv[..., 0], uv[..., 1])
            distorted = jnp.stack([u_d, v_d], axis=-1)
            recovered = G.iterative_undistortion(params, distorted)
            np.testing.assert_allclose(np.asarray(recovered), np.asarray(uv), atol=1e-5)


class TestProjectionVsReference:
    """Cross-validate against the reference torch/numpy implementation."""

    def test_project_world_points(self, rng):
        torch = pytest.importorskip("torch")
        import sys
        sys.path.insert(0, "/root/reference")
        try:
            from sailrecon.dependency.projection import project_3D_points_np
        except Exception:
            pytest.skip("reference projection not importable")
        world = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
        world[:, 2] += 15
        E = random_extrinsics(rng, 4)
        K = random_intrinsics(rng, 4)
        ref_pts, ref_cam = project_3D_points_np(world, E, K)
        ours, ours_cam = G.project_world_points_to_cam(
            jnp.asarray(world), jnp.asarray(E), jnp.asarray(K)
        )
        np.testing.assert_allclose(np.asarray(ours), ref_pts, rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(np.asarray(ours_cam), ref_cam, rtol=1e-4, atol=1e-4)


class TestFp64PoseDecode:
    def test_np64_matches_reference_torch_fp64(self, rng):
        """The host fp64 decode (the co3d_forward fp64-autocast equivalent,
        sail_recon.py:304-311) matches the reference decode run at
        torch.float64 exactly to fp64 round-off."""
        torch = pytest.importorskip("torch")
        import sys
        sys.path.insert(0, "/root/reference")
        from sailrecon.utils.pose_enc import pose_encoding_to_extri_intri

        enc = rng.normal(size=(2, 3, 9)).astype(np.float32)
        enc[..., 7:9] = rng.uniform(0.3, 1.5, size=(2, 3, 2))  # sane FoV
        H, W = 384, 512
        ref_E, ref_K = pose_encoding_to_extri_intri(
            torch.from_numpy(enc).to(torch.float64), (H, W)
        )
        ours_E, ours_K = G.pose_encoding_to_extri_intri_np64(enc, (H, W))
        np.testing.assert_allclose(ours_E, ref_E.numpy(), rtol=1e-12, atol=1e-12)
        # reference quirk: its intrinsics tensor is allocated by
        # ``torch.zeros`` with the DEFAULT dtype (pose_enc.py:125), so even
        # under the fp64 autocast the K it returns is float32 — and
        # co3d_forward returns extrinsics only (sail_recon.py:312). Our
        # decode keeps K in fp64; compare at fp32 tolerance.
        assert ref_K.dtype == torch.float32
        np.testing.assert_allclose(ours_K, ref_K.numpy(), rtol=1e-6)

    def test_pose_forward_fp64_decode(self, rng):
        """pose_forward(fp64_decode=True) == fp64 decode of the fp32 path's
        encoding (same encodings, higher-precision decode)."""
        from self_supervise_sfm_tpu.models import sailrecon as SM

        cfg = SM.make_config(
            img_size=28, embed_dim=64, depth=4, num_heads=4, vit_depth=2,
            intermediate_layer_idx=(0, 1, 2, 3), attn_impl="dense",
        )
        p = SM.init_sailrecon(jax.random.PRNGKey(0), cfg)
        imgs = jnp.asarray(rng.uniform(size=(1, 3, 28, 28, 3)).astype(np.float32))
        key = jax.random.PRNGKey(2)
        E32, K32 = SM.pose_forward(p, cfg, imgs, num_anchor=2, num_query=1,
                                   rank=2, subsample_key=key)
        E64, K64 = SM.pose_forward(p, cfg, imgs, num_anchor=2, num_query=1,
                                   rank=2, subsample_key=key, fp64_decode=True)
        assert E64.dtype == np.float64
        np.testing.assert_allclose(np.asarray(E32), E64, atol=1e-5)
        np.testing.assert_allclose(np.asarray(K32), K64, rtol=1e-5)
