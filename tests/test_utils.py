"""Tests for export (PLY/KITTI), evaluation (ATE/RPE), vls, sanity check."""

import os

import numpy as np
import pytest

from self_supervise_sfm_tpu.utils import evaluation as EV
from self_supervise_sfm_tpu.utils import export as EX


def random_w2c(rng, n):
    from tests.test_geometry import random_extrinsics

    return random_extrinsics(rng, n)


class TestExport:
    def test_ply_roundtrip(self, rng, tmp_path):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        cols = rng.integers(0, 255, size=(100, 3)).astype(np.uint8)
        path = str(tmp_path / "cloud.ply")
        EX.write_ply(path, pts, cols)
        pts2, cols2 = EX.read_ply(path)
        np.testing.assert_allclose(pts2, pts)
        np.testing.assert_array_equal(cols2, cols)

    def test_save_pointcloud_from_predictions(self, rng, tmp_path):
        preds = [
            {
                "point_map": rng.normal(size=(8, 8, 3)).astype(np.float32),
                "xyz_cnf": rng.uniform(1.0, 3.0, size=(8, 8)).astype(np.float32),
                "images": rng.uniform(size=(8, 8, 3)).astype(np.float32),
            }
            for _ in range(2)
        ]
        path = EX.save_pointcloud_ply(preds, str(tmp_path / "pred.ply"))
        pts, cols = EX.read_ply(path)
        assert pts.shape[1] == 3 and cols is not None

    def test_kitti_poses_roundtrip(self, rng, tmp_path):
        E = random_w2c(rng, 5)
        path = EX.save_kitti_poses(E, str(tmp_path / "poses.txt"))
        c2w = EX.load_kitti_poses(path)
        assert c2w.shape == (5, 3, 4)
        # c2w @ w2c == I
        E44 = np.concatenate(
            [E, np.tile(np.array([[[0, 0, 0, 1.0]]]), (5, 1, 1))], axis=1
        )
        for i in range(5):
            T = np.eye(4)
            T[:3] = c2w[i]
            np.testing.assert_allclose(T @ E44[i], np.eye(4), atol=1e-4)

    def test_uniform_sample(self):
        assert EX.uniform_sample(list(range(10)), 3) == [0, 4, 9]
        assert EX.uniform_sample([1, 2], 5) == [1, 2]


class TestEvaluation:
    def test_ate_zero_for_identical(self, rng):
        E = random_w2c(rng, 8)
        m = EV.absolute_trajectory_error(E, E)
        assert m["ate_rmse"] < 1e-6

    def test_ate_invariant_to_sim3(self, rng):
        """ATE after alignment is invariant to a global Sim(3) on predictions."""
        E = random_w2c(rng, 8)
        from tests.test_geometry import random_rotations

        Rg = random_rotations(rng, 1)[0]
        s, t = 2.5, rng.normal(size=3)
        # world' = s Rg world + t  =>  w2c' = w2c o inverse of that
        T = np.eye(4)
        T[:3, :3] = (Rg * s)
        T[:3, 3] = t
        Tinv = np.linalg.inv(T)
        E44 = np.concatenate(
            [E, np.tile(np.array([[[0, 0, 0, 1.0]]]), (8, 1, 1))], axis=1
        )
        E_pred = np.einsum("nij,jk->nik", E44, Tinv)[:, :3]
        m = EV.absolute_trajectory_error(E_pred, E)
        assert m["ate_rmse"] < 1e-5

    def test_rpe_rotation_zero_for_identical(self, rng):
        E = random_w2c(rng, 5)
        errs = EV.relative_rotation_angles_deg(E, E)
        assert np.max(errs) < 0.1  # fp32 arccos-near-1 noise

    def test_pose_auc_monotone(self, rng):
        errs = rng.uniform(0, 30, size=200)
        auc = EV.pose_auc(errs)
        assert 0 <= auc["auc@5"] <= auc["auc@10"] <= auc["auc@20"] <= 1


class TestSanityCheckAndVls:
    def test_sanity_check_on_gt(self, tmp_path):
        import tempfile
        from self_supervise_sfm_tpu.data.imc2021 import IMC2021Scenes
        from self_supervise_sfm_tpu.data.synthetic import make_synthetic_dataset
        from self_supervise_sfm_tpu.utils.sanity_check import (
            sanity_check_relative_poses,
        )

        with tempfile.TemporaryDirectory() as root:
            make_synthetic_dataset(root, num_scenes=1, num_images=3,
                                   image_size=(40, 32))
            ds = IMC2021Scenes(root, sample_num=128, num_images=3, target_size=28)
            scene = ds.load_scene(0, np.random.default_rng(0))
        # with GT poses and GT K (already original space), identity recovery
        scene = dict(scene)
        scene["K_prime_to_K"] = np.tile(np.eye(3, dtype=np.float32), (3, 1, 1))
        m = sanity_check_relative_poses(
            scene["poses_w2c_gt"][:, :3], scene["K_gt"], scene,
            rng=np.random.default_rng(0),
        )
        assert m["median_px_offset"] < 1.0

    def test_vls_outputs(self, rng, tmp_path):
        from self_supervise_sfm_tpu.utils import vls

        d = vls.colorize_depth(rng.uniform(1, 5, size=(16, 16)))
        assert d.shape == (16, 16, 3) and d.dtype == np.uint8
        p = vls.plot_cdf_pdf_curves(
            rng.uniform(size=(2, 50)), rng.uniform(size=(2, 50)),
            0.0, 1.0, 50, str(tmp_path / "cdf.png"),
        )
        assert os.path.exists(p)
        p2 = vls.correspondence_overlay(
            rng.uniform(size=(16, 16, 3)), rng.uniform(size=(16, 16, 3)),
            rng.uniform(0, 15, size=(32, 2)), rng.uniform(0, 15, size=(32, 2)),
            rng.uniform(0, 15, size=(32, 2)),
            save_path=str(tmp_path / "corres.png"),
        )
        assert os.path.exists(p2)


class TestTrackVls:
    def test_visualize_tracks(self, rng, tmp_path):
        from self_supervise_sfm_tpu.utils import vls

        imgs = rng.uniform(size=(3, 24, 32, 3)).astype(np.float32)
        tracks = rng.uniform(0, 24, size=(3, 20, 2)).astype(np.float32)
        vis = rng.uniform(size=(3, 20)) > 0.3
        paths = vls.visualize_tracks_on_images(
            imgs, tracks, vis, out_dir=str(tmp_path / "tv")
        )
        assert len(paths) == 3 and all(os.path.exists(p) for p in paths)
