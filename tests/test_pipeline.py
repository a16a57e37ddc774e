"""Tracking-pipeline tests: FPS, keypoints, triangulation, track->BA."""

import numpy as np
import jax.numpy as jnp
import pytest

from self_supervise_sfm_tpu.pipeline import tracking as T
from tests.test_bundle_adjust import make_ba_scene


class TestFPS:
    def test_matches_reference(self, rng):
        import sys

        sys.path.insert(0, "/root/reference")
        torch = pytest.importorskip("torch")
        try:
            from sailrecon.dependency.vggsfm_utils import farthest_point_sampling
        except Exception:
            pytest.skip("reference not importable")
        dm = rng.uniform(0, 10, size=(12, 12))
        dm = (dm + dm.T) / 2
        np.fill_diagonal(dm, 0)
        ref = farthest_point_sampling(torch.from_numpy(dm.copy()), 5, 3)
        ours = T.farthest_point_sampling(dm, 5, 3)
        assert [int(i) for i in ref] == ours


class TestKeypoints:
    def test_finds_corners(self, rng):
        img = np.zeros((64, 64, 3), np.float32)
        img[16:48, 16:48] = 1.0  # a square: corners at (16,16)...(47,47)
        pts = T.extract_keypoints(img, max_pts=50, border=4)
        assert len(pts) > 0
        corners = np.array([[16, 16], [16, 47], [47, 16], [47, 47]], np.float32)
        d = np.linalg.norm(pts[:, None] - corners[None], axis=-1).min(axis=0)
        assert (d < 6).all(), d

    def test_respects_max_and_border(self, rng):
        img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        pts = T.extract_keypoints(img, max_pts=32, border=8)
        assert len(pts) <= 32
        assert (pts >= 8).all() and (pts < 56).all()


class TestTriangulation:
    def test_exact_recovery(self, rng):
        exts, Ks, pts, ci, pi, uv = make_ba_scene(rng, C=4, P=50)
        S, N = 4, 50
        tracks = np.zeros((S, N, 2), np.float32)
        vis = np.zeros((S, N), bool)
        for c, p, xy in zip(ci, pi, uv):
            tracks[c, p] = xy
            vis[c, p] = True
        rec_pts = T.triangulate_tracks(tracks, vis, exts, Ks)
        np.testing.assert_allclose(rec_pts, pts, atol=1e-3)


class TestTracksToReconstruction:
    def test_end_to_end_with_noisy_poses(self, rng):
        """Noisy initial poses + exact tracks -> BA recovers the geometry."""
        from self_supervise_sfm_tpu.utils import colmap_io as CIO
        from self_supervise_sfm_tpu.utils.evaluation import (
            absolute_trajectory_error,
        )

        exts, Ks, pts, ci, pi, uv = make_ba_scene(rng, C=5, P=80)
        S, N = 5, 80
        tracks = np.zeros((S, N, 2), np.float32)
        vis = np.zeros((S, N), bool)
        for c, p, xy in zip(ci, pi, uv):
            tracks[c, p] = xy
            vis[c, p] = True
        exts_noisy = exts.copy()
        exts_noisy[1:, :3, 3] += rng.normal(scale=0.02, size=(S - 1, 3)).astype(
            np.float32
        )
        rec = T.tracks_to_reconstruction(
            tracks, vis, exts_noisy, Ks, image_size=(256, 192), run_ba=True
        )
        assert rec is not None
        _, e_out, _ = CIO.reconstruction_to_batch_matrix(rec)
        ate = absolute_trajectory_error(e_out.astype(np.float32), exts)
        assert ate["ate_rmse"] < 5e-3, ate
