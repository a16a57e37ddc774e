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


class TestPredictTracks:
    """End-to-end ``predict_tracks`` driver (``track_predict.py:13-141``)."""

    def _tracker(self):
        import jax
        from self_supervise_sfm_tpu.pipeline import vggsfm_tracker as VT

        cfg = VT.VGGSfMTrackerConfig(
            coarse=VT.VGGSfMPredictorConfig(stride=4, depth=2, corr_levels=2,
                                            corr_radius=2, hidden_size=64),
            fine=VT.VGGSfMPredictorConfig(stride=1, depth=2, corr_levels=3,
                                          corr_radius=3, latent_dim=32,
                                          hidden_size=64, fine=True,
                                          use_spaceatt=False),
            pradius=7, fine_iters=2,
        )
        return VT.init_vggsfm_tracker(jax.random.PRNGKey(0), cfg), cfg

    def test_driver_shapes_and_order(self, rng):
        p, cfg = self._tracker()
        S, H, W = 4, 64, 64
        images = rng.uniform(size=(S, H, W, 3)).astype(np.float32)
        out = T.predict_tracks(
            p, images, query_frame_indexes=[2], max_query_pts=24,
            max_points_per_chunk=16, fine_tracking=False,
            augment_min_vis_frac=-1.0, tracker_cfg=cfg,
        )
        assert out is not None
        tracks, vis, qpts = out
        N = len(qpts)
        assert tracks.shape == (S, N, 2) and vis.shape == (S, N)
        # the query frame's own row must carry the query points verbatim
        # (inverse reordering back to the original frame order)
        np.testing.assert_allclose(tracks[2], qpts, atol=1e-3)

    def test_chunked_driver_matches_direct_calls(self, rng):
        """predict_tracks' chunk bookkeeping: its output must equal running
        the tracker by hand on the same chunks (frame reorder + inverse map
        + concat). Bitwise — the driver adds no numerics of its own."""
        import jax.numpy as jnp
        from self_supervise_sfm_tpu.pipeline import vggsfm_tracker as VT
        from self_supervise_sfm_tpu.pipeline.extractors import (
            extract_keypoints_union, initialize_feature_extractors,
        )

        p, cfg = self._tracker()
        S = 3
        images = rng.uniform(size=(S, 64, 64, 3)).astype(np.float32)
        qidx, chunk = 1, 7
        tracks, vis, qpts = T.predict_tracks(
            p, images, query_frame_indexes=[qidx], max_query_pts=20,
            max_points_per_chunk=chunk, fine_tracking=False,
            augment_min_vis_frac=-1.0, tracker_cfg=cfg,
        )
        # by hand
        zoo = initialize_feature_extractors("shi_tomasi", max_pts=20)
        xy = extract_keypoints_union(images[qidx], zoo)[:20]
        order = [qidx] + [i for i in range(S) if i != qidx]
        inv = np.argsort(order)
        imgs = jnp.asarray(images[order])[None]
        trs, vs = [], []
        for lo in range(0, len(xy), chunk):
            q = jnp.asarray(xy[lo : lo + chunk])[None]
            fine, _, v = VT.track(p, imgs, q, cfg, fine_tracking=False)
            trs.append(np.asarray(fine[0]))
            vs.append(np.asarray(v[0]))
        ref_tracks = np.concatenate(trs, axis=1)[inv]
        ref_vis = np.concatenate(vs, axis=1)[inv]
        np.testing.assert_array_equal(qpts, xy)
        np.testing.assert_array_equal(tracks, ref_tracks)
        np.testing.assert_array_equal(vis, ref_vis)

    def test_augmentation_adds_tracks(self, rng):
        p, cfg = self._tracker()
        images = rng.uniform(size=(3, 64, 64, 3)).astype(np.float32)
        kw = dict(query_frame_indexes=[0], max_query_pts=16,
                  max_points_per_chunk=64, fine_tracking=False,
                  tracker_cfg=cfg)
        base = T.predict_tracks(p, images, augment_min_vis_frac=-1.0, **kw)
        aug = T.predict_tracks(p, images, augment_min_vis_frac=2.0,
                               max_augment_frames=1, **kw)
        # vis threshold 2.0 forces augmentation: strictly more tracks
        assert aug[0].shape[1] > base[0].shape[1]


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
