"""COLMAP-interop tests: text model round-trip, masking gates, BA refine."""

import numpy as np
import pytest

from self_supervise_sfm_tpu.utils import colmap_io as CIO
from tests.test_bundle_adjust import make_ba_scene


def build_reconstruction(rng, noise=0.0):
    exts, Ks, pts, ci, pi, uv = make_ba_scene(rng, C=4, P=60, noise_px=noise)
    S, P = 4, 60
    tracks = np.zeros((S, P, 2), np.float32)
    masks = np.zeros((S, P), bool)
    for c, p, xy in zip(ci, pi, uv):
        tracks[c, p] = xy
        masks[c, p] = True
    rec, valid = CIO.batch_matrix_to_reconstruction(
        pts, None, tracks, masks, exts, Ks, image_size=(256, 192),
        max_reproj_error=4.0,
    )
    return rec, valid, (exts, Ks, pts)


class TestReconstruction:
    def test_build_and_roundtrip_text(self, rng, tmp_path):
        rec, valid, (exts, Ks, pts) = build_reconstruction(rng)
        assert rec is not None and valid.all()
        out = rec.write_text(str(tmp_path / "sparse"))
        rec2 = CIO.Reconstruction.read_text(out)
        assert len(rec2.images) == len(rec.images)
        assert len(rec2.points3d) == len(rec.points3d)
        p1, e1, k1 = CIO.reconstruction_to_batch_matrix(rec)
        p2, e2, k2 = CIO.reconstruction_to_batch_matrix(rec2)
        np.testing.assert_allclose(p1, p2, atol=1e-6)
        np.testing.assert_allclose(e1, e2, atol=1e-6)
        np.testing.assert_allclose(k1, k2, atol=1e-4)

    def test_build_and_roundtrip_binary(self, rng, tmp_path):
        """cameras.bin/images.bin/points3D.bin round-trip is exact (binary
        stores full doubles, unlike the %.10g/%.4f text truncation)."""
        rec, valid, _ = build_reconstruction(rng)
        out = rec.write_binary(str(tmp_path / "sparse_bin"))
        rec2 = CIO.Reconstruction.read_binary(out)
        assert set(rec2.cameras) == set(rec.cameras)
        assert set(rec2.images) == set(rec.images)
        assert set(rec2.points3d) == set(rec.points3d)
        for cid, cam in rec.cameras.items():
            c2 = rec2.cameras[cid]
            assert (c2.model, c2.width, c2.height) == (cam.model, cam.width, cam.height)
            np.testing.assert_array_equal(c2.params, cam.params)
        for iid, im in rec.images.items():
            i2 = rec2.images[iid]
            assert (i2.name, i2.camera_id) == (im.name, im.camera_id)
            np.testing.assert_array_equal(i2.qvec_wxyz, im.qvec_wxyz)
            np.testing.assert_array_equal(i2.tvec, im.tvec)
            np.testing.assert_array_equal(i2.xys, im.xys)
            np.testing.assert_array_equal(i2.point3d_ids, im.point3d_ids)
        for pid, pt in rec.points3d.items():
            p2 = rec2.points3d[pid]
            np.testing.assert_array_equal(p2.xyz, pt.xyz)
            np.testing.assert_array_equal(p2.rgb, pt.rgb)
            assert p2.error == pt.error and p2.track == pt.track

    def test_binary_matches_text_model(self, rng, tmp_path):
        rec, _, _ = build_reconstruction(rng)
        rec2 = CIO.Reconstruction.read_binary(
            rec.write_binary(str(tmp_path / "b"))
        )
        rec3 = CIO.Reconstruction.read_text(rec.write_text(str(tmp_path / "t")))
        p2, e2, k2 = CIO.reconstruction_to_batch_matrix(rec2)
        p3, e3, k3 = CIO.reconstruction_to_batch_matrix(rec3)
        np.testing.assert_allclose(p2, p3, atol=1e-6)
        np.testing.assert_allclose(e2, e3, atol=1e-6)
        np.testing.assert_allclose(k2, k3, atol=1e-4)

    def test_binary_empty_observations(self, tmp_path):
        """Images with zero 2D points and pid=-1 sentinels survive IO."""
        rec = CIO.Reconstruction()
        rec.cameras[1] = CIO.Camera(1, "SIMPLE_PINHOLE", 64, 48,
                                    np.asarray([50.0, 32.0, 24.0]))
        im = CIO.ImageRecord(1, "a.jpg", 1, np.asarray([1.0, 0, 0, 0]),
                             np.zeros(3))
        rec.images[1] = im
        im2 = CIO.ImageRecord(2, "b.jpg", 1, np.asarray([1.0, 0, 0, 0]),
                              np.ones(3))
        im2.xys = np.asarray([[1.5, 2.5]])
        im2.point3d_ids = np.asarray([-1], np.int64)
        rec.images[2] = im2
        rec2 = CIO.Reconstruction.read_binary(
            rec.write_binary(str(tmp_path / "e"))
        )
        assert len(rec2.images[1].xys) == 0
        assert rec2.images[2].point3d_ids[0] == -1

    def test_matrix_roundtrip_matches_input(self, rng):
        rec, _, (exts, Ks, pts) = build_reconstruction(rng)
        p, e, k = CIO.reconstruction_to_batch_matrix(rec)
        np.testing.assert_allclose(p, pts, atol=1e-5)
        np.testing.assert_allclose(e, exts, atol=1e-5)
        np.testing.assert_allclose(k, Ks, atol=1e-3)

    def test_reproj_error_gating(self, rng):
        exts, Ks, pts, ci, pi, uv = make_ba_scene(rng, C=4, P=60)
        S, P = 4, 60
        tracks = np.zeros((S, P, 2), np.float32)
        masks = np.zeros((S, P), bool)
        for c, p, xy in zip(ci, pi, uv):
            tracks[c, p] = xy
            masks[c, p] = True
        # corrupt some tracks beyond the threshold
        tracks[:, :10] += 50.0
        rec, valid = CIO.batch_matrix_to_reconstruction(
            pts, None, tracks, masks, exts, Ks, image_size=(256, 192),
            max_reproj_error=4.0,
        )
        assert not valid[:10].any()
        assert valid[10:].all()

    def test_refine_improves_noisy_reconstruction(self, rng):
        rec, _, (exts, Ks, pts) = build_reconstruction(rng)
        # perturb the stored poses
        for iid in list(rec.images.keys())[1:]:
            rec.images[iid].tvec = rec.images[iid].tvec + rng.normal(
                scale=0.03, size=3
            )
        import jax.numpy as jnp
        from self_supervise_sfm_tpu.ops import bundle_adjust as BA

        def rmse(r):
            p, e, k = CIO.reconstruction_to_batch_matrix(r)
            cam_idx, pt_idx, uv = [], [], []
            pids = sorted(r.points3d.keys())
            iids = sorted(r.images.keys())
            for pid in pids:
                for iid, oi in r.points3d[pid].track:
                    cam_idx.append(iids.index(iid))
                    pt_idx.append(pids.index(pid))
                    uv.append(r.images[iid].xys[oi])
            prob = BA.make_problem(
                jnp.asarray(e.astype(np.float32)), jnp.asarray(k.astype(np.float32)),
                jnp.asarray(p.astype(np.float32)),
                jnp.asarray(np.asarray(cam_idx)), jnp.asarray(np.asarray(pt_idx)),
                jnp.asarray(np.asarray(uv, np.float32)),
            )
            return float(BA.reprojection_rmse(prob))

        before = rmse(rec)
        CIO.refine(rec)
        after = rmse(rec)
        assert before > 1.0
        assert after < 0.05, (before, after)
