"""Data pipeline tests: synthetic fixtures, loader shapes, and geometric
consistency (GT poses + loader correspondences -> ~zero reprojection
residual), which validates loader + geometry end to end."""

import numpy as np
import jax.numpy as jnp
import pytest

from self_supervise_sfm_tpu.data.imc2021 import IMC2021Scenes, stack_scenes
from self_supervise_sfm_tpu.data.synthetic import make_synthetic_dataset
from self_supervise_sfm_tpu.ops import geometry as G


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("imc_synth")
    return make_synthetic_dataset(str(root), num_scenes=2, num_images=4)


class TestLoader:
    def test_shapes(self, dataset_root):
        ds = IMC2021Scenes(
            dataset_root, sample_num=256, num_images=3, target_size=56
        )
        assert len(ds) == 2
        scene = ds.load_scene(0, np.random.default_rng(0))
        N, P, K = 3, ds.max_pairs, 256
        assert scene["images"].shape == (N, 56, 56, 3)
        assert scene["depth_processed"].shape == (N, 56, 56)
        assert scene["src_coords"].shape == (P, K, 2)
        assert scene["src_depth"].shape == (P, K)
        assert scene["pair_valid"].sum() == 6  # 3 images -> 6 ordered pairs
        assert scene["poses_w2c_gt"].shape == (N, 4, 4)
        batch = stack_scenes([scene, ds.load_scene(1, np.random.default_rng(1))])
        assert batch["images"].shape == (2, N, 56, 56, 3)

    def test_k_recovery_roundtrip(self, dataset_root):
        ds = IMC2021Scenes(dataset_root, sample_num=64, num_images=2, target_size=56)
        scene = ds.load_scene(0, np.random.default_rng(0))
        K = scene["K_gt"]
        K_prime = scene["K_to_K_prime"] @ K
        K_rec = scene["K_prime_to_K"] @ K_prime
        np.testing.assert_allclose(K_rec, K, rtol=1e-5, atol=1e-4)

    def test_gt_geometry_consistency(self, dataset_root):
        """GT poses + sampled correspondences reproject within ~1px."""
        ds = IMC2021Scenes(
            dataset_root, sample_num=512, num_images=4, target_size=56
        )
        scene = ds.load_scene(0, np.random.default_rng(0))
        valid = scene["pair_valid"].astype(bool)
        src_idx = scene["src_idx"][valid]
        dst_idx = scene["dst_idx"][valid]
        K = scene["K_gt"]
        E = scene["poses_w2c_gt"][:, :3]
        rel = G.relative_pose(jnp.asarray(E[src_idx]), jnp.asarray(E[dst_idx]))
        ones = jnp.ones((valid.sum(), 1), jnp.float32)
        pred_dst, _ = G.backproject_and_reproject(
            jnp.asarray(scene["src_coords"][valid]),
            jnp.asarray(scene["src_depth"][valid]),
            jnp.asarray(K[src_idx]),
            jnp.asarray(K[dst_idx]),
            rel,
            ones,
        )
        res = np.asarray(
            G.compute_projective_residual(
                pred_dst, jnp.asarray(scene["dst_coords"][valid])
            )
        )
        # median sub-pixel; tail tolerance for u16 quantisation + bilinear depth
        assert np.median(res) < 0.5, np.median(res)
        assert np.quantile(res, 0.9) < 2.0, np.quantile(res, 0.9)
