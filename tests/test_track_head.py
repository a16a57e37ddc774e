"""Track-head parity vs the reference (dormant TrackHead made first-class)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_supervise_sfm_tpu.heads import track as TH
from self_supervise_sfm_tpu.heads import track_modules as TM
from self_supervise_sfm_tpu.heads import track_utils as TU
from self_supervise_sfm_tpu.utils import converter as C

from tests._reference import import_reference


@pytest.fixture(scope="module")
def torch():
    return import_reference()


def to_np(t):
    return t.detach().cpu().numpy()


class TestTrackUtils:
    def test_bilinear_sampler_matches(self, torch, rng):
        from sailrecon.heads.track_modules.utils import sample_features4d

        H, W, Cc = 16, 20, 8
        img = rng.normal(size=(1, Cc, H, W)).astype(np.float32)
        coords = rng.uniform(0, 15, size=(1, 40, 2)).astype(np.float32)
        ref = to_np(
            sample_features4d(torch.from_numpy(img), torch.from_numpy(coords))
        )
        ours = np.asarray(
            TU.sample_features(
                jnp.asarray(img[0].transpose(1, 2, 0)), jnp.asarray(coords[0])
            )
        )
        np.testing.assert_allclose(ours, ref[0], atol=1e-5)

    def test_2d_embedding_matches(self, torch, rng):
        from sailrecon.heads.track_modules.utils import get_2d_embedding

        xy = rng.uniform(-5, 5, size=(2, 7, 2)).astype(np.float32)
        ref = to_np(get_2d_embedding(torch.from_numpy(xy), 16, cat_coords=False))
        ours = np.asarray(TU.get_2d_embedding(jnp.asarray(xy), 16, cat_coords=False))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_2d_sincos_pos_embed_matches(self, torch):
        from sailrecon.heads.track_modules.utils import get_2d_sincos_pos_embed

        ref = to_np(get_2d_sincos_pos_embed(32, (6, 9)))  # (1, D, H, W)
        ours = np.asarray(TU.get_2d_sincos_pos_embed(32, (6, 9)))  # (H, W, D)
        np.testing.assert_allclose(ours, ref[0].transpose(1, 2, 0), atol=1e-5)


class TestCorrSampling:
    def test_gather_dot_equals_volume_sample(self, torch, rng):
        """Our gather-then-dot == the reference's corr-volume sampling."""
        from sailrecon.heads.track_modules.blocks import CorrBlock

        B, S, Cc, H, W = 1, 3, 16, 24, 24
        N, levels, radius = 10, 3, 2
        fmaps = rng.normal(size=(B, S, Cc, H, W)).astype(np.float32)
        targets = rng.normal(size=(B, S, N, Cc)).astype(np.float32)
        coords = rng.uniform(3, 20, size=(B, S, N, 2)).astype(np.float32)

        ref_blk = CorrBlock(
            torch.from_numpy(fmaps), num_levels=levels, radius=radius
        )
        ref = to_np(
            ref_blk.corr_sample(torch.from_numpy(targets), torch.from_numpy(coords))
        )

        pyr = TM.build_fmap_pyramid(
            jnp.asarray(fmaps.transpose(0, 1, 3, 4, 2)), levels
        )
        ours = np.asarray(
            TM.corr_sample(pyr, jnp.asarray(targets), jnp.asarray(coords), radius)
        )
        np.testing.assert_allclose(ours, ref, atol=2e-4)


class TestUpdateFormer:
    def test_matches_reference(self, torch, rng):
        from sailrecon.heads.track_modules.blocks import EfficientUpdateFormer

        torch.manual_seed(11)
        cfg = TM.UpdateFormerConfig(
            space_depth=2, time_depth=2, input_dim=36, hidden_size=32,
            num_heads=4, output_dim=10, num_virtual_tracks=8,
        )
        ref = EfficientUpdateFormer(
            space_depth=2, time_depth=2, input_dim=36, hidden_size=32,
            num_heads=4, output_dim=10, num_virtual_tracks=8,
        ).eval()
        x = rng.normal(size=(2, 12, 5, 36)).astype(np.float32)  # (B, N, T, D)
        with torch.no_grad():
            ref_out, _ = ref(torch.from_numpy(x))
        sd = {f"u.{k}": v for k, v in C.torch_module_to_state_dict(ref).items()}
        p = C.convert_updateformer(sd, "u", time_depth=2, space_depth=2)
        ours = np.asarray(TM.updateformer(p, jnp.asarray(x), cfg))
        np.testing.assert_allclose(ours, to_np(ref_out), atol=1e-4)


class TestTrackHead:
    def test_full_head_matches_reference(self, torch, rng):
        from sailrecon.heads.track_head import TrackHead

        torch.manual_seed(12)
        dim, psi = 32, 5
        H = W = 56
        gh = gw = 4
        ref = TrackHead(
            dim_in=dim, features=16, iters=2, corr_levels=3, corr_radius=2,
            hidden_size=32,
        ).eval()
        # shrink the reference's updateformer heads to divide hidden 32
        B, S, P = 1, 3, psi + gh * gw
        taps_np = [rng.normal(size=(B, S, P, dim)).astype(np.float32) for _ in range(4)]
        imgs = rng.uniform(size=(B, S, 3, H, W)).astype(np.float32)
        qp = rng.uniform(10, 40, size=(B, 6, 2)).astype(np.float32)
        ref.feature_extractor.intermediate_layer_idx = [0, 1, 2, 3]
        with torch.no_grad():
            ref_coords, ref_vis, ref_conf = ref(
                [torch.from_numpy(t) for t in taps_np],
                torch.from_numpy(imgs), psi,
                query_points=torch.from_numpy(qp),
            )
        sd = {f"t.{k}": v for k, v in C.torch_module_to_state_dict(ref).items()}
        p = C.convert_track_head(sd, "t")
        cfg = TH.TrackHeadConfig(
            dim_in=dim, features=16, iters=2, corr_levels=3, corr_radius=2,
            hidden_size=32, intermediate_layer_idx=(0, 1, 2, 3),
        )
        taps = {i: jnp.asarray(t) for i, t in enumerate(taps_np)}
        coords, vis, conf = TH.track_head(p, taps, (H, W), psi, jnp.asarray(qp), cfg)
        assert len(coords) == len(ref_coords) == 2
        np.testing.assert_allclose(
            np.asarray(coords[-1]), to_np(ref_coords[-1]), atol=5e-3
        )
        np.testing.assert_allclose(np.asarray(vis), to_np(ref_vis), atol=1e-4)
        np.testing.assert_allclose(np.asarray(conf), to_np(ref_conf), atol=1e-4)
