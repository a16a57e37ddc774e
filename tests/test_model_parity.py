"""Golden parity: aggregator / heads / facade vs the reference torch model.

Small configs (ViT-small patch embed, 2 aggregator layers) keep CPU runtime
sane. Subsampling parity: with ``rank >= P0`` attention is order-invariant in
the KV set, so torch-vs-jax RNG differences cannot affect outputs; smaller
ranks are covered by feeding torch's drawn indices into our forward via the
``subsample_indices`` override.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_supervise_sfm_tpu.models.aggregator import (
    AggregatorConfig,
    aggregator_build_cache,
    aggregator_forward,
    aggregator_reloc,
)
from self_supervise_sfm_tpu.heads.camera import CameraHeadConfig, camera_head
from self_supervise_sfm_tpu.heads.dpt import DPTHeadConfig, dpt_head
from self_supervise_sfm_tpu.layers.vit import ViTConfig
from self_supervise_sfm_tpu.utils import converter as C

from tests._reference import import_reference


@pytest.fixture(scope="module")
def torch():
    t = import_reference()
    # the reference reloc cache path calls .cuda() unconditionally
    # (sailrecon/layers/attention.py:92-93); neutralise on CPU-only torch.
    t.Tensor.cuda = lambda self, *a, **k: self
    return t


def to_np(t):
    return t.detach().cpu().numpy()


IMG = 28  # 2x2 patch grid at patch 14
DEPTH = 2
DIM = 384
HEADS = 6


def small_agg_cfg(**kw):
    return AggregatorConfig(
        img_size=IMG,
        embed_dim=DIM,
        depth=DEPTH,
        num_heads=HEADS,
        intermediate_layer_idx=(0, 1),
        vit=ViTConfig(
            img_size=IMG, embed_dim=DIM, depth=12, num_heads=HEADS, attn_impl="dense"
        ),
        attn_impl="dense",
        **kw,
    )


def build_reference_aggregator(torch, kv_cache=False):
    from sailrecon.models.aggregator import Aggregator

    torch.manual_seed(3)
    agg = Aggregator(
        img_size=IMG,
        patch_size=14,
        embed_dim=DIM,
        depth=DEPTH,
        num_heads=HEADS,
        patch_embed="dinov2_vits14_reg",
        intermediate_layer_idx=[0, 1],
        kv_cache=kv_cache,
    ).eval()
    return agg


def convert_agg(agg):
    sd = {f"aggregator.{k}": v for k, v in C.torch_module_to_state_dict(agg).items()}
    return C.convert_aggregator(sd, "aggregator", DEPTH, 12)


class TestAggregatorParity:
    def test_joint_forward_full_rank(self, torch, rng):
        """rank == P0: KV-set order invariance makes RNG differences moot."""
        agg = build_reference_aggregator(torch)
        B, A, Q = 1, 2, 2
        S = A + Q
        imgs = rng.uniform(size=(B, S, 3, IMG, IMG)).astype(np.float32)
        with torch.no_grad():
            out_dict, psi, cam_tok = agg(
                torch.from_numpy(imgs), list(range(A)), [A + i for i in range(Q)],
                fix_rank=4,
            )
        p = convert_agg(agg)
        cfg = small_agg_cfg()
        taps, psi_j, cam_tok_j = aggregator_forward(
            p, cfg, jnp.asarray(imgs.transpose(0, 1, 3, 4, 2)), A, Q, rank=4,
            subsample_key=jax.random.PRNGKey(0),
        )
        assert psi_j == psi == 5
        for l in (0, 1):
            np.testing.assert_allclose(
                np.asarray(taps[l]), to_np(out_dict[l]), atol=2e-4
            )
        np.testing.assert_allclose(np.asarray(cam_tok_j), to_np(cam_tok), atol=2e-4)

    def test_joint_forward_subsampled(self, torch, rng):
        """rank < P0 with torch's drawn indices injected into our forward."""
        agg = build_reference_aggregator(torch)
        B, A, Q, rank = 1, 2, 1, 2
        S = A + Q
        P0 = 4
        imgs = rng.uniform(size=(B, S, 3, IMG, IMG)).astype(np.float32)

        # replicate the generator draw order: per layer, per (b, anchor)
        gen_clone = torch.Generator()
        gen_clone.set_state(agg.generator.get_state())
        idx = np.zeros((DEPTH, B, A, rank), np.int64)
        for l in range(DEPTH):
            for b in range(B):
                for a in range(A):
                    idx[l, b, a] = (
                        torch.randperm(P0, generator=gen_clone)[:rank].numpy()
                    )

        with torch.no_grad():
            out_dict, psi, cam_tok = agg(
                torch.from_numpy(imgs), list(range(A)), [A], fix_rank=rank
            )
        p = convert_agg(agg)
        cfg = small_agg_cfg()
        taps, _, cam_tok_j = aggregator_forward(
            p, cfg, jnp.asarray(imgs.transpose(0, 1, 3, 4, 2)), A, Q, rank=rank,
            subsample_indices=jnp.asarray(idx),
        )
        for l in (0, 1):
            np.testing.assert_allclose(
                np.asarray(taps[l]), to_np(out_dict[l]), atol=2e-4
            )
        np.testing.assert_allclose(np.asarray(cam_tok_j), to_np(cam_tok), atol=2e-4)

    def test_cache_reloc_matches_reference(self, torch, rng):
        """tmp_forward + forward_with_cache vs build_cache + reloc."""
        agg = build_reference_aggregator(torch, kv_cache=True)
        B, A = 1, 2
        anchors = rng.uniform(size=(B, A, 3, IMG, IMG)).astype(np.float32)
        query = rng.uniform(size=(B, 1, 3, IMG, IMG)).astype(np.float32)
        with torch.no_grad():
            agg(torch.from_numpy(anchors), list(range(A)), [], fix_rank=4)
            agg.num_recon = A
            ref_taps, psi = agg.forward_with_cache(
                torch.from_numpy(query), fix_rank=4
            )
        p = convert_agg(agg)
        cfg = small_agg_cfg()
        cache, cam_tok = aggregator_build_cache(
            p, cfg, jnp.asarray(anchors.transpose(0, 1, 3, 4, 2)), rank=4,
            subsample_key=jax.random.PRNGKey(0),
        )
        taps, _ = aggregator_reloc(
            p, cfg, cache, jnp.asarray(query.transpose(0, 1, 3, 4, 2))
        )
        for l in (0, 1):
            np.testing.assert_allclose(
                np.asarray(taps[l]), to_np(ref_taps[l]), atol=2e-4
            )

    def test_joint_equals_cache_plus_reloc(self, rng):
        """Internal consistency: joint forward == build_cache + reloc exactly
        (anchors never see queries, so the trajectories are identical)."""
        from self_supervise_sfm_tpu.models.aggregator import init_aggregator

        cfg = small_agg_cfg()
        p = init_aggregator(jax.random.PRNGKey(1), cfg)
        B, A, Q = 1, 2, 1
        imgs = jnp.asarray(rng.uniform(size=(B, A + Q, IMG, IMG, 3)).astype(np.float32))
        key = jax.random.PRNGKey(7)
        taps_joint, _, cam_j = aggregator_forward(
            p, cfg, imgs, A, Q, rank=2, subsample_key=key
        )
        cache, cam_c = aggregator_build_cache(
            p, cfg, imgs[:, :A], rank=2, subsample_key=key
        )
        taps_reloc, _ = aggregator_reloc(p, cfg, cache, imgs[:, A:])
        np.testing.assert_allclose(np.asarray(cam_j), np.asarray(cam_c), atol=1e-5)
        for l in (0, 1):
            np.testing.assert_allclose(
                np.asarray(taps_joint[l]), np.asarray(taps_reloc[l]), atol=1e-5
            )


class TestCameraHeadParity:
    def test_matches_reference(self, torch, rng):
        from sailrecon.heads.camera_head import CameraHead

        dim = 128
        torch.manual_seed(5)
        ref = CameraHead(dim_in=dim).eval()
        B, A, Q, P = 1, 2, 2, 7
        taps_last = rng.normal(size=(B, Q, P, dim)).astype(np.float32)
        cam_tok = rng.normal(size=(B, A, dim)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(
                [torch.from_numpy(taps_last)], torch.from_numpy(cam_tok)
            )
        sd = {f"c.{k}": v for k, v in C.torch_module_to_state_dict(ref).items()}
        p = C.convert_camera_head(sd, "c")
        cfg = CameraHeadConfig(dim_in=dim, attn_impl="dense")
        ours = camera_head(p, {-1: jnp.asarray(taps_last)}[-1], jnp.asarray(cam_tok), cfg)
        assert len(ours) == len(ref_out) == 4
        for o, r in zip(ours, ref_out):
            np.testing.assert_allclose(np.asarray(o), to_np(r), atol=1e-4)


class TestDPTHeadParity:
    def test_matches_reference(self, torch, rng):
        from sailrecon.heads.dpt_head import DPTHead

        dim, psi = 32, 5
        H = W = 56  # 4x4 grid
        gh = gw = 4
        torch.manual_seed(6)
        ref = DPTHead(
            dim_in=dim,
            output_dim=4,
            activation="inv_log",
            conf_activation="expp1",
            features=8,
            out_channels=[8, 16, 32, 32],
            intermediate_layer_idx=[0, 1, 2, 3],
        ).eval()
        B, S, P = 1, 2, psi + gh * gw
        taps_np = [
            rng.normal(size=(B, S, P, dim)).astype(np.float32) for _ in range(4)
        ]
        imgs = rng.uniform(size=(B, S, 3, H, W)).astype(np.float32)
        with torch.no_grad():
            ref_preds, ref_conf = ref(
                [torch.from_numpy(t) for t in taps_np],
                torch.from_numpy(imgs),
                patch_start_idx=psi,
            )
        sd = {f"d.{k}": v for k, v in C.torch_module_to_state_dict(ref).items()}
        p = C.convert_dpt_head(sd, "d")
        cfg = DPTHeadConfig(
            dim_in=dim,
            output_dim=4,
            activation="inv_log",
            features=8,
            out_channels=(8, 16, 32, 32),
            intermediate_layer_idx=(0, 1, 2, 3),
        )
        taps = {i: jnp.asarray(t) for i, t in enumerate(taps_np)}
        preds, conf = dpt_head(p, taps, (H, W), psi, cfg)
        # reference preds: (B, S, H, W, C-1) channels-last after activate_head
        np.testing.assert_allclose(np.asarray(preds), to_np(ref_preds), atol=5e-4)
        np.testing.assert_allclose(np.asarray(conf), to_np(ref_conf), atol=5e-4)


class TestPoseForward:
    def test_pose_only_matches_full(self, rng):
        """pose_forward == the pose part of the full forward."""
        import jax
        from self_supervise_sfm_tpu.models import sailrecon as SM

        cfg = SM.make_config(
            img_size=IMG, embed_dim=64, depth=4, num_heads=4, vit_depth=2,
            intermediate_layer_idx=(0, 1, 2, 3), attn_impl="dense",
        )
        p = SM.init_sailrecon(jax.random.PRNGKey(0), cfg)
        imgs = jnp.asarray(rng.uniform(size=(1, 3, IMG, IMG, 3)).astype(np.float32))
        key = jax.random.PRNGKey(2)
        full = SM.forward(p, cfg, imgs, num_anchor=2, num_query=1, rank=2,
                          subsample_key=key)
        ext, intr = SM.pose_forward(p, cfg, imgs, num_anchor=2, num_query=1,
                                    rank=2, subsample_key=key)
        np.testing.assert_allclose(np.asarray(ext), np.asarray(full["extrinsic"]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(intr), np.asarray(full["intrinsic"]),
                                   atol=1e-3)


class TestDuplicatedForward:
    def test_shared_vit_matches_plain(self, rng):
        """images_duplicated=True (ViT once per unique image) must match the
        plain forward on the duplicated stack to fp tolerance."""
        import jax
        from self_supervise_sfm_tpu.models import sailrecon as SM

        cfg = SM.make_config(
            img_size=IMG, embed_dim=64, depth=4, num_heads=4, vit_depth=2,
            intermediate_layer_idx=(0, 1, 2, 3), attn_impl="dense",
        )
        p = SM.init_sailrecon(jax.random.PRNGKey(0), cfg)
        uniq = rng.uniform(size=(1, 3, IMG, IMG, 3)).astype(np.float32)
        imgs = jnp.asarray(np.concatenate([uniq, uniq], axis=1))
        key = jax.random.PRNGKey(2)
        kw = dict(num_anchor=3, num_query=3, rank=2, subsample_key=key)
        a = SM.forward(p, cfg, imgs, **kw)
        b = SM.forward(p, cfg, imgs, images_duplicated=True, **kw)
        for name in ("extrinsic", "intrinsic", "depth_map", "point_map"):
            # rtol dominated by fp32 reduction-order noise amplified through
            # the exp-activated heads (random weights produce ~1e11 depths)
            np.testing.assert_allclose(
                np.asarray(a[name], np.float32), np.asarray(b[name], np.float32),
                rtol=2e-4, atol=1e-4, err_msg=name,
            )


class TestRelocChunked:
    def test_chunked_matches_batched(self, rng):
        """reloc_chunked (the memory_save equivalent) == batched reloc,
        including the Q % chunk != 0 padding path."""
        import jax
        from self_supervise_sfm_tpu.models import sailrecon as SM

        cfg = SM.make_config(
            img_size=IMG, embed_dim=64, depth=4, num_heads=4, vit_depth=2,
            intermediate_layer_idx=(0, 1, 2, 3), attn_impl="dense",
        )
        p = SM.init_sailrecon(jax.random.PRNGKey(0), cfg)
        anchors = jnp.asarray(rng.uniform(size=(1, 2, IMG, IMG, 3)).astype(np.float32))
        queries = jnp.asarray(rng.uniform(size=(1, 5, IMG, IMG, 3)).astype(np.float32))
        cache, cam_tok = SM.build_scene_cache(
            p, cfg, anchors, rank=2, subsample_key=jax.random.PRNGKey(2))
        full = SM.reloc(p, cfg, cache, cam_tok, queries)
        chunked = SM.reloc_chunked(p, cfg, cache, cam_tok, queries, chunk=2)
        assert set(chunked.keys()) == set(full.keys())
        for name in ("extrinsic", "intrinsic", "depth_map", "point_map",
                     "xyz_cnf", "xyz_conf_fractions"):
            np.testing.assert_allclose(
                np.asarray(chunked[name], np.float32),
                np.asarray(full[name], np.float32),
                rtol=2e-4, atol=1e-4, err_msg=name,
            )
