"""Beyond-one-chip scene scale: a 200-anchor scene, built and relocalized
with the context-sharded blocks, must match the single-device program.

SCENE_CAPACITY.json bounds one v5e chip at ~199 anchors (build) /
~195 cached anchors (reloc, packed cache) at flagship scale; growing past that is the "HBM-resident
scene, shard to grow" design claim (SURVEY §2.6). This test executes that
path at 200 anchors on an 8-device virtual mesh (tiny dims so CPU can run
it): frame blocks shard over data x context, the global-attention token
axis rides the shard_map ring, and reloc queries shard over devices against
the replicated compressed scene. tools/scene_sharded_probe.py adds the
flagship-dims AOT per-device memory budget (SCENE_SHARDED_r03.json).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_supervise_sfm_tpu.models import sailrecon as M
from self_supervise_sfm_tpu.parallel import sharding as Sh


ANCHORS = 200
QUERIES = 8
IMG = 28
RANK = 2


def tiny_cfg():
    return M.make_config(
        img_size=IMG, embed_dim=64, depth=4, num_heads=4, vit_depth=2,
        intermediate_layer_idx=(0, 1, 2, 3), attn_impl="dense",
        global_attn_impl="ring",
    )


def test_200_anchor_scene_sharded_matches_single(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = tiny_cfg()
    p = M.init_sailrecon(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(
        rng.uniform(size=(1, ANCHORS, IMG, IMG, 3)).astype(np.float32))
    queries = jnp.asarray(
        rng.uniform(size=(1, QUERIES, IMG, IMG, 3)).astype(np.float32))
    key = jax.random.PRNGKey(7)

    def build(p, imgs):
        return M.build_scene_cache(p, cfg, imgs, rank=RANK, subsample_key=key)

    def reloc(p, cache, cam_tok, imgs):
        return M.reloc(p, cfg, cache, cam_tok, imgs)

    # single device reference
    cache_ref, cam_ref = jax.jit(build)(p, anchors)
    preds_ref = jax.jit(reloc)(p, cache_ref, cam_ref, queries)

    # 8-device context-sharded program
    mesh = Sh.make_mesh(num_data=1, num_context=8)
    with Sh.activate_mesh(mesh):
        cache_sh, cam_sh = jax.jit(build)(p, anchors)
        preds_sh = jax.jit(reloc)(p, cache_sh, cam_sh, queries)

    np.testing.assert_allclose(np.asarray(cam_sh), np.asarray(cam_ref),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(cache_sh["kv"]),
                               np.asarray(cache_ref["kv"]), atol=2e-4)
    for k in ("extrinsic", "intrinsic", "depth_map", "point_map"):
        np.testing.assert_allclose(
            np.asarray(preds_sh[k]), np.asarray(preds_ref[k]),
            atol=5e-4, err_msg=k,
        )


def test_cache_layouts_match(rng):
    """All three cache storage layouts must produce identical reloc outputs
    — "packed" and "kv2" are pure relayouts of the raw per-head cache
    ("kv2" additionally consumed in place by the direct-HBM kernel on
    TPU; off-TPU every layout takes the dense reference path)."""
    import dataclasses

    def with_layout(layout):
        cfg = tiny_cfg()
        return dataclasses.replace(
            cfg,
            aggregator=dataclasses.replace(cfg.aggregator,
                                           cache_layout=layout),
        )

    cfg_h = with_layout("heads")
    p = M.init_sailrecon(jax.random.PRNGKey(0), cfg_h)
    anchors = jnp.asarray(
        rng.uniform(size=(1, 6, IMG, IMG, 3)).astype(np.float32))
    queries = jnp.asarray(
        rng.uniform(size=(1, 3, IMG, IMG, 3)).astype(np.float32))
    key = jax.random.PRNGKey(7)

    cache, cam = M.build_scene_cache(p, cfg_h, anchors, rank=RANK,
                                     subsample_key=key)
    preds = M.reloc(p, cfg_h, cache, cam, queries)

    D, B = cfg_h.aggregator.depth, 1
    Hh, dd = cfg_h.aggregator.num_heads, cfg_h.aggregator.head_dim
    N = cache["k"].shape[3]

    # packed: heads merged (depth, B, N, C)
    cfg_p = with_layout("packed")
    cache_p, cam_p = M.build_scene_cache(p, cfg_p, anchors, rank=RANK,
                                         subsample_key=key)
    assert cache_p["k"].shape == (D, B, N, Hh * dd)
    np.testing.assert_allclose(
        np.asarray(cache_p["k"]),
        np.asarray(cache["k"]).transpose(0, 1, 3, 2, 4).reshape(D, B, N, -1),
        atol=1e-6,
    )
    preds_p = M.reloc(p, cfg_p, cache_p, cam_p, queries)

    # kv2 (default): k/v interleaved on the lane axis (depth, B, H, N, 2d)
    cfg_kv = with_layout("kv2")
    cache_kv, cam_kv = M.build_scene_cache(p, cfg_kv, anchors, rank=RANK,
                                           subsample_key=key)
    assert cache_kv["kv"].shape == (D, B, Hh, N, 2 * dd)
    np.testing.assert_allclose(
        np.asarray(cache_kv["kv"]),
        np.concatenate([np.asarray(cache["k"]), np.asarray(cache["v"])],
                       axis=-1),
        atol=1e-6,
    )
    preds_kv = M.reloc(p, cfg_kv, cache_kv, cam_kv, queries)

    np.testing.assert_allclose(np.asarray(cam_p), np.asarray(cam), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam_kv), np.asarray(cam), atol=1e-6)
    for k in ("extrinsic", "intrinsic", "depth_map", "point_map"):
        np.testing.assert_allclose(
            np.asarray(preds_p[k]), np.asarray(preds[k]), atol=1e-5,
            err_msg=k,
        )
        np.testing.assert_allclose(
            np.asarray(preds_kv[k]), np.asarray(preds[k]), atol=1e-5,
            err_msg=k,
        )
