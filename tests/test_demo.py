"""End-to-end demo test: synthetic IMC scene -> reconstruction artifacts."""

import json
import os
import sys

import numpy as np
import pytest

from self_supervise_sfm_tpu.data.synthetic import make_synthetic_dataset


@pytest.mark.parametrize("mode,extra", [
    ("forward", []),
    ("reloc", []),
    ("reloc", ["--staged-cache", "2"]),  # host-staged cache serving path
    # anchor-chunked staged build (3 frames in chunks of 1): the capacity
    # configuration for scenes past the one-shot HBM bound
    ("reloc", ["--staged-cache", "2", "--build-chunk", "1"]),
])
def test_reconstruct_demo(tmp_path, monkeypatch, mode, extra):
    from self_supervise_sfm_tpu.demos import reconstruct as D
    from self_supervise_sfm_tpu.models import sailrecon as M

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, num_scenes=1, num_images=3, image_size=(40, 32))

    orig_make = M.make_config

    def tiny_make_config(**kw):
        kw.update(
            dict(img_size=28, embed_dim=64, depth=4, num_heads=4, vit_depth=2,
                 intermediate_layer_idx=(0, 1, 2, 3), attn_impl="dense")
        )
        return orig_make(**kw)

    monkeypatch.setattr(M, "make_config", tiny_make_config)
    out = str(tmp_path / "out")
    monkeypatch.setattr(
        sys, "argv",
        ["demo", "--data-root", root, "--out-dir", out, "--mode", mode,
         "--num-images", "3", "--img-size", "28", "--rank", "2",
         "--num-scenes", "1", "--compute-dtype", "float32"] + extra,
    )
    D.main()
    results = json.load(open(os.path.join(out, "results.json")))
    (name, entry), = results.items()
    assert "ate_rmse" in entry  # GT poses present in synthetic scenes
    scene_dir = os.path.join(out, name)
    assert os.path.exists(os.path.join(scene_dir, "pred.ply"))
    assert os.path.exists(os.path.join(scene_dir, "poses_kitti.txt"))


def test_pose_only_and_headless_configs(rng):
    """Config-gated paths: pose_forward with its default subsample_key at
    full rank (no PRNG needed — permutation-invariant), and a model built
    with enable_camera=False must run without the camera head (no
    unprojection output, which needs poses)."""
    import jax
    import jax.numpy as jnp

    from self_supervise_sfm_tpu.models import sailrecon as M

    cfg = M.make_config(img_size=28, embed_dim=64, depth=4, num_heads=4,
                        vit_depth=1, intermediate_layer_idx=(0, 1, 2, 3))
    params = jax.jit(lambda k: M.init_sailrecon(k, cfg))(jax.random.PRNGKey(0))
    images = jnp.asarray(rng.uniform(size=(1, 2, 28, 28, 3)).astype(np.float32))
    ext, intr = M.pose_forward(params, cfg, images, num_anchor=1, num_query=1)
    assert ext.shape == (1, 1, 3, 4) and intr.shape == (1, 1, 3, 3)
    assert np.isfinite(np.asarray(ext)).all()

    from dataclasses import replace

    cfg_nc = replace(cfg, enable_camera=False)
    params_nc = jax.jit(lambda k: M.init_sailrecon(k, cfg_nc))(
        jax.random.PRNGKey(1)
    )
    preds = M.forward(params_nc, cfg_nc, images, num_anchor=1, num_query=1,
                      rank=2, subsample_key=jax.random.PRNGKey(2))
    assert "extrinsic" not in preds and "depth_map" in preds
    assert "point_map_by_unprojection" not in preds
