"""End-to-end demo test: synthetic IMC scene -> reconstruction artifacts."""

import json
import os
import sys

import numpy as np
import pytest

from self_supervise_sfm_tpu.data.synthetic import make_synthetic_dataset


@pytest.mark.parametrize("mode", ["forward", "reloc"])
def test_reconstruct_demo(tmp_path, monkeypatch, mode):
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
         "--num-scenes", "1", "--compute-dtype", "float32"],
    )
    D.main()
    results = json.load(open(os.path.join(out, "results.json")))
    (name, entry), = results.items()
    assert "ate_rmse" in entry  # GT poses present in synthetic scenes
    scene_dir = os.path.join(out, name)
    assert os.path.exists(os.path.join(scene_dir, "pred.ply"))
    assert os.path.exists(os.path.join(scene_dir, "poses_kitti.txt"))
