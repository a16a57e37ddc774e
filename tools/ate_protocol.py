"""Recorded ATE protocol: reference demo vs framework demo on one scene.

BASELINE.md's north-star metric is "ATE within the reference reconstruction's
bound on IMC scenes". No IMC data or pretrained checkpoint exists in this
environment (the published ``sailrecon.pt`` is not fetchable — zero egress),
so this protocol fixes everything BUT the weights:

- one synthetic IMC-format fixture scene with exact GT poses
  (``data/synthetic.py``), loaded through the same 518px preprocessing;
- the SAME random-init flagship weights in both frameworks
  (torch init -> ``convert_sailrecon``), fp32 CPU both sides;
- the reference demo's inference protocol (all frames duplicated as
  anchors + queries, fix_rank=300 — ``train/demo_imc_forward.py:76-101``);
- ``utils/evaluation.absolute_trajectory_error`` (Sim(3)-aligned) for both.

Reported: ATE vs GT for each framework (diagnostic only — random weights
predict geometry-free poses) and the CROSS error between the two predicted
trajectories, which with identical weights must be ~0: that is the claim
"our demo pipeline computes the same poses and the same metric as the
reference's". Writes ``ATE.json``. Run:  python tools/ate_protocol.py
"""

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"
if REPO not in sys.path:
    sys.path.insert(0, REPO)
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import torch

torch.Tensor.cuda = lambda self, *a, **k: self  # CPU-only torch

from self_supervise_sfm_tpu.data.imc2021 import IMC2021Scenes
from self_supervise_sfm_tpu.data.synthetic import make_synthetic_dataset
from self_supervise_sfm_tpu.models import sailrecon as SM
from self_supervise_sfm_tpu.utils import converter as C
from self_supervise_sfm_tpu.utils.evaluation import (
    absolute_trajectory_error, pose_auc, relative_rotation_angles_deg,
)

IMG, RANK, FRAMES = 518, 300, 3

t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)


def main():
    from sailrecon.models.sail_recon import SailRecon

    results = {"config": {
        "img_size": IMG, "rank": RANK, "frames": FRAMES, "dtype": "float32",
        "weights": "random torch init (seed 3), converted via convert_sailrecon",
        "scene": "synthetic IMC-format fixture (data/synthetic.py, seed 0)",
    }}

    log("building fixture scene + loading through 518px preprocessing...")
    with tempfile.TemporaryDirectory() as root:
        make_synthetic_dataset(root, num_scenes=1, num_images=FRAMES,
                               image_size=(640, 480))
        ds = IMC2021Scenes(root, sample_num=64, num_images=FRAMES,
                           target_size=IMG)
        scene = ds.load_scene(0, np.random.default_rng(0))
    imgs = scene["images"]  # (S, 518, 518, 3) float
    gt_w2c = scene["poses_w2c_gt"][:, :3]  # (S, 3, 4)

    log("building reference SailRecon (flagship, random init seed 3)...")
    torch.manual_seed(3)
    ref = SailRecon(img_size=IMG, patch_size=14, embed_dim=1024).eval()

    # reference demo protocol: duplicate frames, all anchors + all queries.
    # Subsampling RNG synchronised by replaying the torch Generator draws
    # into our subsample_indices (the tools/flagship_parity.py protocol), so
    # both frameworks see identical scene-token subsets.
    from tools.flagship_parity import replay_indices

    idx = replay_indices(ref.aggregator.generator, 24, 1, FRAMES,
                         (IMG // 14) ** 2, RANK)
    timgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2).astype(np.float32))
    dup = torch.cat([timgs, timgs], dim=0)
    log("running reference demo forward (torch CPU fp32)...")
    with torch.no_grad():
        preds = ref(dup, list(range(FRAMES)),
                    list(range(FRAMES, 2 * FRAMES)), fix_rank=RANK)
    ref_w2c = np.stack(
        [p["extrinsic"][0].numpy() for p in preds])  # (S, 3, 4)
    log("reference forward done")

    log("converting weights + running framework forward (jit, CPU fp32)...")
    sd = C.torch_module_to_state_dict(ref)
    del ref
    params = C.convert_sailrecon(sd, depth=24, vit_depth=24)
    del sd
    cfg = SM.make_config(attn_impl="dense", global_attn_impl="dense")
    jimgs = jnp.asarray(imgs[None])  # (1, S, H, W, 3)
    dup_j = jnp.concatenate([jimgs, jimgs], axis=1)
    fwd = jax.jit(
        lambda p, x, i: SM.forward(
            p, cfg, x, num_anchor=FRAMES, num_query=FRAMES, rank=RANK,
            subsample_indices=i, images_duplicated=True,
        )
    )
    ours = jax.block_until_ready(fwd(params, dup_j, jnp.asarray(idx)))
    ours_w2c = np.asarray(ours["extrinsic"][0], np.float64)  # (S, 3, 4)
    log("framework forward done")

    results["ours_vs_gt"] = absolute_trajectory_error(ours_w2c, gt_w2c)
    results["reference_vs_gt"] = absolute_trajectory_error(ref_w2c, gt_w2c)
    results["cross_ours_vs_reference"] = absolute_trajectory_error(
        ours_w2c, ref_w2c)
    rot_err = relative_rotation_angles_deg(ours_w2c, ref_w2c)
    results["cross_rel_rotation_deg"] = {
        "mean": float(np.mean(rot_err)), "max": float(np.max(rot_err)),
    }
    results["cross_pose_auc"] = pose_auc(np.asarray(rot_err))
    results["note"] = (
        "random weights: vs-GT numbers are protocol diagnostics, not "
        "reconstruction quality; the parity claim is the cross-framework "
        "agreement under identical weights"
    )
    results["wall_seconds"] = round(time.time() - t0, 1)

    out_path = os.path.join(REPO, "ATE.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {out_path}")
    log(json.dumps({k: v for k, v in results.items() if "vs" in k or "cross" in k}))


if __name__ == "__main__":
    main()
