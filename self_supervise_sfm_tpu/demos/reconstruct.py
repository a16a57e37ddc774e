"""Demo: feed-forward scene reconstruction on IMC scenes.

Equivalent of ``train/demo_imc_forward.py`` (single-pass) and
``train/demo_imc.py`` (two-phase scene-cache + batched relocalisation), with
the artifact outputs the reference intended (PLY point cloud + KITTI poses)
plus ATE against ground-truth poses when the scene carries them.

``--tracks-ba`` additionally runs the reference's dormant downstream path
(SURVEY §3.4: ``predict_tracks`` -> pycolmap BA): keypoint tracks across the
scene, DLT triangulation seeded by the predicted poses/intrinsics, bundle
adjustment, and a COLMAP sparse model export (text + binary) consumable by
the COLMAP ecosystem.

Usage:
  python -m self_supervise_sfm_tpu.demos.reconstruct --data-root <imc_root> \\
      [--mode forward|reloc] [--num-images 5] [--pretrained sailrecon.pt] \\
      [--tracks-ba] [--tracker-weights vggsfm.pt]
"""

from __future__ import annotations

import argparse
import json
import os
import time

# honour host-platform (CPU) runs under the axon TPU plugin, which ignores a
# bare JAX_PLATFORMS=cpu env var (same guard as train/trainer.py)
if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from ..data.imc2021 import IMC2021Scenes
from ..models import sailrecon as M
from ..utils import export as EX
from ..utils.evaluation import absolute_trajectory_error


def load_params(cfg, pretrained: str, key, orbax_checkpoint: str = ""):
    if pretrained:
        from ..utils import converter as C

        sd = C.load_torch_state_dict(pretrained)
        return C.convert_sailrecon(sd)
    if orbax_checkpoint:
        # in-framework trained weights (the trainer's checkpoint dir) — the
        # training loop's output is directly servable by the demo
        from ..train.checkpoint import CheckpointManager

        state = CheckpointManager(orbax_checkpoint).restore()
        assert state is not None, f"no checkpoint under {orbax_checkpoint}"
        print(f"loaded trained params (step {int(state['step'])}) "
              f"from {orbax_checkpoint}")
        params = state["params"]
        # cross-resolution serving: a checkpoint trained at a different
        # img_size carries a pos embed for that grid — resample it to this
        # demo's grid (mirrors trainer.run's --init-params-from hand-off)
        from ..layers.vit import resample_pos_embed

        pe = params["aggregator"]["vit"]["pos_embed"]
        target_grid = cfg.img_size // cfg.aggregator.patch_size
        if pe.shape[1] != target_grid * target_grid + 1:
            print(f"resampling ViT pos embed {pe.shape[1] - 1} -> "
                  f"{target_grid * target_grid} patch tokens")
            params["aggregator"]["vit"]["pos_embed"] = jax.jit(
                resample_pos_embed, static_argnums=1)(pe, target_grid)
        return params
    print("WARNING: no --pretrained checkpoint; using random weights")
    return M.init_sailrecon(key, cfg)


def reconstruct_scene(params, cfg, images_np, mode: str, rank: int, key,
                      chunk: int = 0, staged_segments: int = 0,
                      build_chunk: int = 0):
    """images_np: (S, H, W, 3). Returns host predictions dict for S views.

    ``chunk`` > 0 relocalises in fixed-size query chunks (``reloc_chunked``,
    the reference's ``memory_save``) — bounds peak memory for large scenes.
    ``staged_segments`` > 0 switches to the host-staged cache (build streams
    the kv2 cache to host RAM one layer-segment at a time; reloc re-uploads
    per segment) — scene size bounded by host RAM, the reference's
    CPU-offload equivalent (``sailrecon/layers/attention.py:92-97``).
    ``build_chunk`` > 0 additionally chunks the build's anchor axis so
    per-layer transients scale with the chunk, not the scene
    (``aggregator._build_layer_chunked``; must divide the frame count).
    """
    images = jnp.asarray(images_np)[None]  # (1, S, H, W, 3)
    S = images.shape[1]
    if mode != "forward" and staged_segments > 0:
        cache, cam_tok = M.build_scene_cache_staged(
            params, cfg, images, rank=rank, subsample_key=key,
            num_segments=staged_segments,
            anchor_chunk=build_chunk if build_chunk > 0 else None,
        )
        preds = M.reloc_staged(params, cfg, cache, cam_tok, images,
                               num_segments=staged_segments)
        return jax.device_get(preds)
    if mode == "forward":
        # single pass: duplicate frames into anchors + queries
        # (prepare-model-input semantics, demo_imc_forward.py:76-101)
        dup = jnp.concatenate([images, images], axis=1)
        fwd = jax.jit(
            lambda p, x, k: M.forward(
                p, cfg, x, num_anchor=S, num_query=S, rank=rank, subsample_key=k
            )
        )
        preds = fwd(params, dup, key)
    else:
        # two-phase: build the scene cache from all frames, then localise all
        # frames against it in ONE batched call (vs the reference's
        # sequential loop, demo_imc.py:97-107)
        build = jax.jit(
            lambda p, x, k: M.build_scene_cache(p, cfg, x, rank=rank, subsample_key=k)
        )
        cache, cam_tok = build(params, images, key)
        if chunk > 0:
            rel = jax.jit(
                lambda p, c, t, x: M.reloc_chunked(p, cfg, c, t, x, chunk=chunk)
            )
        else:
            rel = jax.jit(lambda p, c, t, x: M.reloc(p, cfg, c, t, x))
        preds = rel(params, cache, cam_tok, images)
    return jax.device_get(preds)


def track_and_bundle_adjust(scene, preds, args, out_dir: str):
    """The dormant downstream path (SURVEY §3.4): track keypoints across the
    scene, triangulate with the predicted poses/intrinsics as the initial
    geometry, bundle-adjust, export a COLMAP sparse model (text + binary)."""
    from ..pipeline import tracking as T
    from ..pipeline.vggsfm_tracker import VGGSfMTrackerConfig, init_vggsfm_tracker

    tcfg = VGGSfMTrackerConfig()
    if args.tracker_weights:
        from ..utils import converter as C

        tp = C.convert_vggsfm_tracker(
            C.load_torch_state_dict(args.tracker_weights)
        )
    else:
        print("WARNING: no --tracker-weights; using random tracker weights")
        # jitted init: one dispatch instead of one per leaf (CLAUDE.md —
        # un-jitted init takes minutes through the remote-TPU tunnel)
        tp = jax.jit(lambda k: init_vggsfm_tracker(k, tcfg))(
            jax.random.PRNGKey(2)
        )

    out = T.predict_tracks(
        tp, scene["images"], query_frame_num=min(3, scene["images"].shape[0]),
        max_query_pts=args.max_query_pts, tracker_cfg=tcfg,
        fine_tracking=args.fine_tracking,
    )
    if out is None:
        print("  tracks-ba: no keypoints found, skipping")
        return None
    tracks, vis, _ = out
    H, W = scene["images"].shape[1:3]
    rec = T.tracks_to_reconstruction(
        tracks, vis, np.asarray(preds["extrinsic"][0], np.float32),
        np.asarray(preds["intrinsic"][0], np.float32), image_size=(W, H),
        run_ba=True, use_native_ba=args.ba_engine == "native",
    )
    if rec is None:
        print("  tracks-ba: no valid tracks survived gating, skipping")
        return None
    from ..utils.colmap_io import reconstruction_to_batch_matrix

    rec.write_text(os.path.join(out_dir, "sparse_txt"))
    rec.write_binary(os.path.join(out_dir, "sparse"))
    _, ba_ext, _ = reconstruction_to_batch_matrix(rec)
    EX.save_kitti_poses(ba_ext, os.path.join(out_dir, "poses_kitti_ba.txt"))
    return {
        "ba_points": len(rec.points3d),
        "ba_tracks": int(sum(len(p.track) for p in rec.points3d.values())),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--out-dir", default="demo_out")
    ap.add_argument("--mode", choices=["forward", "reloc"], default="forward")
    ap.add_argument("--num-images", type=int, default=5)
    ap.add_argument("--img-size", type=int, default=518)
    ap.add_argument("--rank", type=int, default=300)
    ap.add_argument("--chunk", type=int, default=0,
                    help="reloc-mode query chunk size (0 = one batched "
                         "call); the reference's memory_save equivalent")
    ap.add_argument("--staged-cache", type=int, default=0,
                    help="reloc-mode: host-staged cache in N layer segments "
                         "(0 = HBM-resident) — scene size bounded by host "
                         "RAM, the reference's CPU-offload equivalent")
    ap.add_argument("--build-chunk", type=int, default=0,
                    help="with --staged-cache: anchor-chunked build (chunk "
                         "size, must divide the frame count) — per-layer "
                         "transients scale with the chunk, not the scene")
    ap.add_argument("--num-scenes", type=int, default=3)
    ap.add_argument("--pretrained", default="")
    ap.add_argument("--orbax-checkpoint", default="",
                    help="orbax checkpoint dir from the in-framework "
                         "trainer (use --depth/--vit-depth to match the "
                         "trained shape)")
    ap.add_argument("--depth", type=int, default=24)
    ap.add_argument("--vit-depth", type=int, default=24)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--tracks-ba", action="store_true",
                    help="also run track prediction + bundle adjustment and "
                         "export a COLMAP sparse model")
    ap.add_argument("--tracker-weights", default="",
                    help="torch VGGSfM tracker checkpoint for --tracks-ba")
    ap.add_argument("--ba-engine", choices=["jax", "native"], default="jax")
    ap.add_argument("--max-query-pts", type=int, default=2048)
    ap.add_argument("--fine-tracking", action="store_true", default=True)
    ap.add_argument("--no-fine-tracking", dest="fine_tracking",
                    action="store_false")
    args = ap.parse_args()

    model_kw = {}
    if args.depth != 24:
        # trainer-style tap spread for non-flagship depths (trainer.py)
        model_kw["intermediate_layer_idx"] = tuple(
            round((i + 1) * args.depth / 4) - 1 for i in range(4))
    cfg = M.make_config(img_size=args.img_size,
                        compute_dtype=args.compute_dtype,
                        depth=args.depth, vit_depth=args.vit_depth,
                        **model_kw)
    key = jax.random.PRNGKey(0)
    params = load_params(cfg, args.pretrained, key,
                         orbax_checkpoint=args.orbax_checkpoint)

    ds = IMC2021Scenes(
        args.data_root, sample_num=16, num_images=args.num_images,
        target_size=args.img_size,
    )
    rng = np.random.default_rng(0)
    results = {}
    for si in range(min(args.num_scenes, len(ds))):
        scene = ds.load_scene(si, rng)
        name = scene["scene_name"]
        out_dir = os.path.join(args.out_dir, name)
        os.makedirs(out_dir, exist_ok=True)
        t0 = time.perf_counter()
        preds = reconstruct_scene(
            params, cfg, scene["images"], args.mode, args.rank,
            jax.random.fold_in(key, si), chunk=args.chunk,
            staged_segments=args.staged_cache,
            build_chunk=args.build_chunk,
        )
        dt = time.perf_counter() - t0
        S = scene["images"].shape[0]
        per_view = [
            {
                "point_map": preds["point_map"][0, i],
                "xyz_cnf": preds["xyz_cnf"][0, i],
                "images": scene["images"][i],
            }
            for i in range(S)
        ]
        EX.save_pointcloud_ply(per_view, os.path.join(out_dir, "pred.ply"))
        EX.save_kitti_poses(
            preds["extrinsic"][0], os.path.join(out_dir, "poses_kitti.txt")
        )
        entry = {"seconds": round(dt, 2), "frames": S}
        if "poses_w2c_gt" in scene:
            entry.update(
                absolute_trajectory_error(
                    preds["extrinsic"][0], scene["poses_w2c_gt"][:, :3]
                )
            )
        if args.tracks_ba:
            ba = track_and_bundle_adjust(scene, preds, args, out_dir)
            if ba:
                entry.update(ba)
        results[name] = entry
        print(name, entry, flush=True)
    with open(os.path.join(args.out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
