"""Host-staged scene capacity: S_max for the staged build/reloc (VERDICT #1).

Two measurements on the real TPU chip at flagship scale (518px, rank 300):

1. **AOT memory analysis** of the staged programs (embed + run_segment for
   build and reloc) at increasing anchor counts -> per-anchor slope and
   S_max. The device never holds more than one segment's kv2 slice, so the
   cache term drops from 0.028 GB/anchor to 0.028/num_segments.
2. **Real execution past the one-shot bound**: a staged build at
   ``--validate-anchors`` (default 220 > the one-shot S_max 196,
   SCENE_CAPACITY.json) must complete on the chip, and a small-A staged
   build must match the resident build bit-for-bit-class.

Writes ``SCENE_STAGED_r05.json``.
Run:  python tools/scene_staged_capacity.py [--skip-validate]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax

os.makedirs(os.path.join(REPO, ".jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

HBM_GB = 15.75
IMG, RANK = 518, 300
SEGMENTS = 12  # depth 24 -> 2 layers per segment

t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:6.1f}s] {msg}", flush=True)


def mem_gb(compiled):
    ma = compiled.memory_analysis()
    return (ma.argument_size_in_bytes + ma.temp_size_in_bytes
            + ma.output_size_in_bytes - ma.alias_size_in_bytes) / 2**30


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--validate-anchors", type=int, default=220)
    ap.add_argument("--skip-validate", action="store_true")
    ap.add_argument("--anchor-chunk", type=int, default=8,
                    help="anchor-chunked build chunk size (0 disables the "
                         "chunked measurements)")
    ap.add_argument("--validate-anchors-chunked", type=int, default=0,
                    help="if >0, run a real chunked staged build at this "
                         "anchor count (pick > the unchunked staged S_max)")
    ap.add_argument("--skip-unchunked-mem", action="store_true",
                    help="skip the unchunked memory rows (reuse r05 numbers)")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "SCENE_STAGED_r05.json"))
    args = ap.parse_args()

    from self_supervise_sfm_tpu.models import sailrecon as M
    from self_supervise_sfm_tpu.models.aggregator import (
        staged_build_programs, staged_reloc_programs)

    assert jax.default_backend() == "tpu"
    cfg = M.make_config(compute_dtype="bfloat16", remat=False)
    acfg = cfg.aggregator
    params_sds = jax.eval_shape(
        lambda k: M.cast_trunk_weights(M.init_sailrecon(k, cfg), cfg),
        jax.random.PRNGKey(0),
    )
    agg_sds = params_sds["aggregator"]

    results = {
        "hbm_gb": HBM_GB, "img": IMG, "rank": RANK, "segments": SEGMENTS,
        "one_shot_baseline": "SCENE_CAPACITY.json (build 0.0712 GB/anchor, "
                             "S_max 196)",
        "staged_build": [], "staged_reloc": [],
    }
    if args.skip_unchunked_mem and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        for k in ("staged_build", "staged_build_fit", "equality_check",
                  "validate_big_build", "staged_build_chunked",
                  "staged_build_chunked_fit", "validate_big_build_chunked",
                  "validate_big_serve_chunked",
                  "equality_check_chunked_layers",
                  "equality_check_chunked_full"):
            if k in prev:
                results[k] = prev[k]

    P0 = (IMG // acfg.patch_size) ** 2
    R5 = RANK + acfg.patch_start_idx

    # ---- staged build: peak vs anchors -----------------------------------
    def build_mem_rows(anchor_chunk, anchor_counts):
        rows = []
        for A in anchor_counts:
            embed, run_segment, seg_len = staged_build_programs(
                acfg, 1, A, IMG, IMG, RANK, SEGMENTS,
                anchor_chunk=anchor_chunk)
            imgs = jax.ShapeDtypeStruct((1, A, IMG, IMG, 3), jnp.float32)
            key = jax.ShapeDtypeStruct((2,), jnp.uint32)
            ce = embed.lower(agg_sds, imgs, key).compile()
            tokens_sds, idx_sds = jax.eval_shape(
                lambda p, i, k: embed(p, i, k), agg_sds, imgs, key)
            cs = run_segment.lower(
                agg_sds, tokens_sds, idx_sds,
                jax.ShapeDtypeStruct((), jnp.int32)).compile()
            ge, gs = mem_gb(ce), mem_gb(cs)
            rows.append({"anchors": A, "embed_peak_gb": round(ge, 3),
                         "segment_peak_gb": round(gs, 3),
                         "peak_gb": round(max(ge, gs), 3)})
            log(f"staged build A={A} chunk={anchor_chunk}: "
                f"embed {ge:.2f} GB, segment {gs:.2f} GB")
        return rows

    def fit(rows, key_a="anchors"):
        As = np.array([r[key_a] for r in rows], np.float64)
        Gs = np.array([r["peak_gb"] for r in rows], np.float64)
        slope, icept = np.polyfit(As, Gs, 1)
        return {"gb_per_anchor": round(float(slope), 4),
                "base_gb": round(float(icept), 3),
                "s_max_anchors": int((HBM_GB - icept) / slope)}

    if not args.skip_unchunked_mem:
        results["staged_build"] = build_mem_rows(None, (8, 24, 48, 96))
        f = fit(results["staged_build"])
        results["staged_build_fit"] = {
            "gb_per_anchor": f["gb_per_anchor"], "base_gb": f["base_gb"],
            "s_max_anchors_build_staged": f["s_max_anchors"],
        }
        log(f"staged build: {f['gb_per_anchor']:.4f} GB/anchor "
            f"-> S_max ~ {f['s_max_anchors']}")

    if args.anchor_chunk > 0:
        # anchor-chunked build: per-layer transients scale with the chunk
        # (aggregator._build_layer_chunked), so the per-anchor slope drops to
        # the 5 resident token-buffers + one segment's kv2 slice
        G = args.anchor_chunk
        counts = [c for c in (24, 96, 192) if c % G == 0]
        results["staged_build_chunked"] = build_mem_rows(G, counts)
        f = fit(results["staged_build_chunked"])
        results["staged_build_chunked_fit"] = {
            "anchor_chunk": G,
            "gb_per_anchor": f["gb_per_anchor"], "base_gb": f["base_gb"],
            "s_max_anchors_build_chunked": f["s_max_anchors"],
        }
        log(f"chunked build (G={G}): {f['gb_per_anchor']:.4f} GB/anchor "
            f"-> S_max ~ {f['s_max_anchors']}")

    # ---- staged reloc: peak vs cached anchors ----------------------------
    Q = 4
    for A in (24, 96):
        embed, run_segment, seg_len = staged_reloc_programs(
            acfg, 1, Q, IMG, IMG, SEGMENTS)
        imgs = jax.ShapeDtypeStruct((1, Q, IMG, IMG, 3), jnp.float32)
        ce = embed.lower(agg_sds, imgs).compile()
        tokens_sds = jax.eval_shape(lambda p, i: embed(p, i), agg_sds, imgs)
        Ptok = P0 + acfg.patch_start_idx
        taps_sds = jax.ShapeDtypeStruct(
            (len(acfg.intermediate_layer_idx), 1, Q, Ptok,
             2 * acfg.embed_dim), jnp.float32)
        kv_sds = jax.ShapeDtypeStruct(
            (seg_len, 1, acfg.num_heads, A * R5, 2 * acfg.head_dim),
            jnp.bfloat16)
        cs = run_segment.lower(
            agg_sds, tokens_sds, taps_sds, kv_sds,
            jax.ShapeDtypeStruct((), jnp.int32)).compile()
        ge, gs = mem_gb(ce), mem_gb(cs)
        row = {"anchors_cached": A, "queries": Q,
               "embed_peak_gb": round(ge, 3),
               "segment_peak_gb": round(gs, 3),
               "peak_gb": round(max(ge, gs), 3)}
        log(f"staged reloc A={A} Q={Q}: segment {gs:.2f} GB")
        results["staged_reloc"].append(row)

    ra = [r["anchors_cached"] for r in results["staged_reloc"]]
    rp = [r["peak_gb"] for r in results["staged_reloc"]]
    rslope = (rp[-1] - rp[0]) / (ra[-1] - ra[0])
    rbase = rp[0] - rslope * ra[0]
    results["staged_reloc_fit"] = {
        "gb_per_cached_anchor": round(rslope, 5),
        "base_gb": round(rbase, 3),
        "s_max_anchors_reloc_staged": (
            int((HBM_GB - rbase) / rslope) if rslope > 1e-6 else None),
        "note": "host RAM holds the cache (0.0279 GB/anchor of host memory);"
                " the device slope is one segment's kv2 slice only",
    }
    log(f"staged reloc: {rslope:.5f} GB/anchor device slope")

    # ---- real execution past the one-shot bound --------------------------
    need_params = (not args.skip_validate) or (
        args.anchor_chunk > 0 or args.validate_anchors_chunked > 0)
    if need_params:
        key = jax.random.PRNGKey(0)
        params = jax.jit(
            lambda k: M.cast_trunk_weights(M.init_sailrecon(k, cfg), cfg)
        )(key)
        sk = jax.random.PRNGKey(7)

    if not args.skip_validate:
        # equality at small A: staged == resident on the chip
        A_eq = 6
        imgs = jax.random.uniform(
            jax.random.PRNGKey(1), (1, A_eq, IMG, IMG, 3), jnp.float32)
        cache_ref, cam_ref = jax.jit(
            lambda p, x: M.build_scene_cache(p, cfg, x, rank=RANK,
                                             subsample_key=sk)
        )(params, imgs)
        cache_st, cam_st = M.build_scene_cache_staged(
            params, cfg, imgs, rank=RANK, subsample_key=sk,
            num_segments=SEGMENTS)
        kv_err = float(np.max(np.abs(
            cache_st["kv"].astype(np.float32)
            - np.asarray(cache_ref["kv"]).astype(np.float32))))
        cam_err = float(np.max(np.abs(cam_st - np.asarray(cam_ref))))
        results["equality_check"] = {
            "anchors": A_eq, "max_abs_kv_diff": kv_err,
            "max_abs_cam_diff": cam_err, "ok": bool(kv_err < 1e-2
                                                    and cam_err < 1e-2),
        }
        log(f"equality A={A_eq}: kv diff {kv_err:.2e}, cam {cam_err:.2e}")
        del cache_ref, cache_st, imgs

        # the money demo: build a scene the one-shot path cannot
        A_big = args.validate_anchors
        imgs = jax.random.uniform(
            jax.random.PRNGKey(2), (1, A_big, IMG, IMG, 3), jnp.float32)
        tb = time.time()
        cache_big, cam_big = M.build_scene_cache_staged(
            params, cfg, imgs, rank=RANK, subsample_key=sk,
            num_segments=SEGMENTS)
        build_s = time.time() - tb
        host_gb = cache_big["kv"].nbytes / 2**30
        finite = bool(np.isfinite(
            cache_big["kv"][:, :, :, :64].astype(np.float32)).all())
        results["validate_big_build"] = {
            "anchors": A_big,
            "one_shot_s_max": 196,
            "completed": True,
            "host_cache_gb": round(host_gb, 2),
            "wall_seconds": round(build_s, 1),
            "cache_finite": finite,
            "note": "wall time includes streaming the cache through the "
                    "remote-TPU tunnel; on a directly-attached host this "
                    "is PCIe-rate",
        }
        log(f"staged build A={A_big}: OK in {build_s:.0f}s, host cache "
            f"{host_gb:.1f} GB (one-shot S_max was 196)")

    if args.anchor_chunk > 0:
        # chunked == resident equality ON THE CHIP, two configurations:
        # 1. layer-chunking only (unchunked embed): bit-exact — the kv-tile
        #    reduction order is independent of the q-axis partition;
        # 2. full chunked (embed too, the capacity configuration): the
        #    chunked ViT is a DIFFERENT XLA program (batch G vs A), so bf16
        #    scheduling deviations of the PARITY_BF16 class appear and are
        #    amplified through the 24 trunk layers — quantified here
        #    relative to the kv RMS.
        A_eq, G_eq = 6, 3
        imgs = jax.random.uniform(
            jax.random.PRNGKey(1), (1, A_eq, IMG, IMG, 3), jnp.float32)
        cache_ref, cam_ref = jax.jit(
            lambda p, x: M.build_scene_cache(p, cfg, x, rank=RANK,
                                             subsample_key=sk)
        )(params, imgs)
        kv_ref = np.asarray(cache_ref["kv"]).astype(np.float32)
        kv_rms = float(np.sqrt(np.mean(kv_ref**2)))

        def compare_caches(chunk_embed):
            cache_ch, cam_ch = M.build_scene_cache_staged(
                params, cfg, imgs, rank=RANK, subsample_key=sk,
                num_segments=SEGMENTS, anchor_chunk=G_eq,
                chunk_embed=chunk_embed)
            kv_err = float(np.max(np.abs(
                cache_ch["kv"].astype(np.float32) - kv_ref)))
            cam_err = float(np.max(np.abs(cam_ch - np.asarray(cam_ref))))
            return kv_err, cam_err, cache_ch, cam_ch

        kv_err, cam_err, _, _ = compare_caches(chunk_embed=False)
        results["equality_check_chunked_layers"] = {
            "anchors": A_eq, "anchor_chunk": G_eq, "chunk_embed": False,
            "max_abs_kv_diff": kv_err, "max_abs_cam_diff": cam_err,
            "ok": bool(kv_err == 0.0 and cam_err == 0.0),
        }
        log(f"chunked-layers equality A={A_eq} G={G_eq}: kv {kv_err:.2e}, "
            f"cam {cam_err:.2e}")
        kv_err, cam_err, cache_ch, cam_ch = compare_caches(chunk_embed=True)

        # pose-level impact of the chunked-embed drift: fast-reloc the same
        # frames against both caches, compare decoded extrinsics (the unit
        # PARITY_BF16_r04 speaks in: max rotation delta 0.069 deg there)
        host_ref = {"kv": np.asarray(cache_ref["kv"])}
        q_imgs = jnp.asarray(imgs[:, :3])
        pr = M.reloc_staged(params, cfg, host_ref, np.asarray(cam_ref),
                            q_imgs, num_segments=SEGMENTS, fast_reloc=True)
        pc = M.reloc_staged(params, cfg, cache_ch, cam_ch,
                            q_imgs, num_segments=SEGMENTS, fast_reloc=True)
        Er = np.asarray(pr["extrinsic"], np.float64)[0]
        Ec = np.asarray(pc["extrinsic"], np.float64)[0]
        rot_deg = []
        for i in range(Er.shape[0]):
            Rr, Rc = Er[i, :3, :3], Ec[i, :3, :3]
            cosang = (np.trace(Rr.T @ Rc) - 1.0) / 2.0
            rot_deg.append(float(np.degrees(
                np.arccos(np.clip(cosang, -1.0, 1.0)))))
        tra = float(np.max(np.abs(Er[:, :3, 3] - Ec[:, :3, 3])))
        results["equality_check_chunked_full"] = {
            "anchors": A_eq, "anchor_chunk": G_eq, "chunk_embed": True,
            "max_abs_kv_diff": kv_err, "kv_rms": round(kv_rms, 4),
            "max_abs_cam_diff": cam_err,
            "pose_max_rot_delta_deg": round(max(rot_deg), 4),
            "pose_max_tra_delta": round(tra, 5),
            "note": "chunked ViT = different XLA program (batch G vs A): "
                    "bf16 reduction-order deviation amplified by the trunk. "
                    "Pose deltas are fast-reloc of 3 frames against both "
                    "caches ON RANDOM INIT, where the untrained adaLN "
                    "camera head amplifies bf16-class input drift ~100x "
                    "(PARITY_BF16_r03: 8.3 deg random init vs 0.069 deg on "
                    "trained weights for the same perturbation class, "
                    "PARITY_BF16_r04); the drift source here is the same "
                    "class as that budget. chunk_embed=False restores bit-"
                    "equality at the cost of the embed peak scaling with "
                    "the scene",
        }
        log(f"chunked-full equality A={A_eq} G={G_eq}: kv {kv_err:.2e} "
            f"(rms {kv_rms:.2f}), cam {cam_err:.2e}, "
            f"pose rot {max(rot_deg):.4f} deg, tra {tra:.2e}")
        del cache_ref, cache_ch, host_ref, imgs

    if args.validate_anchors_chunked > 0:
        A_big = args.validate_anchors_chunked
        G = args.anchor_chunk if args.anchor_chunk > 0 else 8
        assert A_big % G == 0
        # host-resident images: a caller-held DEVICE copy (1.26 GB at A=400)
        # would stay live through every run_segment dispatch without being
        # part of the segment program's memory analysis — passing numpy means
        # the upload exists only for the embed call
        imgs = np.random.default_rng(2).random(
            (1, A_big, IMG, IMG, 3), dtype=np.float32)
        tb = time.time()
        cache_big, cam_big = M.build_scene_cache_staged(
            params, cfg, imgs, rank=RANK, subsample_key=sk,
            num_segments=SEGMENTS, anchor_chunk=G)
        build_s = time.time() - tb
        host_gb = cache_big["kv"].nbytes / 2**30
        finite = bool(np.isfinite(
            cache_big["kv"][:, :, :, :64].astype(np.float32)).all())
        results["validate_big_build_chunked"] = {
            "anchors": A_big, "anchor_chunk": G,
            "unchunked_staged_s_max": 326,
            "completed": True,
            "host_cache_gb": round(host_gb, 2),
            "wall_seconds": round(build_s, 1),
            "cache_finite": finite,
        }
        log(f"chunked staged build A={A_big} G={G}: OK in {build_s:.0f}s, "
            f"host cache {host_gb:.1f} GB")

        # ... and SERVE it: full-head staged reloc of 4 query frames against
        # the freshly built scene — the complete serving round-trip at a
        # scene size no single-chip resident path can hold
        q_imgs = jnp.asarray(imgs[:, :4])
        tr = time.time()
        preds = M.reloc_staged(params, cfg, cache_big, cam_big, q_imgs,
                               num_segments=SEGMENTS)
        ex = np.asarray(preds["extrinsic"])
        serve_s = time.time() - tr
        results["validate_big_serve_chunked"] = {
            "anchors_cached": A_big, "queries": 4,
            "completed": True,
            "wall_seconds": round(serve_s, 1),
            "extrinsics_finite": bool(np.isfinite(ex).all()),
            "depth_finite": bool(np.isfinite(
                np.asarray(preds["depth_map"])).all()),
            "note": "first call includes compile + per-segment host->device "
                    "cache upload through the remote tunnel",
        }
        log(f"staged reloc vs {A_big}-anchor host cache: OK in "
            f"{serve_s:.0f}s, extrinsics finite={np.isfinite(ex).all()}")

    results["wall_seconds"] = round(time.time() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
