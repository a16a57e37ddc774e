"""Flagship bf16-TPU vs fp32 deviation budget (production-path parity).

PARITY_FLAGSHIP.json proves fp32 math parity vs the torch reference;
the production inference path is bf16-trunk-on-TPU (the reference's AMP
boundary, ``sail_recon.py:119``: bf16 autocast trunk, fp32 heads). This
records what bf16 actually costs at flagship scale: identical weights and
inputs through

- fp32 CPU  ``forward`` + ``build_scene_cache``/``reloc`` (the parity-proven
  configuration), and
- bf16 trunk on the real TPU (the benched configuration, Pallas kernels),

reporting per-output deltas in physical terms — rotation degrees,
translation relative error, FoV degrees, depth/point relative error,
confidence abs. Writes ``PARITY_BF16_r03.json``.

Run in two phases (the TPU plugin claims the backend at init, so fp32-CPU
and bf16-TPU cannot share a process):

    python tools/bf16_parity.py cpu   # writes /tmp/bf16_parity_ref_<tag>.npz
    python tools/bf16_parity.py tpu   # reads it, writes PARITY_BF16_<tag>.json

Trained-weights mode (VERDICT r3 #5 — the r03 budget rests on random init,
whose adaLN refinement Jacobian amplifies trunk noise arbitrarily; the
"trained heads contract" claim must be measured on a trained checkpoint):

    python tools/bf16_parity.py cpu --tag r04 --depth 12 --vit-depth 12 \
        --checkpoint artifacts/train_conv_r04b/checkpoints \
        --scene-root artifacts/scenes518_r04
    python tools/bf16_parity.py tpu  [same flags]
    python tools/bf16_parity.py tpu32 [same flags]   # fp32-TPU control
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

ap = argparse.ArgumentParser()
ap.add_argument("mode", nargs="?", default="cpu", choices=["cpu", "tpu", "tpu32"])
ap.add_argument("--tag", default="r03")
ap.add_argument("--checkpoint", default="",
                help="orbax checkpoint dir: use trained params instead of random init")
ap.add_argument("--scene-root", default="",
                help="dataset root: draw eval images from scene 0 (in-distribution) "
                     "instead of uniform noise")
ap.add_argument("--depth", type=int, default=24)
ap.add_argument("--vit-depth", type=int, default=24)
ARGS = ap.parse_args()
MODE = ARGS.mode
REF_NPZ = f"/tmp/bf16_parity_ref_{ARGS.tag}.npz"

import jax

if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")
else:
    os.makedirs(os.path.join(REPO, ".jax_cache"), exist_ok=True)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from self_supervise_sfm_tpu.models import sailrecon as M

IMG = 518
A, Q = 2, 1
RANK = 300
KEYS = ("extrinsic", "intrinsic", "depth_map", "dpt_cnf", "point_map",
        "xyz_cnf", "point_map_by_unprojection", "cam_tokens")

t0 = time.time()


def log(m):
    print(f"[{time.time() - t0:6.1f}s] {m}", flush=True)


def make_config(compute_dtype):
    # fp32 flash blocks exceed the 16 MB scoped-VMEM cap (the kernels are
    # built for the bf16 production path); the fp32-TPU control runs dense
    # XLA attention instead
    attn = "dense" if compute_dtype == "float32" else "auto"
    kw = {}
    if ARGS.depth != 24:
        # mirror the trainer's tap spread (trainer.py model_kw)
        kw["intermediate_layer_idx"] = tuple(
            round((i + 1) * ARGS.depth / 4) - 1 for i in range(4))
    return M.make_config(compute_dtype=compute_dtype, attn_impl=attn,
                         global_attn_impl=attn, depth=ARGS.depth,
                         vit_depth=ARGS.vit_depth, **kw)


def load_params(cfg):
    if ARGS.checkpoint:
        from self_supervise_sfm_tpu.train.checkpoint import CheckpointManager

        state = CheckpointManager(ARGS.checkpoint).restore()
        assert state is not None, f"no checkpoint under {ARGS.checkpoint}"
        log(f"loaded trained params (step {int(state['step'])}) "
            f"from {ARGS.checkpoint}")
        params = jax.device_put(state["params"])
        return int(state["step"]), jax.jit(
            lambda p: M.cast_trunk_weights(p, cfg))(params)
    return None, jax.jit(
        lambda k: M.cast_trunk_weights(M.init_sailrecon(k, cfg), cfg)
    )(jax.random.PRNGKey(0))


def load_images():
    """(anchor, query) image batches — scene frames when --scene-root."""
    rng = np.random.default_rng(0)
    if ARGS.scene_root:
        from self_supervise_sfm_tpu.data.imc2021 import IMC2021Scenes

        ds = IMC2021Scenes(ARGS.scene_root, sample_num=8, num_images=A + Q,
                           target_size=IMG, use_native=False)
        sc = ds.load_scene(0, np.random.default_rng(0))
        imgs = np.asarray(sc["images"], np.float32)
        return imgs[None, :A], imgs[None, A:A + Q]
    return (rng.uniform(size=(1, A, IMG, IMG, 3)).astype(np.float32),
            rng.uniform(size=(1, Q, IMG, IMG, 3)).astype(np.float32))


def run(compute_dtype):
    cfg = make_config(compute_dtype)
    _, params = load_params(cfg)
    uniq, query = load_images()
    imgs_fwd = jnp.asarray(np.concatenate([uniq, uniq], axis=1))
    key = jax.random.PRNGKey(1)

    log(f"{compute_dtype}: joint forward (A={A} dup)...")
    fwd = jax.jit(lambda p, x, k: M.forward(
        p, cfg, x, num_anchor=A, num_query=A, rank=RANK, subsample_key=k,
        images_duplicated=True))(params, imgs_fwd, key)
    fwd = {k: np.asarray(v, np.float32) for k, v in fwd.items() if k in KEYS}

    log(f"{compute_dtype}: cache build + reloc...")
    uimgs = jnp.asarray(uniq)
    qimgs = jnp.asarray(query)
    cache, cam_tok = jax.jit(lambda p, x, k: M.build_scene_cache(
        p, cfg, x, rank=RANK, subsample_key=k))(params, uimgs, key)
    rel = jax.jit(lambda p, c, ct, x: M.reloc(p, cfg, c, ct, x))(
        params, cache, cam_tok, qimgs)
    rel = {k: np.asarray(v, np.float32) for k, v in rel.items() if k in KEYS}
    return fwd, rel


def rot_deg(Ra, Rb):
    """Geodesic angle (deg) between rotation blocks (..., 3, 3)."""
    M_ = np.einsum("...ij,...kj->...ik", Ra, Rb)
    tr = np.clip((np.trace(M_, axis1=-2, axis2=-1) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(tr))


def budget(name, a, b):
    """Physical-units deviation of bf16 output ``a`` vs fp32 ``b``.

    Entries non-finite in EITHER model are excluded (same protocol as
    PARITY_FLAGSHIP.json: random-init ``exp``/``inv_log`` head activations
    overflow at flagship scale regardless of dtype)."""
    fin = np.isfinite(a) & np.isfinite(b)
    out = {"finite_frac": float(fin.mean())}
    if name in ("extrinsic", "intrinsic"):
        # per-matrix stats need whole matrices: drop any CAMERA with a
        # non-finite entry in either model (same exclusion protocol, at
        # camera granularity)
        cam_ok = fin.reshape(fin.shape[:-2] + (-1,)).all(-1)
        a, b = a[cam_ok], b[cam_ok]
        if a.size == 0:
            out["no_finite_cameras"] = True
            return out
    if name == "extrinsic":
        r = rot_deg(a[..., :3], b[..., :3])
        out["rotation_deg_max"] = float(r.max())
        out["rotation_deg_mean"] = float(r.mean())
        t_a, t_b = a[..., 3], b[..., 3]
        out["translation_rel_max"] = float(
            (np.abs(t_a - t_b) / (np.abs(t_b).max() + 1e-12)).max())
    elif name == "intrinsic":
        fo = np.stack([b[..., 0, 0], b[..., 1, 1]], -1)
        fn = np.stack([a[..., 0, 0], a[..., 1, 1]], -1)
        # focal -> field-of-view angle error in degrees
        fov_a = 2 * np.degrees(np.arctan(IMG / (2 * fn)))
        fov_b = 2 * np.degrees(np.arctan(IMG / (2 * fo)))
        out["fov_deg_max"] = float(np.abs(fov_a - fov_b).max())
        out["principal_px_max"] = float(
            np.abs(a[..., :2, 2] - b[..., :2, 2]).max())
    elif name == "cam_tokens":
        af, bf = a[fin], b[fin]
        scale = np.abs(bf).mean() + 1e-12
        out["rel_err_mean"] = float(np.abs(af - bf).mean() / scale)
        out["rel_err_p99"] = float(
            np.percentile(np.abs(af - bf), 99) / scale)
    elif name in ("depth_map", "point_map", "point_map_by_unprojection"):
        # random-init exp/inv_log head outputs span e^{+-100}: linear-space
        # stats overflow fp32 aggregates and mean nothing. Compare in the
        # activation's log domain — |delta log| IS the relative error of the
        # linear quantity in nats.
        la = np.sign(a[fin]) * np.log1p(np.abs(a[fin]).astype(np.float64))
        lb = np.sign(b[fin]) * np.log1p(np.abs(b[fin]).astype(np.float64))
        out["log_abs_err_mean"] = float(np.abs(la - lb).mean())
        out["log_abs_err_p99"] = float(np.percentile(np.abs(la - lb), 99))
    else:  # expp1 confidences, similarly exp-scaled at random init
        la = np.log1p(np.abs(a[fin]).astype(np.float64))
        lb = np.log1p(np.abs(b[fin]).astype(np.float64))
        out["log_abs_err_mean"] = float(np.abs(la - lb).mean())
        out["log_abs_err_max"] = float(np.abs(la - lb).max())
    return out


def main():
    if MODE == "cpu":
        fwd, rel = run("float32")
        np.savez(REF_NPZ, **{f"fwd_{k}": v for k, v in fwd.items()},
                 **{f"rel_{k}": v for k, v in rel.items()})
        log(f"fp32 reference written to {REF_NPZ}")
        return
    ref = np.load(REF_NPZ)
    dtype = "float32" if MODE == "tpu32" else "bfloat16"
    fwd, rel = run(dtype)
    note = (
        "Random weights (no pretrained checkpoint is fetchable in this "
        "env): cam_tokens is the budget that transfers — it is the bf16 "
        "trunk's actual output (heads run fp32 in BOTH configs, the "
        "reference's AMP boundary). The pose/FoV deltas additionally "
        "pass through 4 chaotic adaLN refinement iterations whose "
        "random-init Jacobian amplifies trunk noise arbitrarily; with "
        "trained weights the head contracts toward the data manifold "
        "instead."
    ) if not ARGS.checkpoint else (
        "Trained weights (the 518px corner_rand curriculum checkpoint) on "
        "in-distribution scene frames — the direct test of the r03 "
        "'trained heads contract trunk noise' claim. Heads run fp32 in "
        "both configs (the reference's AMP boundary); deltas here are what "
        "bf16 costs on the production serving path."
    )
    out = {
        "config": {"img": IMG, "anchors": A, "queries": Q, "rank": RANK,
                   "depth": ARGS.depth, "vit_depth": ARGS.vit_depth,
                   "weights": (ARGS.checkpoint or "random init key 0"),
                   "images": (f"{ARGS.scene_root} scene 0"
                              if ARGS.scene_root else "uniform noise"),
                   "fp32": "CPU (the PARITY_FLAGSHIP.json-proven config)",
                   "compared": f"{dtype} trunk on TPU v5e, fp32 heads"},
        "forward": {k: budget(k, fwd[k], ref[f"fwd_{k}"]) for k in fwd},
        "reloc": {k: budget(k, rel[k], ref[f"rel_{k}"]) for k in rel},
        "note": note,
    }
    name = (f"PARITY_BF16_{ARGS.tag}.json" if MODE != "tpu32"
            else f"PARITY_TPU32_CONTROL_{ARGS.tag}.json")
    with open(os.path.join(REPO, name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
