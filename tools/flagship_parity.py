"""Flagship-scale end-to-end golden parity vs the torch reference.

Runs the FULL ViT-L/24 @ 518 SailRecon (random-init torch weights, fp32,
CPU) against the framework through ``utils/converter.convert_sailrecon``:

- joint ``forward`` (2 anchors + 1 query) — reference
  ``sailrecon/models/sail_recon.py:70-159``;
- two-phase ``tmp_forward`` + ``reloc`` — reference ``sail_recon.py:176-286``
  vs ``build_scene_cache`` + ``reloc``.

Subsampling parity at rank=300 < P0=1369 is achieved by replaying the
reference ``torch.Generator`` draws (``aggregator.py:593-626``: per layer,
per (batch, anchor) ``randperm(P0)[:rank]``) into our ``subsample_indices``
override — the same protocol as tests/test_model_parity.py, at real shapes.

Writes ``PARITY_FLAGSHIP.json`` at the repo root with per-output max-abs and
max-rel diffs. Run:  python tools/flagship_parity.py   (~15 min on 2 CPUs)
"""

import json
import os
import sys
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

# the reference reloc cache path calls .cuda() unconditionally
# (sailrecon/layers/attention.py:92-93); neutralise on CPU-only torch.
torch.Tensor.cuda = lambda self, *a, **k: self

from self_supervise_sfm_tpu.models import sailrecon as SM
from self_supervise_sfm_tpu.utils import converter as C

IMG = 518
DEPTH = 24
RANK = 300
P0 = (IMG // 14) ** 2  # 1369
A, Q, B = 2, 1, 1

t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)


def to_np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def replay_indices(gen, depth, b, a, p0, rank):
    """Clone ``gen`` and replay the reference draw order (per layer, per
    (batch, anchor): ``randperm(P0)[:rank]`` — aggregator.py:593-626)."""
    clone = torch.Generator()
    clone.set_state(gen.get_state())
    idx = np.zeros((depth, b, a, rank), np.int64)
    for l in range(depth):
        for bi in range(b):
            for ai in range(a):
                idx[l, bi, ai] = torch.randperm(p0, generator=clone)[:rank].numpy()
    return idx


def diff_stats(name, ours, ref):
    """Per-output diff stats over entries finite in BOTH models.

    With random weights the FoV channels of the pose encoding can land on a
    ``tan`` pole, so ``intrinsic`` focals overflow to +/-inf in the torch
    reference (``sailrecon/utils/pose_enc.py``: ``1/tan`` unclamped) and are
    clamped to ~2.6e8 on our side (``ops/geometry.py:274``, a deliberate
    divergence documented there). Comparing non-finite entries is meaningless;
    we report finite-entry stats plus whether the non-finite *positions*
    agree under each model's own overflow semantics.
    """
    ours = np.asarray(ours, np.float64)
    ref = np.asarray(to_np(ref), np.float64)
    assert ours.shape == ref.shape, f"{name}: {ours.shape} vs {ref.shape}"
    fin = np.isfinite(ours) & np.isfinite(ref)
    ad = np.abs(ours[fin] - ref[fin])
    scale = np.abs(ref[fin])
    rel = ad / np.maximum(scale, 1e-6)
    out = {
        "shape": list(ours.shape),
        "max_abs_diff": float(ad.max()),
        "mean_abs_diff": float(ad.mean()),
        "max_rel_diff": float(rel.max()),
        "ref_max_abs": float(scale.max()),
    }
    n_nonfin = int((~fin).sum())
    if n_nonfin:
        out["nonfinite_entries"] = n_nonfin
        out["nonfinite_ref"] = int((~np.isfinite(ref)).sum())
        out["nonfinite_ours"] = int((~np.isfinite(ours)).sum())
    log(
        f"  {name:28s} max_abs={out['max_abs_diff']:.3e} "
        f"mean_abs={out['mean_abs_diff']:.3e} max_rel={out['max_rel_diff']:.3e} "
        f"(ref scale {out['ref_max_abs']:.3e}"
        + (f", {n_nonfin} non-finite masked)" if n_nonfin else ")")
    )
    return out


def main():
    from sailrecon.models.sail_recon import SailRecon

    torch.manual_seed(0)
    results = {
        "config": {
            "img_size": IMG, "depth": DEPTH, "vit": "dinov2_vitl14_reg",
            "embed_dim": 1024, "rank": RANK, "P0": P0,
            "anchors": A, "queries": Q, "dtype": "float32", "device": "cpu",
            "weights": "random torch init (seed 3), converted via convert_sailrecon",
        },
    }

    log("building reference SailRecon (ViT-L/24 @ 518, random init)...")
    torch.manual_seed(3)
    ref = SailRecon(img_size=IMG, patch_size=14, embed_dim=1024).eval()
    n_params = sum(p.numel() for p in ref.parameters())
    log(f"reference params: {n_params / 1e6:.1f} M")
    results["config"]["params_m"] = round(n_params / 1e6, 1)

    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(B, A + Q, 3, IMG, IMG)).astype(np.float32)

    # ---- phase 1: joint forward -------------------------------------------
    log("replaying subsample indices...")
    idx = replay_indices(ref.aggregator.generator, DEPTH, B, A, P0, RANK)

    log("running reference joint forward (torch CPU fp32)...")
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(imgs), list(range(A)), [A + i for i in range(Q)],
            fix_rank=RANK,
        )
    log("reference forward done")

    log("converting weights...")
    sd = C.torch_module_to_state_dict(ref)
    params = C.convert_sailrecon(sd, depth=DEPTH, vit_depth=DEPTH)

    cfg = SM.make_config(attn_impl="dense", global_attn_impl="dense")
    imgs_j = jnp.asarray(imgs.transpose(0, 1, 3, 4, 2))

    log("running framework joint forward (jit compile + run, CPU fp32)...")
    fwd = jax.jit(
        lambda p, x, i: SM.forward(
            p, cfg, x, num_anchor=A, num_query=Q, rank=RANK, subsample_indices=i
        )
    )
    ours = jax.block_until_ready(fwd(params, imgs_j, jnp.asarray(idx)))
    log("framework forward done")

    # reference returns a per-query list of dicts of (B, ...) slices;
    # restack to (B, Q, ...)
    def restack(key):
        return torch.stack([r[key] if torch.is_tensor(r[key])
                            else torch.from_numpy(np.asarray(r[key]))
                            for r in ref_out], dim=1)

    fwd_stats = {}
    for key in ("extrinsic", "intrinsic", "point_map", "xyz_cnf",
                "depth_map", "dpt_cnf", "point_map_by_unprojection",
                "cam_tokens"):
        fwd_stats[key] = diff_stats(key, np.asarray(ours[key]), restack(key))
    results["forward"] = fwd_stats

    del ours, ref_out

    # ---- phase 2: two-phase cache build + reloc ---------------------------
    log("building kv_cache reference model...")
    ref2 = SailRecon(img_size=IMG, patch_size=14, embed_dim=1024,
                     kv_cache=True).eval()
    ref2.load_state_dict(ref.state_dict())
    del ref

    anchors = imgs[:, :A]
    query = imgs[:, A:]
    idx2 = replay_indices(ref2.aggregator.generator, DEPTH, B, A, P0, RANK)

    log("running reference tmp_forward (cache build)...")
    with torch.no_grad():
        ref2.tmp_forward(torch.from_numpy(anchors), list(range(A)), [],
                         fix_rank=RANK)
        ref2.aggregator.num_recon = A
        log("running reference reloc...")
        ref_reloc = ref2.reloc(torch.from_numpy(query), fix_rank=RANK,
                               memory_save=False, save_depth=True)

    log("running framework build_scene_cache + reloc...")
    build = jax.jit(
        lambda p, x, i: SM.build_scene_cache(p, cfg, x, rank=RANK,
                                             subsample_indices=i)
    )
    cache, cam_tok = jax.block_until_ready(
        build(params, jnp.asarray(anchors.transpose(0, 1, 3, 4, 2)),
              jnp.asarray(idx2))
    )
    log("cache built; running reloc...")
    rl = jax.jit(lambda p, c, ct, x: SM.reloc(p, cfg, c, ct, x))
    ours_reloc = jax.block_until_ready(
        rl(params, cache, cam_tok, jnp.asarray(query.transpose(0, 1, 3, 4, 2)))
    )
    log("framework reloc done")

    def restack2(key):
        return torch.stack([r[key] if torch.is_tensor(r[key])
                            else torch.from_numpy(np.asarray(r[key]))
                            for r in ref_reloc], dim=1)

    rel_stats = {}
    for key in ("extrinsic", "intrinsic", "point_map", "xyz_cnf",
                "depth_map", "dpt_cnf", "point_map_by_unprojection",
                "cam_tokens"):
        rel_stats[key] = diff_stats(key, np.asarray(ours_reloc[key]),
                                    restack2(key))
    results["reloc"] = rel_stats

    results["wall_seconds"] = round(time.time() - t0, 1)
    out_path = os.path.join(REPO, "PARITY_FLAGSHIP.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
