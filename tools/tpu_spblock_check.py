"""Mosaic-compile the shard_map'd Pallas blocks on the real TPU chip.

The sp_block variants (``parallel/sp_block.py``) keep the fused Pallas
kernels device-local under shard_map — the real-pod execution path — but CI
runs them only on the virtual CPU mesh, where Pallas executes in interpret
mode. This tool runs all three variants on a 1-device TPU mesh with
``force_single_device_spmd()`` so the shard_map path stays engaged: Mosaic
then compiles the exact per-device programs a pod would run (frame/reloc
bodies, ring attention with a length-1 ring), at flagship shapes
(C=1024, H=16, 1374-token frames, bf16).

Asserts each variant matches the plain (non-shard_map) block on the same
chip, checks gradients flow through the frame variant, and writes
``TPU_SPBLOCK.json``. Run:  python tools/tpu_spblock_check.py
"""

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

from self_supervise_sfm_tpu.layers.block import BlockConfig, block, block_with_context, init_block
from self_supervise_sfm_tpu.models.aggregator import _rope_tables_frame, AggregatorConfig
from self_supervise_sfm_tpu.parallel import sharding as Sh
from self_supervise_sfm_tpu.parallel.sp_block import (
    force_single_device_spmd, frame_block_sharded, global_block_ring,
    reloc_block_sharded,
)

CFG = BlockConfig(dim=1024, num_heads=16, qk_norm=True, init_values=0.01)
ACFG = AggregatorConfig()  # flagship defaults: 518px, C=1024, H=16
S, P, B, Q, NC = 4, 1374, 1, 2, 610  # frames, tokens/frame, scenes, queries,
#                                       context tokens (2 anchors, rank 300)

# A *standalone* jit of one block makes XLA place the Pallas q/k/v outputs
# (3 x 10.7 MB at N=5496) in VMEM — nothing else competes for it — and the
# scoped allocation blows the default 16 MB limit, a placement heuristic the
# full model never triggers (its VMEM pressure pushes them to HBM). Raise the
# scoped limit for these single-block programs only (v5e has 128 MB VMEM).
_OPTS = {"xla_tpu_scoped_vmem_limit_kib": 50000}


def jcompile(fn, *args):
    return jax.jit(fn).lower(*args).compile(compiler_options=_OPTS)


def stats(name, ours, ref, t0):
    a = np.asarray(ours, np.float64)
    r = np.asarray(ref, np.float64)
    d = np.abs(a - r)
    out = {
        "max_abs_diff": float(d.max()),
        "mean_abs_diff": float(d.mean()),
        "ref_rms": float(np.sqrt((r ** 2).mean())),
    }
    print(f"  {name:12s} max_abs={out['max_abs_diff']:.3e} "
          f"mean_abs={out['mean_abs_diff']:.3e} rms={out['ref_rms']:.3e} "
          f"[{time.time() - t0:.0f}s]", flush=True)
    return out


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    t0 = time.time()
    results = {"device": str(jax.devices()[0]),
               "config": {"dim": CFG.dim, "heads": CFG.num_heads,
                          "tokens_per_frame": P, "dtype": "bfloat16"}}
    mesh = Sh.make_mesh(num_data=1, num_context=1, num_model=1)

    params = jax.jit(lambda k: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        init_block(k, CFG)))(jax.random.PRNGKey(0))
    tabs = _rope_tables_frame(ACFG, 37, 37)  # (P, hd) incl. 5 specials
    key = jax.random.PRNGKey(1)
    x = (jax.random.normal(key, (S, P, CFG.dim)) * 0.5).astype(jnp.bfloat16)

    # plain path on the same chip (same Pallas kernels, no shard_map)
    ref_frame = jcompile(lambda p, x: block(p, x, CFG, tabs), params, x)(params, x)

    print("frame_block_sharded under 1-device TPU mesh...", flush=True)
    with Sh.activate_mesh(mesh), force_single_device_spmd():
        out = jcompile(lambda p, x: frame_block_sharded(p, x, CFG, tabs),
                       params, x)(params, x)
    results["frame"] = stats("frame", out, ref_frame, t0)

    print("global_block_ring (length-1 ring) ...", flush=True)
    xg = x.reshape(B, S * P, CFG.dim)
    cosg = jnp.tile(tabs[0], (S, 1))
    sing = jnp.tile(tabs[1], (S, 1))
    ref_g = jcompile(lambda p, x: block(p, x, CFG, (cosg, sing)),
                     params, xg)(params, xg)
    with Sh.activate_mesh(mesh), force_single_device_spmd():
        outg = jcompile(
            lambda p, x: global_block_ring(p, x, CFG, (cosg, sing)),
            params, xg)(params, xg)
    results["ring"] = stats("ring", outg, ref_g, t0)

    print("reloc_block_sharded ...", flush=True)
    ctx = (jax.random.normal(jax.random.PRNGKey(2), (B, NC, CFG.dim)) * 0.5
           ).astype(jnp.bfloat16)
    xq = x[: B * Q]
    ctx_cos = jnp.tile(tabs[0][:NC][None], (B, 1, 1))
    ctx_sin = jnp.tile(tabs[1][:NC][None], (B, 1, 1))
    ref_r = jcompile(
        lambda p, x, c: block_with_context(p, x, c, CFG, tabs,
                                           (ctx_cos, ctx_sin)),
        params, xq, ctx)(params, xq, ctx)
    with Sh.activate_mesh(mesh), force_single_device_spmd():
        outr = jcompile(
            lambda p, x, c: reloc_block_sharded(p, x, c, CFG, tabs,
                                                (ctx_cos, ctx_sin)),
            params, xq, ctx)(params, xq, ctx)
    results["reloc"] = stats("reloc", outr, ref_r, t0)

    print("gradients through frame_block_sharded ...", flush=True)

    def loss_plain(p, x):
        return jnp.sum(block(p, x, CFG, tabs).astype(jnp.float32) ** 2)

    def loss_sharded(p, x):
        return jnp.sum(frame_block_sharded(p, x, CFG, tabs).astype(jnp.float32) ** 2)

    gp = jcompile(jax.grad(loss_plain), params, x)(params, x)
    with Sh.activate_mesh(mesh), force_single_device_spmd():
        gs = jcompile(jax.grad(loss_sharded), params, x)(params, x)
    gnp = float(jnp.sqrt(sum(jnp.sum(a.astype(jnp.float32) ** 2)
                             for a in jax.tree.leaves(gp))))
    gns = float(jnp.sqrt(sum(jnp.sum(a.astype(jnp.float32) ** 2)
                             for a in jax.tree.leaves(gs))))
    gd = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32)))), gp, gs)
    results["grads"] = {
        "grad_norm_plain": gnp, "grad_norm_sharded": gns,
        "max_leaf_abs_diff": float(max(jax.tree.leaves(gd))),
    }
    print(f"  grad norms: plain={gnp:.4e} sharded={gns:.4e} "
          f"max_leaf_diff={results['grads']['max_leaf_abs_diff']:.3e}",
          flush=True)

    # bf16 outputs O(1): shard_map vs plain runs the same Mosaic kernels, so
    # any divergence is accumulation-order noise. Gate loosely, record exact.
    for k in ("frame", "ring", "reloc"):
        assert results[k]["max_abs_diff"] <= 0.125, (k, results[k])
    assert abs(gnp - gns) / max(gnp, 1e-9) < 1e-2

    results["wall_seconds"] = round(time.time() - t0, 1)
    out_path = os.path.join(REPO, "TPU_SPBLOCK.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
