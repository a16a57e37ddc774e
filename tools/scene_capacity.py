"""Maximum scene size per v5e chip for cache build + reloc (S_max).

AOT-compiles (no execute) the two-phase programs at increasing anchor
counts and reads XLA's memory analysis: peak HBM bytes per program as a
function of A (anchors in the scene cache) and Q (query frames per reloc
call). A linear fit over A gives the per-anchor cost and the largest scene
one 16 GB chip can build/serve — the single-chip answer to the reference's
CPU-offloaded unbounded cache (``sailrecon/layers/attention.py:92-97``).
Reloc is measured for the chunked decode (``reloc_chunked``), whose peak is
set by the chunk size, not Q.

Writes ``SCENE_CAPACITY.json``. Run:  python tools/scene_capacity.py
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

HBM_GB = 15.75  # v5e usable HBM (16 GB minus reserved)
IMG, RANK = 518, 300

t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:6.1f}s] {msg}", flush=True)


def mem_gb(compiled):
    ma = compiled.memory_analysis()
    return (ma.argument_size_in_bytes + ma.temp_size_in_bytes
            + ma.output_size_in_bytes - ma.alias_size_in_bytes) / 2**30


def main():
    from self_supervise_sfm_tpu.models import sailrecon as M

    assert jax.default_backend() == "tpu"
    cfg = M.make_config(compute_dtype="bfloat16", remat=False)
    params_sds = jax.eval_shape(
        lambda k: M.cast_trunk_weights(M.init_sailrecon(k, cfg), cfg),
        jax.random.PRNGKey(0),
    )
    results = {"hbm_gb": HBM_GB, "img": IMG, "rank": RANK,
               "build": [], "reloc": []}

    def build_fn(A):
        def f(p, imgs, key):
            return M.build_scene_cache(p, cfg, imgs, rank=RANK,
                                       subsample_key=key)
        imgs = jax.ShapeDtypeStruct((1, A, IMG, IMG, 3), jnp.float32)
        return jax.jit(f).lower(params_sds, imgs,
                                jax.ShapeDtypeStruct((2,), jnp.uint32))

    # ---- cache build: peak vs anchor count -------------------------------
    sizes = (8, 24, 48, 96)
    for A in sizes:
        lowered = build_fn(A)
        compiled = lowered.compile()
        gb = mem_gb(compiled)
        out_gb = sum(
            int(np.prod(s.shape)) * s.dtype.itemsize
            for s in jax.tree.leaves(jax.eval_shape(
                lambda p, i, k: M.build_scene_cache(
                    p, cfg, i, rank=RANK, subsample_key=k),
                params_sds,
                jax.ShapeDtypeStruct((1, A, IMG, IMG, 3), jnp.float32),
                jax.ShapeDtypeStruct((2,), jnp.uint32)))
        ) / 2**30
        row = {"anchors": A, "peak_gb": round(gb, 3),
               "cache_gb": round(out_gb, 3)}
        log(f"build A={A}: peak {gb:.2f} GB (cache itself {out_gb:.3f} GB)")
        results["build"].append(row)

    # linear fit peak(A) -> S_max
    As = np.array([r["anchors"] for r in results["build"]], np.float64)
    Gs = np.array([r["peak_gb"] for r in results["build"]], np.float64)
    slope, icept = np.polyfit(As, Gs, 1)
    smax_build = int((HBM_GB - icept) / slope)
    results["build_fit"] = {
        "gb_per_anchor": round(float(slope), 4),
        "base_gb": round(float(icept), 3),
        "s_max_anchors_build": smax_build,
    }
    log(f"build: {slope:.4f} GB/anchor + {icept:.2f} GB base "
        f"-> S_max ~ {smax_build} anchors")

    # ---- chunked reloc: peak vs cached anchors (chunk=4 queries) ---------
    def reloc_fn(A, Q, chunk):
        cache_sds = jax.eval_shape(
            lambda p, i, k: M.build_scene_cache(p, cfg, i, rank=RANK,
                                                subsample_key=k),
            params_sds,
            jax.ShapeDtypeStruct((1, A, IMG, IMG, 3), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.uint32))

        def f(p, cache, ct, imgs):
            return M.reloc_chunked(p, cfg, cache, ct, imgs, chunk=chunk)

        imgs = jax.ShapeDtypeStruct((1, Q, IMG, IMG, 3), jnp.float32)
        return jax.jit(f).lower(params_sds, cache_sds[0], cache_sds[1], imgs)

    for A in (24, 96):
        compiled = reloc_fn(A, 16, 4).compile()
        gb = mem_gb(compiled)
        row = {"anchors_cached": A, "queries": 16, "chunk": 4,
               "peak_gb": round(gb, 3)}
        log(f"reloc A={A} Q=16 chunk=4: peak {gb:.2f} GB")
        results["reloc"].append(row)

    ra = [r["anchors_cached"] for r in results["reloc"]]
    rp = [r["peak_gb"] for r in results["reloc"]]
    rslope = (rp[-1] - rp[0]) / (ra[-1] - ra[0])
    rbase = rp[0] - rslope * ra[0]
    smax_reloc = int((HBM_GB - rbase) / rslope)
    results["reloc_fit"] = {
        "gb_per_cached_anchor": round(rslope, 4),
        "base_gb": round(rbase, 3),
        "s_max_anchors_reloc": smax_reloc,
        "note": "beyond S_max, shard the scene over the context axis "
                "(SCENE_SHARDED_r03.json)",
    }
    log(f"reloc: {rslope:.4f} GB/anchor + {rbase:.2f} GB base "
        f"-> S_max ~ {smax_reloc} cached anchors")

    out_path = os.path.join(REPO, "SCENE_CAPACITY.json")
    results["wall_seconds"] = round(time.time() - t0, 1)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
