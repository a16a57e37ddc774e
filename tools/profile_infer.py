"""Trace the bench inference step under jax.profiler for roofline analysis.

Usage:
    python tools/profile_infer.py [trace_dir]
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/xprof_summary.py <trace_dir> --steps 2

Runs the exact bench.py configuration (518px, 5-frame duplicated scene,
fix_rank=300, bf16 trunk / fp32 heads) with 2 steps chained in one jit,
wrapped in start_trace/stop_trace after a warmup execution.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

NUM_FRAMES = 5
IMG = 518
RANK = 300
STEPS = 2


def main():
    from self_supervise_sfm_tpu.models import sailrecon as M

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/infer_trace"
    cfg = M.make_config(compute_dtype="bfloat16", remat=False)
    params = jax.jit(
        lambda k: M.cast_trunk_weights(M.init_sailrecon(k, cfg), cfg)
    )(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    uniq = rng.uniform(size=(1, NUM_FRAMES, IMG, IMG, 3)).astype(np.float32)
    images = jnp.asarray(np.concatenate([uniq, uniq], axis=1))
    key = jax.random.PRNGKey(1)
    mode = sys.argv[2] if len(sys.argv) > 2 else "forward"

    if mode == "reloc":
        # two-phase steady state: batched full-head reloc against a
        # prebuilt rank-300 scene cache — the EXACT program bench.py times
        # (shared via bench.make_reloc_fns)
        from bench import make_reloc_fns

        build, reloc_loop = make_reloc_fns(M, cfg, RANK, STEPS)
        uimgs = jnp.asarray(uniq)
        cache, cam_tok, _ = jax.jit(build)(params, uimgs, key)
        jfn = jax.jit(reloc_loop)
        args = (params, cache, cam_tok, uimgs)
    else:
        def step(params, images, key):
            preds = M.forward(
                params, cfg, images,
                num_anchor=NUM_FRAMES, num_query=NUM_FRAMES,
                rank=RANK, subsample_key=key, images_duplicated=True,
            )
            return (
                jnp.sum(preds["extrinsic"].astype(jnp.float32))
                + jnp.sum(preds["depth_map"])
                + jnp.sum(preds["point_map"])
                + jnp.sum(preds["point_map_by_unprojection"])
            )

        def fn(params, images, key):
            def body(i, acc):
                return acc + step(params, images, jax.random.fold_in(key, i))

            return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))

        jfn = jax.jit(fn)
        args = (params, images, key)

    print("compiling/warmup...", flush=True)
    float(jfn(*args))
    print("tracing...", flush=True)
    jax.profiler.start_trace(trace_dir)
    float(jfn(*args))
    jax.profiler.stop_trace()
    print(f"trace written to {trace_dir} ({STEPS} steps, mode={mode})")


if __name__ == "__main__":
    main()
