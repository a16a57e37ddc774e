"""Measure the train step with/without remat (and report HBM peak).

Full ``jax.checkpoint`` on every scan body re-runs the whole layer forward
during the backward — ~1x trunk-forward of extra FLOPs. If the activations
fit HBM at a given depth, turning remat off is the single biggest train-step
speedup available (VERDICT r2 item 2). Usage:

    python tools/train_remat_probe.py [--depth 12] [--remat 0|1]
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--remat", type=int, default=0)
    ap.add_argument("--vit-remat", type=int, default=None)
    ap.add_argument("--img", type=int, default=518)
    ap.add_argument("--frames", type=int, default=2)
    args = ap.parse_args()

    from self_supervise_sfm_tpu.data.imc2021 import IMC2021Scenes, stack_scenes
    from self_supervise_sfm_tpu.data.synthetic import make_synthetic_dataset
    from self_supervise_sfm_tpu.models import sailrecon as M
    from self_supervise_sfm_tpu.train import loop as L
    import tempfile

    D = args.depth
    assert D >= 4, "the DPT heads tap 4 distinct layers; need --depth >= 4"
    taps = tuple(int(round(i * (D - 1) / 3)) for i in range(1, 4))
    taps = (max(0, D // 6),) + taps
    vr = bool(args.remat) if args.vit_remat is None else bool(args.vit_remat)
    mcfg = M.make_config(
        compute_dtype="bfloat16", remat=bool(args.remat), vit_remat=vr, depth=D,
        vit_depth=D, intermediate_layer_idx=(2, 5, 8, 11) if D == 12
        else tuple(sorted(set(taps))),
    )
    tcfg = L.TrainConfig(rank=300, num_images=args.frames,
                         adam_mu_dtype="bfloat16")

    with tempfile.TemporaryDirectory() as root:
        make_synthetic_dataset(root, num_scenes=1, num_images=args.frames,
                               image_size=(640, 480))
        ds = IMC2021Scenes(root, sample_num=10000, num_images=args.frames,
                           target_size=args.img)
        batch_np = stack_scenes([ds.load_scene(0, np.random.default_rng(0))])
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if isinstance(v, np.ndarray)}

    state = jax.jit(lambda k: L.init_train_state(k, mcfg, tcfg))(
        jax.random.PRNGKey(0))
    step_fn = L.make_train_step(mcfg, tcfg, jit_compile=False)
    TITERS = 3

    def chain(state, batch):
        def body(_, carry):
            st, _ = carry
            return step_fn(st, batch)

        return jax.lax.fori_loop(0, TITERS, body, step_fn(state, batch))

    jchain = jax.jit(chain, donate_argnums=(0,))
    lowered = jchain.lower(state, batch)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    peak = getattr(mem, "temp_size_in_bytes", 0) + getattr(
        mem, "argument_size_in_bytes", 0)
    print(f"peak(temp+args): {peak / 2**30:.2f} GiB "
          f"(temp {getattr(mem, 'temp_size_in_bytes', 0) / 2**30:.2f})")

    state, metrics = compiled(state, batch)
    print("first loss:", float(metrics["loss"]))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, metrics = compiled(state, batch)
        float(metrics["loss"])
        times.append((time.perf_counter() - t0) / (TITERS + 1))
    print(f"depth={D} remat={bool(args.remat)} "
          f"step={np.median(times):.4f}s spread={max(times)-min(times):.4f}")


if __name__ == "__main__":
    main()
