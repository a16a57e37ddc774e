"""Benchmark: flagship full-head inference throughput on one chip.

Config mirrors the reference's standard demo inference
(``train/demo_imc_forward.py:22,41,101``): 518x518 images, DINOv2 ViT-L/14
trunk, 5-image scene duplicated into 5 anchors + 5 queries, fix_rank=300,
bf16 trunk with fp32 heads. Metric: query frames fully reconstructed
(pose + intrinsics + depth + point map + unprojection) per second per chip.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is the same model/config executed as a straight XLA program with
dense attention and no Pallas kernels — i.e. the faithful "naive port" of
the reference — measured at 0.75 frames/s on this chip (see CLAUDE.md perf
history). ``trunk_tflops`` reports achieved TFLOP/s against an *analytic*
FLOP count of the ViT+aggregator trunk (matmuls + actual attention; XLA's
cost analysis can't be used — it counts scan bodies once and can't see
inside Pallas kernels).
"""

import json
import os
import time

import jax

# persistent compilation cache: repeated bench runs skip the multi-minute
# remote compile of the full model + Mosaic kernels
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

# v5e (TPU v5 lite) peak bf16 matmul throughput per chip
PEAK_BF16_FLOPS = 197e12
# same model/config, dense XLA attention, no Pallas kernels, on this chip
DENSE_XLA_BASELINE_FPS = 0.75

NUM_FRAMES = 5
IMG = 518
RANK = 300
WARMUP = 1
ITERS = 5


def trunk_flops_analytic(S: int, P: int, C: int, L: int, rank: int) -> float:
    """Matmul + attention FLOPs of one inference step's trunk.

    ViT runs on the S unique frames (duplicated layout); the aggregator's
    L layers each apply a frame block (2S frames), a global block (S·P
    anchor tokens) and a reloc block (S·P query tokens vs the S·(rank+5)
    compressed scene + own frame). Attention counted as executed (the
    reloc self part is per-frame block-diagonal), 4·T_q·T_k·C per site.
    """
    H = 16  # attention FLOPs depend only on C = H*d via 4*Tq*Tk*C
    mm = lambda T, a, b: 2.0 * T * a * b  # noqa: E731
    per_tok = mm(1, C, 3 * C) + mm(1, C, C) + 2 * mm(1, C, 4 * C)
    R5 = rank + 5
    vit = L * (S * P) * per_tok
    agg = L * ((2 * S * P + S * P + S * P) * per_tok + mm(S * R5, C, 2 * C))
    attn = (
        L * S * 4.0 * P * P * C            # ViT self-attention
        + L * 2 * S * 4.0 * P * P * C      # frame attention
        + L * 4.0 * (S * P) ** 2 * C       # global attention
        + L * S * 4.0 * P * (S * R5 + P) * C  # reloc: ctx + own frame
    )
    patch_embed = S * P * mm(1, 14 * 14 * 3, C)
    return vit + agg + attn + patch_embed


def make_reloc_fns(M, cfg, rank: int, iters: int):
    """(build, reloc_loop) for the two-phase measurement — shared with
    tools/profile_infer.py so the profiled program IS the benched program."""

    def build(params, imgs, key):
        cache, cam_tok = M.build_scene_cache(
            params, cfg, imgs, rank=rank, subsample_key=key
        )
        return cache, cam_tok, jnp.sum(cam_tok.astype(jnp.float32))

    def reloc_loop(params, cache, cam_tok, imgs):
        def body(i, acc):
            # tiny per-step input perturbation so XLA cannot hoist the
            # loop-invariant reloc computation out of the fori_loop
            preds = M.reloc(
                params, cfg, cache, cam_tok, imgs + (jnp.float32(i) * 1e-9)
            )
            return (
                acc
                + jnp.sum(preds["extrinsic"].astype(jnp.float32))
                + jnp.sum(preds["depth_map"])
            )

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return build, reloc_loop


def bench_train(out: dict) -> None:
    """Self-supervised fine-tuning step benchmark (one chip).

    The reference fine-tunes the FULL 1.49 B-param model with Adam
    (``train/train_imc.py:475``, 2 frames/scene at 518px, ``:552``); the
    fp32 train state alone is ~18 GB, and the AOT probe
    (``tools/train_memory_probe.py``) measures the whole step at 22.4 GB —
    over one v5e chip's 15.75 GB HBM even with remat + bf16 first moment.
    Flagship training is therefore an FSDP job (>= 2 chips; per-device
    footprint validated by ``__graft_entry__.flagship_fsdp_memory``).

    What one chip CAN measure honestly is per-chip training *throughput* at
    the largest fitting configuration: the same ViT-L blocks and heads at
    half depth (12 aggregator + 12 ViT layers, 750 M params, ~12.5 GB
    step footprint). Per-layer compute is identical to the flagship, so the
    reported train MFU transfers; steps/s does not (half the layers).
    """
    import numpy as np

    from self_supervise_sfm_tpu.data.imc2021 import IMC2021Scenes, stack_scenes
    from self_supervise_sfm_tpu.data.synthetic import make_synthetic_dataset
    from self_supervise_sfm_tpu.models import sailrecon as M
    from self_supervise_sfm_tpu.train import loop as L
    import tempfile

    S = 2  # frames per scene (train_imc.py:552)
    DEPTH = 12
    mcfg = M.make_config(
        compute_dtype="bfloat16", remat=True, depth=DEPTH, vit_depth=DEPTH,
        intermediate_layer_idx=(2, 5, 8, 11),
    )
    tcfg = L.TrainConfig(rank=RANK, num_images=S, adam_mu_dtype="bfloat16")

    with tempfile.TemporaryDirectory() as root:
        make_synthetic_dataset(root, num_scenes=1, num_images=S,
                               image_size=(640, 480))
        ds = IMC2021Scenes(root, sample_num=10000, num_images=S,
                           target_size=IMG)
        batch_np = stack_scenes([ds.load_scene(0, np.random.default_rng(0))])
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if isinstance(v, np.ndarray)}

    state = jax.jit(
        lambda k: L.init_train_state(k, mcfg, tcfg)
    )(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(a.shape))
                   for a in jax.tree.leaves(state["params"]))

    step_fn = L.make_train_step(mcfg, tcfg, jit_compile=False)
    TITERS = 3

    def chain(state, batch):
        # TITERS optimizer steps inside ONE jit: the ~30 ms remote-dispatch
        # RTT is paid per measurement, not per step
        def body(_, carry):
            st, _ = carry
            return step_fn(st, batch)

        return jax.lax.fori_loop(
            0, TITERS, body, step_fn(state, batch), unroll=False
        )

    jchain = jax.jit(chain, donate_argnums=(0,))

    import time as _t

    t0 = _t.perf_counter()
    state, metrics = jchain(state, batch)
    first = float(metrics["loss"])  # sync: compile + first chain
    compile_s = _t.perf_counter() - t0

    times = []
    for _ in range(3):
        t0 = _t.perf_counter()
        state, metrics = jchain(state, batch)
        loss = float(metrics["loss"])
        times.append((_t.perf_counter() - t0) / (TITERS + 1))
    dt = float(np.median(times))
    spread = float(max(times) - min(times))

    P = (IMG // 14) ** 2 + 5
    # fwd FLOPs: S anchors + S queries (duplicated layout); bwd ~= 2x fwd.
    # Remat recompute is excluded (standard MFU convention counts useful
    # FLOPs), making this a conservative utilisation number.
    fwd = trunk_flops_analytic(S, P, 1024, DEPTH, RANK)
    tf = 3.0 * fwd
    out["train"] = {
        "step_seconds": round(dt, 4),
        "step_seconds_spread": round(spread, 4),
        "steps_per_sec": round(1.0 / dt, 3),
        "scenes_per_sec": round(1.0 / dt, 3),
        "compile_plus_first_chain_seconds": round(compile_s, 1),
        "loss_first": round(first, 4),
        "loss_after": round(loss, 4),
        "loss_note": (
            "throughput bench from RANDOM init at the reference max_val=15: "
            "residuals saturate the CDF range (sentinel 2.0) within a few "
            "steps — expected, zero-gradient by design (cdf_loss.py:235-240);"
            " convergence behaviour is TRAIN_CURVE_r04.json's curriculum run"
            " (and TRAIN_EVAL_r04.json for the pose-improvement protocol)"
        ),
        "train_tflops": round(tf / dt / 1e12, 1),
        "train_mfu": round(tf / dt / PEAK_BF16_FLOPS, 4),
        "config": {
            "depth": DEPTH, "frames": S, "img": IMG, "rank": RANK,
            "params_m": round(n_params / 1e6),
            "note": (
                "largest single-chip-fitting config; flagship (depth 24, "
                "1.49B params) needs 22.4 GB > 15.75 GB HBM even with remat "
                "+ bf16 Adam mu (real-TPU AOT probe) and trains via FSDP "
                "at >= 8 chips (FSDP_MEM_r03.json)"
            ),
        },
    }


def bench_inference() -> dict:
    from self_supervise_sfm_tpu.models import sailrecon as M

    dev = jax.devices()[0]
    cfg = M.make_config(compute_dtype="bfloat16", remat=False)
    # one jitted program: on-device init, no per-leaf host dispatch through
    # the remote-TPU tunnel; trunk weights pre-cast to bf16 (inference holds
    # no fp32 master copy — saves ~7 ms/step of in-step converts)
    params = jax.jit(
        lambda k: M.cast_trunk_weights(M.init_sailrecon(k, cfg), cfg)
    )(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    # the reference inference layout: the scene's frames duplicated into
    # anchors + queries (train/demo_imc_forward.py:76-101) — which lets the
    # ViT patch embed run once per unique image (images_duplicated=True)
    uniq = rng.uniform(size=(1, NUM_FRAMES, IMG, IMG, 3)).astype(np.float32)
    images = jnp.asarray(np.concatenate([uniq, uniq], axis=1))
    key = jax.random.PRNGKey(1)

    def step(params, images, key):
        preds = M.forward(
            params, cfg, images,
            num_anchor=NUM_FRAMES, num_query=NUM_FRAMES,
            rank=RANK, subsample_key=key, images_duplicated=True,
        )
        # scalar checksum over every dense output: fetching it on the host is
        # the synchronisation point (block_until_ready is unreliable through
        # the remote-TPU tunnel)
        checksum = (
            jnp.sum(preds["extrinsic"].astype(jnp.float32))
            + jnp.sum(preds["depth_map"])
            + jnp.sum(preds["point_map"])
            + jnp.sum(preds["point_map_by_unprojection"])
        )
        return checksum

    def fn(params, images, key):
        # ITERS steps chained inside one jit: the ~30 ms remote-dispatch RTT
        # is paid once per *measurement*, not once per step; fresh subsample
        # key per step so no step is trivially cached
        def body(i, acc):
            return acc + step(params, images, jax.random.fold_in(key, i))

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    lowered = jfn.lower(params, images, key)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    P = (IMG // 14) ** 2 + 5
    flops = trunk_flops_analytic(NUM_FRAMES, P, 1024, 24, RANK)

    for _ in range(WARMUP):
        float(compiled(params, images, key))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(compiled(params, images, key))
        times.append((time.perf_counter() - t0) / ITERS)
    dt = float(np.median(times))
    spread = float(max(times) - min(times))

    frames_per_sec = NUM_FRAMES / dt
    out = {
        "metric": "frames/sec/chip (full-head 518px inference, 5-frame scene)",
        "value": round(frames_per_sec, 3),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / DENSE_XLA_BASELINE_FPS, 2),
        "baseline_definition": (
            "speedup over the same model as a dense-attention XLA "
            "program, no Pallas kernels (the faithful naive port; "
            "reference publishes no numbers)"
        ),
        "step_seconds": round(dt, 4),
        # max-min over the 3 chained measurements: attributes run-to-run
        # movement (box load, cache state) vs real code deltas
        "step_seconds_spread": round(spread, 4),
        "compile_seconds": round(compile_s, 1),
        "trunk_tflops": round(flops / dt / 1e12, 1),
        "trunk_mfu": round(flops / dt / PEAK_BF16_FLOPS, 4),
        "device": str(dev),
    }

    if os.environ.get("BENCH_RELOC", "1") != "0":
        # secondary: the reference's OTHER headline mode — two-phase
        # inference (demo_imc.py): build the rank-300 scene KV cache once,
        # then localise query batches against it. The reference loops queries
        # one-by-one with CPU-offloaded caches (demo_imc.py:97-107); here one
        # batched full-head reloc call per step.
        uimgs = jnp.asarray(uniq)
        build, reloc_loop = make_reloc_fns(M, cfg, RANK, ITERS)
        jb = jax.jit(build)
        jr = jax.jit(reloc_loop)
        t0 = time.perf_counter()
        cache, cam_tok, chk = jb(params, uimgs, key)
        float(chk)
        build_s = time.perf_counter() - t0  # first call: compile + run
        # warm build: the recurring cost of switching scenes (compile cached)
        t0 = time.perf_counter()
        cache, cam_tok, chk = jb(params, uimgs, jax.random.PRNGKey(2))
        float(chk)
        build_warm_s = time.perf_counter() - t0
        float(jr(params, cache, cam_tok, uimgs))  # warmup (compile)
        rtimes = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jr(params, cache, cam_tok, uimgs))
            rtimes.append((time.perf_counter() - t0) / ITERS)
        rdt = float(np.median(rtimes))
        out["reloc_frames_per_sec"] = round(NUM_FRAMES / rdt, 3)
        out["reloc_step_seconds"] = round(rdt, 4)
        out["reloc_step_seconds_spread"] = round(
            float(max(rtimes) - min(rtimes)), 4
        )
        out["cache_build_first_call_seconds"] = round(build_s, 1)
        out["cache_build_warm_seconds"] = round(build_warm_s, 4)

    return out


def main():
    # inference benches run inside a function so their device buffers
    # (bf16 params, scene cache) are garbage-collected before the train
    # bench allocates its ~12 GB step — sharing them OOMs the chip
    out = bench_inference()
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        import gc

        gc.collect()
        bench_train(out)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
