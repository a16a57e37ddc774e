"""Self-supervised IMC trainer: the ``train/train_imc.py`` equivalent.

Differences from the reference by design:
- one process drives the whole (data, context) mesh via pjit — no mp.spawn /
  NCCL rendezvous / DDP wrapper (``train_imc.py:34-58,472,571-576``);
- background host threads prefetch + decode HDF5 scenes and keep a device
  queue full (the DataLoader-worker equivalent, ``train_imc.py:496-504``).
  Measured (``DATA_BENCH_r05.json``): the C++ dataplane sustains ~30
  scenes/s at 518px/10k-samples on a 2-core host vs the 2.83 steps/s TPU
  train step — >10x headroom, the chip never starves (even the pure-python
  fallback at ~11 scenes/s keeps it fed);
- the full epoch actually runs (the reference breaks after one batch,
  ``train_imc.py:428``);
- checkpoints carry the full train state and resume deterministically;
- every-N-step artifact dumps: PLY point cloud, KITTI poses, CDF/PDF curves,
  reprojection sanity check (``train_imc.py:399-426``).

Run:  python -m self_supervise_sfm_tpu.train.trainer --data-root ... [--steps N]
"""

from __future__ import annotations

import argparse
import functools
import os
import queue
import signal
import threading
import time

# Under the axon TPU plugin JAX_PLATFORMS=cpu alone is not honoured; when the
# caller asks for virtual host devices (CPU smoke runs / CI), force the cpu
# platform through jax.config before the backend initialises.
if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
from dataclasses import dataclass, field, replace
from typing import Iterator, Optional

import jax
import numpy as np

from ..data.imc2021 import IMC2021Scenes, stack_scenes
from ..models import sailrecon as M
from ..parallel import sharding as Sh
from .checkpoint import CheckpointManager
from .loop import TrainConfig, init_train_state, make_train_step, train_state_from_params
from .loss import LossConfig
from .metrics import MetricsWriter


@dataclass(frozen=True)
class TrainerConfig:
    data_root: str = ""
    results_dir: str = "results"
    total_steps: int = 100_000
    num_images: int = 2
    sample_num: int = 10_000
    scenes_per_step_per_device: int = 1
    num_context: int = 1
    num_model: int = 1  # tensor-parallel extent (Megatron heads/MLP sharding)
    prefetch: int = 4
    seed: int = 0
    checkpoint_every: int = 10_000
    artifact_every: int = 10_000
    sanity_check_every: int = 500
    log_every: int = 10
    compute_dtype: str = "bfloat16"
    remat: bool = True
    rank: int = 300
    # model size overrides (flagship ViT-L/24 defaults; smaller variants for
    # ablations and CPU smoke runs)
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    vit_depth: int = 24
    pretrained: str = ""  # optional torch sailrecon.pt to convert+load
    # orbax checkpoint dir to seed params from with a FRESH optimizer,
    # schedule and step counter (vs results-dir resume, which restores the
    # full state). This is the coarse-to-fine hand-off: a low-resolution
    # phase's weights carry into a higher-resolution phase unchanged (the
    # ViT pos-embed is resized at runtime by the matrix interp, vit.py),
    # while the new phase gets its own warmup/cosine schedule.
    init_params_from: str = ""
    # comma-separated top-level param subtrees (e.g. "camera_head") to
    # re-initialize from random when seeding via init_params_from — the
    # controlled experiment for "is the plateau basin the camera head's?"
    # (r4 diagnosis: ~99% of gradient norm lands on the camera head)
    reinit_subtrees: str = ""
    img_size: int = 518
    # jax.profiler trace window: capture steps [profile_start,
    # profile_start + profile_steps) into <results_dir>/profile
    # (view with tensorboard / xprof). 0 disables.
    profile_start: int = 0
    profile_steps: int = 0
    # CDF-range curriculum: steps AFTER ``loss_switch_step`` train with
    # loss.max_val = ``loss_max_val_final`` (0 disables; the step numbered
    # loss_switch_step itself still uses the wide range — switch_step must be
    # < total_steps for the curriculum to engage). Training far from a pretrained
    # init needs a wide histogram (residuals past max_val saturate the CDF
    # at 2.0 with zero gradient, cdf_loss.py:235-240); once residuals shrink
    # the range tightens to the reference's hyperparameter
    # (max_val=15, train_imc.py:332-336). Implemented as a second jitted
    # step function — one extra compile at the switch step.
    loss_max_val_final: float = 0.0
    loss_switch_step: int = 0
    # data plane: None = auto (C++ loader when cpp/dataplane builds — decode,
    # preprocess and sampling off the GIL), False = pure python/PIL
    native_loader: "bool | None" = None
    # held-out validation + early stopping (train/validate.py): the r4 TTA
    # study measured per-scene adaptation OVERFITTING past an optimum the
    # trainer previously sailed through; these productize finding it.
    eval_every: int = 0
    eval_data_root: str = ""
    eval_num_images: int = 8
    eval_sample_num: int = 2048
    eval_heldout_from: int = 0
    eval_min_delta: float = 0.0
    early_stop_patience: int = 0
    train: TrainConfig = field(default_factory=TrainConfig)


def scene_stream(
    ds: IMC2021Scenes, slots, seed: int, prefetch: int
) -> Iterator[dict]:
    """Background-threaded scene loader -> stacked host batches.

    ``slots``: the global batch positions this process serves. Slot ``s`` of
    step ``t`` draws from an rng seeded by (seed, t, s), so the global batch
    is identical no matter how the slots are partitioned across processes —
    each host loads only its own data-axis slice (the reference instead
    replicates loading via DistributedSampler-free full iteration).
    """
    slots = list(slots)
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def worker():
        t = 0
        while not stop.is_set():
            scenes = []
            for s in slots:
                rng = np.random.default_rng(
                    np.random.SeedSequence((seed, t, s))
                )
                idx = int(rng.integers(len(ds)))
                scenes.append(ds.load_scene(idx, rng))
            batch = stack_scenes(scenes)
            # bounded put that re-checks stop: a bare q.put blocks forever on
            # a full queue, so the thread would keep decoding (and hold the
            # dataset) after training ends
            while not stop.is_set():
                try:
                    q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    pass
            t += 1

    t_ = threading.Thread(target=worker, daemon=True)
    t_.start()
    try:
        while True:
            yield q.get()
    finally:
        stop.set()


@functools.lru_cache(maxsize=1)
def _cdf_stats_jit():
    """One shared jit of the residual-statistics computation — building a
    fresh wrapper per artifact dump would retrace/recompile every interval."""
    from .loss import scene_cdf_statistics

    return jax.jit(scene_cdf_statistics, static_argnums=3)


def dump_artifacts(step, preds, tcfg, batch, results_dir):
    """Every-N-step artifact dumps (PLY + KITTI + CDF/PDF curves + sanity
    overlay), matching the reference's checkpoint-interval dumps
    (``train_imc.py:399-426``). ``preds``: host predictions for scene 0
    (shared with the sanity check so the diagnostics forward runs once)."""
    from ..utils import export as EX
    from ..utils.sanity_check import sanity_check_relative_poses
    from ..utils.vls import plot_cdf_pdf_curves

    out_dir = os.path.join(results_dir, "vls", f"step_{step}")
    os.makedirs(out_dir, exist_ok=True)
    per_view = []
    S = batch["images"].shape[1]
    for i in range(S):
        per_view.append(
            {
                "point_map": preds["point_map"][0, i],
                "xyz_cnf": preds["xyz_cnf"][0, i],
                "images": batch["images"][0, i],
            }
        )
    EX.save_pointcloud_ply(per_view, os.path.join(out_dir, "pred.ply"))
    EX.save_kitti_poses(preds["extrinsic"][0], os.path.join(out_dir, "poses_kitti.txt"))
    scene0 = {k: np.asarray(v[0]) for k, v in batch.items()
              if isinstance(v, np.ndarray)}
    # per-frame residual-distribution curves of the current predictions
    # (the reference plots the loss's frame statistics, train_imc.py:418-425)
    lcfg = tcfg.loss
    stats = jax.device_get(
        _cdf_stats_jit()(
            preds["extrinsic"][0], preds["intrinsic"][0], scene0, lcfg
        )
    )
    for name in ("exact", "approx"):
        plot_cdf_pdf_curves(
            stats[name]["frame_cdf"], stats[name]["frame_pdf"],
            lcfg.min_val, lcfg.max_val, lcfg.num_bins,
            os.path.join(out_dir, f"cdf_pdf_{name}.png"),
        )
    # annotated correspondence overlay (the reference's sanity-check artifact,
    # sanity_check.py:195-281); metrics come from the loop's sanity branch
    m = sanity_check_relative_poses(
        np.asarray(preds["extrinsic"][0]), np.asarray(preds["intrinsic"][0]),
        scene0, save_path=os.path.join(out_dir, "sanity_overlay.png"),
    )
    # bidirectional 3D-reprojection triptych (tuple2vls equivalent,
    # train/utils/vls.py:104-180)
    from ..utils.vls import reprojection_validation_grid

    reprojection_validation_grid(
        scene0, np.asarray(preds["extrinsic"][0]),
        np.asarray(preds["intrinsic"][0]),
        save_path=os.path.join(out_dir, "reproj_grid.png"),
    )
    return m


def maybe_init_distributed():
    """Multi-host: initialise JAX's distributed runtime when launched under a
    multi-process coordinator (the jax.distributed replacement for the
    reference's NCCL rendezvous, ``train_imc.py:47-58``). No-op single-host.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()}"
        )


def run(cfg: TrainerConfig):
    maybe_init_distributed()
    # persistent compile cache: full-model train-step compiles are ~50 s
    # through the remote-TPU AOT helper; relaunches (curve extensions,
    # resume-after-preemption) should not pay it again
    _cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    os.makedirs(cfg.results_dir, exist_ok=True)
    devices = jax.devices()
    num_context = cfg.num_context
    num_model = cfg.num_model
    num_data = max(len(devices) // (num_context * num_model), 1)
    mesh = Sh.make_mesh(
        num_data=num_data, num_context=num_context, num_model=num_model
    )
    print(
        f"mesh: data={num_data} context={num_context} model={num_model} "
        f"({devices[0].platform})"
    )

    model_kw = {}
    if cfg.depth != 24:
        # the DPT heads need exactly 4 tap layers; spread them over the depth
        assert cfg.depth >= 4, "model depth must be >= 4 (4 DPT tap layers)"
        model_kw["intermediate_layer_idx"] = tuple(
            round((i + 1) * cfg.depth / 4) - 1 for i in range(4)
        )
    model_cfg = M.make_config(
        img_size=cfg.img_size, compute_dtype=cfg.compute_dtype, remat=cfg.remat,
        embed_dim=cfg.embed_dim, depth=cfg.depth, num_heads=cfg.num_heads,
        vit_depth=cfg.vit_depth, **model_kw,
    )
    tcfg = replace(cfg.train, total_steps=cfg.total_steps, rank=cfg.rank,
                   num_images=cfg.num_images)

    key = jax.random.PRNGKey(cfg.seed)
    ckpt = CheckpointManager(os.path.join(cfg.results_dir, "checkpoints"))
    fsdp = tcfg.fsdp and num_data > 1
    tp = num_model > 1
    if cfg.pretrained:
        from ..utils import converter as C

        print(f"loading pretrained torch checkpoint: {cfg.pretrained}")
        sd = C.load_torch_state_dict(cfg.pretrained)
        params = C.convert_sailrecon(sd)
        if fsdp or tp:
            params = jax.device_put(
                params, Sh.param_sharding(mesh, params, fsdp=fsdp, tp=tp)
            )
        state = train_state_from_params(params, key, tcfg)
        if fsdp or tp:
            state["opt_state"] = jax.device_put(
                state["opt_state"],
                Sh.param_sharding(mesh, state["opt_state"], fsdp=fsdp, tp=tp),
            )
    elif cfg.init_params_from:
        print(f"seeding params from checkpoint: {cfg.init_params_from}")
        prev = CheckpointManager(cfg.init_params_from).restore()
        assert prev is not None, f"no checkpoint under {cfg.init_params_from}"
        prev_params = prev["params"]
        # cross-resolution hand-off: the ViT pos embed is the ONE param
        # whose shape depends on img_size; resample it to this phase's
        # native grid (everything else — patchify conv, rope tables, DPT
        # interp matrices — is resolution-independent or built at runtime)
        from ..layers.vit import resample_pos_embed

        pe = prev_params["aggregator"]["vit"]["pos_embed"]
        target_grid = cfg.img_size // model_cfg.aggregator.vit.patch_size
        if pe.shape[1] != target_grid * target_grid + 1:
            print(f"resampling ViT pos embed {pe.shape[1] - 1} -> "
                  f"{target_grid * target_grid} patch tokens")
            prev_params["aggregator"]["vit"]["pos_embed"] = jax.jit(
                resample_pos_embed, static_argnums=1)(pe, target_grid)
        if cfg.reinit_subtrees:
            names = [n.strip() for n in cfg.reinit_subtrees.split(",") if n.strip()]
            unknown = [n for n in names if n not in prev_params]
            assert not unknown, (
                f"--reinit-subtrees names not in params: {unknown} "
                f"(have {sorted(prev_params)})")
            fresh = jax.jit(lambda k: M.init_sailrecon(k, model_cfg))(
                jax.random.fold_in(key, 0xC0))
            for n in names:
                print(f"re-initializing param subtree: {n}")
                prev_params[n] = fresh[n]
            del fresh
        state = train_state_from_params(prev_params, key, tcfg)
        del prev, prev_params
        if fsdp or tp:
            for k in ("params", "opt_state"):
                state[k] = jax.device_put(
                    state[k],
                    Sh.param_sharding(mesh, state[k], fsdp=fsdp, tp=tp),
                )
    elif fsdp or tp:
        from .loop import init_train_state_sharded

        state = init_train_state_sharded(key, model_cfg, tcfg, mesh,
                                         fsdp=fsdp, tp=tp)
    else:
        state = init_train_state(key, model_cfg, tcfg)
    if ckpt.latest_step() is not None:
        print(f"resuming from step {ckpt.latest_step()}")
        state = ckpt.restore(template=state)
        # orbax restores arrays COMMITTED to the default device; re-place the
        # state on the mesh (params/opt on their FSDP/TP shardings, the rest
        # replicated) or jit rejects the mix with the mesh-sharded batch
        rep = Sh.replicated(mesh)
        if fsdp or tp:
            state["params"] = jax.device_put(
                state["params"],
                Sh.param_sharding(mesh, state["params"], fsdp=fsdp, tp=tp),
            )
            state["opt_state"] = jax.device_put(
                state["opt_state"],
                Sh.param_sharding(mesh, state["opt_state"], fsdp=fsdp, tp=tp),
            )
            for k in list(state):
                if k not in ("params", "opt_state"):
                    state[k] = jax.tree.map(
                        lambda x: jax.device_put(x, rep), state[k]
                    )
        else:
            state = jax.tree.map(lambda x: jax.device_put(x, rep), state)

    ds = IMC2021Scenes(
        cfg.data_root, sample_num=cfg.sample_num, num_images=cfg.num_images,
        target_size=cfg.img_size, use_native=cfg.native_loader,
    )
    print(f"dataset: {len(ds)} scenes (native_loader={ds.use_native})")
    # multi-host: each process loads only its own contiguous block of the
    # data-axis batch slots (the decode/sampling host work is the expensive
    # part the native loader accelerates — replicating it N-fold across
    # hosts makes the host feed the bottleneck at exactly the scale the mesh
    # targets); falls back to replicated loading when slots don't divide
    total_slots = num_data * cfg.scenes_per_step_per_device
    nproc = jax.process_count()
    if nproc > 1 and total_slots % nproc == 0:
        per = total_slots // nproc
        slots = range(jax.process_index() * per, (jax.process_index() + 1) * per)
        process_local_batch = True
    else:
        slots = range(total_slots)
        process_local_batch = False
    batches = scene_stream(ds, slots, cfg.seed, cfg.prefetch)

    # metrics / artifact dumps are primary-process-only, matching the
    # reference's rank-0 SummaryWriter + dumps (train_imc.py:396-426);
    # checkpointing runs on every process (orbax coordinates multihost saves)
    is_primary = jax.process_index() == 0
    writer = MetricsWriter(
        os.path.join(cfg.results_dir, "tensorboard") if is_primary else None,
        console_every=cfg.log_every if is_primary else 0,
    )
    from .loop import make_eval_forward

    # held-out validation: loads the eval scenes once; every process runs
    # the (deterministic) validator so the early-stop decision is identical
    # everywhere without a broadcast. Metrics/artifacts stay primary-only.
    from .validate import BestTracker, EvalConfig, make_validator

    ecfg = EvalConfig(
        data_root=cfg.eval_data_root, every=cfg.eval_every,
        num_images=cfg.eval_num_images, sample_num=cfg.eval_sample_num,
        heldout_from=cfg.eval_heldout_from, patience=cfg.early_stop_patience,
        min_delta=cfg.eval_min_delta,
    )
    validator = None
    best_ckpt = None
    tracker = BestTracker(ecfg.patience, ecfg.min_delta)
    if ecfg.enabled:
        validator = make_validator(model_cfg, tcfg, ecfg, cfg.img_size)
        if cfg.checkpoint_every:
            best_ckpt = CheckpointManager(
                os.path.join(cfg.results_dir, "checkpoints_best"),
                max_to_keep=1,
            )

    # preemption handling (SURVEY §5): TPU pods don't resize elastically —
    # the idiomatic recovery is checkpoint-on-SIGTERM + restart-resume. The
    # handler only sets a flag; the loop checkpoints at the next step edge
    # (full train state: params, opt, PRNG key, step) and exits cleanly.
    preempted = threading.Event()

    def _on_preempt(signum, frame):
        print(f"signal {signum}: checkpointing at next step edge", flush=True)
        preempted.set()

    prev_handlers = {}
    if threading.current_thread() is threading.main_thread():
        for sig in (signal.SIGTERM, signal.SIGINT):
            prev_handlers[sig] = signal.signal(sig, _on_preempt)

    with Sh.activate_mesh(mesh):
        step_fn = make_train_step(model_cfg, tcfg)
        step_fn_final = None
        if bool(cfg.loss_switch_step) != bool(cfg.loss_max_val_final):
            # half-configured curriculum would otherwise be silently ignored
            raise ValueError(
                "CDF-range curriculum needs BOTH --loss-switch-step and "
                "--loss-max-val-final (got switch_step="
                f"{cfg.loss_switch_step}, max_val_final="
                f"{cfg.loss_max_val_final}); set both or neither"
            )
        if cfg.loss_switch_step and cfg.loss_max_val_final:
            assert cfg.loss_switch_step < cfg.total_steps, (
                "loss_switch_step must be < total_steps or the curriculum "
                "never engages (steps AFTER the switch use the final range)"
            )
            tcfg_final = replace(
                tcfg,
                loss=replace(tcfg.loss, max_val=cfg.loss_max_val_final),
            )
            step_fn_final = make_train_step(model_cfg, tcfg_final)
        eval_fwd = make_eval_forward(model_cfg, tcfg)

        def diag_params(params):
            """Host copy of the params for primary-only diagnostics.

            Multi-process: FSDP/TP-sharded leaves span non-addressable
            devices, so fetching them directly would raise on the primary —
            instead EVERY process enters a collective reshard to fully
            replicated (each process then holds the whole value). Must be
            called from all processes at the same step.
            """
            if jax.process_count() == 1:
                return params
            rep = jax.tree.map(lambda _: Sh.replicated(mesh), params)
            return jax.device_get(jax.jit(lambda p: p, out_shardings=rep)(params))

        def save_state(step):
            """Checkpoint the live train state.

            Single-process: host copy (detached from device buffers).
            Multi-process: hand orbax the sharded jax.Arrays directly — it
            writes each process's shards into the shared directory; a
            device_get would raise on FSDP/TP leaves spanning
            non-addressable devices (and replicating them first would not
            fit HBM for exactly the models FSDP exists for).
            """
            if jax.process_count() == 1:
                ckpt.save(step, jax.device_get(state))
            else:
                ckpt.save(step, state)

        def eval_local(params_host, images_np, key):
            """Primary-only diagnostics forward on host data, host results.

            Multi-process: trace without the global mesh so the computation
            stays process-local — a jit over global-mesh arrays would
            require every process to participate while only the primary
            runs diagnostics.
            """
            if jax.process_count() == 1:
                return jax.device_get(eval_fwd(params_host, images_np, key))
            with Sh.activate_mesh(None):
                return jax.device_get(
                    eval_fwd(params_host, np.asarray(images_np), key)
                )

        step = int(state["step"])
        profiling = False
        last_step_time = None
        while step < cfg.total_steps and not preempted.is_set():
            if cfg.profile_steps and step == cfg.profile_start and not profiling:
                jax.profiler.start_trace(os.path.join(cfg.results_dir, "profile"))
                profiling = True
            host_batch = next(batches)
            batch = Sh.shard_batch(
                {k: v for k, v in host_batch.items() if isinstance(v, np.ndarray)},
                mesh, process_local=process_local_batch,
            )
            fn = (step_fn_final
                  if step_fn_final is not None and step >= cfg.loss_switch_step
                  else step_fn)
            with jax.profiler.StepTraceAnnotation("train", step_num=step):
                state, metrics = fn(state, batch)
            step = int(state["step"])
            if profiling and step >= cfg.profile_start + cfg.profile_steps:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                profiling = False
                print(f"profile trace written to {cfg.results_dir}/profile")
            scalars = {k: float(v) for k, v in jax.device_get(metrics).items()}
            # throughput counters (the BASELINE.md metric): frames processed
            # per second per chip from the host wall-clock between steps
            frames = batch["images"].shape[0] * batch["images"].shape[1]
            now = time.perf_counter()
            if last_step_time is not None and now > last_step_time:
                scalars["frames_per_sec_per_chip"] = frames / (
                    (now - last_step_time) * max(jax.device_count(), 1)
                )
                scalars["steps_per_sec"] = 1.0 / (now - last_step_time)
            last_step_time = now
            writer.write(step, scalars)
            do_sanity = bool(
                cfg.sanity_check_every and step % cfg.sanity_check_every == 0
            )
            do_artifacts = bool(
                cfg.artifact_every and step % cfg.artifact_every == 0
            )
            if do_sanity or do_artifacts:
                # collective (all processes), then primary-only consumption;
                # ONE diagnostics forward shared by the sanity check and the
                # artifact dump (they coincide at every artifact step)
                dparams = diag_params(state["params"])
                if is_primary:
                    preds = eval_local(
                        dparams, host_batch["images"][:1],
                        jax.random.fold_in(state["key"], step),
                    )
                    scene0 = {k: np.asarray(v[0]) for k, v in host_batch.items()
                              if isinstance(v, np.ndarray)}
            if is_primary and do_sanity:
                from ..utils.sanity_check import sanity_check_relative_poses

                m = sanity_check_relative_poses(
                    np.asarray(preds["extrinsic"][0]),
                    np.asarray(preds["intrinsic"][0]), scene0,
                )
                writer.write(step, m := {k: v for k, v in m.items() if k != "pair"},
                             prefix="sanity")
            if is_primary and do_artifacts:
                dump_artifacts(step, preds, tcfg, host_batch, cfg.results_dir)
            if cfg.checkpoint_every and step % cfg.checkpoint_every == 0:
                save_state(step)
            if validator is not None and step % ecfg.every == 0:
                # collective reshard (multi-process), then every process
                # scores identically — the stop decision needs no broadcast
                dparams = diag_params(state["params"])
                if jax.process_count() == 1:
                    vm = validator(dparams)
                else:
                    with Sh.activate_mesh(None):
                        vm = validator(dparams)
                improved, should_stop = tracker.update(
                    step, vm["px_residual"])
                if is_primary:
                    writer.write(
                        step, {**vm, "best_step": float(tracker.best_step)},
                        prefix="val")
                    print(
                        f"[val {step}] px_residual {vm['px_residual']:.3f} "
                        f"log {vm['log_residual']:.3f} (best "
                        f"{tracker.best:.3f} @ {tracker.best_step})"
                        + (" *" if improved else ""), flush=True)
                if improved and best_ckpt is not None:
                    if jax.process_count() == 1:
                        best_ckpt.save(step, jax.device_get(state))
                    else:
                        best_ckpt.save(step, state)
                if should_stop:
                    if is_primary:
                        print(
                            f"early stop at step {step}: no improvement in "
                            f"{tracker.stale} validations (best "
                            f"{tracker.best:.4f} @ step {tracker.best_step})",
                            flush=True)
                    break
    if validator is not None and is_primary:
        import json as _json

        with open(os.path.join(cfg.results_dir, "best.json"), "w") as f:
            _json.dump(tracker.summary(), f)
    if best_ckpt is not None:
        best_ckpt.wait()
        best_ckpt.close()
    # checkpoint_every=0 opts out of ALL saves (through the remote-TPU
    # tunnel a full-state device_get is minutes of wall clock; profiling and
    # curve runs don't want it)
    if cfg.checkpoint_every:
        save_state(step)
    ckpt.wait()
    ckpt.close()
    writer.close()
    for sig, h in prev_handlers.items():
        signal.signal(sig, h)
    if preempted.is_set():
        print(f"preempted: state saved at step {step}; rerun to resume")
    return state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--results-dir", default="results")
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--num-images", type=int, default=2)
    ap.add_argument("--sample-num", type=int, default=10_000)
    ap.add_argument("--img-size", type=int, default=518)
    ap.add_argument("--num-context", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel extent (model mesh axis)")
    ap.add_argument("--max-lr", type=float, default=2e-4)
    ap.add_argument("--warmup", type=int, default=2000)
    ap.add_argument("--pretrained", default="")
    ap.add_argument("--init-params-from", default="",
                    help="orbax checkpoint dir: seed params only (fresh "
                         "optimizer + schedule) — the coarse-to-fine "
                         "resolution-schedule hand-off")
    ap.add_argument("--reinit-subtrees", default="",
                    help="comma-separated top-level param subtrees (e.g. "
                         "camera_head) to re-initialize from random when "
                         "seeding via --init-params-from")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fsdp", action="store_true",
                    help="shard params + optimizer state over the data axis")
    ap.add_argument("--adam-mu-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--profile-start", type=int, default=0)
    ap.add_argument("--profile-steps", type=int, default=0,
                    help="capture a jax.profiler trace over N steps")
    ap.add_argument("--checkpoint-every", type=int, default=10_000)
    ap.add_argument("--artifact-every", type=int, default=10_000,
                    help="PLY/KITTI/CDF-PDF-curve dump interval (0 disables)")
    ap.add_argument("--sanity-check-every", type=int, default=500)
    ap.add_argument("--embed-dim", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=24)
    ap.add_argument("--num-heads", type=int, default=16)
    ap.add_argument("--vit-depth", type=int, default=24)
    ap.add_argument("--rank", type=int, default=300)
    ap.add_argument("--eval-every", type=int, default=0,
                    help="run held-out validation every N steps (needs "
                         "--eval-data-root; 0 disables)")
    ap.add_argument("--eval-data-root", default="",
                    help="directory of held-out scenes; the validation "
                         "metric is their self-supervised reprojection "
                         "residual (no GT poses needed)")
    ap.add_argument("--eval-num-images", type=int, default=8)
    ap.add_argument("--eval-sample-num", type=int, default=2048)
    ap.add_argument("--eval-heldout-from", type=int, default=0,
                    help="count only correspondence pairs touching frame "
                         "index >= K — for per-scene TTA point "
                         "--eval-data-root at the FULL scene and hold out "
                         "its tail frames from training")
    ap.add_argument("--eval-min-delta", type=float, default=0.0,
                    help="relative improvement required to count as a new "
                         "best (e.g. 0.01 = 1%%)")
    ap.add_argument("--early-stop-patience", type=int, default=0,
                    help="stop after P validations without improvement "
                         "(0 disables); the best state is kept in "
                         "<results-dir>/checkpoints_best")
    ap.add_argument("--no-native-loader", action="store_true",
                    help="force the pure-python data pipeline")
    ap.add_argument("--debug-nans", action="store_true",
                    help="enable jax_debug_nans: fail fast with a traceback "
                         "at the op that produced the first NaN (SURVEY §5 "
                         "NaN-guard; slows compilation, debugging only)")
    ap.add_argument("--loss-max-val", type=float, default=15.0,
                    help="CDF histogram upper bound over log1p residuals "
                         "(reference default 15, train_imc.py:332-336). "
                         "Residuals past it saturate the CDF and stop "
                         "producing gradient — raise it when training far "
                         "from a pretrained init (random-init smoke runs)")
    ap.add_argument("--loss-max-val-final", type=float, default=0.0,
                    help="steps after --loss-switch-step train with this "
                         "CDF max_val (0 disables)")
    ap.add_argument("--loss-switch-step", type=int, default=0)
    ap.add_argument("--grad-clip-norm", type=float, default=0.0,
                    help="global-norm gradient clip (0 = off, the "
                         "reference's configuration); recommended ~1.0 for "
                         "from-random runs — an unclipped spike can push "
                         "residuals past the CDF range where the loss "
                         "saturates with zero gradient (unrecoverable)")
    args = ap.parse_args()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    cfg = TrainerConfig(
        data_root=args.data_root,
        results_dir=args.results_dir,
        total_steps=args.steps,
        num_images=args.num_images,
        sample_num=args.sample_num,
        img_size=args.img_size,
        num_context=args.num_context,
        num_model=args.tp,
        pretrained=args.pretrained,
        init_params_from=args.init_params_from,
        reinit_subtrees=args.reinit_subtrees,
        compute_dtype=args.compute_dtype,
        seed=args.seed,
        profile_start=args.profile_start,
        profile_steps=args.profile_steps,
        loss_max_val_final=args.loss_max_val_final,
        loss_switch_step=args.loss_switch_step,
        checkpoint_every=args.checkpoint_every,
        artifact_every=args.artifact_every,
        sanity_check_every=args.sanity_check_every,
        embed_dim=args.embed_dim,
        depth=args.depth,
        num_heads=args.num_heads,
        vit_depth=args.vit_depth,
        rank=args.rank,
        native_loader=False if args.no_native_loader else None,
        eval_every=args.eval_every,
        eval_data_root=args.eval_data_root,
        eval_num_images=args.eval_num_images,
        eval_sample_num=args.eval_sample_num,
        eval_heldout_from=args.eval_heldout_from,
        eval_min_delta=args.eval_min_delta,
        early_stop_patience=args.early_stop_patience,
        train=TrainConfig(max_lr=args.max_lr, warmup_steps=args.warmup,
                          total_steps=args.steps,
                          loss=LossConfig(max_val=args.loss_max_val),
                          fsdp=args.fsdp, adam_mu_dtype=args.adam_mu_dtype,
                          grad_clip_norm=args.grad_clip_norm),
    )
    run(cfg)


if __name__ == "__main__":
    main()
