"""Smoke test of the full trainer loop on synthetic scenes (tiny model)."""

import os

import jax
import numpy as np
import pytest

from self_supervise_sfm_tpu.data.synthetic import make_synthetic_dataset


def test_trainer_runs_and_checkpoints(tmp_path, monkeypatch):
    from dataclasses import replace

    from self_supervise_sfm_tpu.train import trainer as T
    from self_supervise_sfm_tpu.train.loop import TrainConfig
    from self_supervise_sfm_tpu.train.loss import LossConfig
    from self_supervise_sfm_tpu.models import sailrecon as M

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, num_scenes=2, num_images=3, image_size=(40, 32))

    # shrink the model inside run() by patching make_config defaults
    orig_make = M.make_config

    def tiny_make_config(**kw):
        kw.update(
            dict(img_size=28, embed_dim=64, depth=4, num_heads=4, vit_depth=2,
                 intermediate_layer_idx=(0, 1, 2, 3))
        )
        return orig_make(**kw)

    monkeypatch.setattr(M, "make_config", tiny_make_config)

    cfg = T.TrainerConfig(
        data_root=root,
        results_dir=str(tmp_path / "results"),
        total_steps=3,
        num_images=2,
        sample_num=64,
        img_size=28,
        num_context=1,
        checkpoint_every=2,
        artifact_every=2,
        sanity_check_every=2,
        log_every=1,
        compute_dtype="float32",
        remat=False,
        rank=2,
        train=TrainConfig(max_lr=1e-4, warmup_steps=2, total_steps=3, rank=2,
                          num_images=2, loss=LossConfig(num_bins=50)),
    )
    state = T.run(cfg)
    assert int(state["step"]) == 3
    # checkpoint written
    assert os.path.isdir(os.path.join(cfg.results_dir, "checkpoints"))
    # artifacts written at step 2
    vls_dir = os.path.join(cfg.results_dir, "vls", "step_2")
    assert os.path.exists(os.path.join(vls_dir, "pred.ply"))
    assert os.path.exists(os.path.join(vls_dir, "poses_kitti.txt"))
    # tuple2vls-equivalent reprojection triptych
    assert os.path.exists(os.path.join(vls_dir, "reproj_grid.png"))
    # per-frame residual-distribution curves (train_imc.py:418-425 parity)
    assert os.path.exists(os.path.join(vls_dir, "cdf_pdf_exact.png"))
    assert os.path.exists(os.path.join(vls_dir, "cdf_pdf_approx.png"))


def test_trainer_fsdp_profile(tmp_path):
    """Trainer with FSDP sharding + jax.profiler trace window + model-size
    overrides (no monkeypatch: the real CLI-exposed config path)."""
    import glob

    from self_supervise_sfm_tpu.train import trainer as T
    from self_supervise_sfm_tpu.train.loop import TrainConfig
    from self_supervise_sfm_tpu.train.loss import LossConfig

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, num_scenes=4, num_images=2, image_size=(40, 32))

    cfg = T.TrainerConfig(
        data_root=root,
        results_dir=str(tmp_path / "results"),
        total_steps=4,
        num_images=2,
        sample_num=64,
        img_size=28,
        num_context=2,
        checkpoint_every=0,
        artifact_every=0,
        sanity_check_every=0,
        log_every=1,
        compute_dtype="float32",
        remat=False,
        rank=2,
        embed_dim=64,
        depth=4,
        num_heads=4,
        vit_depth=2,
        profile_start=1,
        profile_steps=2,
        train=TrainConfig(max_lr=1e-4, warmup_steps=2, total_steps=4, rank=2,
                          num_images=2, loss=LossConfig(num_bins=50),
                          fsdp=True, adam_mu_dtype="bfloat16"),
    )
    state = T.run(cfg)
    assert int(state["step"]) == 4
    assert np.isfinite(float(np.asarray(
        jax.tree_util.tree_leaves(state["params"])[0]
    ).sum()))
    traces = glob.glob(
        os.path.join(cfg.results_dir, "profile", "**", "*.xplane.pb"),
        recursive=True,
    )
    assert traces, "profiler trace not written"


def test_trainer_preemption_checkpoint_and_resume(tmp_path, monkeypatch):
    """SIGTERM mid-run -> clean exit with a full-state checkpoint; a rerun
    resumes from the saved step and finishes (SURVEY §5 failure recovery)."""
    import signal as _signal
    from dataclasses import replace

    from self_supervise_sfm_tpu.train import trainer as T
    from self_supervise_sfm_tpu.train.loop import TrainConfig
    from self_supervise_sfm_tpu.train.loss import LossConfig
    from self_supervise_sfm_tpu.models import sailrecon as M
    from self_supervise_sfm_tpu.train.metrics import MetricsWriter

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, num_scenes=1, num_images=2, image_size=(40, 32))

    orig_make = M.make_config

    def tiny_make_config(**kw):
        kw.update(
            dict(img_size=28, embed_dim=64, depth=4, num_heads=4, vit_depth=1,
                 intermediate_layer_idx=(0, 1, 2, 3))
        )
        return orig_make(**kw)

    monkeypatch.setattr(M, "make_config", tiny_make_config)

    handlers = {}
    orig_signal = _signal.signal

    def record_signal(sig, h):
        handlers[sig] = h
        return _signal.SIG_DFL

    monkeypatch.setattr(_signal, "signal", record_signal)

    orig_write = MetricsWriter.write

    def write_and_preempt(self, step, scalars, prefix="train"):
        orig_write(self, step, scalars, prefix)
        if prefix == "train" and step >= 2 and _signal.SIGTERM in handlers:
            handlers[_signal.SIGTERM](_signal.SIGTERM, None)

    monkeypatch.setattr(MetricsWriter, "write", write_and_preempt)

    cfg = T.TrainerConfig(
        data_root=root,
        results_dir=str(tmp_path / "results"),
        total_steps=5,
        num_images=2,
        sample_num=64,
        img_size=28,
        num_context=1,
        checkpoint_every=0,
        artifact_every=0,
        sanity_check_every=0,
        log_every=1,
        compute_dtype="float32",
        remat=False,
        rank=2,
        train=TrainConfig(max_lr=1e-4, warmup_steps=2, total_steps=5, rank=2,
                          num_images=2, loss=LossConfig(num_bins=50)),
    )
    state = T.run(cfg)
    stopped_at = int(state["step"])
    assert 2 <= stopped_at < 5  # preempted early, state saved
    assert os.path.isdir(os.path.join(cfg.results_dir, "checkpoints"))

    # resume: no preemption this time
    monkeypatch.setattr(MetricsWriter, "write", orig_write)
    state2 = T.run(cfg)
    assert int(state2["step"]) == 5


def test_trainer_multiprocess_matches_single(tmp_path):
    """True multi-host training: 2 OS processes (1 CPU device each) under
    jax.distributed vs 1 process with 2 devices, with FSDP state sharding
    and the collective rank-0 sanity diagnostics on. Same seed -> identical
    global batches -> the data-parallel gradient psum must produce identical
    final parameters (the DDP-equivalence guarantee, train_imc.py:472); also
    exercises the cross-process param reshard for diagnostics and the
    distributed orbax save of process-spanning shards."""
    import socket
    import subprocess
    import sys

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, num_scenes=2, num_images=3, image_size=(40, 32))

    def run_workers(nprocs, ndev, tag):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        out = str(tmp_path / f"{tag}.npz")
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo
        procs = [
            subprocess.Popen(
                [sys.executable, "-m", "tests._trainer_mh_worker",
                 str(port), str(nprocs), str(i), str(ndev), root,
                 str(tmp_path / f"res_{tag}"), out, "1"],  # fsdp on
                env=env, cwd=repo,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for i in range(nprocs)
        ]
        logs = [p.communicate(timeout=900)[0].decode() for p in procs]
        assert all(p.returncode == 0 for p in procs), logs
        return np.load(out)

    multi = run_workers(nprocs=2, ndev=1, tag="mp")
    single = run_workers(nprocs=1, ndev=2, tag="sp")
    assert int(multi["step"]) == 2 and int(single["step"]) == 2
    np.testing.assert_allclose(
        multi["checksums"], single["checksums"], rtol=1e-5, atol=1e-6
    )


def test_trainer_max_val_curriculum(tmp_path, monkeypatch):
    """The CDF-range anneal switches step functions at --loss-switch-step:
    metrics flow through the switch, the run completes, and checkpointing
    can be fully disabled (checkpoint_every=0 writes nothing)."""
    import json

    from self_supervise_sfm_tpu.train import trainer as T
    from self_supervise_sfm_tpu.train.loop import TrainConfig
    from self_supervise_sfm_tpu.train.loss import LossConfig
    from self_supervise_sfm_tpu.models import sailrecon as M

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, num_scenes=1, num_images=3,
                           image_size=(40, 32))
    orig_make = M.make_config

    def tiny_make_config(**kw):
        kw.update(
            dict(img_size=28, embed_dim=64, depth=4, num_heads=4, vit_depth=2,
                 intermediate_layer_idx=(0, 1, 2, 3))
        )
        return orig_make(**kw)

    monkeypatch.setattr(M, "make_config", tiny_make_config)

    cfg = T.TrainerConfig(
        data_root=root,
        results_dir=str(tmp_path / "results"),
        total_steps=4,
        num_images=2,
        sample_num=64,
        img_size=28,
        checkpoint_every=0,
        artifact_every=0,
        sanity_check_every=0,
        log_every=1,
        compute_dtype="float32",
        remat=False,
        rank=2,
        loss_max_val_final=15.0,
        loss_switch_step=2,
        train=TrainConfig(max_lr=1e-4, warmup_steps=2, total_steps=4, rank=2,
                          num_images=2,
                          loss=LossConfig(num_bins=50, max_val=25.0)),
    )
    state = T.run(cfg)
    assert int(state["step"]) == 4
    rows = [
        json.loads(l)
        for l in open(os.path.join(cfg.results_dir, "tensorboard",
                                   "metrics.jsonl"))
        if '"train"' in l
    ]
    steps = [r["step"] for r in rows]
    assert steps == [1, 2, 3, 4]
    assert all(np.isfinite(r["loss"]) for r in rows)
    # checkpoint_every=0: no state was ever written
    assert not os.listdir(os.path.join(cfg.results_dir, "checkpoints"))


def test_grad_clip_norm_bounds_update():
    """grad_clip_norm > 0 chains a global-norm clip before adam: the
    clipped gradient entering the optimizer has norm <= the clip value
    (saturation-cliff guard for from-random curve runs; 0 = reference
    behavior, no clipping)."""
    import jax.numpy as jnp
    import optax

    from self_supervise_sfm_tpu.train.loop import TrainConfig, make_optimizer

    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    big_grads = jax.tree.map(lambda p: 100.0 * jnp.ones_like(p), params)

    for clip, expect_scaled in ((0.5, True), (0.0, False)):
        cfg = TrainConfig(max_lr=1.0, warmup_steps=0, total_steps=10,
                          grad_clip_norm=clip)
        opt = make_optimizer(cfg)
        state = opt.init(params)
        updates, _ = opt.update(big_grads, state, params)
        # adam normalizes magnitudes, so compare against the unclipped
        # optimizer's updates instead of the raw gradient norm
        if expect_scaled:
            clipped, _ = optax.clip_by_global_norm(clip).update(
                big_grads, (), params)
            assert float(optax.global_norm(clipped)) <= clip + 1e-6
        assert all(np.isfinite(np.asarray(u)).all()
                   for u in jax.tree.leaves(updates))


def test_init_params_from_cross_resolution(tmp_path, monkeypatch):
    """Coarse-to-fine hand-off: phase A trains+checkpoints at img 28, phase
    B seeds params from it at img 56 — the ViT pos embed (the one
    resolution-shaped param) is resampled at load; everything else carries
    over unchanged, with a fresh optimizer/step."""
    from self_supervise_sfm_tpu.train import trainer as T
    from self_supervise_sfm_tpu.train.loop import TrainConfig
    from self_supervise_sfm_tpu.train.loss import LossConfig
    from self_supervise_sfm_tpu.models import sailrecon as M

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, num_scenes=1, num_images=3,
                           image_size=(80, 60))
    orig_make = M.make_config

    def tiny_make_config(**kw):
        kw.update(dict(embed_dim=64, depth=4, num_heads=4, vit_depth=2,
                       intermediate_layer_idx=(0, 1, 2, 3)))
        return orig_make(**kw)

    monkeypatch.setattr(M, "make_config", tiny_make_config)

    def cfg(img, results, **kw):
        return T.TrainerConfig(
            data_root=root, results_dir=str(tmp_path / results),
            total_steps=2, num_images=2, sample_num=64, img_size=img,
            checkpoint_every=2, artifact_every=0, sanity_check_every=0,
            log_every=1, compute_dtype="float32", remat=False, rank=2,
            train=TrainConfig(max_lr=1e-4, warmup_steps=1, total_steps=2,
                              rank=2, num_images=2,
                              loss=LossConfig(num_bins=50)),
            **kw,
        )

    T.run(cfg(28, "phaseA"))
    ckpt = os.path.join(str(tmp_path / "phaseA"), "checkpoints")
    state = T.run(cfg(56, "phaseB", init_params_from=ckpt))
    assert int(state["step"]) == 2
    pe = state["params"]["aggregator"]["vit"]["pos_embed"]
    assert pe.shape[1] == (56 // 14) ** 2 + 1  # resampled to the 4x4 grid


def test_best_tracker_logic():
    """BestTracker: first measurement always counts; min_delta gates what
    counts as improvement; patience counts consecutive stale validations."""
    from self_supervise_sfm_tpu.train.validate import BestTracker

    t = BestTracker(patience=2, min_delta=0.1)
    assert t.update(1, 10.0) == (True, False)
    # 9.5 is < 10 but not 10% better -> stale
    assert t.update(2, 9.5) == (False, False)
    assert t.update(3, 8.0) == (True, False)  # >10% better, resets patience
    assert t.update(4, 8.0) == (False, False)
    assert t.update(5, 8.0) == (False, True)  # 2 stale -> stop
    assert t.best_step == 3 and t.best == 8.0


def test_trainer_validation_early_stop(tmp_path, monkeypatch):
    """--eval-every + --early-stop-patience: validation metrics are written,
    the best state lands in checkpoints_best, and training stops before
    total_steps once the metric stops improving (min_delta forced high so
    the second validation is guaranteed stale)."""
    import json

    from self_supervise_sfm_tpu.train import trainer as T
    from self_supervise_sfm_tpu.train.loop import TrainConfig
    from self_supervise_sfm_tpu.train.loss import LossConfig
    from self_supervise_sfm_tpu.models import sailrecon as M

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, num_scenes=1, num_images=3,
                           image_size=(40, 32))
    eval_root = str(tmp_path / "eval")
    make_synthetic_dataset(eval_root, num_scenes=1, num_images=3,
                           image_size=(40, 32))
    orig_make = M.make_config

    def tiny_make_config(**kw):
        kw.update(
            dict(img_size=28, embed_dim=64, depth=4, num_heads=4, vit_depth=2,
                 intermediate_layer_idx=(0, 1, 2, 3))
        )
        return orig_make(**kw)

    monkeypatch.setattr(M, "make_config", tiny_make_config)

    cfg = T.TrainerConfig(
        data_root=root,
        results_dir=str(tmp_path / "results"),
        total_steps=10,
        num_images=2,
        sample_num=64,
        img_size=28,
        checkpoint_every=100,  # saves enabled (gates checkpoints_best)
        artifact_every=0,
        sanity_check_every=0,
        log_every=1,
        compute_dtype="float32",
        remat=False,
        rank=2,
        eval_every=1,
        eval_data_root=eval_root,
        eval_num_images=3,
        eval_sample_num=64,
        eval_heldout_from=2,  # pairs touching frame 2 only
        eval_min_delta=10.0,  # nothing after the first eval can improve
        early_stop_patience=1,
        train=TrainConfig(max_lr=1e-4, warmup_steps=2, total_steps=10, rank=2,
                          num_images=2, loss=LossConfig(num_bins=50)),
    )
    state = T.run(cfg)
    # stopped at the second validation, far before total_steps
    assert int(state["step"]) == 2
    best = json.load(open(os.path.join(cfg.results_dir, "best.json")))
    assert best["best_step"] == 1
    assert np.isfinite(best["best_val_px_residual"])
    # best checkpoint kept (step-1 state)
    best_dir = os.path.join(cfg.results_dir, "checkpoints_best")
    assert os.path.isdir(os.path.join(best_dir, "1"))
    # val metrics logged
    rows = [
        json.loads(l)
        for l in open(os.path.join(cfg.results_dir, "tensorboard",
                                   "metrics.jsonl"))
        if '"val"' in l
    ]
    assert len(rows) == 2
    assert all(np.isfinite(r["px_residual"]) for r in rows)


def test_reinit_subtrees_on_handoff(tmp_path, monkeypatch):
    """--reinit-subtrees camera_head: the hand-off carries every subtree
    except the named one, which restarts from fresh init (the r5 basin
    experiment's control knob)."""
    from self_supervise_sfm_tpu.train import trainer as T
    from self_supervise_sfm_tpu.train.loop import TrainConfig
    from self_supervise_sfm_tpu.train.loss import LossConfig
    from self_supervise_sfm_tpu.models import sailrecon as M

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, num_scenes=1, num_images=3,
                           image_size=(40, 32))
    orig_make = M.make_config

    def tiny_make_config(**kw):
        kw.update(dict(img_size=28, embed_dim=64, depth=4, num_heads=4,
                       vit_depth=2, intermediate_layer_idx=(0, 1, 2, 3)))
        return orig_make(**kw)

    monkeypatch.setattr(M, "make_config", tiny_make_config)

    def cfg(results, **kw):
        return T.TrainerConfig(
            data_root=root, results_dir=str(tmp_path / results),
            total_steps=1, num_images=2, sample_num=64, img_size=28,
            checkpoint_every=1, artifact_every=0, sanity_check_every=0,
            log_every=1, compute_dtype="float32", remat=False, rank=2,
            train=TrainConfig(max_lr=0.0, warmup_steps=1, total_steps=1,
                              rank=2, num_images=2,
                              loss=LossConfig(num_bins=50)),
            **kw,
        )

    stateA = T.run(cfg("phaseA"))
    ckpt = os.path.join(str(tmp_path / "phaseA"), "checkpoints")
    stateB = T.run(cfg("phaseB", init_params_from=ckpt,
                       reinit_subtrees="camera_head"))
    # lr=0 -> params unchanged by the single step; compare directly
    vitA = np.asarray(jax.tree_util.tree_leaves(
        stateA["params"]["aggregator"]["vit"]["blocks"])[0])
    vitB = np.asarray(jax.tree_util.tree_leaves(
        stateB["params"]["aggregator"]["vit"]["blocks"])[0])
    np.testing.assert_array_equal(vitA, vitB)  # carried
    camA = np.concatenate([np.asarray(x).ravel() for x in
                           jax.tree_util.tree_leaves(
                               stateA["params"]["camera_head"])])
    camB = np.concatenate([np.asarray(x).ravel() for x in
                           jax.tree_util.tree_leaves(
                               stateB["params"]["camera_head"])])
    assert not np.allclose(camA, camB)  # re-initialized
