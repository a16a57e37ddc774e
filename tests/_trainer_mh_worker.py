"""Worker process for the multi-process trainer test.

Launched as ``python -m tests._trainer_mh_worker <coordinator_port> <nprocs>
<proc_id> <local_devices> <data_root> <results_dir> <out_npz>`` by
``tests/test_trainer.py::test_trainer_multiprocess_matches_single``. Each
process initializes ``jax.distributed`` on the CPU backend (skipped when
nprocs == 1) and runs the full trainer for two steps on a tiny model; the
primary writes per-leaf parameter checksums for the parent to compare
against the single-process run over the same global device count.
"""

import os
import sys


def main():
    port, nprocs, pid, ndev, data_root, results_dir, out_npz = sys.argv[1:8]
    fsdp = len(sys.argv) > 8 and sys.argv[8] == "1"
    nprocs, pid, ndev = int(nprocs), int(pid), int(ndev)
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        # generous rendezvous timeout: CI boxes running the full suite can
        # stall a worker's startup long enough to trip the default
        jax.distributed.initialize(
            f"localhost:{port}", nprocs, pid, initialization_timeout=600
        )

    import numpy as np

    from self_supervise_sfm_tpu.models import sailrecon as M
    from self_supervise_sfm_tpu.train import trainer as T
    from self_supervise_sfm_tpu.train.loop import TrainConfig
    from self_supervise_sfm_tpu.train.loss import LossConfig

    # tiny flagship-shaped model (same shrink as test_trainer)
    orig_make = M.make_config

    def tiny_make_config(**kw):
        # embed 128 so the MLP fc1/fc2 leaves (128*512 = 65536 elems) clear
        # param_sharding's MIN_SHARD_ELEMS and actually shard across the two
        # processes under FSDP
        kw.update(
            dict(img_size=28, embed_dim=128, depth=4, num_heads=4, vit_depth=2,
                 intermediate_layer_idx=(0, 1, 2, 3))
        )
        return orig_make(**kw)

    M.make_config = tiny_make_config

    cfg = T.TrainerConfig(
        data_root=data_root,
        results_dir=results_dir,
        total_steps=2,
        num_images=2,
        sample_num=64,
        img_size=28,
        checkpoint_every=0,
        artifact_every=0,
        # sanity_check_every=2 exercises the collective diag_params reshard
        # (FSDP/TP-sharded params -> replicated host copy) + rank-0 eval
        sanity_check_every=2,
        log_every=1,
        compute_dtype="float32",
        remat=False,
        rank=2,
        native_loader=False,
        train=TrainConfig(max_lr=1e-4, warmup_steps=1, total_steps=2, rank=2,
                          num_images=2, loss=LossConfig(num_bins=50),
                          fsdp=fsdp),
    )
    state = T.run(cfg)
    params = state["params"]
    if nprocs > 1:
        # FSDP leaves span processes: collectively reshard to replicated
        # before fetching (all processes must enter)
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        mesh = Mesh(np.asarray(jax.devices()), ("all",))
        rep = jax.tree.map(
            lambda _: NamedSharding(mesh, PartitionSpec()), params
        )
        params = jax.device_get(jax.jit(lambda p: p, out_shardings=rep)(params))
    if pid == 0:
        leaves = jax.tree_util.tree_leaves(jax.device_get(params))
        checks = np.asarray([float(np.sum(np.asarray(l))) for l in leaves])
        np.savez(out_npz, checksums=checks, step=int(state["step"]))
    if nprocs > 1:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
