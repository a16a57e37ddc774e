"""Worker process for the multi-process distributed-BA test.

Launched as ``python -m tests._ba_mh_worker <coordinator_port> <num_procs>
<proc_id> <out_npz>`` by ``tests/test_native_ba.py::test_multiprocess_psum``.
Each process initializes ``jax.distributed`` on the CPU backend, solves the
same seeded synthetic problem with :func:`ba_solve_multihost`, and process 0
writes the (replicated) solution for the parent to compare against the
single-process solver.
"""

import sys

import numpy as np


def make_worker_problem():
    """The shared synthetic problem — deterministic, no pytest fixtures."""
    from tests.test_bundle_adjust import make_ba_scene
    from self_supervise_sfm_tpu.ops import geometry as G
    import jax.numpy as jnp

    rng = np.random.default_rng(1234)
    exts, Ks, pts, ci, pi, uv = make_ba_scene(rng, noise_px=0.2)
    exts_n = exts.copy()
    for c in range(1, exts.shape[0]):
        daa = rng.normal(scale=0.01, size=3).astype(np.float32)
        dR = np.asarray(G.axis_angle_to_mat(jnp.asarray(daa)))
        exts_n[c, :3, :3] = dR @ exts_n[c, :3, :3]
        exts_n[c, :3, 3] += rng.normal(scale=0.02, size=3).astype(np.float32)
    pts_n = pts + rng.normal(scale=0.03, size=pts.shape).astype(np.float32)
    return exts_n, Ks, pts_n, ci, pi, uv


def main():
    port, nproc, pid, out = sys.argv[1:5]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=int(nproc),
        process_id=int(pid),
    )
    assert jax.process_count() == int(nproc)

    exts_n, Ks, pts_n, ci, pi, uv = make_worker_problem()
    from self_supervise_sfm_tpu.native import ba as NBA

    ext, pts, info = NBA.ba_solve_multihost(
        exts_n, Ks, pts_n, ci, pi, uv, max_iters=15, init_lambda=1e-3,
    )
    if int(pid) == 0:
        np.savez(out, ext=ext, pts=pts, final_cost=info["final_cost"])
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
