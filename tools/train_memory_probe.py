"""AOT memory analysis of the flagship train step (compile-only, no execute).

Answers "does the full ViT-L/24 @ 518 fine-tuning step fit one v5e chip
(16 GB HBM)?" without risking a runtime OOM: lower + compile the jitted
train step against abstract inputs on the real TPU backend and print XLA's
``memory_analysis()``. The reference trains the FULL 1.49 B-param model with
Adam (``/root/reference/train/train_imc.py:475``), so the fp32 state alone is
params 6 + mu 6 + nu 6 = 18 GB replicated — the probe quantifies what remat /
bf16-mu / donation actually buy, and (with ``--mesh N``) what the FSDP shard
per chip costs.

Usage:
  python tools/train_memory_probe.py [--frames 2] [--img 518] [--mu bfloat16]
      [--remat] [--mesh N] [--backend tpu|cpu]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2)  # train_imc.py:552
    ap.add_argument("--img", type=int, default=518)
    ap.add_argument("--sample-num", type=int, default=10000)  # imc2021.py:20
    ap.add_argument("--mu", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--mesh", type=int, default=0,
                    help="FSDP data-axis size (0 = single device, no mesh)")
    ap.add_argument("--backend", default=None, choices=[None, "tpu", "cpu"])
    args = ap.parse_args()

    if args.backend == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS",
            f"--xla_force_host_platform_device_count={max(args.mesh, 1)}",
        )
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    if args.backend != "cpu":
        # TPU-only: XLA:CPU AOT cache entries are host-specific (SIGILL on
        # feature mismatch when reloaded on another box)
        os.makedirs(os.path.join(REPO, ".jax_cache"), exist_ok=True)
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from self_supervise_sfm_tpu.models import sailrecon as M
    from self_supervise_sfm_tpu.parallel import sharding as Sh
    from self_supervise_sfm_tpu.train import loop as L

    S, IMG, K = args.frames, args.img, args.sample_num
    P = S * (S - 1)  # all ordered pairs
    B = 1

    mcfg = M.make_config(compute_dtype="bfloat16", remat=args.remat)
    tcfg = L.TrainConfig(rank=300, num_images=S, adam_mu_dtype=args.mu,
                         fsdp=args.mesh > 1)

    batch = {
        "images": jax.ShapeDtypeStruct((B, S, IMG, IMG, 3), jnp.float32),
        "K_prime_to_K": jax.ShapeDtypeStruct((B, S, 3, 3), jnp.float32),
        "src_idx": jax.ShapeDtypeStruct((B, P), jnp.int32),
        "dst_idx": jax.ShapeDtypeStruct((B, P), jnp.int32),
        "src_coords": jax.ShapeDtypeStruct((B, P, K, 2), jnp.float32),
        "dst_coords": jax.ShapeDtypeStruct((B, P, K, 2), jnp.float32),
        "src_depth": jax.ShapeDtypeStruct((B, P, K), jnp.float32),
        "dst_depth": jax.ShapeDtypeStruct((B, P, K), jnp.float32),
        "pair_valid": jax.ShapeDtypeStruct((B, P), jnp.float32),
    }

    state_shapes = jax.eval_shape(
        lambda k: L.init_train_state(k, mcfg, tcfg), jax.random.PRNGKey(0)
    )
    n_params = sum(
        int(np.prod(l.shape))
        for l in jax.tree.leaves(state_shapes["params"])
    )
    print(f"params: {n_params/1e6:.1f} M  frames={S} img={IMG} "
          f"mu={args.mu} remat={args.remat} mesh={args.mesh}", flush=True)

    def lower_and_report(step, state_sds, batch_sds):
        lowered = step.lower(state_sds, batch_sds)
        print("lowered; compiling (AOT, no execute)...", flush=True)
        try:
            compiled = lowered.compile()
        except Exception as e:  # noqa: BLE001 — XLA OOM is the probe's answer
            msg = str(e)
            out = {"oom": True, "config": {
                "frames": S, "img": IMG, "mu": args.mu, "remat": args.remat,
                "mesh": args.mesh, "params_m": round(n_params / 1e6, 1)}}
            import re
            m = re.search(r"Used ([\d.]+)G of ([\d.]+)G hbm", msg)
            if m:
                out["used_gb"], out["hbm_gb"] = float(m.group(1)), float(m.group(2))
            print(json.dumps(out, indent=1), flush=True)
            print(msg.split("Largest program allocations")[0], flush=True)
            return out
        ma = compiled.memory_analysis()
        out = {
            "argument_bytes_gb": round(ma.argument_size_in_bytes / 2**30, 3),
            "output_bytes_gb": round(ma.output_size_in_bytes / 2**30, 3),
            "temp_bytes_gb": round(ma.temp_size_in_bytes / 2**30, 3),
            "alias_bytes_gb": round(ma.alias_size_in_bytes / 2**30, 3),
            "generated_code_gb": round(
                ma.generated_code_size_in_bytes / 2**30, 3),
        }
        # peak live = args + temps + outputs - aliased (donated) buffers
        out["peak_gb_estimate"] = round(
            out["argument_bytes_gb"] + out["temp_bytes_gb"]
            + out["output_bytes_gb"] - out["alias_bytes_gb"], 3
        )
        out["config"] = {
            "frames": S, "img": IMG, "sample_num": K, "mu": args.mu,
            "remat": args.remat, "mesh": args.mesh,
            "backend": jax.devices()[0].platform, "params_m": round(n_params/1e6, 1),
        }
        print(json.dumps(out, indent=1), flush=True)
        return out

    if args.mesh > 1:
        devs = jax.devices()[: args.mesh]
        mesh = Sh.make_mesh(num_data=len(devs))
        with Sh.activate_mesh(mesh):
            shardings = Sh.param_sharding(mesh, state_shapes, fsdp=True)
            state_sds = jax.tree.map(
                lambda sd, sh: jax.ShapeDtypeStruct(sd.shape, sd.dtype, sharding=sh),
                state_shapes, shardings,
            )
            batch_sh = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(Sh.DATA_AXIS))
            batch_sds = {
                k: jax.ShapeDtypeStruct(
                    (len(devs),) + v.shape[1:], v.dtype, sharding=batch_sh)
                for k, v in batch.items()
            }
            step = L.make_train_step(mcfg, tcfg)
            lower_and_report(step, state_sds, batch_sds)
    else:
        step = L.make_train_step(mcfg, tcfg)
        lower_and_report(step, state_shapes, batch)


if __name__ == "__main__":
    main()
