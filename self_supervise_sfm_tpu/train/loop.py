"""Training step: pjit data-parallel self-supervised fine-tuning.

Re-design of ``train_worker``/``train_epoch`` (``train/train_imc.py:320-430``)
minus the reference's bugs (one-batch-per-epoch ``break`` at ``:428``,
weights-only checkpoints with no resume, ``:272-286``).

TPU mapping:
- one jitted ``train_step`` over a (data, context) mesh; gradients reduce
  over ``data`` via XLA (the DDP all-reduce equivalent);
- bf16 trunk compute with fp32 params/optimizer (replacing torch AMP +
  GradScaler — bf16 needs no loss scaling);
- optax Adam + linear-warmup cosine schedule (``train_imc.py:61-85``);
- full train state (params, opt state, PRNG key, step) checkpointed via
  orbax (see ``checkpoint.py``) — deterministic resume including the
  subsampling key the reference forgot to save (``aggregator.py:629-631``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import sailrecon as M
from ..parallel import sharding as Sh
from .loss import LossConfig, scene_loss


@dataclass(frozen=True)
class TrainConfig:
    max_lr: float = 2e-4
    warmup_steps: int = 2000
    total_steps: int = 100_000
    min_lr_ratio: float = 0.01  # train_imc.py:484
    rank: int = 300
    num_images: int = 2  # frames per scene (train_imc.py:552)
    loss: LossConfig = field(default_factory=LossConfig)
    # Adam first-moment dtype. bfloat16 halves the largest optimizer buffer
    # (the flagship model is ~1.3B params; m+v in f32 = 10.4 GB, more than
    # half a v5e chip's HBM). f32 default matches the reference exactly.
    adam_mu_dtype: str = "float32"
    # Shard params + optimizer state over the mesh's data axis (FSDP/ZeRO-3
    # style): each leaf's largest divisible dim is sharded; XLA inserts the
    # per-layer all-gathers and reduce-scatters. Activated only when a mesh
    # with data extent > 1 is active at make_train_step time.
    fsdp: bool = False
    # Global-norm gradient clipping (0 disables — the reference's exact
    # configuration, no clipping anywhere in train_imc.py). Opt-in for
    # from-random curve runs: the CDF loss saturates at 2.0 with ZERO
    # gradient once residuals exceed max_val, so a single spike-driven bad
    # step can push the whole residual distribution over the boundary and
    # kill the run unrecoverably (measured: the 154px phase died exactly
    # this way at step ~4700, grad spikes of 20-55x the typical norm).
    grad_clip_norm: float = 0.0


def make_schedule(cfg: TrainConfig):
    # short smoke/profile runs can have total_steps < warmup_steps; clamp so
    # the cosine decay span stays positive
    warmup = min(cfg.warmup_steps, cfg.total_steps)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.max_lr,
        warmup_steps=warmup,
        decay_steps=max(cfg.total_steps, warmup + 1),
        end_value=cfg.max_lr * cfg.min_lr_ratio,
    )


def make_optimizer(cfg: TrainConfig):
    adam = optax.adam(
        make_schedule(cfg), b1=0.9, b2=0.999, eps=1e-8,
        mu_dtype=jnp.dtype(cfg.adam_mu_dtype),
    )
    if cfg.grad_clip_norm > 0:
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm), adam)
    return adam


def init_train_state(key, model_cfg: M.SailReconConfig, train_cfg: TrainConfig):
    params = M.init_sailrecon(key, model_cfg)
    opt_state = make_optimizer(train_cfg).init(params)
    return {
        "params": params,
        "opt_state": opt_state,
        "step": jnp.zeros((), jnp.int32),
        "key": jax.random.fold_in(key, 0xD5),
    }


def init_train_state_sharded(key, model_cfg, train_cfg: TrainConfig, mesh,
                             fsdp: bool = True, tp: bool = False):
    """Init the train state directly into FSDP/TP shardings on ``mesh`` — the
    replicated flagship state (params + Adam moments ~15.6 GB) exceeds one
    v5e chip's HBM, so it must never materialise unsharded."""
    from ..parallel import sharding as Sh

    shapes = jax.eval_shape(lambda k: init_train_state(k, model_cfg, train_cfg), key)
    shardings = Sh.param_sharding(mesh, shapes, fsdp=fsdp, tp=tp)
    return jax.jit(
        lambda k: init_train_state(k, model_cfg, train_cfg),
        out_shardings=shardings,
    )(key)


def train_state_from_params(params, key, train_cfg: TrainConfig):
    """Wrap converted (pretrained) params into a fresh train state."""
    return {
        "params": params,
        "opt_state": make_optimizer(train_cfg).init(params),
        "step": jnp.zeros((), jnp.int32),
        "key": key,
    }


_BATCH_KEYS = (
    "images", "K_prime_to_K", "src_idx", "dst_idx", "src_coords",
    "dst_coords", "src_depth", "dst_depth", "pair_valid",
)


def _loss_fn(params, model_cfg, train_cfg, batch, key):
    """Mean scene loss over the batch (scenes are the data-parallel axis)."""
    images = batch["images"]  # (B, S, H, W, 3)
    B, S = images.shape[0], images.shape[1]
    # anchors = queries = the scene frames, duplicated (prepare_model_input,
    # train_imc.py:107-139)
    dup = jnp.concatenate([images, images], axis=1)
    # images_duplicated: anchors repeat queries by construction here, so the
    # ViT patch embed runs once per unique frame (fwd AND bwd — the gradient
    # sums over both uses, exactly)
    preds = M.forward(
        params, model_cfg, dup,
        num_anchor=S, num_query=S,
        rank=train_cfg.rank, subsample_key=key,
        images_duplicated=True,
    )

    def one_scene(ext, intr, scene):
        return scene_loss(ext, intr, scene, train_cfg.loss)

    scenes = {k: batch[k] for k in _BATCH_KEYS if k != "images"}
    losses, metrics = jax.vmap(one_scene)(
        preds["extrinsic"], preds["intrinsic"], scenes
    )
    metrics = jax.tree.map(jnp.mean, metrics)
    return jnp.mean(losses), metrics


def make_train_step(model_cfg: M.SailReconConfig, train_cfg: TrainConfig,
                    jit_compile: bool = True):
    """Build the jitted train step. Call under ``Sh.activate_mesh(mesh)`` (or
    without a mesh for single-device). ``jit_compile=False`` returns the raw
    step function for callers that chain steps inside one jit themselves
    (bench.py: the remote-TPU tunnel charges ~30 ms dispatch RTT per call)."""
    optimizer = make_optimizer(train_cfg)

    def step_fn(state, batch):
        from ..parallel import sharding as Sh

        mesh = Sh.active_mesh()
        fsdp = (
            train_cfg.fsdp
            and mesh is not None
            and mesh.shape.get(Sh.DATA_AXIS, 1) > 1
        )
        tp = mesh is not None and mesh.shape.get(Sh.MODEL_AXIS, 1) > 1

        def constrain_tree(tree):
            if not (fsdp or tp):
                return tree
            sh = Sh.param_sharding(mesh, tree, fsdp=fsdp, tp=tp)
            return jax.tree.map(jax.lax.with_sharding_constraint, tree, sh)

        key = jax.random.fold_in(state["key"], state["step"])
        (loss, metrics), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
            state["params"], model_cfg, train_cfg, batch, key
        )
        # FSDP: gradients leave the backward as a reduce-scatter onto the
        # same shards as the params; the optimizer then runs fully sharded.
        grads = constrain_tree(grads)
        updates, new_opt = optimizer.update(grads, state["opt_state"], state["params"])
        new_params = constrain_tree(optax.apply_updates(state["params"], updates))
        metrics["grad_norm"] = optax.global_norm(grads)
        # per-subsystem gradient norms: the 518px-curve plateau diagnosis
        # needs to see which component the loss signal actually reaches
        # (trunk vs camera head vs DPT heads) — a vanishing camera-head
        # gradient with a live DPT gradient means the objective is carving
        # depth, not poses, and vice versa.
        metrics["grad_norm_vit"] = optax.global_norm(grads["aggregator"]["vit"])
        metrics["grad_norm_agg"] = optax.global_norm(
            {k: v for k, v in grads["aggregator"].items() if k != "vit"})
        # heads are optional subtrees (cfg.enable_camera/depth/point); only
        # report the norms for heads this config actually instantiates.
        for head in ("camera_head", "depth_head", "point_head"):
            if head in grads:
                short = head.split("_")[0]
                metrics[f"grad_norm_{short}"] = optax.global_norm(grads[head])
        metrics["learning_rate"] = make_schedule(train_cfg)(state["step"])
        new_state = {
            "params": new_params,
            "opt_state": constrain_tree(new_opt),
            "step": state["step"] + 1,
            "key": state["key"],
        }
        return new_state, metrics

    if not jit_compile:
        return step_fn
    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_forward(model_cfg: M.SailReconConfig, train_cfg: TrainConfig):
    """Jitted inference forward on a batch of scenes (for artifact dumps)."""

    def fwd(params, images, key):
        S = images.shape[1]
        dup = jnp.concatenate([images, images], axis=1)
        return M.forward(
            params, model_cfg, dup, num_anchor=S, num_query=S,
            rank=train_cfg.rank, subsample_key=key, images_duplicated=True,
        )

    return jax.jit(fwd)
