"""Camera head: iterative adaLN pose regression.

Re-design of ``sailrecon/heads/camera_head.py`` (CameraHead). Anchors' camera
tokens (from the last aggregator layer) and query camera tokens are refined
jointly through 4 DiT-style modulated iterations of a 4-block trunk, with an
anchor/query visibility mask; only the query encodings are returned.

The per-iteration ``.detach()`` (``camera_head.py:461``) becomes
``jax.lax.stop_gradient``; the trunk blocks are depth-stacked and scanned.
Runs in fp32 (the reference disables AMP for heads, ``sail_recon.py:119``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp

from ..layers import params as P
from ..layers.block import BlockConfig, block, init_block
from .act import activate_pose


@dataclass(frozen=True)
class CameraHeadConfig:
    dim_in: int = 2048
    trunk_depth: int = 4
    target_dim: int = 9  # absT_quaR_FoV
    num_heads: int = 16
    mlp_ratio: float = 4.0
    init_values: float = 0.01
    trans_act: str = "linear"
    quat_act: str = "linear"
    fl_act: str = "relu"
    num_iterations: int = 4
    attn_impl: str = "auto"

    @property
    def block_cfg(self) -> BlockConfig:
        return BlockConfig(
            dim=self.dim_in,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qk_norm=False,
            init_values=self.init_values,
            attn_impl=self.attn_impl,
        )


def init_camera_head(key, cfg: CameraHeadConfig):
    kt, ke, km, kp = jax.random.split(key, 4)
    trunk_keys = jax.random.split(kt, cfg.trunk_depth)
    d = cfg.dim_in
    return {
        "trunk": jax.vmap(lambda k: init_block(k, cfg.block_cfg))(trunk_keys),
        "token_norm": P.init_layer_norm(d),
        "trunk_norm": P.init_layer_norm(d),
        "empty_pose_tokens": jnp.zeros((1, 1, cfg.target_dim), jnp.float32),
        "embed_pose": P.init_linear(ke, cfg.target_dim, d),
        "poseLN_modulation": P.init_linear(km, d, 3 * d),
        "pose_branch": {
            "fc1": P.init_linear(kp, d, d // 2),
            "fc2": P.init_linear(jax.random.fold_in(kp, 1), d // 2, cfg.target_dim),
        },
    }


def _anchor_query_allow_mask(num_anchor: int, num_query: int) -> jax.Array:
    """(1, 1, S, S) allow-mask: anchors↔anchors, queries→anchors+self.

    Inverse of ``build_lr_mask`` (``camera_head.py:509-540``, the reference
    passes ``~mask`` to its blocks).
    """
    S = num_anchor + num_query
    is_q = jnp.arange(S) >= num_anchor
    allow = (~is_q[:, None]) & (~is_q[None, :])  # anchors see anchors
    allow |= is_q[:, None] & (~is_q[None, :])  # queries see anchors
    allow |= jnp.eye(S, dtype=bool) & is_q[:, None]  # queries see self
    return allow[None, None]


def camera_head(
    p,
    tokens_last: jax.Array,
    cam_token_last_layer: jax.Array,
    cfg: CameraHeadConfig,
) -> List[jax.Array]:
    """Predict per-iteration 9-D pose encodings for the query frames.

    Args:
        tokens_last: (B, Q, P, 2C) last-tap features; camera token = index 0.
        cam_token_last_layer: (B, A, 2C) anchor camera tokens.
    Returns:
        list of ``num_iterations`` arrays (B, Q, 9), post-activation.
    """
    tokens_last = tokens_last.astype(jnp.float32)
    cam_token_last_layer = cam_token_last_layer.astype(jnp.float32)
    pose_tokens = tokens_last[:, :, 0]  # (B, Q, 2C)
    B, Q, _ = pose_tokens.shape
    A = cam_token_last_layer.shape[1]
    S = A + Q

    x = jnp.concatenate([cam_token_last_layer, pose_tokens], axis=1)  # (B, S, 2C)
    x = P.layer_norm(p["token_norm"], x)
    mask = _anchor_query_allow_mask(A, Q)
    bcfg = cfg.block_cfg

    def trunk(tokens):
        def body(carry, bp):
            return block(bp, carry, bcfg, mask=mask), None

        out, _ = jax.lax.scan(body, tokens, p["trunk"])
        return out

    preds: List[jax.Array] = []
    pred_pose_enc = None
    for _ in range(cfg.num_iterations):
        if pred_pose_enc is None:
            module_input = P.linear(
                p["embed_pose"], jnp.broadcast_to(p["empty_pose_tokens"], (B, S, cfg.target_dim))
            )
        else:
            pred_pose_enc = jax.lax.stop_gradient(pred_pose_enc)
            module_input = P.linear(p["embed_pose"], pred_pose_enc)

        mod = P.linear(p["poseLN_modulation"], jax.nn.silu(module_input))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        normed = P.layer_norm({}, x, eps=1e-6)  # adaln: no affine params
        modulated = gate * (normed * (1 + scale) + shift) + x

        modulated = trunk(modulated)
        delta = P.linear(
            p["pose_branch"]["fc2"],
            P.gelu(
                P.linear(p["pose_branch"]["fc1"], P.layer_norm(p["trunk_norm"], modulated))
            ),
        )
        pred_pose_enc = delta if pred_pose_enc is None else pred_pose_enc + delta
        activated = activate_pose(
            pred_pose_enc,
            trans_act=cfg.trans_act,
            quat_act=cfg.quat_act,
            fl_act=cfg.fl_act,
        )
        preds.append(activated[:, A:])  # queries only (camera_head.py:430-433)
    return preds
