"""DINOv2 vision transformer (the aggregator's patch-embed backbone).

Functional re-design of ``sailrecon/layers/vision_transformer.py``
(DinoVisionTransformer / vit_small..vit_giant2). The 24 identical blocks are
depth-stacked and driven by ``lax.scan`` (+ optional ``jax.checkpoint``) so
XLA compiles ONE block body instead of 24 — faster compiles and natural remat.

Differences from the reference (all TPU-motivated, none capability-affecting):
- NHWC activations, HWIO conv kernels.
- positional-embedding interpolation for non-native grids is bilinear via
  precomputed interpolation matrices (MXU-friendly) instead of torch bicubic;
  at the native grid (518px / 37x37 for ViT-L/14) no interpolation happens in
  either implementation (``vision_transformer.py:205-209``).
- the unused mask_token / masked-forward path is dropped; head is identity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import params as P
from .block import BlockConfig, block, init_block


@dataclass(frozen=True)
class ViTConfig:
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    init_values: float = 1.0  # layer-scale init (aggregator passes 1.0)
    ln_eps: float = 1e-6  # DINOv2 uses eps=1e-6 everywhere
    remat: bool = False
    attn_impl: str = "auto"

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def block_cfg(self) -> BlockConfig:
        return BlockConfig(
            dim=self.embed_dim,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qk_norm=False,
            ln_eps=self.ln_eps,
            init_values=self.init_values,
            attn_impl=self.attn_impl,
        )


def vit_small(**kw):
    return ViTConfig(embed_dim=384, depth=12, num_heads=6, **kw)


def vit_base(**kw):
    return ViTConfig(embed_dim=768, depth=12, num_heads=12, **kw)


def vit_large(**kw):
    return ViTConfig(embed_dim=1024, depth=24, num_heads=16, **kw)


def vit_giant2(**kw):
    return ViTConfig(embed_dim=1536, depth=40, num_heads=24, **kw)


def init_vit(key, cfg: ViTConfig):
    k_patch, k_pos, k_reg, k_blocks = jax.random.split(key, 4)
    block_keys = jax.random.split(k_blocks, cfg.depth)
    blocks = jax.vmap(lambda k: init_block(k, cfg.block_cfg))(block_keys)
    return {
        "patch_embed": {
            "proj": P.init_conv(
                k_patch, cfg.patch_size, cfg.patch_size, 3, cfg.embed_dim
            )
        },
        "cls_token": jnp.zeros((1, 1, cfg.embed_dim), jnp.float32),
        "pos_embed": P.trunc_normal(
            k_pos, (1, cfg.num_patches + 1, cfg.embed_dim), std=0.02
        ),
        "register_tokens": (
            1e-6 * jax.random.normal(
                k_reg, (1, cfg.num_register_tokens, cfg.embed_dim), jnp.float32
            )
            if cfg.num_register_tokens
            else None
        ),
        "blocks": blocks,
        "norm": P.init_layer_norm(cfg.embed_dim),
    }


def _interp_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Bilinear (align_corners=False, half-pixel) 1D interpolation matrix."""
    A = np.zeros((n_out, n_in), np.float32)
    if n_out == n_in:
        np.fill_diagonal(A, 1.0)
        return A
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        src = min(max(src, 0.0), n_in - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        f = src - lo
        A[i, lo] += 1.0 - f
        A[i, hi] += f
    return A


def _interpolate_pos_embed(pos_embed: jax.Array, grid_hw, native_grid: int):
    """Resample the (1, 1+N, D) pos embed to a (h, w) patch grid."""
    h, w = grid_hw
    if h == native_grid and w == native_grid:
        return pos_embed
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:].reshape(1, native_grid, native_grid, -1)
    Ah = jnp.asarray(_interp_matrix(h, native_grid))
    Aw = jnp.asarray(_interp_matrix(w, native_grid))
    out = jnp.einsum("hi,niwd->nhwd", Ah, patch_pe)
    out = jnp.einsum("wj,nhjd->nhwd", Aw, out)
    return jnp.concatenate([cls_pe, out.reshape(1, h * w, -1)], axis=1)


def resample_pos_embed(pos_embed: jax.Array, target_grid: int) -> jax.Array:
    """Resample a (1, 1+g², D) positional embedding PARAM to a new native
    grid — the coarse-to-fine hand-off (a phase trained at img_size=154
    stores an 11×11 pos embed; resuming at 518 needs 37×37). Runtime
    non-native inputs are handled by ``_interpolate_pos_embed`` inside
    ``vit_forward``; this converts the stored parameter itself, once, at
    load time."""
    n = pos_embed.shape[1] - 1
    g = int(round(n ** 0.5))
    assert g * g == n, f"pos_embed token count {n} is not a square grid"
    return _interpolate_pos_embed(pos_embed, (target_grid, target_grid), g)


def vit_forward(
    p,
    images: jax.Array,
    cfg: ViTConfig,
    compute_dtype=jnp.float32,
):
    """images: (B, H, W, 3), already normalised. Returns dict of outputs.

    Output dict mirrors the reference's ``forward_features`` return
    (``vision_transformer.py:288-306``): final-norm cls token, register
    tokens, and patch tokens.
    """
    B, H, W, _ = images.shape
    gh, gw = H // cfg.patch_size, W // cfg.patch_size

    x = P.conv2d(
        p["patch_embed"]["proj"],
        images.astype(compute_dtype),
        stride=cfg.patch_size,
        padding="VALID",
    )  # (B, gh, gw, D)
    x = x.reshape(B, gh * gw, cfg.embed_dim)

    cls = jnp.broadcast_to(
        p["cls_token"].astype(compute_dtype), (B, 1, cfg.embed_dim)
    )
    x = jnp.concatenate([cls, x], axis=1)
    pe = _interpolate_pos_embed(p["pos_embed"], (gh, gw), cfg.grid)
    x = x + pe.astype(compute_dtype)

    if cfg.num_register_tokens:
        regs = jnp.broadcast_to(
            p["register_tokens"].astype(compute_dtype),
            (B, cfg.num_register_tokens, cfg.embed_dim),
        )
        x = jnp.concatenate([x[:, :1], regs, x[:, 1:]], axis=1)

    bcfg = cfg.block_cfg
    # frames are independent through the ViT: under a mesh the shard_map
    # variant shards them over (data x context) and keeps the Pallas kernels
    # device-local (plain block + GSPMD otherwise)
    from ..parallel.sp_block import frame_block_sharded

    def body(carry, layer_params):
        y = frame_block_sharded(layer_params, carry, bcfg)
        return y, None

    if cfg.remat:
        body = jax.checkpoint(body, prevent_cse=False)
    x, _ = jax.lax.scan(body, x, p["blocks"])

    x = P.layer_norm(p["norm"], x, cfg.ln_eps)
    r = cfg.num_register_tokens
    return {
        "x_norm_clstoken": x[:, 0],
        "x_norm_regtokens": x[:, 1 : r + 1],
        "x_norm_patchtokens": x[:, r + 1 :],
    }
