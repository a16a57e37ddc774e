"""Tracker building blocks: correlation sampling + update transformer.

Re-design of ``sailrecon/heads/track_modules/blocks.py`` and ``modules.py``.

TPU-native correlation: the reference builds a full (B, S, N, H*W)
correlation volume per pyramid level and bilinearly samples it
(``blocks.py:227-278``). Bilinear sampling commutes with the feature dot
product, so we instead bilinearly gather the (2r+1)^2 neighbourhood *features*
and contract with the track features on the MXU — O(N * (2r+1)^2 * C) instead
of O(N * H * W) per level, no giant volume in HBM.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..layers import params as P
from .track_utils import bilinear_sample_nhwc, get_2d_embedding, get_2d_sincos_pos_embed


# -- torch nn.MultiheadAttention equivalent ---------------------------------


def init_mha(key, dim: int):
    k1, k2 = jax.random.split(key)
    return {
        "qkv": P.init_linear(k1, dim, 3 * dim),
        "proj": P.init_linear(k2, dim, dim),
    }


def mha(p, x_q: jax.Array, x_kv: jax.Array, num_heads: int) -> jax.Array:
    """torch ``nn.MultiheadAttention(batch_first=True)`` semantics.

    x_q: (B, Nq, C); x_kv: (B, Nk, C).
    """
    B, Nq, C = x_q.shape
    hd = C // num_heads
    w = p["qkv"]["w"]
    b = p["qkv"].get("b")
    q = x_q @ w[:, :C] + (b[:C] if b is not None else 0.0)
    k = x_kv @ w[:, C : 2 * C] + (b[C : 2 * C] if b is not None else 0.0)
    v = x_kv @ w[:, 2 * C :] + (b[2 * C :] if b is not None else 0.0)

    def split(t):
        return t.reshape(B, -1, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / (hd**0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(x_q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, Nq, C)
    return P.linear(p["proj"], o)


# -- attention blocks (note: residuals are on the NORMED input, matching the
#    reference exactly: ``modules.py:168-181, 204-217``) ---------------------


def init_attn_block(key, dim: int, mlp_ratio: float = 4.0,
                    norm_affine: bool = True):
    """``norm_affine=False`` for the VGGSfM dependency variant whose norm1 /
    norm2 are ``elementwise_affine=False`` (``dependency/track_modules/
    modules.py:156-157``); the track-head variant's are affine."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "norm1": P.init_layer_norm(dim, affine=norm_affine),
        "norm2": P.init_layer_norm(dim, affine=norm_affine),
        "attn": init_mha(k1, dim),
        "mlp": {
            "fc1": P.init_linear(k2, dim, int(dim * mlp_ratio)),
            "fc2": P.init_linear(k3, int(dim * mlp_ratio), dim),
        },
    }


def attn_block(p, x, num_heads: int, norm_eps: float = 1e-5):
    x = P.layer_norm(p["norm1"], x, norm_eps)
    x = x + mha(p["attn"], x, x, num_heads)
    x = x + P.linear(p["mlp"]["fc2"], P.gelu(P.linear(p["mlp"]["fc1"], P.layer_norm(p["norm2"], x, norm_eps))))
    return x


def init_cross_attn_block(key, dim: int, mlp_ratio: float = 4.0,
                          norm_affine: bool = True):
    p = init_attn_block(key, dim, mlp_ratio, norm_affine)
    # norm_context is a default (affine) LayerNorm in BOTH variants
    # (dependency/track_modules/modules.py:193)
    p["norm_context"] = P.init_layer_norm(dim)
    return p


def cross_attn_block(p, x, context, num_heads: int, norm_eps: float = 1e-5):
    x = P.layer_norm(p["norm1"], x, norm_eps)
    ctx = P.layer_norm(p["norm_context"], context)
    x = x + mha(p["attn"], x, ctx, num_heads)
    x = x + P.linear(p["mlp"]["fc2"], P.gelu(P.linear(p["mlp"]["fc1"], P.layer_norm(p["norm2"], x, norm_eps))))
    return x


# -- EfficientUpdateFormer ---------------------------------------------------


@dataclass(frozen=True)
class UpdateFormerConfig:
    space_depth: int = 6
    time_depth: int = 6
    input_dim: int = 388
    hidden_size: int = 384
    num_heads: int = 8
    output_dim: int = 130
    mlp_ratio: float = 4.0
    add_space_attn: bool = True
    num_virtual_tracks: int = 64
    # the track-head variant wraps the transformer in input/output LayerNorms
    # (``heads/track_modules/blocks.py:45,49``); the VGGSfM dependency variant
    # has neither (``dependency/track_modules/blocks.py:200-201,269,314``)
    use_norms: bool = True
    # block norm1/norm2 flavour: affine eps-1e-5 (track-head variant) vs
    # affine-free eps-1e-6 (dependency variant, modules.py:156-157)
    block_norm_affine: bool = True
    block_norm_eps: float = 1e-5


def init_updateformer(key, cfg: UpdateFormerConfig):
    keys = jax.random.split(key, 6)
    p = {
        "input_transform": P.init_linear(keys[0], cfg.input_dim, cfg.hidden_size),
        "flow_head": P.init_linear(keys[1], cfg.hidden_size, cfg.output_dim),
        "time_blocks": [
            init_attn_block(k, cfg.hidden_size, cfg.mlp_ratio,
                            cfg.block_norm_affine)
            for k in jax.random.split(keys[2], cfg.time_depth)
        ],
    }
    if cfg.use_norms:
        p["input_norm"] = P.init_layer_norm(cfg.input_dim)
        p["output_norm"] = P.init_layer_norm(cfg.hidden_size)
    if cfg.add_space_attn:
        p["virtual_tracks"] = jax.random.normal(
            keys[3], (1, cfg.num_virtual_tracks, 1, cfg.hidden_size)
        )
        p["space_virtual_blocks"] = [
            init_attn_block(k, cfg.hidden_size, cfg.mlp_ratio,
                            cfg.block_norm_affine)
            for k in jax.random.split(keys[4], cfg.space_depth)
        ]
        kp, kv = jax.random.split(keys[5])
        p["space_point2virtual_blocks"] = [
            init_cross_attn_block(k, cfg.hidden_size, cfg.mlp_ratio,
                                  cfg.block_norm_affine)
            for k in jax.random.split(kp, cfg.space_depth)
        ]
        p["space_virtual2point_blocks"] = [
            init_cross_attn_block(k, cfg.hidden_size, cfg.mlp_ratio,
                                  cfg.block_norm_affine)
            for k in jax.random.split(kv, cfg.space_depth)
        ]
    return p


def updateformer(p, x: jax.Array, cfg: UpdateFormerConfig) -> jax.Array:
    """x: (B, N, T, input_dim) -> (B, N, T, output_dim).

    Mirrors ``EfficientUpdateFormer.forward`` (``blocks.py:113-167``):
    interleaved time attention (over T per track) and virtual-track space
    attention (over tracks per timestep).
    """
    if cfg.use_norms:
        x = P.layer_norm(p["input_norm"], x)
    tokens = P.linear(p["input_transform"], x)
    init_tokens = tokens
    B, N0, T, C = tokens.shape

    if cfg.add_space_attn:
        virt = jnp.broadcast_to(
            p["virtual_tracks"].astype(tokens.dtype),
            (B, cfg.num_virtual_tracks, T, C),
        )
        tokens = jnp.concatenate([tokens, virt], axis=1)
    N = tokens.shape[1]

    stride = (
        len(p["time_blocks"]) // len(p["space_virtual_blocks"])
        if cfg.add_space_attn
        else 1
    )
    j = 0
    for i, tb in enumerate(p["time_blocks"]):
        tt = tokens.reshape(B * N, T, C)
        tt = attn_block(tb, tt, cfg.num_heads, cfg.block_norm_eps)
        tokens = tt.reshape(B, N, T, C)
        if cfg.add_space_attn and i % stride == 0:
            st = tokens.transpose(0, 2, 1, 3).reshape(B * T, N, C)
            pts = st[:, : N - cfg.num_virtual_tracks]
            virt = st[:, N - cfg.num_virtual_tracks :]
            virt = cross_attn_block(
                p["space_virtual2point_blocks"][j], virt, pts, cfg.num_heads,
                cfg.block_norm_eps,
            )
            virt = attn_block(p["space_virtual_blocks"][j], virt,
                              cfg.num_heads, cfg.block_norm_eps)
            pts = cross_attn_block(
                p["space_point2virtual_blocks"][j], pts, virt, cfg.num_heads,
                cfg.block_norm_eps,
            )
            st = jnp.concatenate([pts, virt], axis=1)
            tokens = st.reshape(B, T, N, C).transpose(0, 2, 1, 3)
            j += 1

    if cfg.add_space_attn:
        tokens = tokens[:, : N - cfg.num_virtual_tracks]
    tokens = tokens + init_tokens
    if cfg.use_norms:
        tokens = P.layer_norm(p["output_norm"], tokens)
    return P.linear(p["flow_head"], tokens)


# -- correlation pyramid -----------------------------------------------------


def avg_pool2x2(x: jax.Array) -> jax.Array:
    """(..., H, W, C) -> (..., H//2, W//2, C), torch avg_pool2d(k=2, s=2)."""
    H, W = x.shape[-3], x.shape[-2]
    x = x[..., : H - H % 2, : W - W % 2, :]
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1,) * (x.ndim - 3) + (2, 2, 1),
        (1,) * (x.ndim - 3) + (2, 2, 1), "VALID",
    ) / 4.0


def build_fmap_pyramid(fmaps: jax.Array, num_levels: int) -> List[jax.Array]:
    """(B, S, H, W, C) -> list of ``num_levels`` maps, each half-res.

    Pooling stops once a spatial dim would fall below 2 (the remaining levels
    repeat the coarsest map) — identical to the reference wherever the
    reference's pyramid is well-formed; torch ``avg_pool2d(k=2)`` on a 1-px
    map would produce a 0-size level and crash (tiny smoke-test images).
    """
    pyr = [fmaps]
    cur = fmaps
    for _ in range(num_levels - 1):
        if min(cur.shape[-3], cur.shape[-2]) >= 2:
            cur = avg_pool2x2(cur)
        pyr.append(cur)
    return pyr


def corr_sample(
    pyramid: List[jax.Array],
    targets: jax.Array,  # (B, S, N, C)
    coords: jax.Array,  # (B, S, N, 2) at level-0 resolution
    radius: int,
) -> jax.Array:
    """Sampled correlation features (B, S, N, L), L = levels * (2r+1)^2.

    Gather-then-dot equivalent of ``CorrBlock.corr_sample`` (zero-padding
    sampling, /sqrt(C) scaling, identical ordering of levels).
    """
    B, S, N, C = targets.shape
    r = radius
    k = 2 * r + 1
    # NOTE the reference's delta grid adds its axis-0-varying component to the
    # x coordinate (``blocks.py:216-222`` + ``:254-258``) — keep that exact
    # (transposed-looking) enumeration so the flattened (2r+1)^2 ordering
    # matches converted corr_mlp weights.
    d0, d1 = np.meshgrid(
        np.linspace(-r, r, k), np.linspace(-r, r, k), indexing="ij"
    )
    delta = jnp.asarray(np.stack([d0, d1], -1).reshape(-1, 2), jnp.float32)

    outs = []
    for lvl, fmaps in enumerate(pyramid):
        centroid = coords / (2.0**lvl)  # (B, S, N, 2)
        pts = centroid[:, :, :, None, :] + delta  # (B, S, N, k*k, 2)

        def sample_frame(fmap_hwc, pts_frame):
            return bilinear_sample_nhwc(
                fmap_hwc, pts_frame, align_corners=True, padding_mode="zeros"
            )

        feats = jax.vmap(jax.vmap(sample_frame))(fmaps, pts)  # (B,S,N,k*k,C)
        corr = jnp.einsum(
            "bsnkc,bsnc->bsnk", feats, targets, preferred_element_type=jnp.float32
        ) / (C**0.5)
        outs.append(corr.astype(targets.dtype))
    return jnp.concatenate(outs, axis=-1)
