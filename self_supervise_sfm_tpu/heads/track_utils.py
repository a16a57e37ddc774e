"""Tracker utilities: bilinear sampling, sincos embeddings.

Re-design of ``sailrecon/heads/track_modules/utils.py`` — all jnp, NHWC.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_sample_nhwc(
    img: jax.Array,  # (H, W, C)
    coords: jax.Array,  # (..., 2) as (x, y) pixel coordinates
    align_corners: bool = True,
    padding_mode: str = "border",
) -> jax.Array:
    """Bilinear sampling matching the reference's ``bilinear_sampler``
    coordinate convention (``track_modules/utils.py:135-211``):
    align_corners=True means x in [0, W-1] addresses pixel centres.

    Returns (..., C).
    """
    H, W, C = img.shape
    x = coords[..., 0]
    y = coords[..., 1]
    if not align_corners:
        # [0, W] edge-based convention -> centre-based
        x = x - 0.5
        y = y - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def gather(xi, yi):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = img[yc, xc]  # (..., C)
        if padding_mode == "zeros":
            vals = jnp.where(inside[..., None], vals, 0.0)
        return vals  # border mode: clamped

    v00 = gather(x0, y0)
    v10 = gather(x0 + 1, y0)
    v01 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    w00 = ((1 - fx) * (1 - fy))[..., None]
    w10 = (fx * (1 - fy))[..., None]
    w01 = ((1 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]
    return v00 * w00 + v10 * w10 + v01 * w01 + v11 * w11


def sample_features(fmap: jax.Array, coords: jax.Array) -> jax.Array:
    """(H, W, C) sampled at (N, 2) xy -> (N, C), align_corners=True border."""
    return bilinear_sample_nhwc(fmap, coords)


def get_2d_sincos_pos_embed(
    embed_dim: int, grid_size: Union[int, Tuple[int, int]]
) -> jax.Array:
    """(H, W, embed_dim) — ``track_modules/utils.py:19-95`` (10000-base)."""
    if isinstance(grid_size, tuple):
        gh, gw = grid_size
    else:
        gh = gw = grid_size
    omega = np.arange(embed_dim // 4, dtype=np.float64) / (embed_dim / 4.0)
    omega = 1.0 / 10000**omega

    def embed_1d(pos):  # (M,)
        out = pos.reshape(-1)[:, None] * omega[None]
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    xs, ys = np.meshgrid(np.arange(gw, dtype=np.float64),
                         np.arange(gh, dtype=np.float64))
    # reference order: emb_h from grid[0] (the x/w grid), emb_w from grid[1]
    emb_h = embed_1d(xs)
    emb_w = embed_1d(ys)
    emb = np.concatenate([emb_h, emb_w], axis=1).reshape(gh, gw, embed_dim)
    return jnp.asarray(emb, jnp.float32)


def get_2d_embedding(xy: jax.Array, C: int, cat_coords: bool = True) -> jax.Array:
    """(..., N, 2) -> (..., N, 2C [+2]) — the tracker's *multiplicative*
    frequency embedding (``track_modules/utils.py:98-132``)."""
    x = xy[..., 0:1]
    y = xy[..., 1:2]
    div_term = (
        jnp.arange(0, C, 2, dtype=jnp.float32) * (1000.0 / C)
    ).reshape((1,) * (xy.ndim - 1) + (C // 2,))

    def interleave(sin, cos):
        # channels [0::2] = sin, [1::2] = cos
        stacked = jnp.stack([sin, cos], axis=-1)
        return stacked.reshape(stacked.shape[:-2] + (C,))

    pe_x = interleave(jnp.sin(x * div_term), jnp.cos(x * div_term))
    pe_y = interleave(jnp.sin(y * div_term), jnp.cos(y * div_term))
    pe = jnp.concatenate([pe_x, pe_y], axis=-1)
    if cat_coords:
        pe = jnp.concatenate([xy, pe], axis=-1)
    return pe
