"""2D rotary position embeddings, TPU-style: precomputed tables, fused apply.

Re-design of ``sailrecon/layers/rope.py`` (RotaryPositionEmbedding2D /
PositionGetter). Instead of a stateful cache keyed on device/dtype, tables are
computed once per forward from the (static-shape) position grid and shared by
every layer — under jit this is constant-folded where positions are static.

Semantics (must match the reference exactly for checkpoint parity):
- head features are split in half: first half rotated by the *y* position,
  second half by *x* (``rope.py:183-207``).
- within each half, a 1D rope with ``inv_freq = 1/f^(2i/half)`` for
  ``i < half/2``, angles duplicated across the two quarter blocks
  (``rope.py:96-127``), rotation via ``(-x2, x1)`` (``rope.py:129-141``).
- special (camera/register) tokens use position (0, 0) => identity rotation
  (``models/aggregator.py:319-328``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def position_grid(height: int, width: int, dtype=jnp.float32) -> jax.Array:
    """(H*W, 2) grid of (y, x) patch positions — ``rope.py:25-66``."""
    y = np.arange(height)
    x = np.arange(width)
    yy, xx = np.meshgrid(y, x, indexing="ij")
    return jnp.asarray(np.stack([yy.ravel(), xx.ravel()], axis=-1), dtype=dtype)


def rope_tables(
    pos: jax.Array, head_dim: int, base_frequency: float = 100.0
) -> Tuple[jax.Array, jax.Array]:
    """Build (cos, sin) tables of shape ``pos.shape[:-1] + (head_dim,)``.

    ``pos``: (..., N, 2) of (y, x). The first ``head_dim//2`` channels carry
    the y-angle tables, the second half the x-angle tables; each half is the
    duplicated-angle layout the reference uses.
    """
    half = head_dim // 2
    exponents = jnp.arange(0, half, 2, dtype=jnp.float32) / half
    inv_freq = 1.0 / (base_frequency**exponents)  # (half//2,)

    def one_axis(p):  # p: (..., N)
        ang = p[..., None].astype(jnp.float32) * inv_freq  # (..., N, half//2)
        ang = jnp.concatenate([ang, ang], axis=-1)  # (..., N, half)
        return jnp.cos(ang), jnp.sin(ang)

    cos_y, sin_y = one_axis(pos[..., 0])
    cos_x, sin_x = one_axis(pos[..., 1])
    cos = jnp.concatenate([cos_y, cos_x], axis=-1)  # (..., N, head_dim)
    sin = jnp.concatenate([sin_y, sin_x], axis=-1)
    return cos, sin


def _rotate_half_block(t: jax.Array) -> jax.Array:
    """(-t2, t1) rotation within the last axis."""
    d = t.shape[-1]
    t1, t2 = t[..., : d // 2], t[..., d // 2 :]
    return jnp.concatenate([-t2, t1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply 2D rope to attention heads.

    x:   (B, H, N, head_dim)
    cos: (B, N, head_dim) or (N, head_dim) — broadcast over heads.
    """
    if cos.ndim == x.ndim - 1:
        cos = cos[..., None, :, :]  # (B, 1, N, hd)
        sin = sin[..., None, :, :]
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    half = x.shape[-1] // 2
    xv, xh = x[..., :half], x[..., half:]
    cv, ch = cos[..., :half], cos[..., half:]
    sv, sh = sin[..., :half], sin[..., half:]
    out_v = xv * cv + _rotate_half_block(xv) * sv
    out_h = xh * ch + _rotate_half_block(xh) * sh
    return jnp.concatenate([out_v, out_h], axis=-1)
