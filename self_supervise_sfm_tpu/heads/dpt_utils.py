"""DPT-head utilities: sincos position embeddings, UV grids, and
align-corners bilinear resize as MXU-friendly matrix contractions.

Re-design of ``sailrecon/heads/utils.py`` and ``custom_interpolate``
(``sailrecon/heads/dpt_head.py:568-598``). The reference resizes with
``F.interpolate(align_corners=True)``; here each resize is two small dense
interpolation-matrix contractions (H2xH1 and W2xW1) — exact same math, but
lowers to MXU matmuls and is trivially differentiable/fusable, and the
INT_MAX chunking workaround is unnecessary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix_ac(n_out: int, n_in: int) -> np.ndarray:
    """1D bilinear interpolation matrix with align_corners=True semantics."""
    A = np.zeros((n_out, n_in), np.float32)
    if n_in == 1 or n_out == 1:
        A[:, 0] = 1.0
        return A
    if n_out == n_in:
        np.fill_diagonal(A, 1.0)
        return A
    scale = (n_in - 1) / (n_out - 1)
    for i in range(n_out):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        f = src - lo
        A[i, lo] += 1.0 - f
        A[i, hi] += f
    return A


def _resize_einsum(x: jax.Array, out_hw) -> jax.Array:
    H2, W2 = out_hw
    N, H, W, C = x.shape
    Ah = jnp.asarray(_interp_matrix_ac(H2, H), x.dtype)
    Aw = jnp.asarray(_interp_matrix_ac(W2, W), x.dtype)
    with jax.default_matmul_precision("highest"):
        y = jnp.einsum("hi,niwc->nhwc", Ah, x)
        y = jnp.einsum("wj,nhjc->nhwc", Aw, y)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _resize_kernel_vjp(x, add, out_hw, out_dtype=None):
    from ..ops.resize import resize_bilinear_kernel

    return resize_bilinear_kernel(
        x, out_hw, _interp_matrix_ac(out_hw[1], x.shape[2]), add=add,
        out_dtype=out_dtype,
    )


def _resize_kernel_fwd(x, add, out_hw, out_dtype=None):
    # the backward of this LINEAR map needs only x's (H, W) and add's dtype
    # — carried as zero-element token arrays: bare python shapes/dtypes are
    # not valid residual leaves once the bwd actually traces (surfaced by
    # the big-batch train step, where the kernel path engages)
    shape_tok = jnp.zeros((0,) + x.shape[1:3] + (0,), x.dtype)
    add_tok = None if add is None else jnp.zeros((0,), add.dtype)
    return _resize_kernel_vjp(x, add, out_hw, out_dtype), (shape_tok, add_tok)


def _resize_kernel_bwd(out_hw, out_dtype, res, g):
    # linear map: vjp = transpose contraction with the same interp matrices;
    # the fused addend is broadcast over N, so its cotangent is the N-sum.
    # With an out_dtype the store rounding is treated straight-through.
    shape_tok, add_tok = res
    H2, W2 = out_hw
    H, W = shape_tok.shape[1], shape_tok.shape[2]
    g = g.astype(shape_tok.dtype)
    Ah = jnp.asarray(_interp_matrix_ac(H2, H), g.dtype)
    Aw = jnp.asarray(_interp_matrix_ac(W2, W), g.dtype)
    with jax.default_matmul_precision("highest"):
        dx = jnp.einsum("wj,nhwc->nhjc", Aw, g)
        dx = jnp.einsum("hi,nhjc->nijc", Ah, dx)
    dadd = None if add_tok is None else jnp.sum(g, axis=0).astype(add_tok.dtype)
    return (dx, dadd)


_resize_kernel_vjp.defvjp(_resize_kernel_fwd, _resize_kernel_bwd)


def resize_bilinear_ac(x: jax.Array, out_hw, add: jax.Array | None = None,
                       out_dtype=None) -> jax.Array:
    """(N, H, W, C) -> (N, H2, W2, C), bilinear, align_corners=True.

    Large upsamples take the Pallas two-pass kernel (``ops/resize``): the
    interp matmul stays in VMEM (no HBM-visible FLOP waste or layout copies)
    and the H pass is a VPU 2-tap lerp. Everything else runs as the exact
    einsum contraction (also the backward of the kernel path).

    ``add``: optional (H2, W2, C) addend applied after the resize — on the
    kernel path it fuses into the H-pass epilogue (no extra full-image HBM
    pass); on the einsum path it is a plain add, numerically identical.
    """
    H2, W2 = out_hw
    N, H, W, C = x.shape
    if (H, W) == (H2, W2):
        y = x if add is None else x + add[None].astype(x.dtype)
        return y.astype(out_dtype) if out_dtype else y
    if jax.default_backend() == "tpu":
        from ..ops.resize import resize_kernel_applicable

        if resize_kernel_applicable(x.shape, out_hw):
            return _resize_kernel_vjp(x, add, tuple(out_hw), out_dtype)
    y = _resize_einsum(x, out_hw)
    y = y if add is None else y + add[None].astype(y.dtype)
    return y.astype(out_dtype) if out_dtype else y


def make_sincos_pos_embed(embed_dim: int, pos: jax.Array, omega_0: float = 100.0):
    """1D sincos embedding, (M,) -> (M, embed_dim). ``heads/utils.py:42-73``."""
    assert embed_dim % 2 == 0
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    omega = omega / (embed_dim / 2.0)
    omega = 1.0 / omega_0**omega
    out = pos.reshape(-1)[:, None] * omega[None, :]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1).astype(jnp.float32)


def position_grid_to_embed(pos_grid: jax.Array, embed_dim: int, omega_0: float = 100.0):
    """(H, W, 2) -> (H, W, embed_dim). ``heads/utils.py:11-39``."""
    H, W, _ = pos_grid.shape
    flat = pos_grid.reshape(-1, 2)
    emb_x = make_sincos_pos_embed(embed_dim // 2, flat[:, 0], omega_0)
    emb_y = make_sincos_pos_embed(embed_dim // 2, flat[:, 1], omega_0)
    return jnp.concatenate([emb_x, emb_y], axis=-1).reshape(H, W, embed_dim)


def create_uv_grid(width: int, height: int, aspect_ratio=None, dtype=jnp.float32):
    """(H, W, 2) normalised UV grid. ``heads/utils.py:77-125``."""
    if aspect_ratio is None:
        aspect_ratio = float(width) / float(height)
    diag = (aspect_ratio**2 + 1.0) ** 0.5
    span_x = aspect_ratio / diag
    span_y = 1.0 / diag
    left_x = -span_x * (width - 1) / width
    right_x = span_x * (width - 1) / width
    top_y = -span_y * (height - 1) / height
    bottom_y = span_y * (height - 1) / height
    xs = np.linspace(left_x, right_x, width, dtype=np.float32)
    ys = np.linspace(top_y, bottom_y, height, dtype=np.float32)
    uu, vv = np.meshgrid(xs, ys)  # (H, W)
    return jnp.asarray(np.stack([uu, vv], axis=-1), dtype)
