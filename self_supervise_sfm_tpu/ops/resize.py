"""Pallas bilinear-upsample kernels for the DPT decoder resizes.

``heads/dpt_utils.resize_bilinear_ac`` expresses align-corners bilinear
resize as dense interpolation-matrix contractions — exact, but bilinear has
only 2 taps per output sample, so the fp32 matmuls burn H/2 (resp. W/2)
times the useful FLOPs and XLA surrounds them with layout copies: ~19 ms of
the 518px inference step. (A jnp.take 2-tap formulation is worse still —
TPU gathers on the row axis lose to the MXU contraction.)

These kernels read the input once and write the output once:

- W pass (``_resize_w``): per input-row block, the (W2, W) interp matrix
  stays VMEM-resident and each row is one (W2, W) x (W, C) MXU matmul — the
  FLOP waste never touches HBM and there are no layout copies.
- H pass (``_resize_h``): pure VPU 2-tap lerp. Output row j needs input rows
  lo(j), lo(j)+1 with lo(j) = floor(j*(H-1)/(H2-1)); a 2-block halo window
  (two input refs at consecutive block indices) covers every output tile
  because the upsample span per tile is < one block.

Upsampling only (H2 >= H, W2 >= W) — the DPT pyramid never bilinearly
downsamples (the ÷2 step is a stride-2 conv). Backward = VJP of the einsum
reference (the transpose resize; training keeps the exact same gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _cdiv(a, b):
    return -(-a // b)


def _w_kernel(x_ref, aw_ref, o_ref, *, rh: int):
    for r in range(rh):
        o_ref[0, r] = jax.lax.dot_general(
            aw_ref[...], x_ref[0, r], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _resize_w(x: jax.Array, aw: np.ndarray, rh: int = 8,
              interpret: bool = False) -> jax.Array:
    N, H, W, C = x.shape
    W2 = aw.shape[0]
    return pl.pallas_call(
        functools.partial(_w_kernel, rh=rh),
        grid=(N, _cdiv(H, rh)),
        in_specs=[
            pl.BlockSpec((1, rh, W, C), lambda n, i: (n, i, 0, 0)),
            pl.BlockSpec((W2, W), lambda n, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rh, W2, C), lambda n, i: (n, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W2, C), x.dtype),
        interpret=interpret,
    )(x, jnp.asarray(aw, jnp.float32))


_H_TILE = 4  # keeps the 2-block halo window + out tile well under VMEM


def _h_kernel(xa_ref, xb_ref, *rest, th: int, rh: int, H: int, H2: int,
              fused_add: bool):
    if fused_add:
        add_ref, o_ref = rest
    else:
        (o_ref,) = rest
        add_ref = None
    i = pl.program_id(0)
    j0 = i * th
    # clamped lo, matching the index maps exactly (an unclamped H-1 floor at
    # the top edge would put off one row before the window)
    block_a = jnp.minimum((j0 * (H - 1)) // (H2 - 1), H - 2) // rh

    def window_row(off):
        # row ``off`` of the 2-block halo window [refA ‖ refB]; Mosaic has no
        # dynamic_slice on values, so load from whichever ref holds it with a
        # dynamic start and select
        a = xa_ref[0, pl.ds(jnp.clip(off, 0, rh - 1), 1)][0]
        b = xb_ref[0, pl.ds(jnp.clip(off - rh, 0, rh - 1), 1)][0]
        return jnp.where(off < rh, a, b)

    for r in range(th):
        j = j0 + r
        lo = jnp.minimum((j * (H - 1)) // (H2 - 1), H - 2)
        frac = (j * (H - 1) / (H2 - 1) - lo).astype(jnp.float32)
        off = lo - block_a * rh
        row_lo = window_row(off)
        row_hi = window_row(off + 1)
        y = row_lo * (1.0 - frac) + row_hi * frac
        if add_ref is not None:
            y = y + add_ref[r]
        o_ref[0, r] = y.astype(o_ref.dtype)


def _resize_h(x: jax.Array, H2: int, th: int = _H_TILE,
              interpret: bool = False, add=None, out_dtype=None):
    """H-pass 2-tap lerp; ``add`` (H2, W, C) is an optional fused epilogue
    addend shared across N (the DPT pos-embed): grid iterates N innermost so
    each ``add`` block is DMA'd once, not once per frame."""
    N, H, W, C = x.shape
    out_dtype = out_dtype or x.dtype
    if H == 1:
        x = jnp.broadcast_to(x, (N, H2, W, C))
        y = x if add is None else x + add[None].astype(x.dtype)
        return y.astype(out_dtype)
    rh = th
    # halo containment: with th == rh the needed span per output tile is
    # ceil((th-1)*(H-1)/(H2-1)) + 1 <= rh rows past lo(j0), which always fits
    # the 2-block window for upsampling ((H-1)/(H2-1) <= 1)
    assert H2 >= H
    nblk = _cdiv(H, rh)

    def _block_a(i):
        return jnp.minimum((i * th * (H - 1)) // (H2 - 1), H - 2) // rh

    def idx_a(i, n):
        return (n, _block_a(i), 0, 0)

    def idx_b(i, n):
        return (n, jnp.minimum(_block_a(i) + 1, nblk - 1), 0, 0)

    in_specs = [
        pl.BlockSpec((1, rh, W, C), idx_a),
        pl.BlockSpec((1, rh, W, C), idx_b),
    ]
    operands = [x, x]
    if add is not None:
        in_specs.append(pl.BlockSpec((th, W, C), lambda i, n: (i, 0, 0)))
        operands.append(add.astype(jnp.float32))
    return pl.pallas_call(
        functools.partial(_h_kernel, th=th, rh=rh, H=H, H2=H2,
                          fused_add=add is not None),
        grid=(_cdiv(H2, th), N),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, W, C), lambda i, n: (n, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H2, W, C), out_dtype),
        interpret=interpret,
    )(*operands)


def resize_kernel_applicable(shape, out_hw) -> bool:
    """Gate: upsample-only, big enough to beat the einsum path, and VMEM-safe
    for BOTH passes: the W-pass blocks (rh * (W + W2) * C * 4B plus the interp
    matrix) and the H-pass resident set (2 halo refs + optional fused-add
    block + out tile, th rows of W2 x C each, double-buffered)."""
    N, H, W, C = shape
    H2, W2 = out_hw
    if H2 < H or W2 < W or H < 2:
        return False
    if N * H2 * W2 * C < 1 << 27:  # only the huge final upsamples win —
        # smaller pyramid levels fuse into their conv neighbours on the
        # einsum path, which beats standalone kernels
        return False
    vmem_w = 8 * (W + W2) * C * 4 + W2 * W * 4
    # H-pass: 4 blocks (2-halo window, fused add, out) of th rows at width W2,
    # x2 for pipeline double-buffering; f32 worst case
    vmem_h = 2 * 4 * _H_TILE * W2 * C * 4
    return max(vmem_w, vmem_h) < 12 * 2**20


def resize_bilinear_kernel(
    x: jax.Array, out_hw, aw: np.ndarray, interpret: bool = False,
    add: jax.Array | None = None, out_dtype=None,
) -> jax.Array:
    """(N, H, W, C) -> (N, H2, W2, C): Pallas W-matmul pass + H-lerp pass.

    ``aw``: the (W2, W) align-corners interp matrix (same weights as the
    einsum path — results match to fp32 rounding).
    ``add``: optional (H2, W2, C) addend fused into the H-pass epilogue
    (the DPT final pos-embed — saves a full-image HBM round trip).
    ``out_dtype``: optional store dtype for the H-pass epilogue. The DPT
    head's consumer conv runs its MXU multiply in bf16 regardless (TPU
    default conv precision), so storing bf16 applies the SAME rounding one
    op earlier and halves the bytes of XLA's convert+relayout copy feeding
    the conv (measured 2x1.51 ms at 518px).
    """
    H2, W2 = out_hw
    if x.shape[2] != W2:
        x = _resize_w(x, aw, interpret=interpret)
    if x.shape[1] != H2:
        return _resize_h(x, H2, interpret=interpret, add=add,
                         out_dtype=out_dtype)
    y = x if add is None else x + add[None].astype(x.dtype)
    return y.astype(out_dtype) if out_dtype else y
