"""Pallas TPU flash attention with functional block-structured masks.

Replaces ``F.scaled_dot_product_attention`` (``sailrecon/layers/attention.py:103``)
for the hot attention sites. Design (see /opt/skills/guides/pallas_guide.md):

- online-softmax tiling: grid (batch*heads, q_tiles, k_tiles), the k axis is
  the innermost (sequential on TPU) so running max / denominator / accumulator
  live in VMEM scratch across k steps — O(N) memory instead of the XLA dense
  path's O(N^2) fp32 logits (3 GB+ per layer at the 5-frame global-attention
  size A*P = 6870).
- masks are evaluated *functionally* per tile from a ``RelocMask`` spec and
  fully-masked tiles are skipped via ``pl.when`` — the anchor/query structure
  makes ~(Q-1)/Q of the query-query tiles dead (SURVEY §7.2).
- fp32 softmax state, bf16 QK^T inputs on the MXU.
- full flash backward: the forward saves per-row log-sum-exp; dq and dk/dv
  kernels recompute p tile-wise (same functional masks + tile skipping) —
  O(N) memory end to end under ``jax.custom_vjp``.

Off-TPU (tests), kernels run in Pallas interpret mode for bit-accurate
semantics checks against the dense reference.
"""

from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mask_spec import RelocMask

NEG_INF = -1e30
LANES = 128
LOG2E = 1.4426950408889634


def _cdiv(a, b):
    return -(-a // b)


def _kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch,
    *, sm_scale, mask: Optional[RelocMask], nk_valid, bq, bk, d,
):
    ki = pl.program_id(2)
    nk_tiles = pl.num_programs(2)
    qi = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q0 = qi * bq
    k0 = ki * bk
    if mask is not None:
        visible = mask.block_visible(q0, q0 + bq, k0, k0 + bk) & (k0 < nk_valid)
    else:
        visible = k0 < nk_valid

    @pl.when(visible)
    def _compute():
        # logits are kept in log2 space: the log2(e) factor folds into the
        # f32 softmax-scale multiply (exact), so exp() on the (bq, bk) tile
        # becomes the native exp2 with no internal multiply. exp2(s2 - m2) ==
        # exp(s - m) elementwise, so p/l/acc are bit-identical; only the
        # saved lse converts back to natural log at finalize.
        q = q_ref[0]  # (bq, d)
        k = k_ref[0]  # (bk, d)
        # key rows past nk_valid are OOB reads of the (unpadded) input —
        # Pallas leaves their contents undefined, so v must be zeroed (p has
        # exact zeros there, but 0 * undefined could still be nan) and s
        # forced with a select rather than an additive bias (undefined inf
        # would survive `+ NEG_INF` and poison the running row max).
        k_row = k0 + jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
        v = jnp.where(k_row < nk_valid, v_ref[0], 0.0)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (sm_scale * LOG2E)  # (bq, bk), log2-scaled

        k_idx = k0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        if mask is not None:
            q_idx = q0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            allowed = mask.allowed(q_idx, k_idx) & (k_idx < nk_valid)
        else:
            allowed = k_idx < nk_valid
        s = jnp.where(allowed, s, NEG_INF)

        m_prev = m_scratch[:, 0:1]  # (bq, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)  # (bq, bk)
        l_new = l_scratch[:, 0:1] * alpha + jnp.sum(p, axis=-1, keepdims=True)

        m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[:] = acc_scratch[:] * alpha + pv

    @pl.when(ki == nk_tiles - 1)
    def _finalize():
        l = l_scratch[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / l_safe).astype(o_ref.dtype)
        # per-row log-sum-exp in natural log, saved for the backward kernels
        lse_ref[0] = m_scratch[:, 0:1] * (1.0 / LOG2E) + jnp.log(l_safe)


def _flash_fwd(
    q: jax.Array, k: jax.Array, v: jax.Array,
    mask: Optional[RelocMask],
    bq: int, bk: int,
    interpret: bool,
) -> jax.Array:
    """q: (BH, Nq, d); k/v: (BH, Nk, d). Returns (BH, Nq, d).

    Inputs are consumed UNPADDED: Pallas masks out-of-bounds stores on the
    ragged last tiles and the kernel guards all OOB *reads* (key select +
    v zeroing; garbage query rows only produce garbage output rows, which
    are never stored) — no pad/slice HBM copies around the kernel.
    """
    BH, Nq, d = q.shape
    Nk = k.shape[1]
    sm_scale = 1.0 / (d**0.5)

    grid = (BH, _cdiv(Nq, bq), _cdiv(Nk, bk))
    kernel = functools.partial(
        _kernel, sm_scale=sm_scale, mask=mask, nk_valid=Nk, bq=bq, bk=bk, d=d
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Nq, d), q.dtype),
            jax.ShapeDtypeStruct((BH, Nq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out, lse[:, :, 0]


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    acc_scratch,
    *, sm_scale, mask: Optional[RelocMask], nk_valid, bq, bk, d,
):
    """dq = sum_k  ds @ k * scale, ds = p * (do @ v^T - D).

    Grid (BH, nq_tiles, nk_tiles): k innermost, dq accumulated in scratch.
    """
    ki = pl.program_id(2)
    nk_tiles = pl.num_programs(2)
    qi = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q0 = qi * bq
    k0 = ki * bk
    if mask is not None:
        visible = mask.block_visible(q0, q0 + bq, k0, k0 + bk) & (k0 < nk_valid)
    else:
        visible = k0 < nk_valid

    @pl.when(visible)
    def _compute():
        # p is recomputed in log2 space (see forward): identical values,
        # native exp2 with the log2(e) factor folded into the f32 scale.
        # Inputs are UNPADDED (as in the forward): key/value rows past
        # nk_valid are OOB reads with undefined contents, so they are
        # zero-selected at load — 0 * undefined is still nan, and a nan in a
        # masked-out (p == 0) column would poison the dq row sums.
        q = q_ref[0]
        k_row = k0 + jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
        k = jnp.where(k_row < nk_valid, k_ref[0], 0.0)
        v = jnp.where(k_row < nk_valid, v_ref[0], 0.0)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (sm_scale * LOG2E)
        lse2 = lse_ref[0] * LOG2E  # (bq, 1) natural -> log2
        k_idx = k0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        if mask is not None:
            q_idx = q0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            allowed = mask.allowed(q_idx, k_idx) & (k_idx < nk_valid)
        else:
            allowed = k_idx < nk_valid
        p = jnp.where(allowed, jnp.exp2(s - lse2), 0.0)
        dov = jax.lax.dot_general(
            do_ref[0], v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)
        ds = p * (dov - delta_ref[0]) * sm_scale
        acc_scratch[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == nk_tiles - 1)
    def _finalize():
        dq_ref[0] = acc_scratch[:].astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, sm_scale, mask: Optional[RelocMask], nk_valid, nq_valid, bq, bk, d,
):
    """dk = sum_q ds^T @ q * scale;  dv = sum_q p^T @ do.

    Grid (BH, nk_tiles, nq_tiles): q innermost, dk/dv accumulated in scratch.
    """
    qi = pl.program_id(2)
    nq_tiles = pl.num_programs(2)
    ki = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    q0 = qi * bq
    k0 = ki * bk
    if mask is not None:
        visible = mask.block_visible(q0, q0 + bq, k0, k0 + bk) & (k0 < nk_valid)
    else:
        visible = k0 < nk_valid

    @pl.when(visible)
    def _compute():
        # log2-space p recompute (see forward). This kernel REDUCES over the
        # query axis, so with unpadded inputs every q-side load (q, do, lse,
        # delta) must zero its OOB rows — undefined contents in a garbage
        # row would otherwise flow into the dk/dv sums via nan propagation —
        # and p itself is zero-selected on q validity (zeroed q and lse give
        # p = exp2(0) = 1 on garbage rows, not 0).
        q_row = q0 + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
        q_ok = q_row < nq_valid
        q = jnp.where(q_ok, q_ref[0], 0.0)
        do = jnp.where(q_ok, do_ref[0], 0.0)
        lse2 = jnp.where(q_ok, lse_ref[0], 0.0) * LOG2E  # (bq, 1)
        delta = jnp.where(q_ok, delta_ref[0], 0.0)
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (sm_scale * LOG2E)
        k_idx = k0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        q_idx = q0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        if mask is not None:
            allowed = (mask.allowed(q_idx, k_idx) & (k_idx < nk_valid)
                       & (q_idx < nq_valid))
        else:
            allowed = (k_idx < nk_valid) & (q_idx < nq_valid)
        p = jnp.where(allowed, jnp.exp2(s - lse2), 0.0)  # (bq, bk)
        dv_scratch[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bk, d)
        dov = jax.lax.dot_general(
            do, v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dov - delta) * sm_scale  # (bq, bk)
        dk_scratch[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bk, d)

    @pl.when(qi == nq_tiles - 1)
    def _finalize():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, o, lse, do, mask, bq, bk, interpret, dlse=None):
    BH, Nq, d = q.shape
    Nk = k.shape[1]
    sm_scale = 1.0 / (d**0.5)
    # The bwd kernels hold TWO (bq, bk) f32 tiles (p and ds) where the
    # forward holds one — inheriting the forward's single-tile config at
    # N=1374 puts their resident set ~600 KB OVER the 16 MB scoped-vmem
    # limit (observed: schedule-dependent compile failures in the depth-12
    # train step). Cap the tile product so 2*bq*bk*4B + block overhead stays
    # ~12.5 MB; the k side halves first (the q-side tile carries the dq/ds
    # accumulator rows).
    while 2 * bq * bk * 4 > int(12.5 * 2**20) and max(bq, bk) > 128:
        if bk >= bq:
            bk = _cdiv(bk, 2 * 8) * 8
        else:
            bq = _cdiv(bq, 2 * 8) * 8
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # (BH, Nq, 1)
    if dlse is not None:
        # d lse_i / d s_ij = p_ij, so a cotangent on lse adds p_ij * dlse_i to
        # ds — algebraically ds = p*(dov - (delta - dlse)), i.e. the existing
        # kernels absorb it by shifting delta. Used by ring attention, whose
        # cross-device softmax merge differentiates through the per-chunk lse.
        delta = delta - dlse.astype(jnp.float32)[..., None]
    lse = lse[..., None]  # (BH, Nq, 1)

    # UNPADDED consume, mirroring the forward: ragged last tiles mask their
    # stores; OOB reads are guarded inside the kernels (k/v zero-select in
    # _dq, q-side zero-selects + q-validity in p for the reducing _dkv) —
    # the pad/slice HBM round trips this replaces were ~3% of the train step
    # (xprof "pad" at 294 GB/s).
    common = dict(sm_scale=sm_scale, mask=mask, nk_valid=Nk, bq=bq, bk=bk, d=d)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        grid=(BH, _cdiv(Nq, bq), _cdiv(Nk, bk)),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Nq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, nq_valid=Nq, **common),
        grid=(BH, _cdiv(Nk, bk), _cdiv(Nq, bq)),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Nk, d), k.dtype),
            jax.ShapeDtypeStruct((BH, Nk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_mha(q, k, v, mask, bq, bk, interpret):
    out, _ = _flash_fwd(q, k, v, mask, bq, bk, interpret)
    return out


def _flash_mha_fwd(q, k, v, mask, bq, bk, interpret):
    out, lse = _flash_fwd(q, k, v, mask, bq, bk, interpret)
    return out, (q, k, v, out, lse)


def _flash_mha_bwd(mask, bq, bk, interpret, res, g):
    q, k, v, o, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, o, lse, g, mask, bq, bk, interpret)
    return dq, dk, dv


_flash_mha.defvjp(_flash_mha_fwd, _flash_mha_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_mha_lse(q, k, v, mask, bq, bk, interpret):
    """Like ``_flash_mha`` but also returns per-row log-sum-exp.

    The lse output is a first-class differentiable value (its cotangent is
    folded into the delta term of the backward kernels) so callers may combine
    partial softmaxes across devices — the ring-attention merge.
    """
    return _flash_fwd(q, k, v, mask, bq, bk, interpret)


def _flash_mha_lse_fwd(q, k, v, mask, bq, bk, interpret):
    out, lse = _flash_fwd(q, k, v, mask, bq, bk, interpret)
    return (out, lse), (q, k, v, out, lse)


def _flash_mha_lse_bwd(mask, bq, bk, interpret, res, g):
    q, k, v, o, lse = res
    do, dlse = g
    dq, dk, dv = _flash_bwd(
        q, k, v, o, lse, do, mask, bq, bk, interpret, dlse=dlse
    )
    return dq, dk, dv


_flash_mha_lse.defvjp(_flash_mha_lse_fwd, _flash_mha_lse_bwd)


# ---------------------------------------------------------------------------
# fused [context ‖ own-frame] attention (the reloc site, frame-major layout)
# ---------------------------------------------------------------------------


def _online_step(k, v, k0, nk_valid, s2, m_scratch, l_scratch, acc_scratch):
    """Fold one key tile into the running log2-space online softmax.

    ``s2``: (bq, bk) f32 logits already scaled by sm_scale*log2(e);
    ``k0``: first key index of this tile; rows past ``nk_valid`` are OOB
    reads with undefined contents, so v is zeroed and s forced by select
    (see the guard comments in ``_kernel``).
    """
    bk = k.shape[0]
    k_row = k0 + jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
    v = jnp.where(k_row < nk_valid, v, 0.0)
    kcol = k0 + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
    s2 = jnp.where(kcol < nk_valid, s2, NEG_INF)

    m_prev = m_scratch[:, 0:1]
    m_cur = jnp.max(s2, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s2 - m_new)
    l_new = l_scratch[:, 0:1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
    l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scratch[:] = acc_scratch[:] * alpha + pv


def _frame_ctx_kernel(
    q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, sm_scale, nc, np_, ct, bk,
):
    """One query tile of frame f attends [ctx(0:nc) ‖ own frame(0:np_)].

    Grid (B, F, H, nq_tiles, ct + ot), key axis innermost: tiles j < ct
    stream the shared context K/V (indexed by (b, h) — the same context
    serves every frame), tiles j >= ct stream the frame's own K/V.
    """
    j = pl.program_id(4)
    nk_tiles = pl.num_programs(4)

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0, 0]  # (bq, d)

    def consume(k, v, k0, nk_valid):
        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (sm_scale * LOG2E)
        _online_step(k, v, k0, nk_valid, s2, m_scratch, l_scratch, acc_scratch)

    @pl.when(j < ct)
    def _ctx():
        consume(ck_ref[0, 0], cv_ref[0, 0], j * bk, nc)

    @pl.when(j >= ct)
    def _own():
        consume(k_ref[0, 0, 0], v_ref[0, 0, 0], (j - ct) * bk, np_)

    @pl.when(j == nk_tiles - 1)
    def _finalize():
        l = l_scratch[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0, 0] = (acc_scratch[:] / l_safe).astype(o_ref.dtype)


def frame_ctx_kernel(
    q: jax.Array, k: jax.Array, v: jax.Array,
    ck: jax.Array, cv: jax.Array,
    bq: Optional[int] = None,
    bk: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """q/k/v: (B*F, H, P, d) frame-major; ck/cv: (B, H, Nc, d) shared context.

    Each frame's rows attend softmax([ctx ‖ own frame]) — the reloc
    allow-mask structure (``aggregator.py:832-851``) expressed by layout
    instead of a mask: no mask evaluation, no dead tiles, no fold/unfold
    transposes, no cross-call lse merge. Returns (B*F, H, P, d).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    BF, H, P, d = q.shape
    B, _, Nc, _ = ck.shape
    F = BF // B
    assert BF == B * F
    sm_scale = 1.0 / (d**0.5)
    bq = bq or (_cdiv(max(128, P), 8) * 8 if P <= 1536 else 1024)
    bq = min(bq, _cdiv(max(128, P), 8) * 8)
    bk = bk or 768
    bk = int(min(bk, _cdiv(max(128, max(Nc, P)), 8) * 8))
    ct = _cdiv(Nc, bk)
    ot = _cdiv(P, bk)

    q5 = q.reshape(B, F, H, P, d)
    k5 = k.reshape(B, F, H, P, d)
    v5 = v.reshape(B, F, H, P, d)
    grid = (B, F, H, _cdiv(P, bq), ct + ot)

    own_spec = pl.BlockSpec(
        (1, 1, 1, bk, d),
        lambda b, f, h, i, j: (b, f, h, jnp.clip(j - ct, 0, ot - 1), 0),
    )
    out = pl.pallas_call(
        functools.partial(
            _frame_ctx_kernel, sm_scale=sm_scale, nc=Nc, np_=P, ct=ct, bk=bk
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, bq, d), lambda b, f, h, i, j: (b, f, h, i, 0)),
            own_spec,
            own_spec,
            pl.BlockSpec(
                (1, 1, bk, d),
                lambda b, f, h, i, j: (b, h, jnp.minimum(j, ct - 1), 0),
            ),
            pl.BlockSpec(
                (1, 1, bk, d),
                lambda b, f, h, i, j: (b, h, jnp.minimum(j, ct - 1), 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, bq, d), lambda b, f, h, i, j: (b, f, h, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, F, H, P, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=interpret,
    )(q5, k5, v5, ck, cv)
    return out.reshape(BF, H, P, d)


def _frame_ctx_kv2_kernel(
    q_ref, own_ref, ckv_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, sm_scale, nc, np_, ct, bk, d,
):
    """:func:`_frame_ctx_kernel` operating natively on 128-lane kv2 tiles.

    Every key tile — the scene cache (streamed straight from the
    depth-stacked kv2 array, layer picked by the BlockSpec index map) and
    the query frame's own K/V (interleaved by the wrapper) — is (bk, 2d)
    rows of [k ‖ v]. q arrives zero-padded to 2d, so the logits matmul
    contracts all 2d=128 lanes: [q ‖ 0]·[k ‖ v]^T = q·k^T exactly, and at
    the same wall cost (the d=64 contraction ran at half MXU rate; 128 runs
    at full). p @ [k ‖ v] accumulates both halves into a 2d-wide
    accumulator; finalize reads the v half. No per-tile lane split, no
    relayout — the k/v split never happens."""
    j = pl.program_id(4)
    nk_tiles = pl.num_programs(4)

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0, 0]  # (bq, 2d), lanes d: are zero

    def consume(kv, k0, nk_valid):
        s2 = jax.lax.dot_general(
            q, kv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (sm_scale * LOG2E)
        _online_step(kv, kv, k0, nk_valid, s2, m_scratch, l_scratch,
                     acc_scratch)

    @pl.when(j < ct)
    def _ctx():
        consume(ckv_ref[0, 0, 0], j * bk, nc)

    @pl.when(j >= ct)
    def _own():
        consume(own_ref[0, 0, 0], (j - ct) * bk, np_)

    @pl.when(j == nk_tiles - 1)
    def _finalize():
        l = l_scratch[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0, 0] = (acc_scratch[:, d:] / l_safe).astype(o_ref.dtype)


def frame_ctx_packed_kernel(
    q: jax.Array, k: jax.Array, v: jax.Array,
    ckv: jax.Array,  # (depth, B, H, Nc, 2d) kv2 scene cache
    layer: int,
    bq: Optional[int] = None,
    bk: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """:func:`frame_ctx_kernel` consuming the kv2 cache in place.

    The full depth-stacked cache array is passed to the pallas_call and
    ``layer`` (a static python int) is applied inside the K/V BlockSpec index
    map — there is no HLO-level slice of the cache, so XLA allocates no
    per-layer transient and no loop copy of the stacks: the kernel DMAs
    (bk, 2d) tiles of layer ``layer`` directly from the cache's HBM buffer.
    This is what holds serving-scene capacity at the cache's true byte cost
    (the scan/xs structure pays 2x; SCENE_CAPACITY.json r4 vs r3). The
    query frames' own K/V is interleaved to the same [k ‖ v] lane layout and
    q zero-padded to 2d so the kernel is 128-lane native throughout (see
    ``_frame_ctx_kv2_kernel``).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    BF, H, P, d = q.shape
    depth, B, _, Nc, d2 = ckv.shape
    assert d2 == 2 * d
    F = BF // B
    assert BF == B * F
    sm_scale = 1.0 / (d**0.5)
    bq = bq or (_cdiv(max(128, P), 8) * 8 if P <= 1536 else 1024)
    bq = min(bq, _cdiv(max(128, P), 8) * 8)
    bk = bk or 768
    bk = int(min(bk, _cdiv(max(128, max(Nc, P)), 8) * 8))
    ct = _cdiv(Nc, bk)
    ot = _cdiv(P, bk)

    qp = jnp.concatenate([q, jnp.zeros_like(q)], axis=-1)
    q5 = qp.reshape(B, F, H, P, 2 * d)
    own5 = jnp.concatenate([k, v], axis=-1).reshape(B, F, H, P, 2 * d)
    grid = (B, F, H, _cdiv(P, bq), ct + ot)

    out = pl.pallas_call(
        functools.partial(
            _frame_ctx_kv2_kernel, sm_scale=sm_scale, nc=Nc, np_=P,
            ct=ct, bk=bk, d=d,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, bq, 2 * d), lambda b, f, h, i, j: (b, f, h, i, 0)
            ),
            pl.BlockSpec(
                (1, 1, 1, bk, 2 * d),
                lambda b, f, h, i, j: (b, f, h, jnp.clip(j - ct, 0, ot - 1), 0),
            ),
            pl.BlockSpec(
                (1, 1, 1, bk, 2 * d),
                lambda b, f, h, i, j: (layer, b, h, jnp.minimum(j, ct - 1), 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, bq, d), lambda b, f, h, i, j: (b, f, h, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, F, H, P, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, 2 * d), jnp.float32),
        ],
        interpret=interpret,
    )(q5, own5, ckv)
    return out.reshape(BF, H, P, d)


def packed_ctx_attention(q, k, v, ckv, layer: int, impl: str = "auto"):
    """[ctx ‖ own] reloc attention against one layer of the kv2 scene cache.

    Serving path (no VJP): TPU takes the direct-consumption kernel (always
    when the problem is big enough to matter — that is exactly when the
    cache transient it avoids is expensive); small problems and other
    backends slice + split the layer and reuse the dense reference.
    """
    d = q.shape[-1]
    Nc = ckv.shape[3]
    if (
        jax.default_backend() == "tpu"
        and impl != "dense"
        and d <= 256
        and q.shape[2] * (Nc + k.shape[2]) >= 1_500_000
    ):
        return frame_ctx_packed_kernel(q, k, v, ckv, layer)
    ck, cv = ckv[layer, ..., :d], ckv[layer, ..., d:]
    return _frame_ctx_dense(q, k, v, ck.astype(k.dtype), cv.astype(v.dtype))


def _frame_ctx_dense(q, k, v, ck, cv):
    """Dense reference: per-frame softmax over the [ctx ‖ own] concatenation
    (identical to the reference's masked global-reloc attention rows,
    ``aggregator.py:672-741``). Differentiable; used off-TPU and as the
    ground truth in kernel tests."""
    BF, H, P, d = q.shape
    B, _, Nc, _ = ck.shape
    F = BF // B

    def bcast(c):
        return jnp.broadcast_to(
            c[:, None], (B, F) + c.shape[1:]
        ).reshape(BF, *c.shape[1:])

    kk = jnp.concatenate([bcast(ck).astype(k.dtype), k], axis=2)
    vv = jnp.concatenate([bcast(cv).astype(v.dtype), v], axis=2)
    scale = 1.0 / (d**0.5)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, kk, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(q.dtype), vv,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _frame_ctx_split(q, k, v, ck, cv):
    """O(N)-memory differentiable composition: own-frame flash + broadcast-ctx
    flash merged by lse (exact softmax; the backward path of the fused
    forward kernel — each flash call carries its own flash backward)."""
    BF, H, P, d = q.shape
    B = ck.shape[0]
    F = BF // B

    def bcast(c):
        return jnp.broadcast_to(
            c[:, None], (B, F) + c.shape[1:]
        ).reshape(BF, *c.shape[1:])

    o_own, lse_own = flash_attention_lse(q, k, v)
    o_ctx, lse_ctx = flash_attention_lse(
        q, bcast(ck).astype(k.dtype), bcast(cv).astype(v.dtype)
    )
    from .ring_attention import _merge

    out, _ = _merge(
        o_own.astype(jnp.float32), lse_own, o_ctx.astype(jnp.float32), lse_ctx
    )
    return out.astype(q.dtype)


@jax.custom_vjp
def frame_ctx_attention(q, k, v, ck, cv):
    """Fused reloc attention: frame-major q/k/v vs shared context K/V.

    Forward: single Pallas kernel on TPU (dense reference elsewhere).
    Backward: VJP of the numerically matching lse-split composition —
    flash backward kernels end to end, O(N) memory.
    """
    if jax.default_backend() == "tpu":
        return frame_ctx_kernel(q, k, v, ck, cv)
    return _frame_ctx_dense(q, k, v, ck, cv)


def _frame_ctx_fwd(q, k, v, ck, cv):
    return frame_ctx_attention(q, k, v, ck, cv), (q, k, v, ck, cv)


def _frame_ctx_bwd(res, g):
    f = (
        _frame_ctx_split
        if jax.default_backend() == "tpu"
        else _frame_ctx_dense
    )
    _, vjp = jax.vjp(f, *res)
    return vjp(g)


frame_ctx_attention.defvjp(_frame_ctx_fwd, _frame_ctx_bwd)


# ---------------------------------------------------------------------------
# public API (consumed by ops.attention_core.sdpa)
# ---------------------------------------------------------------------------


def _pick_block(n, target):
    return int(min(target, max(128, 1 << int(np.ceil(np.log2(max(n, 1)))))))


def supported(q, k, v, mask) -> bool:
    if mask is not None and not isinstance(mask, RelocMask):
        return False  # dense boolean masks stay on the XLA path
    d = q.shape[-1]
    return d <= 256 and q.ndim == 4


def worth_it(q, k, v) -> bool:
    # below ~1k tokens the dense XLA path wins (tiny grids underutilise the
    # kernel); above it, avoiding the fp32 logits HBM round-trip pays off
    return q.shape[-2] * k.shape[-2] >= 1_500_000


def _auto_block(n: int, itemsize: int = 2) -> int:
    """Measured-on-v5e tile heuristic: a single padded tile up to 1536 tokens
    (no cross-tile softmax state traffic), 1024 beyond. The fp32 (bq, bk)
    logits tile must fit scoped VMEM (16 MB): 1536^2*4 = 9.4 MB fits with
    the q/k/v/acc buffers, 2032^2*4 = 16.5 MB does not (observed compile
    OOM at N=2025); 1024 beat 512/768/1536 in the block sweep. fp32 inputs
    double the q/k/v block bytes, so their cap halves (observed scoped-VMEM
    compile OOM at 1374 tokens fp32 with the bf16 caps)."""
    cap1, cap2 = (1536, 1024) if itemsize <= 2 else (768, 512)
    if n <= cap1:
        return _cdiv(n, 8) * 8
    return cap2


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    mask: Optional[RelocMask] = None,
    bq: Optional[int] = None,
    bk: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """(B, H, Nq, d) x (B, H, Nk, d)^2 -> (B, H, Nq, d)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, Nq, d = q.shape
    Nk = k.shape[2]
    # k/v itemsize governs the k-side VMEM cap (advisor r3: q bf16 with
    # fp32 k/v would otherwise budget the k blocks at half their true size)
    bq = bq or _auto_block(Nq, q.dtype.itemsize)
    bk = bk or _auto_block(Nk, max(k.dtype.itemsize, v.dtype.itemsize))
    bq = int(min(bq, _cdiv(max(128, Nq), 8) * 8))
    bk = int(min(bk, _cdiv(max(128, Nk), 8) * 8))
    out = _flash_mha(
        q.reshape(B * H, Nq, d),
        k.reshape(B * H, Nk, d),
        v.reshape(B * H, Nk, d),
        mask, bq, bk, interpret,
    )
    return out.reshape(B, H, Nq, d)


def flash_attention_lse(
    q: jax.Array, k: jax.Array, v: jax.Array,
    mask: Optional[RelocMask] = None,
    bq: Optional[int] = None,
    bk: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """(B, H, Nq, d) x (B, H, Nk, d)^2 -> ((B, H, Nq, d), (B, H, Nq) fp32 lse).

    The partial-softmax form consumed by ring attention: ``out`` is the
    softmax-normalised value over the *given* keys and ``lse`` the per-row
    log-normaliser, so outputs over disjoint key chunks can be merged exactly.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, Nq, d = q.shape
    Nk = k.shape[2]
    # k/v itemsize governs the k-side VMEM cap (advisor r3: q bf16 with
    # fp32 k/v would otherwise budget the k blocks at half their true size)
    bq = bq or _auto_block(Nq, q.dtype.itemsize)
    bk = bk or _auto_block(Nk, max(k.dtype.itemsize, v.dtype.itemsize))
    bq = int(min(bq, _cdiv(max(128, Nq), 8) * 8))
    bk = int(min(bk, _cdiv(max(128, Nk), 8) * 8))
    out, lse = _flash_mha_lse(
        q.reshape(B * H, Nq, d),
        k.reshape(B * H, Nk, d),
        v.reshape(B * H, Nk, d),
        mask, bq, bk, interpret,
    )
    return out.reshape(B, H, Nq, d), lse.reshape(B, H, Nq)
