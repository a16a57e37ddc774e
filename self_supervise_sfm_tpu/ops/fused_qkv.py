"""Fused LayerNorm + QKV projection + qk-norm + 2D-RoPE Pallas kernel.

Profiling the 518px inference step (see CLAUDE.md perf notes) showed ~45% of
device time in bandwidth-bound elementwise/formatting ops, dominated by the
unfused pre-attention chain: LN write+read, the (B, N, 3C) QKV intermediate,
the head-split transpose, and the RoPE applies — whose half-head (…, 32)
intermediates tile terribly on TPU ((8, 128) native tiles ⇒ 75% of each tile
wasted, ~14% of HBM bandwidth achieved).

This kernel does the whole chain in VMEM per (batch, token-block) grid step:

    x (bn, C) ─LN→ ─@W_qkv→ (bn, 3C) ─per-head: qk-norm, rope─→
        q, k, v written directly in the (B, H, N, d) layout flash attention
        consumes.

HBM traffic per attention site drops from ~7 full-tensor passes (several
badly tiled) to: read x + W once, write q/k/v once. Numerics follow the
unfused path op-for-op (f32 LN stats, bf16 matmul with f32 accumulate
rounded to bf16, bf16 rope with bf16 cos/sin), golden-tested against it.

The public entry :func:`fused_ln_qkv_rope` carries a ``jax.custom_vjp``
whose backward differentiates the (numerically matching) unfused reference —
so the fused forward is usable inside the training step.

Reference chain being fused: ``sailrecon/layers/block.py:85-89`` (pre-LN) +
``layers/attention.py:70-102`` (QKV, qk-norm, rope).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _cdiv(a, b):
    return -(-a // b)


# Conservative per-kernel VMEM budget. The hard scoped limit is 16 MB and
# overflowing it does not degrade gracefully: the remote AOT helper dies with
# a misleading TPU_WORKER_HOSTNAMES HTTP-500 (CLAUDE.md). Sizing to ~13 MB
# leaves headroom for double-buffering + compiler scratch, which measurably
# varies between compiles of the SAME program (r4: a reloc program that
# compiled in r3 landed 44 KB over the cliff on recompile).
_VMEM_BUDGET = 14 * 2**20


def _shrink_qkv_bn(bn: int, N: int, C: int, nh: int, d: int, e: int) -> int:
    """Largest block_n <= bn whose QKV-kernel resident set fits the budget.

    Resident set model: weights C*3C*e (single-buffered constant block),
    fp32 bias 3C*4, double-buffered x block, rope tables and the three
    per-head outputs, plus fp32 LN/accumulator scratch (x + qkv rows).
    """
    fixed = C * 3 * C * e + 3 * C * 4
    per_row = (
        2 * C * e            # x block, double-buffered
        + 2 * 2 * d * 4      # cos+sin f32, double-buffered
        + 2 * 3 * nh * d * e  # q/k/v out blocks, double-buffered
        + C * 4 + 3 * C * 4  # f32 x rows + qkv accumulator
        + 8 * d * 4          # per-head qk-norm/rope temporaries
    )

    def fits(b):
        return fixed + b * per_row <= _VMEM_BUDGET

    # a block spanning the full token axis is always a legal Mosaic block
    # shape (block == array dim); prefer it when it fits — no grid remainder
    if N <= bn and fits(N):
        return N
    # PARTIAL blocks must keep the second-minor dim 8-divisible. Shrink on
    # multiples of 64 computed independently of N: the previous form
    # (bn = min(bn, N); bn -= 64) inherited N's remainder mod 64, so an
    # over-budget N = 252 (154px frame site) yielded the illegal block 188.
    bn = max(64, (min(bn, N) // 64) * 64)
    while bn > 64 and not fits(bn):
        bn -= 64
    return bn


def _ln_rows(x32, scale, bias, eps):
    """Row-wise layer norm in f32 (matches layers/params.py:layer_norm)."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * scale + bias


def _rope_rows(t, cos, sin):
    """2D rope on (bn, d) rows; quarters (-t2, t1, -t4, t3) — the in-VMEM
    form of layers/rope.py:apply_rope (two halves, rotate-half within each).
    """
    qd = t.shape[-1] // 4
    t1 = t[:, :qd]
    t2 = t[:, qd : 2 * qd]
    t3 = t[:, 2 * qd : 3 * qd]
    t4 = t[:, 3 * qd :]
    rot = jnp.concatenate([-t2, t1, -t4, t3], axis=-1)
    return t * cos + rot * sin


def _kernel(
    x_ref, lnw_ref, lnb_ref, w_ref, b_ref,
    qnw_ref, qnb_ref, knw_ref, knb_ref, cos_ref, sin_ref,
    q_ref, k_ref, v_ref,
    *, nh: int, d: int, eps: float,
):
    x = x_ref[0].astype(jnp.float32)  # (bn, C)
    h = _ln_rows(x, lnw_ref[0], lnb_ref[0], eps).astype(w_ref.dtype)
    qkv = jax.lax.dot_general(
        h, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # match the unfused linear(): bf16 matmul output, bias added in bf16
    qkv = qkv.astype(q_ref.dtype) + b_ref[0].astype(q_ref.dtype)  # (bn, 3C)

    cos = cos_ref[...].astype(q_ref.dtype)  # (bn, d)
    sin = sin_ref[...].astype(q_ref.dtype)
    C = nh * d
    for hh in range(nh):
        qh = qkv[:, hh * d : (hh + 1) * d]
        kh = qkv[:, C + hh * d : C + (hh + 1) * d]
        vh = qkv[:, 2 * C + hh * d : 2 * C + (hh + 1) * d]
        qh = _ln_rows(qh.astype(jnp.float32), qnw_ref[0], qnb_ref[0], eps)
        kh = _ln_rows(kh.astype(jnp.float32), knw_ref[0], knb_ref[0], eps)
        qh = _rope_rows(qh.astype(q_ref.dtype), cos, sin)
        kh = _rope_rows(kh.astype(q_ref.dtype), cos, sin)
        q_ref[0, hh] = qh
        k_ref[0, hh] = kh
        v_ref[0, hh] = vh


def fused_qkv_kernel(
    x: jax.Array,  # (B, N, C)
    ln_scale: jax.Array, ln_bias: jax.Array,  # (C,)
    w: jax.Array, b: jax.Array,  # (C, 3C), (3C,)
    qn_scale: jax.Array, qn_bias: jax.Array,  # (d,)
    kn_scale: jax.Array, kn_bias: jax.Array,  # (d,)
    cos: jax.Array, sin: jax.Array,  # (N, d) f32
    num_heads: int,
    eps: float = 1e-5,
    block_n: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Raw kernel invocation; returns (q, k, v) each (B, H, N, d)."""
    B, N, C = x.shape
    nh = num_heads
    d = C // nh
    bn = _shrink_qkv_bn(block_n, N, C, nh, d, x.dtype.itemsize)
    grid = (B, _cdiv(N, bn))

    const = lambda *_: (0, 0)  # noqa: E731
    kern = functools.partial(_kernel, nh=nh, d=d, eps=eps)
    q, k, v = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn, C), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec((C, 3 * C), const),
            pl.BlockSpec((1, 3 * C), const),
            pl.BlockSpec((1, d), const),
            pl.BlockSpec((1, d), const),
            pl.BlockSpec((1, d), const),
            pl.BlockSpec((1, d), const),
            pl.BlockSpec((bn, d), lambda bi, ni: (ni, 0)),
            pl.BlockSpec((bn, d), lambda bi, ni: (ni, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, nh, bn, d), lambda bi, ni: (bi, 0, ni, 0)),
            pl.BlockSpec((1, nh, bn, d), lambda bi, ni: (bi, 0, ni, 0)),
            pl.BlockSpec((1, nh, bn, d), lambda bi, ni: (bi, 0, ni, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nh, N, d), x.dtype) for _ in range(3)
        ],
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, C).astype(jnp.float32),
        ln_bias.reshape(1, C).astype(jnp.float32),
        w.astype(x.dtype),
        b.reshape(1, 3 * C).astype(jnp.float32),
        qn_scale.reshape(1, d).astype(jnp.float32),
        qn_bias.reshape(1, d).astype(jnp.float32),
        kn_scale.reshape(1, d).astype(jnp.float32),
        kn_bias.reshape(1, d).astype(jnp.float32),
        cos.astype(jnp.float32),
        sin.astype(jnp.float32),
    )
    return q, k, v


def reference_qkv(
    x, ln_scale, ln_bias, w, b, qn_scale, qn_bias, kn_scale, kn_bias,
    cos, sin, num_heads: int, eps: float = 1e-5,
):
    """The unfused chain (layers/block.py + layers/attention.py semantics),
    self-contained for the custom-vjp backward and golden tests."""
    B, N, C = x.shape
    d = C // num_heads
    dt = x.dtype

    def ln(t, s, bb):
        t32 = t.astype(jnp.float32)
        mu = jnp.mean(t32, -1, keepdims=True)
        var = jnp.var(t32, -1, keepdims=True)
        return ((t32 - mu) * jax.lax.rsqrt(var + eps) * s + bb).astype(dt)

    h = ln(x, ln_scale, ln_bias)
    qkv = h @ w.astype(dt) + b.astype(dt)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, N, num_heads, d).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    q = ln(q, qn_scale, qn_bias)
    k = ln(k, kn_scale, kn_bias)

    def rope(t):
        c = cos.astype(dt)
        s = sin.astype(dt)
        qd = d // 4
        t1, t2 = t[..., :qd], t[..., qd : 2 * qd]
        t3, t4 = t[..., 2 * qd : 3 * qd], t[..., 3 * qd :]
        rot = jnp.concatenate([-t2, t1, -t4, t3], axis=-1)
        return t * c + rot * s

    return rope(q), rope(k), v


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def fused_ln_qkv_rope(
    x, ln_scale, ln_bias, w, b, qn_scale, qn_bias, kn_scale, kn_bias,
    cos, sin, num_heads: int, eps: float = 1e-5, block_n: int = 256,
):
    """(q, k, v) in (B, H, N, d) layout — Pallas-fused on TPU, reference
    chain elsewhere. Differentiable: the backward is the VJP of the
    numerically matching unfused chain."""
    if jax.default_backend() == "tpu":
        return fused_qkv_kernel(
            x, ln_scale, ln_bias, w, b, qn_scale, qn_bias, kn_scale, kn_bias,
            cos, sin, num_heads, eps, block_n,
        )
    return reference_qkv(
        x, ln_scale, ln_bias, w, b, qn_scale, qn_bias, kn_scale, kn_bias,
        cos, sin, num_heads, eps,
    )


def _fwd(x, ln_scale, ln_bias, w, b, qn_scale, qn_bias, kn_scale, kn_bias,
         cos, sin, num_heads, eps, block_n):
    out = fused_ln_qkv_rope(
        x, ln_scale, ln_bias, w, b, qn_scale, qn_bias, kn_scale, kn_bias,
        cos, sin, num_heads, eps, block_n,
    )
    return out, (x, ln_scale, ln_bias, w, b, qn_scale, qn_bias, kn_scale,
                 kn_bias, cos, sin)


def _bwd(num_heads, eps, block_n, res, g):
    ref = functools.partial(reference_qkv, num_heads=num_heads, eps=eps)
    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


fused_ln_qkv_rope.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# plain variant: LN + QKV + head split, no qk-norm / rope (the ViT blocks)
# ---------------------------------------------------------------------------


def _kernel_plain(
    x_ref, lnw_ref, lnb_ref, w_ref, b_ref, q_ref, k_ref, v_ref,
    *, nh: int, d: int, eps: float,
):
    x = x_ref[0].astype(jnp.float32)  # (bn, C)
    h = _ln_rows(x, lnw_ref[0], lnb_ref[0], eps).astype(w_ref.dtype)
    qkv = jax.lax.dot_general(
        h, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = qkv.astype(q_ref.dtype) + b_ref[0].astype(q_ref.dtype)  # (bn, 3C)
    C = nh * d
    for hh in range(nh):
        q_ref[0, hh] = qkv[:, hh * d : (hh + 1) * d]
        k_ref[0, hh] = qkv[:, C + hh * d : C + (hh + 1) * d]
        v_ref[0, hh] = qkv[:, 2 * C + hh * d : 2 * C + (hh + 1) * d]


def fused_qkv_plain_kernel(
    x, ln_scale, ln_bias, w, b, num_heads: int,
    eps: float = 1e-5, block_n: int = 256, interpret: bool = False,
):
    B, N, C = x.shape
    nh = num_heads
    d = C // nh
    bn = _shrink_qkv_bn(block_n, N, C, nh, d, x.dtype.itemsize)
    grid = (B, _cdiv(N, bn))
    const = lambda *_: (0, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_kernel_plain, nh=nh, d=d, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn, C), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec((C, 3 * C), const),
            pl.BlockSpec((1, 3 * C), const),
        ],
        out_specs=[
            pl.BlockSpec((1, nh, bn, d), lambda bi, ni: (bi, 0, ni, 0))
            for _ in range(3)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nh, N, d), x.dtype) for _ in range(3)
        ],
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, C).astype(jnp.float32),
        ln_bias.reshape(1, C).astype(jnp.float32),
        w.astype(x.dtype),
        b.reshape(1, 3 * C).astype(jnp.float32),
    )


def reference_qkv_plain(x, ln_scale, ln_bias, w, b, num_heads: int,
                        eps: float = 1e-5):
    B, N, C = x.shape
    d = C // num_heads
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    h = ((x32 - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias).astype(dt)
    qkv = h @ w.astype(dt) + b.astype(dt)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, N, num_heads, d).transpose(0, 2, 1, 3)

    return heads(q), heads(k), heads(v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_ln_qkv(x, ln_scale, ln_bias, w, b, num_heads: int,
                 eps: float = 1e-5, block_n: int = 256):
    """No-rope/no-qk-norm fused LN+QKV (e.g. the DINOv2 ViT blocks)."""
    if jax.default_backend() == "tpu":
        return fused_qkv_plain_kernel(x, ln_scale, ln_bias, w, b, num_heads,
                                      eps, block_n)
    return reference_qkv_plain(x, ln_scale, ln_bias, w, b, num_heads, eps)


def _plain_fwd(x, ln_scale, ln_bias, w, b, num_heads, eps, block_n):
    out = fused_ln_qkv(x, ln_scale, ln_bias, w, b, num_heads, eps, block_n)
    return out, (x, ln_scale, ln_bias, w, b)


def _plain_bwd(num_heads, eps, block_n, res, g):
    ref = functools.partial(reference_qkv_plain, num_heads=num_heads, eps=eps)
    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


fused_ln_qkv.defvjp(_plain_fwd, _plain_bwd)


# ---------------------------------------------------------------------------
# fused merge-heads + out-projection + layer-scale + residual
# ---------------------------------------------------------------------------


def _proj_kernel(o_ref, x_ref, w_ref, b_ref, ls_ref, y_ref, *, nh: int, d: int):
    # merge heads in VMEM: (H, bn, d) -> (bn, H*d)
    m = jnp.concatenate([o_ref[0, h] for h in range(nh)], axis=-1)
    y = jax.lax.dot_general(
        m, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y_ref.dtype)
    y = y + b_ref[0].astype(y_ref.dtype)
    y_ref[0] = x_ref[0] + y * ls_ref[0].astype(y_ref.dtype)


def fused_proj_kernel(
    o: jax.Array,  # (B, H, N, d) attention head outputs
    x_res: jax.Array,  # (B, N, C) residual stream
    w: jax.Array, b: jax.Array,  # (C, C), (C,)
    ls_gamma: jax.Array,  # (C,) layer-scale
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """y = x_res + layer_scale(merge_heads(o) @ w + b), fused in VMEM —
    removes the head-merge transpose and the projection intermediates from
    HBM (the post-attention half of the unfused chain)."""
    B, nh, N, d = o.shape
    C = nh * d
    bn = min(block_n, N)
    grid = (B, _cdiv(N, bn))
    const = lambda *_: (0, 0)  # noqa: E731
    kern = functools.partial(_proj_kernel, nh=nh, d=d)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nh, bn, d), lambda bi, ni: (bi, 0, ni, 0)),
            pl.BlockSpec((1, bn, C), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((C, C), const),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec((1, C), const),
        ],
        out_specs=pl.BlockSpec((1, bn, C), lambda bi, ni: (bi, ni, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x_res.dtype),
        interpret=interpret,
    )(
        o, x_res,
        w.astype(x_res.dtype),
        b.reshape(1, C).astype(jnp.float32),
        ls_gamma.reshape(1, C).astype(jnp.float32),
    )


def reference_proj(o, x_res, w, b, ls_gamma):
    """Unfused chain: merge heads, linear, layer-scale, residual add —
    matches layers/attention.py:_merge_heads + P.linear + P.layer_scale."""
    B, nh, N, d = o.shape
    m = o.transpose(0, 2, 1, 3).reshape(B, N, nh * d)
    dt = x_res.dtype
    y = m @ w.astype(dt) + b.astype(dt)
    return x_res + y * ls_gamma.astype(dt)


@jax.custom_vjp
def fused_proj_residual(o, x_res, w, b, ls_gamma):
    """Pallas-fused on TPU, reference elsewhere; differentiable."""
    if jax.default_backend() == "tpu":
        return fused_proj_kernel(o, x_res, w, b, ls_gamma)
    return reference_proj(o, x_res, w, b, ls_gamma)


def _proj_fwd(o, x_res, w, b, ls_gamma):
    return fused_proj_residual(o, x_res, w, b, ls_gamma), (o, x_res, w, b, ls_gamma)


def _proj_bwd(res, g):
    _, vjp = jax.vjp(reference_proj, *res)
    return vjp(g)


fused_proj_residual.defvjp(_proj_fwd, _proj_bwd)


# ---------------------------------------------------------------------------
# fused MLP: [LN2 + fc1 + GELU] and [fc2 + layer-scale + residual]
# ---------------------------------------------------------------------------


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf, |err| < 1.5e-7 — Mosaic has
    no erf/erfc lowering; at bf16 output precision this is exact."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x32):
    return 0.5 * x32 * (1.0 + _erf(x32 * (2.0**-0.5)))


def _mlp_up_kernel(x_ref, lnw_ref, lnb_ref, w_ref, b_ref, h_ref, *, eps):
    x = x_ref[0].astype(jnp.float32)
    hn = _ln_rows(x, lnw_ref[0], lnb_ref[0], eps).astype(w_ref.dtype)
    h = jax.lax.dot_general(
        hn, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(h_ref.dtype)
    h = h + b_ref[0].astype(h_ref.dtype)
    h_ref[0] = _gelu_exact(h.astype(jnp.float32)).astype(h_ref.dtype)


def _mlp_down_kernel(h_ref, x_ref, w_ref, b_ref, ls_ref, y_ref):
    y = jax.lax.dot_general(
        h_ref[0], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(y_ref.dtype)
    y = y + b_ref[0].astype(y_ref.dtype)
    y_ref[0] = x_ref[0] + y * ls_ref[0].astype(y_ref.dtype)


def fused_mlp_kernel(
    x: jax.Array,  # (B, N, C) residual stream
    ln_scale, ln_bias,  # (C,)
    w1, b1,  # (C, Ch), (Ch,)
    w2, b2,  # (Ch, C), (C,)
    ls_gamma,  # (C,)
    eps: float = 1e-5,
    block_n: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """y = x + layer_scale(fc2(gelu(fc1(LN(x))))) as two Pallas kernels.

    The hidden (B, N, Ch) crosses HBM exactly once (vs LN + gelu round
    trips and the frame/global reshape copies on the unfused path); weights
    stay VMEM-resident across token blocks.
    """
    B, N, C = x.shape
    Ch = w1.shape[1]
    bn = min(block_n, N)
    grid = (B, _cdiv(N, bn))
    const = lambda *_: (0, 0)  # noqa: E731

    h = pl.pallas_call(
        functools.partial(_mlp_up_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn, C), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec((C, Ch), const),
            pl.BlockSpec((1, Ch), const),
        ],
        out_specs=pl.BlockSpec((1, bn, Ch), lambda bi, ni: (bi, ni, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, Ch), x.dtype),
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, C).astype(jnp.float32),
        ln_bias.reshape(1, C).astype(jnp.float32),
        w1.astype(x.dtype),
        b1.reshape(1, Ch).astype(jnp.float32),
    )
    return pl.pallas_call(
        _mlp_down_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn, Ch), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, bn, C), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((Ch, C), const),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec((1, C), const),
        ],
        out_specs=pl.BlockSpec((1, bn, C), lambda bi, ni: (bi, ni, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        interpret=interpret,
    )(
        h, x,
        w2.astype(x.dtype),
        b2.reshape(1, C).astype(jnp.float32),
        ls_gamma.reshape(1, C).astype(jnp.float32),
    )


def reference_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, ls_gamma, eps=1e-5):
    """Unfused chain matching layers/block.py: LN2 -> mlp -> ls2 -> residual."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    hn = ((x32 - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias).astype(dt)
    h = hn @ w1.astype(dt) + b1.astype(dt)
    h = jax.nn.gelu(h, approximate=False)
    y = h @ w2.astype(dt) + b2.astype(dt)
    return x + y * ls_gamma.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_mlp_residual(x, ln_scale, ln_bias, w1, b1, w2, b2, ls_gamma,
                       eps: float = 1e-5):
    """Pallas-fused on TPU, reference elsewhere; differentiable."""
    if jax.default_backend() == "tpu":
        return fused_mlp_kernel(x, ln_scale, ln_bias, w1, b1, w2, b2,
                                ls_gamma, eps)
    return reference_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, ls_gamma, eps)


def _mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, ls_gamma, eps):
    out = fused_mlp_residual(x, ln_scale, ln_bias, w1, b1, w2, b2, ls_gamma, eps)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2, ls_gamma)


def _mlp_bwd(eps, res, g):
    ref = functools.partial(reference_mlp, eps=eps)
    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


fused_mlp_residual.defvjp(_mlp_fwd, _mlp_bwd)
