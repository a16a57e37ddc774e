"""Frame/sequence-parallel transformer blocks: shard_map'd Pallas-kernel path.

Under the GSPMD-only path, ``pallas_call`` is opaque to sharding propagation,
so the fused kernels are gated off whenever a multi-extent mesh is active
(``layers/block.py``) and multi-chip runs fall back to unfused XLA ops. These
wrappers make the sharding explicit with ``jax.shard_map`` so each device runs
the full fused block on its local shard — the real-pod execution path
(CLAUDE.md open item: "a real pod would want shard_map'd kernel variants").

Three variants, matching the aggregator's three attention sites (SURVEY §2.2):

- :func:`frame_block_sharded` — frames sharded over ``data x context``; frame
  (and ViT) attention is frame-local, so the block needs **no collectives**.
- :func:`reloc_block_sharded` — query frames sharded, the small compressed
  scene representation replicated on every device (it is all-gathered once by
  construction); per-device fused [ctx ‖ own-frame] attention.
- :func:`global_block_ring` — the (A·P) token axis sharded over ``context``:
  fused LN+QKV(+RoPE) on local tokens, ring attention (``lax.ppermute`` K/V
  rotation with exact lse merges, K/V never gathered), fused proj/MLP. This
  is the sequence-parallel block; per-device K/V memory is O(N/devices).

With tensor parallelism on (``model`` mesh axis > 1) every variant switches
to a Megatron-style shard_map body: attention heads and the MLP hidden dim
are column-split over ``model`` (:func:`_tp_local_attn`), the row-parallel
out-projection / fc2 outputs psum over it (:func:`_tp_out_mlp`), and the
fused Pallas kernels run on each device's head shard. The ring variant
composes both axes (ring over ``context`` × head split over ``model``).
Each function falls back to the plain ``block()`` / ``block_with_context()``
when no mesh is active or the sharded axis does not divide.

Gradients flow through ``shard_map``: replicated-param cotangents are psummed
across devices by the shard_map transpose and the ppermute ring transposes to
the inverted permutation (validated in ``tests/test_sp_block.py``).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..layers.block import (
    BlockConfig,
    attn_out_mlp,
    block,
    block_with_context,
    qkv_parts,
)
from .sharding import CONTEXT_AXIS, DATA_AXIS, MODEL_AXIS, activate_mesh, active_mesh


# Validation hook: when True, the shard_map paths stay engaged even when every
# mesh axis has extent 1. A 1-device TPU mesh then executes the exact
# shard_map + Pallas programs a pod would run per device (ring of length 1,
# collective-free frame/reloc bodies) — the only way to have Mosaic compile
# the shard_map'd kernels on the single available chip
# (tools/tpu_spblock_check.py).
_FORCE_SINGLE_DEVICE_SPMD = False


@contextlib.contextmanager
def force_single_device_spmd():
    global _FORCE_SINGLE_DEVICE_SPMD
    prev = _FORCE_SINGLE_DEVICE_SPMD
    _FORCE_SINGLE_DEVICE_SPMD = True
    try:
        yield
    finally:
        _FORCE_SINGLE_DEVICE_SPMD = prev


def _axes_over(mesh, axes) -> Tuple[str, ...]:
    if _FORCE_SINGLE_DEVICE_SPMD:
        return tuple(a for a in axes if a in mesh.shape)
    return tuple(a for a in axes if mesh.shape.get(a, 1) > 1)


def _extent(mesh, axes) -> int:
    n = 1
    for a in axes:
        n *= mesh.shape.get(a, 1)
    return n


def _frames_shardable(n_frames: int, mesh, axes) -> bool:
    if mesh is None or mesh.shape.get(MODEL_AXIS, 1) > 1:
        return False
    n = _extent(mesh, _axes_over(mesh, axes))
    return (n > 1 or _FORCE_SINGLE_DEVICE_SPMD) and n_frames % n == 0


def _spec1(axes: Tuple[str, ...], ndim: int) -> P:
    lead = axes if len(axes) > 1 else axes[0]
    return P(lead, *([None] * (ndim - 1)))


def frame_block_sharded(
    p,
    x: jax.Array,
    cfg: BlockConfig,
    rope_cos_sin: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """``block()`` with the leading frame axis sharded over data x context.

    Frame attention is independent per frame (``aggregator.py:643-670``), so
    the shard_map body is collective-free and every Pallas kernel applies to
    the device-local frames. With tensor parallelism on (``model`` extent
    > 1) the Megatron variant :func:`_block_tp` is used instead — heads and
    MLP hidden sharded over ``model`` on top of the frame sharding.
    """
    mesh = active_mesh()
    if mesh is not None and mesh.shape.get(MODEL_AXIS, 1) > 1:
        if _tp_divides(cfg, mesh.shape[MODEL_AXIS]):
            return _block_tp(p, x, cfg, rope_cos_sin, mesh)
        return block(p, x, cfg, rope_cos_sin)
    if not _frames_shardable(x.shape[0], mesh, (DATA_AXIS, CONTEXT_AXIS)):
        return block(p, x, cfg, rope_cos_sin)
    axes = _axes_over(mesh, (DATA_AXIS, CONTEXT_AXIS))
    spec_x = _spec1(axes, 3)
    has_rope = rope_cos_sin is not None
    in_specs = (P(), spec_x) + ((P(None, None), P(None, None)) if has_rope else ())

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=spec_x,
        check_vma=False,
    )
    def run(pl, xl, *rope):
        with activate_mesh(None):
            return block(pl, xl, cfg, rope if has_rope else None)

    return run(p, x, *(rope_cos_sin if has_rope else ()))


def _tp_local_attn(att, i, cfg: BlockConfig, m: int):
    """This device's head shard of the attention params.

    Column-parallel qkv: slice heads ``[i*Hl, (i+1)*Hl)`` out of the fused
    [q|k|v] weight, keeping the kernel-expected
    [q_local|k_local|v_local] column layout; the per-head-dim q/k norms are
    head-independent and pass through whole.
    """
    import jax.lax as lax

    H = cfg.num_heads
    Hl = H // m
    C = cfg.dim
    d = C // H
    wqkv = att["qkv"]["w"].reshape(C, 3, H, d)
    wqkv = lax.dynamic_slice_in_dim(wqkv, i * Hl, Hl, axis=2)
    local = {"qkv": {"w": wqkv.reshape(C, 3 * Hl * d)}}
    if "b" in att["qkv"]:
        bqkv = att["qkv"]["b"].reshape(3, H, d)
        bqkv = lax.dynamic_slice_in_dim(bqkv, i * Hl, Hl, axis=1)
        local["qkv"]["b"] = bqkv.reshape(3 * Hl * d)
    for key in ("q_norm", "k_norm"):
        if key in att:
            local[key] = att[key]
    return local


def _tp_out_mlp(pl, merged, xl, cfg: BlockConfig, i, m: int) -> jax.Array:
    """Row-parallel post-attention tail of the Megatron block: out-projection
    on the local head shard + psum over ``model`` (bias added once after),
    layer-scale residual, then column-parallel fc1+gelu / row-parallel
    fc2+psum MLP residual."""
    import jax.lax as lax

    from ..layers import params as Pm

    H = cfg.num_heads
    Hl = H // m
    C = cfg.dim
    d = C // H
    Chl = cfg.mlp_hidden // m
    att = pl["attn"]
    wproj = att["proj"]["w"].reshape(H, d, C)
    wproj = lax.dynamic_slice_in_dim(wproj, i * Hl, Hl, axis=0)
    y = merged @ wproj.reshape(Hl * d, C).astype(merged.dtype)
    y = lax.psum(y, MODEL_AXIS)
    if "b" in att["proj"]:
        y = y + att["proj"]["b"].astype(y.dtype)
    xl = xl + Pm.layer_scale(pl["ls1"], y)
    h = Pm.layer_norm(pl["norm2"], xl, cfg.ln_eps)
    w1 = lax.dynamic_slice_in_dim(pl["mlp"]["fc1"]["w"], i * Chl, Chl, axis=1)
    h = h @ w1.astype(h.dtype)
    if "b" in pl["mlp"]["fc1"]:
        b1 = lax.dynamic_slice_in_dim(pl["mlp"]["fc1"]["b"], i * Chl, Chl, axis=0)
        h = h + b1.astype(h.dtype)
    h = Pm.gelu(h)
    w2 = lax.dynamic_slice_in_dim(pl["mlp"]["fc2"]["w"], i * Chl, Chl, axis=0)
    y2 = h @ w2.astype(h.dtype)
    y2 = lax.psum(y2, MODEL_AXIS)
    if "b" in pl["mlp"]["fc2"]:
        y2 = y2 + pl["mlp"]["fc2"]["b"].astype(y2.dtype)
    return xl + Pm.layer_scale(pl["ls2"], y2)


def _tp_divides(cfg: BlockConfig, m: int) -> bool:
    return cfg.num_heads % m == 0 and cfg.mlp_hidden % m == 0


def _block_tp(
    p,
    x: jax.Array,
    cfg: BlockConfig,
    rope_cos_sin: Optional[Tuple[jax.Array, jax.Array]],
    mesh,
) -> jax.Array:
    """Megatron tensor-parallel block inside one shard_map.

    Attention heads and the MLP hidden dim are column-split over ``model``
    (each device slices its head/hidden shard from the standard-layout
    weights by ``axis_index``, so storage/converter/FSDP layouts are
    untouched); the row-parallel out-projection and fc2 outputs are psummed,
    biases added once after the psum. Frames additionally shard over
    data x context when they divide. The fused LN+QKV(+RoPE) kernel and
    flash attention run on the device-local head subset.
    """
    import dataclasses

    m = mesh.shape[MODEL_AXIS]
    fr_axes = _axes_over(mesh, (DATA_AXIS, CONTEXT_AXIS))
    nf = _extent(mesh, fr_axes)
    if nf > 1 and x.shape[0] % nf == 0:
        spec_x = _spec1(fr_axes, 3)
    else:
        spec_x = P(None, None, None)
    has_rope = rope_cos_sin is not None
    in_specs = (P(), spec_x) + ((P(None, None), P(None, None)) if has_rope else ())
    # scale dim together with num_heads so lcfg's derived quantities
    # (head_dim, kernel/flash gates, VMEM estimates) see the TRUE per-head
    # dim of the local shard — the array shapes come from the sliced weights
    lcfg = dataclasses.replace(
        cfg, num_heads=cfg.num_heads // m, dim=cfg.dim // m
    )

    from ..layers.attention import _merge_heads, attention_heads_out

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=spec_x,
        check_vma=False,
    )
    def run(pl, xl, *rope):
        i = jax.lax.axis_index(MODEL_AXIS)
        local_attn = _tp_local_attn(pl["attn"], i, cfg, m)
        lp = dict(pl)
        lp["attn"] = local_attn
        with activate_mesh(None):
            q, k, v = qkv_parts(lp, xl, lcfg, rope if has_rope else None)
            o = attention_heads_out(local_attn, q, k, v, lcfg.attn)
            merged = _merge_heads(o)  # (B, N, Hl*d)
        return _tp_out_mlp(pl, merged, xl, cfg, i, m)

    return run(p, x, *(rope_cos_sin if has_rope else ()))


def _block_ctx_tp(
    p,
    x: jax.Array,
    context: jax.Array,
    cfg: BlockConfig,
    rope_q,
    rope_ctx,
    mesh,
) -> jax.Array:
    """Megatron tensor-parallel ``block_with_context`` inside one shard_map.

    Heads/MLP hidden column-split over ``model`` exactly as :func:`_block_tp`;
    the context tokens' K/V are computed per device on its local head shard
    (``kv_heads`` on the head-sliced weight). Query frames additionally shard
    over data x context when they align with their scene's context (same rule
    as :func:`reloc_block_sharded`); the context itself shards over ``data``
    when scenes divide, else stays replicated.
    """
    import dataclasses

    m = mesh.shape[MODEL_AXIS]
    B = context.shape[0]
    BF = x.shape[0]
    Q = BF // B
    nd = mesh.shape.get(DATA_AXIS, 1)
    nc = mesh.shape.get(CONTEXT_AXIS, 1)
    fr_ok = (
        nd * nc > 1
        and B % nd == 0
        and BF % (nd * nc) == 0
        and (nc == 1 or (B == nd and Q % nc == 0))
    )
    if fr_ok:
        fr_axes = _axes_over(mesh, (DATA_AXIS, CONTEXT_AXIS))
        spec_x = _spec1(fr_axes, 3)
        data_ax = DATA_AXIS if nd > 1 else None
        spec_ctx = P(data_ax, None, None)
    else:
        spec_x = P(None, None, None)
        spec_ctx = P(None, None, None)
    has_rq = rope_q is not None
    has_rc = rope_ctx is not None
    in_specs = (P(), spec_x, spec_ctx)
    if has_rq:
        in_specs = in_specs + (P(None, None), P(None, None))
    if has_rc:
        in_specs = in_specs + (spec_ctx, spec_ctx)
    # scale dim together with num_heads so lcfg's derived quantities
    # (head_dim, kernel/flash gates, VMEM estimates) see the TRUE per-head
    # dim of the local shard — the array shapes come from the sliced weights
    lcfg = dataclasses.replace(
        cfg, num_heads=cfg.num_heads // m, dim=cfg.dim // m
    )

    from ..layers import params as Pm
    from ..layers.attention import _merge_heads, attention_heads_out, kv_heads

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=spec_x,
        check_vma=False,
    )
    def run(pl, xl, ctxl, *ropes):
        j = 0
        rq = rc = None
        if has_rq:
            rq = (ropes[0], ropes[1])
            j = 2
        if has_rc:
            rc = (ropes[j], ropes[j + 1])
        i = jax.lax.axis_index(MODEL_AXIS)
        local_attn = _tp_local_attn(pl["attn"], i, cfg, m)
        lp = dict(pl)
        lp["attn"] = local_attn
        with activate_mesh(None):
            hc = Pm.layer_norm(pl["norm1"], ctxl, cfg.ln_eps)
            ekv = kv_heads(local_attn, hc, lcfg.attn, rc)
            q, k, v = qkv_parts(lp, xl, lcfg, rq)
            o = attention_heads_out(
                local_attn, q, k, v, lcfg.attn, extra_kv=ekv
            )
            merged = _merge_heads(o)
        return _tp_out_mlp(pl, merged, xl, cfg, i, m)

    args = (p, x, context)
    if has_rq:
        args = args + rope_q
    if has_rc:
        args = args + rope_ctx
    return run(*args)


def reloc_block_sharded(
    p,
    x: jax.Array,
    context: jax.Array,
    cfg: BlockConfig,
    rope_q: Optional[Tuple[jax.Array, jax.Array]] = None,
    rope_ctx: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """``block_with_context()`` with query frames sharded, context replicated.

    x: (B*Q, P, C) frame-major queries; context: (B, Nc, C) compressed scene
    tokens — small (A·(rank+5) ≈ 1.5k tokens), kept whole on every device
    (the "all-gather the rank-R scene rep over ICI" shape from SURVEY §2.6).
    Each device runs the fused [ctx ‖ own-frame] attention on its frames.
    """
    mesh = active_mesh()
    B = context.shape[0]
    BF = x.shape[0]
    Q = BF // B
    if mesh is not None and mesh.shape.get(MODEL_AXIS, 1) > 1:
        if _tp_divides(cfg, mesh.shape[MODEL_AXIS]):
            return _block_ctx_tp(p, x, context, cfg, rope_q, rope_ctx, mesh)
        return block_with_context(p, x, context, cfg, rope_q, rope_ctx)
    ok = False
    if mesh is not None and mesh.shape.get(MODEL_AXIS, 1) == 1:
        nd = mesh.shape.get(DATA_AXIS, 1)
        nc = mesh.shape.get(CONTEXT_AXIS, 1)
        if ((nd * nc > 1 or _FORCE_SINGLE_DEVICE_SPMD)
                and B % nd == 0 and BF % (nd * nc) == 0):
            # each device's frame chunk must land on the scene(s) whose
            # context it holds: whole scenes per device (nc == 1), or frames
            # of exactly one scene split over context (B == nd)
            ok = nc == 1 or (B == nd and Q % nc == 0)
    if not ok:
        return block_with_context(p, x, context, cfg, rope_q, rope_ctx)
    axes = _axes_over(mesh, (DATA_AXIS, CONTEXT_AXIS))
    spec_x = _spec1(axes, 3)
    data_ax = DATA_AXIS if mesh.shape.get(DATA_AXIS, 1) > 1 else None
    spec_ctx = P(data_ax, None, None)
    has_rq = rope_q is not None
    has_rc = rope_ctx is not None
    in_specs = (P(), spec_x, spec_ctx)
    if has_rq:
        in_specs = in_specs + (P(None, None), P(None, None))
    if has_rc:
        in_specs = in_specs + (spec_ctx, spec_ctx)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=spec_x,
        check_vma=False,
    )
    def run(pl, xl, ctxl, *ropes):
        i = 0
        rq = rc = None
        if has_rq:
            rq = (ropes[0], ropes[1])
            i = 2
        if has_rc:
            rc = (ropes[i], ropes[i + 1])
        with activate_mesh(None):
            return block_with_context(pl, xl, ctxl, cfg, rq, rc)

    args = (p, x, context)
    if has_rq:
        args = args + rope_q
    if has_rc:
        args = args + rope_ctx
    return run(*args)


def global_block_ring(
    p,
    x: jax.Array,
    cfg: BlockConfig,
    rope_cos_sin: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """Sequence-parallel block: token axis sharded over ``context``, ring
    attention inside one shard_map, all pointwise/matmul kernels local.

    x: (B, N, C) with N divisible by the context extent. K/V stay sharded and
    rotate around the ring via ppermute while each device folds the visiting
    chunk into an exact online softmax (``ops/ring_attention`` numerics); the
    fused LN+QKV+RoPE / proj / MLP kernels run on the local N/n tokens.

    Composes with tensor parallelism: with a ``model`` extent > 1 each device
    runs the ring on its head shard (:func:`_tp_local_attn`); the K/V chunks
    that rotate over ``context`` are the local-head slices (per-device comm
    shrinks by 1/m), and the row-parallel proj/MLP outputs psum over
    ``model`` (:func:`_tp_out_mlp`).
    """
    import dataclasses

    mesh = active_mesh()
    nctx = mesh.shape.get(CONTEXT_AXIS, 1) if mesh is not None else 1
    nm = mesh.shape.get(MODEL_AXIS, 1) if mesh is not None else 1
    if (
        mesh is None
        or (nctx == 1 and not _FORCE_SINGLE_DEVICE_SPMD)
        or x.shape[1] % nctx != 0
        or (nm > 1 and not _tp_divides(cfg, nm))
    ):
        # no token-axis sharding possible: fall back to scene sharding over
        # the data axis / the Megatron block (themselves falling back to the
        # plain GSPMD block)
        return frame_block_sharded(p, x, cfg, rope_cos_sin)
    data_ax = (
        DATA_AXIS
        if mesh.shape.get(DATA_AXIS, 1) > 1
        and x.shape[0] % mesh.shape[DATA_AXIS] == 0
        else None
    )
    spec_x = P(data_ax, CONTEXT_AXIS, None)
    spec_rope = P(CONTEXT_AXIS, None)
    has_rope = rope_cos_sin is not None
    in_specs = (P(), spec_x) + ((spec_rope, spec_rope) if has_rope else ())
    use_flash = jax.default_backend() == "tpu"
    perm = [(i, (i + 1) % nctx) for i in range(nctx)]
    lcfg = dataclasses.replace(
        cfg, num_heads=cfg.num_heads // nm, dim=cfg.dim // nm
    )

    from ..layers.attention import _merge_heads
    from ..ops.ring_attention import _chunk_attn, _merge

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=spec_x,
        check_vma=False,
    )
    def run(pl, xl, *rope):
        lp = pl
        if nm > 1:
            i = jax.lax.axis_index(MODEL_AXIS)
            lp = dict(pl)
            lp["attn"] = _tp_local_attn(pl["attn"], i, cfg, nm)
        with activate_mesh(None):
            q, k, v = qkv_parts(lp, xl, lcfg, rope if has_rope else None)
            o, lse = _chunk_attn(q, k, v, use_flash)

            def step(carry, _):
                o, lse, kc, vc = carry
                kc = jax.lax.ppermute(kc, CONTEXT_AXIS, perm)
                vc = jax.lax.ppermute(vc, CONTEXT_AXIS, perm)
                o_c, lse_c = _chunk_attn(q, kc, vc, use_flash)
                o, lse = _merge(o, lse, o_c, lse_c)
                return (o, lse, kc, vc), None

            (o, lse, _, _), _ = jax.lax.scan(
                step, (o, lse, k, v), None, length=nctx - 1
            )
            if nm == 1:
                return attn_out_mlp(pl, o.astype(q.dtype), xl, cfg)
            merged = _merge_heads(o.astype(q.dtype))
        return _tp_out_mlp(pl, merged, xl, cfg, i, nm)

    return run(p, x, *(rope_cos_sin if has_rope else ()))
