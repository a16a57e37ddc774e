"""Pre-LN transformer block: Attn+LayerScale residual, MLP+LayerScale residual.

Functional re-design of ``sailrecon/layers/block.py`` (Block). Stochastic
depth / drop-path (``layers/drop_path.py:14-36``) is available behind
``BlockConfig.drop_path`` + a ``drop_key`` but no flagship configuration
enables it: every config the reference instantiates uses ``drop_path=0``
(``models/aggregator.py:99-149``, DINOv2 built with ``drop_path_rate=0.0``),
so the only training-time regulariser in play is the rank-subsampling of
scene tokens.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import params as P
from .attention import (
    AttentionConfig, attention_heads_out, init_attention, kv_heads, qkv_heads,
)


@dataclass(frozen=True)
class BlockConfig:
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qk_norm: bool = False
    ln_eps: float = 1e-5  # block layer norms (torch nn.LayerNorm default)
    init_values: float = 0.01  # layer-scale init
    attn_impl: str = "auto"
    # LN+QKV+rope fusion (ops/fused_qkv): 'auto' = Pallas kernel on TPU when
    # the block shape qualifies, 'on' forces it (tests), 'off' disables.
    fused_qkv: str = "auto"
    # MLP fusion (LN2+fc1+gelu / fc2+ls+residual kernels), same tri-state.
    fused_mlp: str = "auto"
    # Stochastic depth rate (reference ``layers/drop_path.py:14-36``). Takes
    # effect only when ``block()`` is also given a ``drop_key`` (training);
    # no reference config enables it (``aggregator.py:99-149`` all pass 0).
    drop_path: float = 0.0

    @property
    def attn(self) -> AttentionConfig:
        return AttentionConfig(
            dim=self.dim,
            num_heads=self.num_heads,
            qk_norm=self.qk_norm,
            ln_eps=self.ln_eps,
            impl=self.attn_impl,
        )

    @property
    def mlp_hidden(self) -> int:
        return int(self.dim * self.mlp_ratio)


def init_block(key, cfg: BlockConfig):
    k_attn, k_fc1, k_fc2 = jax.random.split(key, 3)
    return {
        "norm1": P.init_layer_norm(cfg.dim),
        "attn": init_attention(k_attn, cfg.attn),
        "ls1": P.init_layer_scale(cfg.dim, cfg.init_values),
        "norm2": P.init_layer_norm(cfg.dim),
        "mlp": {
            "fc1": P.init_linear(k_fc1, cfg.dim, cfg.mlp_hidden),
            "fc2": P.init_linear(k_fc2, cfg.mlp_hidden, cfg.dim),
        },
        "ls2": P.init_layer_scale(cfg.dim, cfg.init_values),
    }


def mlp(p, x):
    return P.linear(p["fc2"], P.gelu(P.linear(p["fc1"], x)))


def drop_path_mask(key, x: jax.Array, rate: float) -> jax.Array:
    """Per-sample stochastic-depth mask, pre-scaled by 1/keep_prob.

    Semantics of the reference ``drop_path`` (``layers/drop_path.py:14-25``):
    Bernoulli(keep) per leading-axis sample, broadcast over all other axes,
    scaled so the residual branch is unbiased in expectation. The reference's
    exact-count gather variant (``block.py:115-144``, used when rate > 0.1)
    is a GPU-side variance reduction; on TPU the mask form stays fused into
    the residual add, so we use it for every rate.
    """
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    m = jax.random.bernoulli(key, keep, shape)
    return m.astype(x.dtype) / jnp.asarray(keep, x.dtype)


def _fused_qkv_applicable(p, cfg: BlockConfig, x, rope_cos_sin) -> bool:
    """Gate for the fused LN+QKV+rope kernel: TPU backend (or forced), 2D-rope
    with shared (N, d) tables, qk-norm on, rope-compatible head dim, and no
    active multi-axis mesh (pallas_call is opaque to GSPMD propagation)."""
    if cfg.fused_qkv == "off":
        return False
    if cfg.fused_qkv != "on" and jax.default_backend() != "tpu":
        return False
    if rope_cos_sin is None or rope_cos_sin[0].ndim != 2:
        return False
    if not (cfg.qk_norm and "b" in p["attn"]["qkv"]):
        return False
    d = cfg.dim // cfg.num_heads
    if cfg.dim % cfg.num_heads or d % 4:
        return False
    # bf16 trunk only on TPU: f32 weights would blow the VMEM budget
    if cfg.fused_qkv != "on" and x.dtype != jnp.bfloat16:
        return False
    from ..parallel.sharding import active_mesh

    mesh = active_mesh()
    if mesh is not None and any(v > 1 for v in mesh.shape.values()):
        return False
    return True


def _fused_qkv_plain_applicable(p, cfg: BlockConfig, x) -> bool:
    """Gate for the no-rope/no-qk-norm fused LN+QKV (ViT blocks)."""
    if cfg.fused_qkv == "off":
        return False
    if cfg.fused_qkv != "on" and jax.default_backend() != "tpu":
        return False
    if cfg.qk_norm or "b" not in p["attn"]["qkv"]:
        return False
    if cfg.dim % cfg.num_heads:
        return False
    if cfg.fused_qkv != "on" and x.dtype != jnp.bfloat16:
        return False
    from ..parallel.sharding import active_mesh

    mesh = active_mesh()
    if mesh is not None and any(v > 1 for v in mesh.shape.values()):
        return False
    return True


def _fused_qkv(p, x, cfg: BlockConfig, rope_cos_sin):
    from ..ops.fused_qkv import fused_ln_qkv_rope

    cos, sin = rope_cos_sin
    return fused_ln_qkv_rope(
        x, p["norm1"]["scale"], p["norm1"]["bias"],
        p["attn"]["qkv"]["w"], p["attn"]["qkv"]["b"],
        p["attn"]["q_norm"]["scale"], p["attn"]["q_norm"]["bias"],
        p["attn"]["k_norm"]["scale"], p["attn"]["k_norm"]["bias"],
        cos, sin, cfg.num_heads, cfg.ln_eps,
    )


def _fused_proj_residual(p, o, x):
    from ..ops.fused_qkv import fused_proj_residual

    return fused_proj_residual(
        o, x, p["attn"]["proj"]["w"], p["attn"]["proj"]["b"],
        p["ls1"]["gamma"],
    )


def _fused_mlp_applicable(p, cfg: BlockConfig, x) -> bool:
    if cfg.fused_mlp == "off":
        return False
    if cfg.fused_mlp != "on" and jax.default_backend() != "tpu":
        return False
    if "fc1" not in p["mlp"] or "b" not in p["mlp"]["fc1"]:
        return False
    # bf16 trunk only (fp32 heads keep the reference AMP boundary), and the
    # up-projection weight must fit VMEM alongside the token block
    if cfg.fused_mlp != "on":
        if x.dtype != jnp.bfloat16:
            return False
        if 2 * cfg.dim * cfg.mlp_hidden > 9 * 2**20:
            return False
    from ..parallel.sharding import active_mesh

    mesh = active_mesh()
    if mesh is not None and any(v > 1 for v in mesh.shape.values()):
        return False
    return True


def _mlp_residual(p, x, cfg: BlockConfig):
    """LN2 + MLP + layer-scale + residual: Pallas-fused when applicable."""
    if _fused_mlp_applicable(p, cfg, x):
        from ..ops.fused_qkv import fused_mlp_residual

        return fused_mlp_residual(
            x, p["norm2"]["scale"], p["norm2"]["bias"],
            p["mlp"]["fc1"]["w"], p["mlp"]["fc1"]["b"],
            p["mlp"]["fc2"]["w"], p["mlp"]["fc2"]["b"],
            p["ls2"]["gamma"], cfg.ln_eps,
        )
    h = P.layer_norm(p["norm2"], x, cfg.ln_eps)
    return x + P.layer_scale(p["ls2"], mlp(p["mlp"], h))


def qkv_parts(
    p,
    x: jax.Array,
    cfg: BlockConfig,
    rope_cos_sin: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-head (q, k, v) after LN1 (+ qk-norm / rope) — the pre-attention
    half of the block, Pallas-fused when applicable. Used by the
    sequence-parallel ring block (``parallel/sp_block.py``), which needs the
    attention core split out to interleave the ppermute ring."""
    if _fused_qkv_applicable(p, cfg, x, rope_cos_sin):
        return _fused_qkv(p, x, cfg, rope_cos_sin)
    if rope_cos_sin is None and _fused_qkv_plain_applicable(p, cfg, x):
        from ..ops.fused_qkv import fused_ln_qkv

        return fused_ln_qkv(
            x, p["norm1"]["scale"], p["norm1"]["bias"],
            p["attn"]["qkv"]["w"], p["attn"]["qkv"]["b"],
            cfg.num_heads, cfg.ln_eps,
        )
    h = P.layer_norm(p["norm1"], x, cfg.ln_eps)
    return qkv_heads(p["attn"], h, cfg.attn, rope_cos_sin)


def attn_out_mlp(p, o: jax.Array, x: jax.Array, cfg: BlockConfig) -> jax.Array:
    """Post-attention half: head-merge + out-proj + layer-scale + residual,
    then the MLP residual — Pallas-fused when applicable (the counterpart of
    :func:`qkv_parts` for composed attention cores)."""
    from ..parallel.sharding import active_mesh

    mesh = active_mesh()
    if (
        cfg.fused_qkv != "off"
        and jax.default_backend() == "tpu"
        and x.dtype == jnp.bfloat16
        and "b" in p["attn"]["proj"]
        and (mesh is None or all(v == 1 for v in mesh.shape.values()))
    ):
        x = _fused_proj_residual(p, o, x)
    else:
        from .attention import _merge_heads

        x = x + P.layer_scale(p["ls1"], P.linear(p["attn"]["proj"], _merge_heads(o)))
    return _mlp_residual(p, x, cfg)


def block(
    p,
    x: jax.Array,
    cfg: BlockConfig,
    rope_cos_sin: Optional[Tuple[jax.Array, jax.Array]] = None,
    mask: Optional[jax.Array] = None,
    extra_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    drop_key: Optional[jax.Array] = None,
) -> jax.Array:
    if cfg.drop_path > 0.0 and drop_key is not None:
        # stochastic-depth path (training only; plain residuals so the
        # per-sample mask multiplies the branch, reference block.py:107-108 —
        # which reuses drop_path1's *rate* for both branches but draws fresh
        # Bernoulli noise per call, hence two independent keys here)
        from .attention import _merge_heads

        k1, k2 = jax.random.split(drop_key)
        q, k, v = qkv_parts(p, x, cfg, rope_cos_sin)
        o = attention_heads_out(p["attn"], q, k, v, cfg.attn, mask, extra_kv)
        attn_res = P.layer_scale(p["ls1"], P.linear(p["attn"]["proj"], _merge_heads(o)))
        x = x + drop_path_mask(k1, x, cfg.drop_path) * attn_res
        h = P.layer_norm(p["norm2"], x, cfg.ln_eps)
        mlp_res = P.layer_scale(p["ls2"], mlp(p["mlp"], h))
        return x + drop_path_mask(k2, x, cfg.drop_path) * mlp_res
    # composed from the two halves so the fused-kernel gating lives in ONE
    # place (qkv_parts / attn_out_mlp) for every block variant
    q, k, v = qkv_parts(p, x, cfg, rope_cos_sin)
    o = attention_heads_out(p["attn"], q, k, v, cfg.attn, mask, extra_kv)
    return attn_out_mlp(p, o, x, cfg)


def block_with_context(
    p,
    x: jax.Array,
    context: jax.Array,
    cfg: BlockConfig,
    rope_q: Optional[Tuple[jax.Array, jax.Array]] = None,
    rope_ctx: Optional[Tuple[jax.Array, jax.Array]] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Block where ``context`` tokens contribute keys/values only.

    Numerically identical to running the reference block on the concatenation
    ``[context ‖ x]`` and keeping the ``x`` rows (``aggregator.py:672-741``):
    context passes through the same pre-norm before the KV projection, but no
    attention rows / MLP are spent on it since those outputs are discarded.
    ``mask``'s KV axis is laid out as [context ‖ x].
    """
    hc = P.layer_norm(p["norm1"], context, cfg.ln_eps)
    ekv = kv_heads(p["attn"], hc, cfg.attn, rope_ctx)
    return block(p, x, cfg, rope_q, mask, extra_kv=ekv)


def block_context_kv(
    p,
    context: jax.Array,
    cfg: BlockConfig,
    rope_ctx: Optional[Tuple[jax.Array, jax.Array]] = None,
):
    """The (k, v) heads this block would derive from ``context`` tokens.

    This is exactly what gets stored in the relocalisation scene cache
    (the reference caches the same quantity inside ``Attention.forward``,
    ``layers/attention.py:94-97`` — post-norm, post-rope K/V).
    """
    hc = P.layer_norm(p["norm1"], context, cfg.ln_eps)
    return kv_heads(p["attn"], hc, cfg.attn, rope_ctx)
