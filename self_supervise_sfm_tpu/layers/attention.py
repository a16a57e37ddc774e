"""Multi-head attention with fused QKV, optional QK-norm / 2D RoPE / extra KV.

Functional re-design of ``sailrecon/layers/attention.py``. The reference's
stateful KV cache with CPU offload (``attention.py:84-100``) is replaced by an
*explicit* extra-KV argument: the scene cache lives in HBM as a pytree and is
concatenated in front of the fresh keys/values — pure, static-shaped, and
shardable (see ``models/aggregator.py`` for how the cache is built).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import params as P
from . import rope as R
from ..ops import attention_core


@dataclass(frozen=True)
class AttentionConfig:
    dim: int
    num_heads: int
    qk_norm: bool = False
    ln_eps: float = 1e-5  # eps of the q/k head-dim layer norms
    impl: str = "auto"  # sdpa implementation

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


def init_attention(key, cfg: AttentionConfig):
    k1, k2 = jax.random.split(key)
    p = {
        "qkv": P.init_linear(k1, cfg.dim, 3 * cfg.dim),
        "proj": P.init_linear(k2, cfg.dim, cfg.dim),
    }
    if cfg.qk_norm:
        p["q_norm"] = P.init_layer_norm(cfg.head_dim)
        p["k_norm"] = P.init_layer_norm(cfg.head_dim)
    return p


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    B, N, C = x.shape
    return x.reshape(B, N, num_heads, C // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    B, H, N, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, H * d)


def qkv_heads(
    p, x: jax.Array, cfg: AttentionConfig,
    rope_cos_sin: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Project x to per-head (q, k, v) with qk-norm and rope applied.

    This is the exact transformation whose (k, v) output is cached for
    relocalisation — matching what the reference stores inside
    ``Attention.forward`` (post-norm, post-rope; ``attention.py:78-97``).
    """
    B, N, C = x.shape
    qkv = P.linear(p["qkv"], x)  # (B, N, 3C)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = _split_heads(q, cfg.num_heads)
    k = _split_heads(k, cfg.num_heads)
    v = _split_heads(v, cfg.num_heads)
    if cfg.qk_norm:
        q = P.layer_norm(p["q_norm"], q, cfg.ln_eps)
        k = P.layer_norm(p["k_norm"], k, cfg.ln_eps)
    if rope_cos_sin is not None:
        cos, sin = rope_cos_sin
        q = R.apply_rope(q, cos, sin)
        k = R.apply_rope(k, cos, sin)
    return q, k, v


def kv_heads(
    p, x: jax.Array, cfg: AttentionConfig,
    rope_cos_sin: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """K/V-only projection via slices of the fused QKV weight.

    Used for tokens that act purely as attention *context* (the compressed
    scene representation): the reference wastes a full QKV + attention row on
    them and discards the output (``aggregator.py:736-737``); we only compute
    what is consumed.
    """
    w = p["qkv"]["w"]
    # derive the per-part width from the weight itself (== cfg.dim normally;
    # == local heads * head_dim when a tensor-parallel shard_map body passes
    # a head-sliced [q|k|v] weight, parallel/sp_block.py)
    D = w.shape[-1] // 3
    k = x @ w[:, D : 2 * D].astype(x.dtype)
    v = x @ w[:, 2 * D :].astype(x.dtype)
    if "b" in p["qkv"]:
        b = p["qkv"]["b"]
        k = k + b[D : 2 * D].astype(x.dtype)
        v = v + b[2 * D :].astype(x.dtype)
    k = _split_heads(k, cfg.num_heads)
    v = _split_heads(v, cfg.num_heads)
    if cfg.qk_norm:
        k = P.layer_norm(p["k_norm"], k, cfg.ln_eps)
    if rope_cos_sin is not None:
        cos, sin = rope_cos_sin
        k = R.apply_rope(k, cos, sin)
    return k, v


def attention(
    p,
    x: jax.Array,
    cfg: AttentionConfig,
    rope_cos_sin: Optional[Tuple[jax.Array, jax.Array]] = None,
    mask: Optional[jax.Array] = None,
    extra_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """Self-attention over x, optionally against prepended extra keys/values.

    Args:
        x: (B, N, C) tokens.
        rope_cos_sin: optional (cos, sin) tables for x's positions.
        mask: bool, True=attend; (B|1, 1, N, N_kv_total) where the kv axis is
            [extra_kv ‖ x] when extra_kv is given.
        extra_kv: optional (k, v) of shape (B, H, N_extra, head_dim), already
            normed/roped — e.g. the relocalisation scene cache.
    Returns:
        (B, N, C).
    """
    q, k, v = qkv_heads(p, x, cfg, rope_cos_sin)
    return attention_from_qkv(p, q, k, v, cfg, mask, extra_kv)


def attention_from_qkv(
    p,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cfg: AttentionConfig,
    mask: Optional[jax.Array] = None,
    extra_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """Attention core + output projection on pre-projected per-head q/k/v —
    the entry point for the fused LN+QKV+rope kernel (``ops/fused_qkv``)."""
    o = attention_heads_out(p, q, k, v, cfg, mask, extra_kv)
    o = _merge_heads(o)
    return P.linear(p["proj"], o)


def attention_heads_out(
    p,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cfg: AttentionConfig,
    mask: Optional[jax.Array] = None,
    extra_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """The attention core alone: (B, H, N, d) per-head outputs, no merge /
    projection — consumed by the fused out-projection kernel."""
    if extra_kv is not None and extra_kv[0].shape[0] != q.shape[0]:
        # frame-major reloc layout: q/k/v carry (B*F, H, P, d) with frames
        # folded into batch while the shared context K/V stays (B, H, Nc, d).
        # Every q row sees [ctx ‖ own frame] — the reloc allow-mask expressed
        # by layout (no mask argument applies).
        assert mask is None and q.shape[0] % extra_kv[0].shape[0] == 0
        ek, ev = extra_kv
        from ..ops import flash_attention as fa

        if (
            cfg.impl != "dense"
            and jax.default_backend() == "tpu"
            and cfg.head_dim <= 256
            and q.shape[2] * (ek.shape[2] + k.shape[2]) >= 1_500_000
        ):
            return fa.frame_ctx_attention(
                q, k, v, ek.astype(k.dtype), ev.astype(v.dtype)
            )
        return fa._frame_ctx_dense(
            q, k, v, ek.astype(k.dtype), ev.astype(v.dtype)
        )
    o = None
    if (
        extra_kv is not None
        and isinstance(mask, attention_core.RelocMask)
        and cfg.impl != "dense"
        and q.shape[2] * (mask.n_ctx + mask.frame_size) >= 1_500_000
    ):
        # [ctx ‖ own-frame] mask structure: two unmasked flash calls merged
        # by lse beat the masked kernel (see reloc_split_attention)
        ek, ev = extra_kv
        o = attention_core.reloc_split_attention(
            q, k, v, ek.astype(k.dtype), ev.astype(v.dtype), mask
        )
    if o is None:
        if extra_kv is not None:
            ek, ev = extra_kv
            k = jnp.concatenate([ek.astype(k.dtype), k], axis=2)
            v = jnp.concatenate([ev.astype(v.dtype), v], axis=2)
        o = attention_core.sdpa(q, k, v, mask=mask, impl=cfg.impl)
    return o
