"""Scaled-dot-product attention cores.

Replaces the reference's ``F.scaled_dot_product_attention`` call
(``sailrecon/layers/attention.py:103``). Two interchangeable implementations:

- ``sdpa_dense``: einsum attention with fp32 logits/softmax — the XLA path
  and the ground truth for kernel tests.
- ``flash_attention`` (``ops/flash_attention.py``): Pallas online-softmax
  kernel with functional block masks; used on TPU for long sequences.

Mask is either a boolean array (True = attend, torch-sdpa convention), a
``RelocMask`` spec (materialised for the dense path, evaluated per-tile for
the flash path), or None.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from .mask_spec import RelocMask

_NEG_INF = -1e30

MaskLike = Union[None, jax.Array, RelocMask]


def sdpa_dense(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: MaskLike = None,
) -> jax.Array:
    """Dense attention. q,k,v: (B, H, N, d); mask broadcastable (B|1, 1, Nq, Nk)."""
    if isinstance(mask, RelocMask):
        mask = mask.materialize()
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(q.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def reloc_split_attention(
    q: jax.Array,
    k_self: jax.Array,
    v_self: jax.Array,
    k_ctx: jax.Array,
    v_ctx: jax.Array,
    mask: RelocMask,
):
    """RelocMask attention as two UNMASKED flash calls merged by log-sum-exp.

    The mask structure — every query row sees [all context ‖ its own frame]
    (``aggregator.py:832-851``) — partitions the key axis exactly, so
    softmax(q, [ctx ‖ own]) == lse-merge(softmax(q, ctx), softmax(q, own)).
    vs the masked kernel this removes all per-tile mask evaluation AND the
    ~40% dead-tile overhang from 1374-token frames straddling 1024-wide key
    tiles. Returns None when shapes don't line up (caller falls back).
    """
    B, H, N, d = q.shape
    F, P = mask.num_frames, mask.frame_size
    if N != F * P or k_self.shape[2] != N or k_ctx.shape[2] != mask.n_ctx:
        return None
    from . import flash_attention as fa
    from .ring_attention import _merge

    o_ctx, lse_ctx = fa.flash_attention_lse(q, k_ctx, v_ctx)
    # own-frame part: frames fold into the batch axis — plain per-frame
    # self-attention with no mask at all
    def fold(x):
        return x.reshape(B, H, F, P, d).transpose(0, 2, 1, 3, 4).reshape(B * F, H, P, d)

    o_s, lse_s = fa.flash_attention_lse(fold(q), fold(k_self), fold(v_self))
    o_s = o_s.reshape(B, F, H, P, d).transpose(0, 2, 1, 3, 4).reshape(B, H, N, d)
    lse_s = lse_s.reshape(B, F, H, P).transpose(0, 2, 1, 3).reshape(B, H, N)
    out, _ = _merge(
        o_ctx.astype(jnp.float32), lse_ctx, o_s.astype(jnp.float32), lse_s
    )
    return out.astype(q.dtype)


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: MaskLike = None,
    impl: str = "auto",
) -> jax.Array:
    """Dispatch between implementations.

    ``impl``: 'dense' | 'flash' | 'auto'. 'auto' uses the Pallas flash kernel
    when the mask form supports it and the sequence is long enough to pay off.
    """
    if impl == "dense":
        return sdpa_dense(q, k, v, mask)
    if impl == "ring":
        from ..parallel.sharding import active_mesh
        from . import ring_attention as ra

        mesh = active_mesh()
        if ra.ring_applicable(q, mesh, mask):
            return ra.ring_sdpa(q, k, v, mesh)
        impl = "auto"  # single-device / non-dividing: regular paths
    if impl in ("flash", "auto"):
        from . import flash_attention as fa

        if fa.supported(q, k, v, mask) and (impl == "flash" or fa.worth_it(q, k, v)):
            return fa.flash_attention(
                q, k, v, mask if isinstance(mask, RelocMask) else None
            )
        return sdpa_dense(q, k, v, mask)
    raise ValueError(f"unknown attention impl: {impl}")
