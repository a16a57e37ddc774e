"""Scaled-dot-product attention cores.

Replaces the reference's ``F.scaled_dot_product_attention`` call
(``sailrecon/layers/attention.py:103``). Two interchangeable implementations:

- ``sdpa_dense``: einsum attention with fp32 logits/softmax — the XLA path.
  On TPU, XLA fuses this well for moderate sequence lengths; it is also the
  ground truth for kernel tests.
- ``sdpa_flash``: Pallas block-wise flash attention (``ops/flash_attention``),
  used on TPU for the long global-attention sequences. Selected via ``impl``.

Mask convention: boolean, **True = attend** (same as torch sdpa bool masks).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def sdpa_dense(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Dense attention. q,k,v: (B, H, N, d); mask broadcastable (B|1, 1, Nq, Nk)."""
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


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    impl: str = "auto",
) -> jax.Array:
    """Dispatch between implementations.

    ``impl``: 'dense' | 'flash' | 'auto'. 'auto' uses flash on TPU backends for
    sequences where it pays off, otherwise dense.
    """
    if impl == "dense":
        return sdpa_dense(q, k, v, mask)
    if impl in ("flash", "auto"):
        try:
            from . import flash_attention as fa

            if fa.supported(q, k, v, mask) and (
                impl == "flash" or fa.worth_it(q, k, v)
            ):
                return fa.flash_attention(q, k, v, mask)
        except ImportError:
            pass
        return sdpa_dense(q, k, v, mask)
    raise ValueError(f"unknown attention impl: {impl}")
