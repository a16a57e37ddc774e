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
