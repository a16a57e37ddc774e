"""Ring attention: sequence-parallel self-attention over the context mesh axis.

The default context-parallel path shards the global-attention token axis with
``with_sharding_constraint`` and lets XLA all-gather the full K/V onto every
device (``models/aggregator.py`` step 4). That is simple and correct, but each
device then holds the *entire* K/V and the gather serialises ahead of the
matmul. This module is the shard_map alternative (CLAUDE.md open item): K/V
stay sharded, and chunk-sized blocks rotate around the ring via
``lax.ppermute`` while each device folds them into an exact online softmax —
per-device K/V memory drops from O(N) to O(N/n_devices) and the
collective-permute overlaps with the attention matmuls (XLA schedules the
ppermute of step i+1 concurrently with compute of step i since they have no
data dependency inside the scan body).

Numerics: per-chunk partial softmax (out_c, lse_c) — flash kernel on TPU,
dense fp32 off-TPU — merged in fp32 as

    L        = logsumexp_c(lse_c)
    out      = sum_c out_c * exp(lse_c - L)

which is exactly softmax over the full key axis. The merge participates in
autodiff (the flash kernel's lse output carries a real cotangent, folded into
its backward delta term), so the backward pass is a reverse ring — JAX
transposes ``ppermute`` to the inverted permutation automatically.

Replaces: the reference has no sequence parallelism at all; its substitutes
are rank-subsampling + KV CPU offload (SURVEY §2.6). This is the TPU-native
answer for scenes too large for one chip's HBM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..parallel.sharding import CONTEXT_AXIS, DATA_AXIS, active_mesh


def _dense_chunk(q, k, v, scale):
    """Partial softmax vs one key chunk, fp32. Returns (out fp32, lse fp32)."""
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ) / l
    return out, (m + jnp.log(l))[..., 0]


def _chunk_attn(q, k, v, use_flash: bool):
    d = q.shape[-1]
    if use_flash:
        from . import flash_attention as fa

        out, lse = fa.flash_attention_lse(q, k, v)
        return out.astype(jnp.float32), lse
    return _dense_chunk(q, k, v, 1.0 / (d**0.5))


def _merge(o_a, lse_a, o_b, lse_b):
    """Combine two partial softmaxes (fp32) into one."""
    m = jnp.maximum(lse_a, lse_b)
    wa = jnp.exp(lse_a - m)[..., None]
    wb = jnp.exp(lse_b - m)[..., None]
    out = (o_a * wa + o_b * wb) / (wa + wb)
    lse = m + jnp.log(wa + wb)[..., 0]
    return out, lse


def ring_applicable(
    q: jax.Array, mesh: Optional[Mesh], mask
) -> bool:
    """Ring path preconditions: active mesh with context extent > 1 that
    divides the token axis, no attention mask (the global-attention site is
    unmasked; masked sites keep the flash/dense paths)."""
    if mask is not None or mesh is None:
        return False
    n = mesh.shape.get(CONTEXT_AXIS, 1)
    return n > 1 and q.ndim == 4 and q.shape[2] % n == 0


def ring_sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Optional[Mesh] = None,
) -> jax.Array:
    """Sequence-parallel SDPA: (B, H, N, d)^3 -> (B, H, N, d), N sharded over
    the ``context`` mesh axis, K/V rotated around the ring.

    Caller guarantees ``ring_applicable``. Batch stays sharded over ``data``
    when it divides; heads are replicated (head_dim=64 x 16 heads fits every
    chip — sharding heads would cut the MXU tiles below a lane).
    """
    mesh = mesh if mesh is not None else active_mesh()
    n = mesh.shape[CONTEXT_AXIS]
    B = q.shape[0]
    data_ax = DATA_AXIS if (
        mesh.shape.get(DATA_AXIS, 1) > 1 and B % mesh.shape[DATA_AXIS] == 0
    ) else None
    spec = P(data_ax, None, CONTEXT_AXIS, None)
    use_flash = jax.default_backend() == "tpu"
    perm = [(i, (i + 1) % n) for i in range(n)]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    def run(ql, kl, vl):
        # local chunk first, then n-1 rotations
        o, lse = _chunk_attn(ql, kl, vl, use_flash)

        def step(carry, _):
            o, lse, kc, vc = carry
            kc = jax.lax.ppermute(kc, CONTEXT_AXIS, perm)
            vc = jax.lax.ppermute(vc, CONTEXT_AXIS, perm)
            o_c, lse_c = _chunk_attn(ql, kc, vc, use_flash)
            o, lse = _merge(o, lse, o_c, lse_c)
            return (o, lse, kc, vc), None

        (o, lse, _, _), _ = jax.lax.scan(
            step, (o, lse, kl, vl), None, length=n - 1
        )
        return o.astype(ql.dtype)

    return run(q, k, v)
