"""Ring attention (shard_map sequence parallelism) vs the dense reference.

Covers the CLAUDE.md open item "ring-attention shard_map variant of context
parallelism": forward equality, gradient equality (the merge differentiates
through per-chunk lse), the flash-kernel-per-chunk path in interpret mode,
and the aggregator integration via ``global_attn_impl='ring'``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_supervise_sfm_tpu.ops.attention_core import sdpa_dense
from self_supervise_sfm_tpu.ops import ring_attention as ra
from self_supervise_sfm_tpu.ops import flash_attention as fa
from self_supervise_sfm_tpu.parallel.sharding import activate_mesh, make_mesh


def _qkv(rng, B, H, N, d):
    return tuple(
        jnp.asarray(rng.normal(size=(B, H, N, d)), jnp.float32) for _ in range(3)
    )


class TestRingSdpa:
    def test_forward_matches_dense(self, rng):
        mesh = make_mesh(num_data=2, num_context=4)
        q, k, v = _qkv(rng, 2, 4, 64, 16)
        with activate_mesh(mesh):
            out = jax.jit(lambda *a: ra.ring_sdpa(*a, mesh))(q, k, v)
        np.testing.assert_allclose(out, sdpa_dense(q, k, v), atol=2e-6)

    def test_grads_match_dense(self, rng):
        mesh = make_mesh(num_data=1, num_context=8)
        q, k, v = _qkv(rng, 1, 2, 40, 8)

        def loss(fn):
            return lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v)))

        with activate_mesh(mesh):
            g_ring = jax.jit(
                jax.grad(loss(lambda *a: ra.ring_sdpa(*a, mesh)), argnums=(0, 1, 2))
            )(q, k, v)
        g_ref = jax.grad(loss(sdpa_dense), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_ring, g_ref):
            np.testing.assert_allclose(a, b, atol=5e-6)

    def test_applicability_gate(self, rng):
        mesh = make_mesh(num_data=8, num_context=1)
        q, _, _ = _qkv(rng, 1, 2, 64, 8)
        assert not ra.ring_applicable(q, mesh, None)  # context extent 1
        mesh = make_mesh(num_data=2, num_context=4)
        assert ra.ring_applicable(q, mesh, None)
        q66 = jnp.zeros((1, 2, 66, 8))
        assert not ra.ring_applicable(q66, mesh, None)  # 66 % 4 != 0
        assert not ra.ring_applicable(q, None, None)  # no mesh
        assert not ra.ring_applicable(q, mesh, object())  # masked site


class TestFlashLse:
    """flash_attention_lse: the lse output must carry a real cotangent
    (folded into the backward delta) — this is what makes the ring merge
    differentiable when the per-chunk kernel is the Pallas one."""

    def test_forward_out_and_lse(self, rng):
        q, k, v = _qkv(rng, 1, 2, 48, 16)
        out, lse = fa.flash_attention_lse(q, k, v, interpret=True)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(16)
        np.testing.assert_allclose(out, sdpa_dense(q, k, v), atol=2e-6)
        np.testing.assert_allclose(
            lse, jax.scipy.special.logsumexp(s, axis=-1), rtol=1e-5
        )

    def test_lse_cotangent(self, rng):
        q, k, v = _qkv(rng, 1, 2, 32, 16)

        def loss_flash(q, k, v):
            out, lse = fa.flash_attention_lse(q, k, v, interpret=True)
            return jnp.sum(jnp.sin(out)) + jnp.sum(jnp.cos(lse))

        def loss_dense(q, k, v):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(16)
            lse = jax.scipy.special.logsumexp(s, axis=-1)
            return jnp.sum(jnp.sin(sdpa_dense(q, k, v))) + jnp.sum(jnp.cos(lse))

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(a, b, atol=5e-6)

    def test_ring_with_flash_chunks(self, rng, monkeypatch):
        """Force the flash-per-chunk path (interpret mode) through the ring."""
        mesh = make_mesh(num_data=1, num_context=4)
        q, k, v = _qkv(rng, 1, 2, 64, 16)
        real = fa.flash_attention_lse

        def interp(q, k, v, mask=None, **kw):
            kw["interpret"] = True
            return real(q, k, v, mask, **kw)

        monkeypatch.setattr(fa, "flash_attention_lse", interp)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        with activate_mesh(mesh):
            out = jax.jit(lambda *a: ra.ring_sdpa(*a, mesh))(q, k, v)
        np.testing.assert_allclose(out, sdpa_dense(q, k, v), atol=2e-6)


class TestAggregatorRing:
    def test_global_ring_matches_dense(self, rng):
        from self_supervise_sfm_tpu.models.aggregator import (
            AggregatorConfig,
            aggregator_forward,
            init_aggregator,
        )
        from self_supervise_sfm_tpu.layers.vit import ViTConfig

        vit = ViTConfig(
            img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2,
            num_register_tokens=0, init_values=1.0,
        )
        base = dict(
            img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2,
            num_register_tokens=4, intermediate_layer_idx=(0, 1), vit=vit,
        )
        cfg_d = AggregatorConfig(**base, attn_impl="dense", global_attn_impl="dense")
        cfg_r = AggregatorConfig(**base, attn_impl="dense", global_attn_impl="ring")
        key = jax.random.PRNGKey(0)
        p = init_aggregator(key, cfg_d)
        # A*Ptok = 4*(4+5)=36 not divisible by 8 -> use context=4 (36%4==0... 36%4=0)
        images = jnp.asarray(rng.uniform(size=(1, 6, 28, 28, 3)), jnp.float32)
        kw = dict(num_anchor=4, num_query=2, rank=2, subsample_key=jax.random.PRNGKey(1))
        taps_d, _, cam_d = aggregator_forward(p, cfg_d, images, **kw)
        mesh = make_mesh(num_data=1, num_context=4)
        with activate_mesh(mesh):
            taps_r, _, cam_r = jax.jit(
                lambda p, im: aggregator_forward(p, cfg_r, im, **kw)
            )(p, images)
        np.testing.assert_allclose(cam_r, cam_d, atol=1e-5)
        for l in taps_d:
            np.testing.assert_allclose(taps_r[l], taps_d[l], atol=1e-5, rtol=1e-5)
