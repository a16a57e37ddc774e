"""shard_map'd block variants (parallel/sp_block) vs the plain blocks.

Forward AND gradient equality on the virtual CPU mesh — validates the
shard_map wiring: frame sharding, replicated-param cotangent psums, the
ppermute ring transpose, and the scene-alignment rules of the reloc variant.
(The Pallas kernels inside are exercised on TPU only; their semantics are
covered by test_flash_attention / test_fused_qkv.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_supervise_sfm_tpu.layers.block import (
    BlockConfig, block, block_with_context, init_block,
)
from self_supervise_sfm_tpu.layers import rope as R
from self_supervise_sfm_tpu.parallel import sharding as Sh
from self_supervise_sfm_tpu.parallel.sp_block import (
    frame_block_sharded, global_block_ring, reloc_block_sharded,
)

CFG = BlockConfig(dim=64, num_heads=4, qk_norm=True)


@pytest.fixture(scope="module")
def bparams():
    return jax.jit(lambda k: init_block(k, CFG))(jax.random.PRNGKey(0))


def rope_tables(n):
    pos = R.position_grid(2, n // 2) + 1
    return R.rope_tables(pos, CFG.dim // CFG.num_heads, 100.0)


def mesh_dc(nd, nc):
    return Sh.make_mesh(num_data=nd, num_context=nc, num_model=1)


class TestFrameBlock:
    @pytest.mark.parametrize("nd,nc", [(2, 2), (4, 1), (1, 4)])
    def test_matches_plain(self, rng, bparams, nd, nc):
        x = jnp.asarray(rng.normal(size=(8, 12, CFG.dim)).astype(np.float32))
        tabs = rope_tables(12)
        ref = block(bparams, x, CFG, tabs)
        with Sh.activate_mesh(mesh_dc(nd, nc)):
            out = jax.jit(lambda p, x: frame_block_sharded(p, x, CFG, tabs))(
                bparams, x
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_non_dividing_falls_back(self, rng, bparams):
        x = jnp.asarray(rng.normal(size=(5, 12, CFG.dim)).astype(np.float32))
        ref = block(bparams, x, CFG, None)
        with Sh.activate_mesh(mesh_dc(2, 2)):
            out = jax.jit(lambda p, x: frame_block_sharded(p, x, CFG, None))(
                bparams, x
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_grads_match(self, rng, bparams):
        x = jnp.asarray(rng.normal(size=(8, 12, CFG.dim)).astype(np.float32))
        tabs = rope_tables(12)

        def loss_plain(p, x):
            return jnp.sum(block(p, x, CFG, tabs) ** 2)

        def loss_sharded(p, x):
            return jnp.sum(frame_block_sharded(p, x, CFG, tabs) ** 2)

        gp_ref = jax.grad(loss_plain)(bparams, x)
        with Sh.activate_mesh(mesh_dc(2, 2)):
            gp = jax.jit(jax.grad(loss_sharded))(bparams, x)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            ),
            gp, gp_ref,
        )


class TestRelocBlock:
    def _inputs(self, rng, B, Q, P_, nc_tok):
        x = jnp.asarray(
            rng.normal(size=(B * Q, P_, CFG.dim)).astype(np.float32)
        )
        ctx = jnp.asarray(
            rng.normal(size=(B, nc_tok, CFG.dim)).astype(np.float32)
        )
        rq = rope_tables(P_)
        cos, sin = rope_tables(nc_tok)
        rc = (
            jnp.broadcast_to(cos, (B,) + cos.shape),
            jnp.broadcast_to(sin, (B,) + sin.shape),
        )
        return x, ctx, rq, rc

    @pytest.mark.parametrize(
        "B,Q,nd,nc",
        [
            (2, 4, 2, 1),  # whole scenes per data shard
            (4, 2, 4, 2),  # one scene per data shard, frames context-split
            (1, 8, 1, 4),  # single scene, frames context-split
        ],
    )
    def test_matches_plain(self, rng, bparams, B, Q, nd, nc):
        x, ctx, rq, rc = self._inputs(rng, B, Q, 12, 10)
        ref = block_with_context(bparams, x, ctx, CFG, rq, rc)
        with Sh.activate_mesh(mesh_dc(nd, nc)):
            out = jax.jit(
                lambda p, x, c: reloc_block_sharded(p, x, c, CFG, rq, rc)
            )(bparams, x, ctx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_misaligned_scenes_fall_back(self, rng, bparams):
        """B=2 scenes over context-only mesh would split frames of different
        scenes onto devices holding the wrong ctx — must take the fallback."""
        x, ctx, rq, rc = self._inputs(rng, 2, 4, 12, 10)
        ref = block_with_context(bparams, x, ctx, CFG, rq, rc)
        with Sh.activate_mesh(mesh_dc(1, 4)):
            out = jax.jit(
                lambda p, x, c: reloc_block_sharded(p, x, c, CFG, rq, rc)
            )(bparams, x, ctx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_grads_match(self, rng, bparams):
        x, ctx, rq, rc = self._inputs(rng, 1, 8, 12, 10)

        def loss_plain(p, x, c):
            return jnp.sum(block_with_context(p, x, c, CFG, rq, rc) ** 2)

        def loss_sharded(p, x, c):
            return jnp.sum(reloc_block_sharded(p, x, c, CFG, rq, rc) ** 2)

        g_ref = jax.grad(loss_plain, argnums=(0, 1, 2))(bparams, x, ctx)
        with Sh.activate_mesh(mesh_dc(2, 4)):
            g = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(
                bparams, x, ctx
            )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            ),
            g, g_ref,
        )


class TestTPBlock:
    """Megatron shard_map block (heads/hidden over `model`) vs plain block."""

    @pytest.mark.parametrize("nd,nc,nm", [(1, 1, 4), (2, 1, 2), (1, 2, 2)])
    def test_matches_plain(self, rng, bparams, nd, nc, nm):
        x = jnp.asarray(rng.normal(size=(8, 12, CFG.dim)).astype(np.float32))
        tabs = rope_tables(12)
        ref = block(bparams, x, CFG, tabs)
        mesh = Sh.make_mesh(num_data=nd, num_context=nc, num_model=nm)
        with Sh.activate_mesh(mesh):
            out = jax.jit(lambda p, x: frame_block_sharded(p, x, CFG, tabs))(
                bparams, x
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_no_rope_plain_block(self, rng, bparams):
        x = jnp.asarray(rng.normal(size=(4, 12, CFG.dim)).astype(np.float32))
        ref = block(bparams, x, CFG, None)
        mesh = Sh.make_mesh(num_data=1, num_context=1, num_model=4)
        with Sh.activate_mesh(mesh):
            out = jax.jit(lambda p, x: frame_block_sharded(p, x, CFG, None))(
                bparams, x
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_grads_match(self, rng, bparams):
        x = jnp.asarray(rng.normal(size=(4, 12, CFG.dim)).astype(np.float32))
        tabs = rope_tables(12)

        def loss_plain(p, x):
            return jnp.sum(block(p, x, CFG, tabs) ** 2)

        def loss_tp(p, x):
            return jnp.sum(frame_block_sharded(p, x, CFG, tabs) ** 2)

        g_ref = jax.grad(loss_plain, argnums=(0, 1))(bparams, x)
        mesh = Sh.make_mesh(num_data=2, num_context=1, num_model=2)
        with Sh.activate_mesh(mesh):
            g = jax.jit(jax.grad(loss_tp, argnums=(0, 1)))(bparams, x)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            ),
            g, g_ref,
        )

    def test_indivisible_heads_fall_back(self, rng):
        cfg3 = BlockConfig(dim=48, num_heads=3, qk_norm=True)
        p3 = jax.jit(lambda k: init_block(k, cfg3))(jax.random.PRNGKey(1))
        x = jnp.asarray(rng.normal(size=(4, 8, 48)).astype(np.float32))
        ref = block(p3, x, cfg3, None)
        mesh = Sh.make_mesh(num_data=2, num_context=1, num_model=2)
        with Sh.activate_mesh(mesh):
            out = jax.jit(lambda p, x: frame_block_sharded(p, x, cfg3, None))(
                p3, x
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestTPRelocBlock:
    """Megatron TP block_with_context (heads over `model`, context K/V
    computed per head shard) vs the plain context block."""

    def _inputs(self, rng, B, Q, P_, nc_tok):
        x = jnp.asarray(
            rng.normal(size=(B * Q, P_, CFG.dim)).astype(np.float32)
        )
        ctx = jnp.asarray(
            rng.normal(size=(B, nc_tok, CFG.dim)).astype(np.float32)
        )
        rq = rope_tables(P_)
        cos, sin = rope_tables(nc_tok)
        rc = (
            jnp.broadcast_to(cos, (B,) + cos.shape),
            jnp.broadcast_to(sin, (B,) + sin.shape),
        )
        return x, ctx, rq, rc

    @pytest.mark.parametrize(
        "B,Q,nd,nc,nm",
        [
            (2, 4, 1, 1, 4),  # pure TP, frames unsharded
            (2, 4, 2, 1, 2),  # scenes over data x heads over model
            (2, 4, 2, 2, 2),  # misaligned frames (B != nd with nc>1): TP only
            (1, 8, 1, 4, 2),  # one scene, frames over context, TP heads
        ],
    )
    def test_matches_plain(self, rng, bparams, B, Q, nd, nc, nm):
        x, ctx, rq, rc = self._inputs(rng, B, Q, 12, 10)
        ref = block_with_context(bparams, x, ctx, CFG, rq, rc)
        mesh = Sh.make_mesh(num_data=nd, num_context=nc, num_model=nm)
        with Sh.activate_mesh(mesh):
            out = jax.jit(
                lambda p, x, c: reloc_block_sharded(p, x, c, CFG, rq, rc)
            )(bparams, x, ctx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_grads_match(self, rng, bparams):
        x, ctx, rq, rc = self._inputs(rng, 1, 4, 12, 10)

        def loss_plain(p, x, c):
            return jnp.sum(block_with_context(p, x, c, CFG, rq, rc) ** 2)

        def loss_sharded(p, x, c):
            return jnp.sum(reloc_block_sharded(p, x, c, CFG, rq, rc) ** 2)

        g_ref = jax.grad(loss_plain, argnums=(0, 1, 2))(bparams, x, ctx)
        mesh = Sh.make_mesh(num_data=1, num_context=2, num_model=4)
        with Sh.activate_mesh(mesh):
            g = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(
                bparams, x, ctx
            )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            ),
            g, g_ref,
        )

    def test_indivisible_heads_fall_back(self, rng):
        cfg3 = BlockConfig(dim=48, num_heads=3, qk_norm=True)
        p3 = jax.jit(lambda k: init_block(k, cfg3))(jax.random.PRNGKey(1))
        rng2 = np.random.default_rng(7)
        x = jnp.asarray(rng2.normal(size=(4, 8, 48)).astype(np.float32))
        ctx = jnp.asarray(rng2.normal(size=(2, 6, 48)).astype(np.float32))
        ref = block_with_context(p3, x, ctx, cfg3)
        mesh = Sh.make_mesh(num_data=2, num_context=1, num_model=2)
        with Sh.activate_mesh(mesh):
            out = jax.jit(
                lambda p, x, c: reloc_block_sharded(p, x, c, cfg3)
            )(p3, x, ctx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestGlobalRingBlock:
    def test_matches_plain(self, rng, bparams):
        x = jnp.asarray(rng.normal(size=(2, 32, CFG.dim)).astype(np.float32))
        tabs = rope_tables(32)
        ref = block(bparams, x, CFG, tabs)
        with Sh.activate_mesh(mesh_dc(2, 4)):
            out = jax.jit(lambda p, x: global_block_ring(p, x, CFG, tabs))(
                bparams, x
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_grads_match(self, rng, bparams):
        x = jnp.asarray(rng.normal(size=(1, 32, CFG.dim)).astype(np.float32))
        tabs = rope_tables(32)

        def loss_plain(p, x):
            return jnp.sum(block(p, x, CFG, tabs) ** 2)

        def loss_ring(p, x):
            return jnp.sum(global_block_ring(p, x, CFG, tabs) ** 2)

        g_ref = jax.grad(loss_plain, argnums=(0, 1))(bparams, x)
        with Sh.activate_mesh(mesh_dc(1, 4)):
            g = jax.jit(jax.grad(loss_ring, argnums=(0, 1)))(bparams, x)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            ),
            g, g_ref,
        )

    def test_token_axis_not_dividing_falls_back(self, rng, bparams):
        x = jnp.asarray(rng.normal(size=(2, 30, CFG.dim)).astype(np.float32))
        ref = block(bparams, x, CFG, None)
        with Sh.activate_mesh(mesh_dc(2, 4)):
            out = jax.jit(lambda p, x: global_block_ring(p, x, CFG, None))(
                bparams, x
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    @pytest.mark.parametrize("nd,nc,nm", [(1, 2, 4), (2, 2, 2), (1, 4, 2)])
    def test_ring_with_tp(self, rng, bparams, nd, nc, nm):
        """Ring over `context` composed with the head split over `model`."""
        x = jnp.asarray(rng.normal(size=(2, 32, CFG.dim)).astype(np.float32))
        tabs = rope_tables(32)
        ref = block(bparams, x, CFG, tabs)
        mesh = Sh.make_mesh(num_data=nd, num_context=nc, num_model=nm)
        with Sh.activate_mesh(mesh):
            out = jax.jit(lambda p, x: global_block_ring(p, x, CFG, tabs))(
                bparams, x
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_ring_tp_grads_match(self, rng, bparams):
        x = jnp.asarray(rng.normal(size=(1, 32, CFG.dim)).astype(np.float32))
        tabs = rope_tables(32)

        def loss_plain(p, x):
            return jnp.sum(block(p, x, CFG, tabs) ** 2)

        def loss_ring(p, x):
            return jnp.sum(global_block_ring(p, x, CFG, tabs) ** 2)

        g_ref = jax.grad(loss_plain, argnums=(0, 1))(bparams, x)
        mesh = Sh.make_mesh(num_data=1, num_context=4, num_model=2)
        with Sh.activate_mesh(mesh):
            g = jax.jit(jax.grad(loss_ring, argnums=(0, 1)))(bparams, x)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            ),
            g, g_ref,
        )
