"""Flash-attention kernel tests (Pallas interpret mode on CPU).

Equality vs the dense XLA reference across mask forms, non-tile-aligned
lengths, and gradients (dense-recompute backward)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_supervise_sfm_tpu.ops import attention_core as AC
from self_supervise_sfm_tpu.ops.flash_attention import flash_attention
from self_supervise_sfm_tpu.ops.mask_spec import RelocMask


def rand_qkv(rng, B, H, Nq, Nk, d, dtype=np.float32):
    q = rng.normal(size=(B, H, Nq, d)).astype(dtype)
    k = rng.normal(size=(B, H, Nk, d)).astype(dtype)
    v = rng.normal(size=(B, H, Nk, d)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


class TestFlashForward:
    @pytest.mark.parametrize("nq,nk", [(128, 128), (256, 384), (200, 200), (130, 70)])
    def test_no_mask(self, rng, nq, nk):
        q, k, v = rand_qkv(rng, 1, 2, nq, nk, 64)
        ref = AC.sdpa_dense(q, k, v)
        out = flash_attention(q, k, v, bq=128, bk=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_reloc_mask(self, rng):
        P, Q, n_ctx = 96, 3, 160
        mask = RelocMask(n_ctx=n_ctx, frame_size=P, num_frames=Q)
        q, k, v = rand_qkv(rng, 1, 2, mask.nq, mask.nk, 64)
        ref = AC.sdpa_dense(q, k, v, mask)
        out = flash_attention(q, k, v, mask, bq=128, bk=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_reloc_mask_tile_aligned_skipping(self, rng):
        """Block sizes dividing the frame layout exercise tile skipping."""
        P, Q, n_ctx = 128, 4, 256
        mask = RelocMask(n_ctx=n_ctx, frame_size=P, num_frames=Q)
        q, k, v = rand_qkv(rng, 1, 1, mask.nq, mask.nk, 64)
        ref = AC.sdpa_dense(q, k, v, mask)
        out = flash_attention(q, k, v, mask, bq=128, bk=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_bf16(self, rng):
        q, k, v = rand_qkv(rng, 1, 2, 256, 256, 64)
        q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
        ref = AC.sdpa_dense(q, k, v)
        out = flash_attention(q, k, v, bq=128, bk=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
        )

    def test_mask_spec_dense_vs_materialized(self, rng):
        mask = RelocMask(n_ctx=50, frame_size=30, num_frames=2)
        q, k, v = rand_qkv(rng, 1, 2, mask.nq, mask.nk, 32)
        a = AC.sdpa_dense(q, k, v, mask)
        b = AC.sdpa_dense(q, k, v, mask.materialize())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestFrameCtxKernel:
    """Fused [ctx ‖ own-frame] reloc kernel vs the dense per-frame reference
    (which itself equals the reference's masked global-reloc attention rows)."""

    @pytest.mark.parametrize(
        "B,F,P,nc,bq,bk",
        [
            (1, 3, 96, 160, 128, 128),   # ragged frame + ctx vs tiles
            (2, 2, 128, 128, 128, 128),  # tile-aligned, multi-batch
            (1, 2, 200, 70, 128, 64),    # multiple ragged k tiles both sides
        ],
    )
    def test_matches_dense(self, rng, B, F, P, nc, bq, bk):
        from self_supervise_sfm_tpu.ops.flash_attention import (
            _frame_ctx_dense, frame_ctx_kernel,
        )

        H, d = 2, 64
        q, k, v = rand_qkv(rng, B * F, H, P, P, d)
        ck = jnp.asarray(rng.normal(size=(B, H, nc, d)).astype(np.float32))
        cv = jnp.asarray(rng.normal(size=(B, H, nc, d)).astype(np.float32))
        ref = _frame_ctx_dense(q, k, v, ck, cv)
        out = frame_ctx_kernel(q, k, v, ck, cv, bq=bq, bk=bk, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_equals_masked_reloc_attention(self, rng):
        """Layout form == mask form: folding frames and passing ctx separately
        reproduces RelocMask attention over the [ctx ‖ all-frames] axis."""
        B, F, P, nc, H, d = 1, 3, 96, 160, 2, 64
        mask = RelocMask(n_ctx=nc, frame_size=P, num_frames=F)
        q, k, v = rand_qkv(rng, B, H, F * P, nc + F * P, d)
        ref = AC.sdpa_dense(q, k, v, mask)

        from self_supervise_sfm_tpu.ops.flash_attention import frame_ctx_kernel

        def fold(x):
            return (
                x.reshape(B, H, F, P, d)
                .transpose(0, 2, 1, 3, 4)
                .reshape(B * F, H, P, d)
            )

        ck, cv = k[:, :, :nc], v[:, :, :nc]
        out = frame_ctx_kernel(
            fold(q), fold(k[:, :, nc:]), fold(v[:, :, nc:]), ck, cv,
            bq=128, bk=128, interpret=True,
        )
        out = (
            out.reshape(B, F, H, P, d)
            .transpose(0, 2, 1, 3, 4)
            .reshape(B, H, F * P, d)
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_split_composition_and_grads(self, rng):
        """The lse-split composition (the TPU backward path) matches the dense
        reference in value and gradients."""
        from self_supervise_sfm_tpu.ops.flash_attention import (
            _frame_ctx_dense, _frame_ctx_split,
        )

        B, F, P, nc, H, d = 1, 2, 64, 96, 2, 64
        q, k, v = rand_qkv(rng, B * F, H, P, P, d)
        ck = jnp.asarray(rng.normal(size=(B, H, nc, d)).astype(np.float32))
        cv = jnp.asarray(rng.normal(size=(B, H, nc, d)).astype(np.float32))

        def loss(f):
            return lambda *a: jnp.sum(f(*a) ** 2)

        vs, gs = jax.value_and_grad(loss(_frame_ctx_split), argnums=(0, 1, 2, 3, 4))(
            q, k, v, ck, cv
        )
        vd, gd = jax.value_and_grad(loss(_frame_ctx_dense), argnums=(0, 1, 2, 3, 4))(
            q, k, v, ck, cv
        )
        np.testing.assert_allclose(float(vs), float(vd), rtol=1e-5)
        for a, b in zip(gs, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


class TestFlashBackward:
    def test_grads_match_dense(self, rng):
        mask = RelocMask(n_ctx=64, frame_size=64, num_frames=2)
        q, k, v = rand_qkv(rng, 1, 2, mask.nq, mask.nk, 64)

        def loss_flash(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, mask, bq=128, bk=128, interpret=True) ** 2
            )

        def loss_dense(q, k, v):
            return jnp.sum(AC.sdpa_dense(q, k, v, mask) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    def test_grads_match_dense_ragged_unpadded(self, rng):
        """Nq AND Nk both non-tile-divisible through the UNPADDED backward
        (the production 1374-token shape class): q-side OOB rows must not
        leak into the dk/dv reductions."""
        q, k, v = rand_qkv(rng, 1, 2, 150, 170, 64)
        q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)

        def loss_flash(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, None, bq=128, bk=128,
                                interpret=True) ** 2
            )

        def loss_dense(q, k, v):
            return jnp.sum(AC.sdpa_dense(q, k, v, None) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
