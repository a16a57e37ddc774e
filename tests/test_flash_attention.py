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
