"""Pallas bilinear-upsample kernels (ops/resize) vs the einsum reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_supervise_sfm_tpu.heads.dpt_utils import (
    _interp_matrix_ac,
    _resize_einsum,
    _resize_kernel_bwd,
)
from self_supervise_sfm_tpu.ops.resize import resize_bilinear_kernel


@pytest.mark.parametrize(
    "h,w,h2,w2,c",
    [
        (37, 37, 74, 74, 8),     # DPT x2 pyramid step (scaled channels)
        (74, 74, 130, 130, 8),   # 518/296-style non-integer ratio
        (18, 22, 37, 45, 16),    # non-square, non-integer
        (9, 13, 9, 26, 8),       # W-only upsample
        (7, 16, 21, 16, 8),      # H-only upsample
    ],
)
def test_kernel_matches_einsum(rng, h, w, h2, w2, c):
    x = jnp.asarray(rng.normal(size=(2, h, w, c)).astype(np.float32))
    ref = _resize_einsum(x, (h2, w2))
    out = resize_bilinear_kernel(
        x, (h2, w2), _interp_matrix_ac(w2, w), interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("h,w,h2,w2,c", [(18, 22, 37, 45, 16),
                                         (9, 13, 9, 26, 8)])
def test_kernel_fused_add_matches_einsum(rng, h, w, h2, w2, c):
    """The fused pos-embed epilogue == resize-then-add (both W+H and W-only
    shapes — the latter exercises the non-kernel add fallback)."""
    x = jnp.asarray(rng.normal(size=(2, h, w, c)).astype(np.float32))
    add = jnp.asarray(rng.normal(size=(h2, w2, c)).astype(np.float32))
    ref = _resize_einsum(x, (h2, w2)) + add[None]
    out = resize_bilinear_kernel(
        x, (h2, w2), _interp_matrix_ac(w2, w), interpret=True, add=add
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_resize_ac_fused_add_grads(rng):
    """resize_bilinear_ac(add=...) differentiates like resize + add."""
    from self_supervise_sfm_tpu.heads.dpt_utils import resize_bilinear_ac

    h, w, h2, w2, c = 6, 7, 11, 13, 4
    x = jnp.asarray(rng.normal(size=(3, h, w, c)).astype(np.float32))
    add = jnp.asarray(rng.normal(size=(h2, w2, c)).astype(np.float32))
    f = lambda x, a: jnp.sum(resize_bilinear_ac(x, (h2, w2), add=a) ** 2)  # noqa: E731
    fr = lambda x, a: jnp.sum(  # noqa: E731
        (_resize_einsum(x, (h2, w2)) + a[None]) ** 2)
    gx, ga = jax.grad(f, argnums=(0, 1))(x, add)
    rx, ra = jax.grad(fr, argnums=(0, 1))(x, add)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), atol=1e-4)


def test_bwd_is_einsum_transpose(rng):
    """The custom-vjp backward equals autodiff of the einsum path."""
    h, w, h2, w2 = 10, 12, 21, 25
    x = jnp.asarray(rng.normal(size=(1, h, w, 4)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(1, h2, w2, 4)).astype(np.float32))
    _, vjp = jax.vjp(lambda t: _resize_einsum(t, (h2, w2)), x)
    (ref,) = vjp(g)
    got, dadd = _resize_kernel_bwd(
        (h2, w2), None,
        (jnp.zeros((0,) + x.shape[1:3] + (0,), x.dtype), None), g)
    assert dadd is None
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_bwd_fused_add_is_einsum_transpose(rng):
    """The custom-vjp backward with a live fused addend matches jax.vjp of
    the einsum+add reference for BOTH cotangents (dx, dadd) — covers the
    dadd = sum-over-N path that TPU training hits but CPU autodiff skips."""
    n, h, w, h2, w2, c = 3, 10, 12, 21, 25, 4
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    add = jnp.asarray(rng.normal(size=(h2, w2, c)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, h2, w2, c)).astype(np.float32))
    _, vjp = jax.vjp(
        lambda t, a: _resize_einsum(t, (h2, w2)) + a[None], x, add
    )
    ref_dx, ref_dadd = vjp(g)
    got_dx, got_dadd = _resize_kernel_bwd(
        (h2, w2), None,
        (jnp.zeros((0,) + x.shape[1:3] + (0,), x.dtype),
         jnp.zeros((0,), add.dtype)), g)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_dadd), np.asarray(ref_dadd),
                               atol=1e-5)


def test_identity_rows_passthrough(rng):
    """Integer-aligned output rows copy their input row exactly."""
    x = jnp.asarray(rng.normal(size=(1, 5, 9, 8)).astype(np.float32))
    out = resize_bilinear_kernel(
        x, (9, 17), _interp_matrix_ac(17, 9), interpret=True
    )
    # align_corners 5->9: every even output row is an input row
    np.testing.assert_allclose(
        np.asarray(out)[:, ::2, ::2], np.asarray(x), atol=1e-6
    )


def test_out_dtype_bf16_store_matches_f32(rng):
    """out_dtype=bfloat16 stores the f32 H-pass result rounded once — the
    same rounding the consumer conv applies internally at DEFAULT TPU
    precision; values must equal the f32 path rounded to bf16."""
    from self_supervise_sfm_tpu.ops.resize import resize_bilinear_kernel
    from self_supervise_sfm_tpu.heads.dpt_utils import _interp_matrix_ac

    n, h, w, h2, w2, c = 2, 10, 12, 21, 25, 8
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    add = jnp.asarray(rng.normal(size=(h2, w2, c)).astype(np.float32))
    aw = _interp_matrix_ac(w2, w)
    f32 = resize_bilinear_kernel(x, (h2, w2), aw, add=add, interpret=True)
    bf16 = resize_bilinear_kernel(x, (h2, w2), aw, add=add, interpret=True,
                                  out_dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(bf16), np.asarray(f32.astype(jnp.bfloat16)))
