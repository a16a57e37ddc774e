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


def test_bwd_is_einsum_transpose(rng):
    """The custom-vjp backward equals autodiff of the einsum path."""
    h, w, h2, w2 = 10, 12, 21, 25
    x = jnp.asarray(rng.normal(size=(1, h, w, 4)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(1, h2, w2, 4)).astype(np.float32))
    _, vjp = jax.vjp(lambda t: _resize_einsum(t, (h2, w2)), x)
    (ref,) = vjp(g)
    (got,) = _resize_kernel_bwd((h2, w2), x.shape, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


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
