"""Stochastic depth (DropPath) semantics (reference ``layers/drop_path.py``).

No reference config ever enables drop-path (``aggregator.py:99-149``), so
there is no golden to replay; instead these tests pin the *semantics* the
reference defines: per-sample Bernoulli(keep) masks scaled by 1/keep applied
to both residual branches (``block.py:107-108``), identity when inactive.
"""

import numpy as np
import jax
import jax.numpy as jnp

from self_supervise_sfm_tpu.layers.block import (
    BlockConfig, block, drop_path_mask, init_block,
)


def test_mask_values_and_mean():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((4096, 3, 8))
    rate = 0.3
    m = drop_path_mask(key, x, rate)
    assert m.shape == (4096, 1, 1)
    vals = np.unique(np.asarray(m))
    np.testing.assert_allclose(sorted(vals), [0.0, 1.0 / 0.7], rtol=1e-6)
    # unbiased: E[mask] = 1
    assert abs(float(m.mean()) - 1.0) < 0.05


def test_inactive_paths_identical():
    cfg0 = BlockConfig(dim=32, num_heads=4, attn_impl="dense")
    cfg = BlockConfig(dim=32, num_heads=4, attn_impl="dense", drop_path=0.5)
    p = init_block(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 7, 32))
    # rate set but no key (eval mode), or key given but rate 0 — both must
    # reduce to the plain block exactly
    np.testing.assert_array_equal(
        np.asarray(block(p, x, cfg)), np.asarray(block(p, x, cfg0)))
    np.testing.assert_array_equal(
        np.asarray(block(p, x, cfg0, drop_key=jax.random.PRNGKey(3))),
        np.asarray(block(p, x, cfg0)))


def test_per_sample_branch_membership():
    """Every sample's output must equal one of the four (m1, m2) in
    {0, 1/keep}^2 combinations of the plain residual branches — drop-path
    drops whole branches per sample, nothing else."""
    dim, heads, rate = 32, 4, 0.5
    cfg = BlockConfig(dim=dim, num_heads=heads, attn_impl="dense",
                      drop_path=rate)
    p = init_block(jax.random.PRNGKey(1), cfg)
    B, N = 64, 5
    x = jax.random.normal(jax.random.PRNGKey(2), (B, N, dim))
    out = np.asarray(block(p, x, cfg, drop_key=jax.random.PRNGKey(7)))

    from self_supervise_sfm_tpu.layers import params as P
    from self_supervise_sfm_tpu.layers.attention import (
        _merge_heads, attention_heads_out, qkv_heads,
    )
    from self_supervise_sfm_tpu.layers.block import mlp

    h = P.layer_norm(p["norm1"], x, cfg.ln_eps)
    q, k, v = qkv_heads(p["attn"], h, cfg.attn, None)
    o = attention_heads_out(p["attn"], q, k, v, cfg.attn)
    res1 = np.asarray(
        P.layer_scale(p["ls1"], P.linear(p["attn"]["proj"], _merge_heads(o))))
    xn = np.asarray(x)

    scale = 1.0 / (1.0 - rate)
    matched_kinds = set()
    for b in range(B):
        ok = False
        for m1 in (0.0, scale):
            mid = xn[b] + m1 * res1[b]
            h2 = P.layer_norm(p["norm2"], jnp.asarray(mid), cfg.ln_eps)
            res2 = np.asarray(P.layer_scale(p["ls2"], mlp(p["mlp"], h2)))
            for m2 in (0.0, scale):
                if np.allclose(out[b], mid + m2 * res2, atol=1e-5):
                    matched_kinds.add((m1 > 0, m2 > 0))
                    ok = True
                    break
            if ok:
                break
        assert ok, f"sample {b}: output is not a branch-drop combination"
    # at rate 0.5 over 64 samples all four combinations occur w.h.p.
    assert len(matched_kinds) >= 3
