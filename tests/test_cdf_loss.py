"""CDF-loss acceptance tests.

Port of the reference's statistical self-test
(``train/losses/cdf_loss.py:263-524``): recover analytic
exponential/gamma/uniform CDFs from samples, check the injected gradient
matches the theoretical PDF pointwise, and that out-of-range residuals get
zero gradient. Plus a direct golden comparison against the reference torch
implementation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats as stats

from self_supervise_sfm_tpu.ops.cdf_loss import (
    CDFLossConfig,
    cdf_loss,
    compute_pdf_cdf,
    frame_statistics,
)

from tests._reference import import_reference


MAX_VAL = 0.2
NUM_BINS = 5000
NUM_FRAMES = 4
POINTS = 50000

DISTS = [
    {"type": "exponential", "rate": 50.0},
    {"type": "gamma", "shape": 2.0, "rate": 100.0},
    {"type": "exponential", "rate": 20.0},
    {"type": "gamma", "shape": 3.0, "rate": 150.0},
]


def sample(dist, n, rng):
    if dist["type"] == "exponential":
        return rng.exponential(1.0 / dist["rate"], size=n)
    return rng.gamma(dist["shape"], 1.0 / dist["rate"], size=n)


def theoretical_cdf(dist, x):
    if dist["type"] == "exponential":
        return 1.0 - np.exp(-dist["rate"] * x)
    return stats.gamma.cdf(x, a=dist["shape"], scale=1.0 / dist["rate"])


def theoretical_pdf(dist, x):
    if dist["type"] == "exponential":
        return dist["rate"] * np.exp(-dist["rate"] * x)
    return stats.gamma.pdf(x, a=dist["shape"], scale=1.0 / dist["rate"])


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    num_pairs = 12
    src = np.array([i // (num_pairs // NUM_FRAMES) for i in range(num_pairs)])
    dst = src.copy()
    residuals = np.stack(
        [sample(DISTS[src[i]], POINTS, rng) for i in range(num_pairs)]
    ).astype(np.float32)
    weights = np.ones_like(residuals)
    cfg = CDFLossConfig(
        min_val=0.0,
        max_val=MAX_VAL,
        num_bins=NUM_BINS,
        num_nodes=NUM_FRAMES,
        gradient_smooth=0.003,
    )
    return cfg, residuals, weights, src, dst


class TestDistributionRecovery:
    def test_cdf_recovery(self, setup):
        cfg, residuals, weights, src, dst = setup
        stats_out = frame_statistics(
            jnp.asarray(residuals), jnp.asarray(weights),
            jnp.asarray(src), jnp.asarray(dst), cfg,
        )
        centers = np.linspace(0, MAX_VAL, NUM_BINS)
        for f in range(NUM_FRAMES):
            rec = np.asarray(stats_out["frame_cdf"][f])
            theo = theoretical_cdf(DISTS[f], centers)
            mae = np.abs(rec - theo).mean()
            assert mae < 0.01, f"frame {f}: CDF MAE {mae}"

    def test_pdf_recovery(self, setup):
        cfg, residuals, weights, src, dst = setup
        stats_out = frame_statistics(
            jnp.asarray(residuals), jnp.asarray(weights),
            jnp.asarray(src), jnp.asarray(dst), cfg,
        )
        centers = np.linspace(0, MAX_VAL, NUM_BINS)
        for f in range(NUM_FRAMES):
            rec = np.asarray(stats_out["frame_pdf"][f])
            theo = theoretical_pdf(DISTS[f], centers)
            # relative error where the pdf is appreciable
            sel = theo > theo.max() * 0.1
            rel = np.abs(rec[sel] - theo[sel]) / theo[sel]
            assert np.median(rel) < 0.1, f"frame {f}: PDF rel err {np.median(rel)}"


class TestInjectedGradient:
    def test_gradient_matches_theoretical_pdf(self, setup):
        cfg, residuals, weights, src, dst = setup

        def loss_fn(r):
            cs, cd = cdf_loss(
                r, jnp.asarray(weights), jnp.asarray(src), jnp.asarray(dst), cfg
            )
            return (cs.sum() + cd.sum()) / 2.0

        grad = np.asarray(jax.grad(loss_fn)(jnp.asarray(residuals)))

        rng = np.random.default_rng(123)
        checked = 0
        for _ in range(60):
            i = rng.integers(0, residuals.shape[0])
            j = rng.integers(0, residuals.shape[1])
            r = residuals[i, j]
            pdf_t = theoretical_pdf(DISTS[src[i]], r)
            if 0.005 <= r <= MAX_VAL and pdf_t > 1.0:
                rel = abs(grad[i, j] - pdf_t) / pdf_t
                assert rel < 0.25, f"r={r}: grad {grad[i, j]} vs pdf {pdf_t}"
                checked += 1
        assert checked > 10

    def test_out_of_range_zero_gradient_and_cdf2(self, setup):
        cfg, _, _, src, dst = setup
        residuals = jnp.asarray(
            [[-0.05, 0.1, 0.5, MAX_VAL + 0.01]], dtype=jnp.float32
        )
        weights = jnp.ones_like(residuals)
        s = jnp.asarray(src[:1])
        d = jnp.asarray(dst[:1])

        cs, cdst = cdf_loss(residuals, weights, s, d, cfg)
        np.testing.assert_allclose(np.asarray(cs)[0, [0, 2, 3]], 2.0)

        def loss_fn(r):
            a, b = cdf_loss(r, weights, s, d, cfg)
            return a.sum() + b.sum()

        g = np.asarray(jax.grad(loss_fn)(residuals))
        np.testing.assert_allclose(g[0, [0, 2, 3]], 0.0)
        assert g[0, 1] != 0.0

    def test_weights_gate_gradient(self, setup):
        cfg, residuals, weights, src, dst = setup
        w = jnp.asarray(weights).at[:, ::2].set(0.0)

        def loss_fn(r):
            a, b = cdf_loss(r, w, jnp.asarray(src), jnp.asarray(dst), cfg)
            return a.sum() + b.sum()

        g = np.asarray(jax.grad(loss_fn)(jnp.asarray(residuals)))
        assert (g[:, ::2] == 0).all()
        assert (g[:, 1::2] != 0).any()


class TestGoldenVsReference:
    def test_matches_torch_implementation(self, rng):
        torch = import_reference()
        import sys

        sys.path.insert(0, "/root/reference/train")
        from losses.cdf_loss import CDFLossIndexPytorch

        num_pairs, K = 6, 500
        src = np.array([0, 0, 1, 1, 2, 2])
        dst = np.array([1, 2, 0, 2, 0, 1])
        residuals = rng.exponential(2.0, size=(num_pairs, K)).astype(np.float32)
        weights = rng.uniform(0.1, 1.0, size=(num_pairs, K)).astype(np.float32)

        ref = CDFLossIndexPytorch(
            min_val=0.0, max_val=15.0, num_bins=250,
            src_indices=torch.from_numpy(src), dst_indices=torch.from_numpy(dst),
            gradient_smooth=0.05, num_nodes=3,
        )
        r_t = torch.from_numpy(residuals).requires_grad_(True)
        cs_t, cd_t = ref(r_t, torch.from_numpy(weights))
        ((cs_t.sum() + cd_t.sum())).backward()

        cfg = CDFLossConfig(
            min_val=0.0, max_val=15.0, num_bins=250, num_nodes=3,
            gradient_smooth=0.05,
        )
        cs, cd = cdf_loss(
            jnp.asarray(residuals), jnp.asarray(weights),
            jnp.asarray(src), jnp.asarray(dst), cfg,
        )
        np.testing.assert_allclose(np.asarray(cs), cs_t.detach().numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(cd), cd_t.detach().numpy(), atol=1e-5)

        def loss_fn(r):
            a, b = cdf_loss(
                r, jnp.asarray(weights), jnp.asarray(src), jnp.asarray(dst), cfg
            )
            return a.sum() + b.sum()

        g = np.asarray(jax.grad(loss_fn)(jnp.asarray(residuals)))
        np.testing.assert_allclose(g, r_t.grad.numpy(), atol=1e-4)
