"""Per-frame CDF loss — the self-supervised training objective.

Re-design of ``train/losses/cdf_loss.py`` (CDFLossIndexPytorch, itself a port
of CuPy CUDA kernels). Semantics:

1. Every correspondence residual contributes to the weighted histogram of BOTH
   its source and destination frame (``cdf_loss.py:146-172``); histograms are
   normalised by each frame's TOTAL weight (including out-of-range residuals,
   ``cdf_loss.py:174-182``) into a PMF, then cumsum'd into a CDF.
2. A PDF is recovered from the CDF by a reflect-padded Sobel derivative plus
   optional reflect-padded Gaussian smoothing (``cdf_loss.py:55-88,185-187``).
3. Each residual's loss value is CDF(frame, r) (via +0.5-rounded bin lookup,
   ``cdf_loss.py:207-211``), and its *gradient* is analytically injected as
   PDF(frame, r) * weight via ``jax.custom_vjp`` — the forward value is NOT
   autodiffed (``CDFLossTorchWrapper``, ``cdf_loss.py:6-16``).
4. Out-of-range residuals get CDF = 2.0 and zero gradient
   (``cdf_loss.py:235-240``).

TPU notes: histogram building is one fused scatter-add over a flattened
(frame x bin) axis; the whole loss is jit-compatible with static
``num_nodes``/``num_bins``. The reference trainer rebuilt nothing per batch —
pair indices here are run-time arguments so one compilation serves every
scene graph shape (pad pairs and zero their weights).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CDFLossConfig:
    min_val: float
    max_val: float
    num_bins: int
    num_nodes: int  # number of frames
    gradient_smooth: float = 0.0001  # physical smoothing radius on the x-axis

    @property
    def bin_width(self) -> float:
        return (self.max_val - self.min_val) / self.num_bins

    @property
    def smooth_kernel(self) -> np.ndarray:
        """Gaussian smoothing kernel (identity if smoothing disabled)."""
        if self.gradient_smooth <= 0:
            return np.ones((1,), np.float32)
        radius = max(1, int(self.gradient_smooth / self.bin_width))
        idx = np.arange(2 * radius + 1, dtype=np.float32) - radius
        sigma = self.gradient_smooth / self.bin_width
        g = np.exp(-0.5 * (idx / sigma) ** 2)
        return (g / g.sum()).astype(np.float32)


def _reflect_correlate(rows: jax.Array, kernel: jax.Array) -> jax.Array:
    """Cross-correlate each row with ``kernel`` under reflect padding.

    rows: (N, B); kernel: (K,) with K odd. Matches torch Conv1d with
    ``padding_mode='reflect'`` (correlation, not convolution).
    """
    K = kernel.shape[0]
    if K == 1:
        return rows * kernel[0]
    r = K // 2
    padded = jnp.pad(rows, ((0, 0), (r, r)), mode="reflect")
    # correlation == convolution with reversed kernel
    return jax.vmap(lambda row: jnp.convolve(row, kernel[::-1], mode="valid"))(padded)


def compute_pdf_cdf(
    residuals: jax.Array,
    weights: jax.Array,
    src_idx: jax.Array,
    dst_idx: jax.Array,
    cfg: CDFLossConfig,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Build per-frame (pmf, cdf, pdf), each (num_nodes, num_bins).

    residuals/weights: (P, K); src_idx/dst_idx: (P,) int frame ids.
    """
    P, K = residuals.shape
    bw = cfg.bin_width
    bins = jnp.floor((residuals - cfg.min_val) / bw).astype(jnp.int32)
    valid = (bins >= 0) & (bins < cfg.num_bins)
    bins = jnp.clip(bins, 0, cfg.num_bins - 1)
    contrib = (weights * valid).reshape(-1)

    flat_bins = bins.reshape(-1)
    pair_of_point = jnp.repeat(jnp.arange(P), K)
    src_flat = src_idx[pair_of_point] * cfg.num_bins + flat_bins
    dst_flat = dst_idx[pair_of_point] * cfg.num_bins + flat_bins

    hist = jnp.zeros(cfg.num_nodes * cfg.num_bins, jnp.float32)
    hist = hist.at[src_flat].add(contrib)
    hist = hist.at[dst_flat].add(contrib)
    hist = hist.reshape(cfg.num_nodes, cfg.num_bins)

    total = jnp.zeros(cfg.num_nodes, jnp.float32)
    w_flat = weights.reshape(-1)
    total = total.at[src_idx[pair_of_point]].add(w_flat)
    total = total.at[dst_idx[pair_of_point]].add(w_flat)

    pmf = hist / (total[:, None] + 1e-10)
    cdf = jnp.cumsum(pmf, axis=1)

    sobel = jnp.asarray([-1.0, 0.0, 1.0], jnp.float32) / (2.0 * bw)
    raw_pdf = _reflect_correlate(cdf, sobel)
    pdf = _reflect_correlate(raw_pdf, jnp.asarray(cfg.smooth_kernel))
    return pmf, cdf, pdf


def _lookup(residuals, weights, src_idx, dst_idx, cdf, pdf, cfg: CDFLossConfig):
    """CDF value + injected gradient per residual (``cdf_loss.py:191-242``)."""
    P, K = residuals.shape
    bw = cfg.bin_width
    bins = jnp.floor((residuals - cfg.min_val) / bw + 0.5).astype(jnp.int32)
    valid = (bins >= 0) & (bins < cfg.num_bins) & (weights > 0.0)
    bins = jnp.clip(bins, 0, cfg.num_bins - 1)

    flat_cdf = cdf.reshape(-1)
    flat_pdf = pdf.reshape(-1)
    src_g = src_idx[:, None] * cfg.num_bins + bins
    dst_g = dst_idx[:, None] * cfg.num_bins + bins
    cdf_src = jnp.where(valid, flat_cdf[src_g], 2.0)
    cdf_dst = jnp.where(valid, flat_cdf[dst_g], 2.0)
    grad_src = jnp.where(valid, flat_pdf[src_g] * weights, 0.0)
    grad_dst = jnp.where(valid, flat_pdf[dst_g] * weights, 0.0)
    return cdf_src, cdf_dst, grad_src, grad_dst


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def cdf_loss(residuals, weights, src_idx, dst_idx, cfg: CDFLossConfig):
    """Per-residual CDF values (cdf_src, cdf_dst), each (P, K).

    d(cdf_src + cdf_dst)/d residuals is the injected analytic
    (PDF_src + PDF_dst) * weight — NOT the autodiff of the histogram lookup.
    """
    cdf_src, cdf_dst, _, _ = _forward(residuals, weights, src_idx, dst_idx, cfg)
    return cdf_src, cdf_dst


def _forward(residuals, weights, src_idx, dst_idx, cfg):
    residuals = jax.lax.stop_gradient(residuals)
    weights = jax.lax.stop_gradient(weights)
    _, cdf, pdf = compute_pdf_cdf(residuals, weights, src_idx, dst_idx, cfg)
    return _lookup(residuals, weights, src_idx, dst_idx, cdf, pdf, cfg)


def _cdf_loss_fwd(residuals, weights, src_idx, dst_idx, cfg):
    cdf_src, cdf_dst, grad_src, grad_dst = _forward(
        residuals, weights, src_idx, dst_idx, cfg
    )
    return (cdf_src, cdf_dst), (grad_src, grad_dst)


def _cdf_loss_bwd(cfg, res, g):
    grad_src, grad_dst = res
    g_src, g_dst = g
    d_res = grad_src * g_src + grad_dst * g_dst
    return d_res, None, None, None


cdf_loss.defvjp(_cdf_loss_fwd, _cdf_loss_bwd)


def frame_statistics(residuals, weights, src_idx, dst_idx, cfg: CDFLossConfig):
    """Per-frame pmf/cdf/pdf for diagnostics (``cdf_loss.py:244-259``)."""
    pmf, cdf, pdf = compute_pdf_cdf(residuals, weights, src_idx, dst_idx, cfg)
    return {"frame_pmf": pmf, "frame_cdf": cdf, "frame_pdf": pdf}
