"""Self-supervised training loss: reprojection-residual CDF objective.

Re-design of ``compute_loss`` (``train/train_imc.py:141-268``). Per scene:

1. recover predicted intrinsics into original image space via the loader's
   ``K_prime_to_K`` matrices (``train_imc.py:162-172``), optionally averaging
   them when the scene is known shared-focal;
2. relative poses from predicted extrinsics for each correspondence pair;
3. reproject sampled correspondences two ways — exact perspective and the
   depth-approximated linearisation (``train/utils/geometry.py``);
4. ``log1p`` residuals -> per-frame CDF loss with injected PDF gradient;
5. total = mean of the exact-CDF and approx-CDF masked means.

Padded (invalid) pairs carry zero weight: they contribute CDF=2.0 values
which are excluded by the weighted mean, and zero gradient.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops import geometry as G
from ..ops.cdf_loss import CDFLossConfig, cdf_loss


@dataclass(frozen=True)
class LossConfig:
    # CDF hyperparameters (train_imc.py:332-336)
    max_val: float = 15.0
    num_bins: int = 250
    gradient_smooth: float = 0.05
    min_val: float = 0.0
    shared_focal: bool = False

    def cdf_cfg(self, num_frames: int) -> CDFLossConfig:
        return CDFLossConfig(
            min_val=self.min_val,
            max_val=self.max_val,
            num_bins=self.num_bins,
            num_nodes=num_frames,
            gradient_smooth=self.gradient_smooth,
        )


def _masked_mean(x: jax.Array, w: jax.Array) -> jax.Array:
    return jnp.sum(x * w) / (jnp.sum(w) + 1e-10)


@G.f32_matmul
def scene_residuals(
    extrinsic: jax.Array,  # (S, 3, 4) predicted, in processed (518) space
    intrinsic: jax.Array,  # (S, 3, 3) predicted, processed space
    scene: Dict[str, jax.Array],  # un-batched scene dict
    cfg: LossConfig,
) -> Dict[str, jax.Array]:
    """Reprojection residuals for one scene (steps 1-4 of the module doc).

    Returns ``residuals`` / ``residuals_approx`` (raw px), their ``log1p``
    forms, ``weights`` and the pair frame indices — everything the CDF loss
    and the per-frame statistics dumps consume.
    """
    recovered_K = scene["K_prime_to_K"] @ intrinsic  # (S, 3, 3)
    if cfg.shared_focal:
        recovered_K = jnp.broadcast_to(
            jnp.mean(recovered_K, axis=0, keepdims=True), recovered_K.shape
        )

    src_idx = scene["src_idx"]
    dst_idx = scene["dst_idx"]
    src_K = recovered_K[src_idx]
    dst_K = recovered_K[dst_idx]
    rel = G.relative_pose(extrinsic[src_idx], extrinsic[dst_idx])

    num_pairs = src_idx.shape[0]
    ones = jnp.ones((num_pairs, 1), jnp.float32)
    weights = jnp.broadcast_to(
        scene["pair_valid"][:, None], scene["src_depth"].shape
    ).astype(jnp.float32)

    pred_dst, _ = G.backproject_and_reproject(
        scene["src_coords"], scene["src_depth"], src_K, dst_K, rel, ones
    )
    residuals = G.compute_projective_residual(pred_dst, scene["dst_coords"])

    pred_dst_a, _ = G.backproject_and_reproject_with_approximation(
        scene["src_coords"], scene["src_depth"], scene["dst_depth"],
        src_K, dst_K, rel, ones, ones,
    )
    residuals_a = G.compute_projective_residual(pred_dst_a, scene["dst_coords"])

    return {
        "residuals": residuals,
        "residuals_approx": residuals_a,
        "res_log": jnp.log1p(residuals),
        "res_a_log": jnp.log1p(residuals_a),
        "weights": weights,
        "src_idx": src_idx,
        "dst_idx": dst_idx,
    }


def scene_cdf_statistics(
    extrinsic: jax.Array,
    intrinsic: jax.Array,
    scene: Dict[str, jax.Array],
    cfg: LossConfig,
) -> Dict[str, Dict[str, jax.Array]]:
    """Per-frame (pmf, cdf, pdf) for the exact and approximated residual
    distributions — the quantities the reference plots every checkpoint
    interval (``train_imc.py:418-425`` via ``get_frame_statistics``)."""
    from ..ops.cdf_loss import frame_statistics

    S = extrinsic.shape[0]
    r = scene_residuals(extrinsic, intrinsic, scene, cfg)
    ccfg = cfg.cdf_cfg(S)
    return {
        "exact": frame_statistics(
            r["res_log"], r["weights"], r["src_idx"], r["dst_idx"], ccfg
        ),
        "approx": frame_statistics(
            r["res_a_log"], r["weights"], r["src_idx"], r["dst_idx"], ccfg
        ),
    }


def scene_loss(
    extrinsic: jax.Array,  # (S, 3, 4) predicted, in processed (518) space
    intrinsic: jax.Array,  # (S, 3, 3) predicted, processed space
    scene: Dict[str, jax.Array],  # un-batched scene dict
    cfg: LossConfig,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Loss for one scene. Returns (scalar loss, metrics dict)."""
    S = extrinsic.shape[0]
    r = scene_residuals(extrinsic, intrinsic, scene, cfg)
    residuals = r["residuals"]
    weights = r["weights"]
    src_idx, dst_idx = r["src_idx"], r["dst_idx"]
    res_log, res_a_log = r["res_log"], r["res_a_log"]

    ccfg = cfg.cdf_cfg(S)
    cs, cd = cdf_loss(res_log, weights, src_idx, dst_idx, ccfg)
    loss_exact = (_masked_mean(cs, weights) + _masked_mean(cd, weights)) / 2.0
    cs_a, cd_a = cdf_loss(res_a_log, weights, src_idx, dst_idx, ccfg)
    loss_approx = (_masked_mean(cs_a, weights) + _masked_mean(cd_a, weights)) / 2.0

    total = (loss_exact + loss_approx) / 2.0
    metrics = {
        "loss": total,
        "loss_cdf_exact": loss_exact,
        "loss_cdf_approx": loss_approx,
        "mean_px_residual": _masked_mean(residuals, weights),
        "mean_log_residual": _masked_mean(res_log, weights),
    }
    # residual-distribution quantiles: the mean is outlier-dominated (it is
    # the mean of exp-scale values), so a plateau in the mean cannot
    # distinguish "everything is stuck" from "a tail of bad pairs"; the
    # quantiles separate those regimes (VERDICT r3 next-round #3).
    masked = jnp.where(weights > 0, res_log, jnp.nan)
    p10, p50, p90 = jnp.nanpercentile(masked, jnp.array([10.0, 50.0, 90.0]))
    metrics["log_residual_p10"] = p10
    metrics["log_residual_p50"] = p50
    metrics["log_residual_p90"] = p90
    return total, metrics
