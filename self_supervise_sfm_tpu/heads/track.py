"""Track head: DPT feature extractor + iterative point-track refinement.

Re-design of ``sailrecon/heads/track_head.py`` (TrackHead) +
``track_modules/base_track_predictor.py`` (BaseTrackerPredictor). This is the
reference's dormant capability (constructed but commented out at
``models/sail_recon.py:66``) made first-class: its tracks feed the
correspondence graph for bundle adjustment (``utils/colmap_io.py``).

Iterations are a static python loop (4) with ``stop_gradient`` on coords
between iterations, mirroring ``base_track_predictor.py:141``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..layers import params as P
from .dpt import DPTHeadConfig, dpt_head, init_dpt_head
from .track_modules import (
    UpdateFormerConfig,
    build_fmap_pyramid,
    corr_sample,
    init_updateformer,
    updateformer,
)
from .track_utils import get_2d_embedding, get_2d_sincos_pos_embed, sample_features


@dataclass(frozen=True)
class TrackHeadConfig:
    dim_in: int = 2048
    patch_size: int = 14
    features: int = 128
    iters: int = 4
    predict_conf: bool = True
    stride: int = 2
    corr_levels: int = 7
    corr_radius: int = 4
    hidden_size: int = 384
    max_scale: int = 518
    depth: int = 6
    use_spaceatt: bool = True
    intermediate_layer_idx: Tuple[int, ...] = (4, 11, 17, 23)

    @property
    def flows_emb_dim(self) -> int:
        return self.features // 2

    @property
    def transformer_dim(self) -> int:
        return 3 * self.features + 4

    @property
    def feature_extractor_cfg(self) -> DPTHeadConfig:
        return DPTHeadConfig(
            dim_in=self.dim_in,
            patch_size=self.patch_size,
            features=self.features,
            feature_only=True,
            down_ratio=2,
            pos_embed=False,
            intermediate_layer_idx=self.intermediate_layer_idx,
        )

    @property
    def updateformer_cfg(self) -> UpdateFormerConfig:
        return UpdateFormerConfig(
            space_depth=self.depth if self.use_spaceatt else 0,
            time_depth=self.depth,
            input_dim=self.transformer_dim,
            hidden_size=self.hidden_size,
            output_dim=self.features + 2,
            add_space_attn=self.use_spaceatt,
        )


def init_track_head(key, cfg: TrackHeadConfig):
    kf, kc, ku, kq, kv, kn, kp = jax.random.split(key, 7)
    corr_dim = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    p = {
        "feature_extractor": init_dpt_head(kf, cfg.feature_extractor_cfg),
        "corr_mlp": {
            "fc1": P.init_linear(kc, corr_dim, cfg.hidden_size),
            "fc2": P.init_linear(jax.random.fold_in(kc, 1), cfg.hidden_size, cfg.features),
        },
        "query_ref_token": jax.random.normal(kq, (1, 2, cfg.transformer_dim)),
        "updateformer": init_updateformer(ku, cfg.updateformer_cfg),
        "fmap_norm": P.init_layer_norm(cfg.features),
        "ffeat_norm": P.init_layer_norm(cfg.features),  # GroupNorm(1, C) == LN
        "ffeat_updater": P.init_linear(kn, cfg.features, cfg.features),
        "vis_predictor": P.init_linear(kv, cfg.features, 1),
    }
    if cfg.predict_conf:
        p["conf_predictor"] = P.init_linear(kp, cfg.features, 1)
    return p


def track_predictor(
    p,
    query_points: jax.Array,  # (B, N, 2) pixel coords at fmap input scale
    fmaps: jax.Array,  # (B, S, H, W, C) feature maps
    cfg: TrackHeadConfig,
    iters: Optional[int] = None,
    down_ratio: int = 1,
    apply_sigmoid: bool = True,
):
    """Iterative tracker (``base_track_predictor.py:83-242``).

    Returns (coord_preds list of (B, S, N, 2), vis (B, S, N), conf or None).
    """
    iters = iters or cfg.iters
    B, N, _ = query_points.shape
    B, S, H, W, C = fmaps.shape

    fmaps = P.layer_norm(p["fmap_norm"], fmaps)
    qp = query_points / float(down_ratio) / float(cfg.stride)
    coords = jnp.broadcast_to(qp[:, None], (B, S, N, 2))

    # track features initialised from the query frame
    query_feat = jax.vmap(sample_features)(fmaps[:, 0], coords[:, 0])  # (B,N,C)
    track_feats = jnp.broadcast_to(query_feat[:, None], (B, S, N, C))
    coords0 = coords

    pyramid = build_fmap_pyramid(fmaps, cfg.corr_levels)

    pos_grid = get_2d_sincos_pos_embed(cfg.transformer_dim, (H, W))  # (H,W,D)
    sampled_pos = jax.vmap(sample_features, in_axes=(None, 0))(
        pos_grid, coords[:, 0]
    )  # (B, N, D)

    qrt = jnp.concatenate(
        [
            p["query_ref_token"][:, 0:1],
            jnp.broadcast_to(
                p["query_ref_token"][:, 1:2], (1, S - 1, cfg.transformer_dim)
            ),
        ],
        axis=1,
    )  # (1, S, D)

    coord_preds = []
    for _ in range(iters):
        coords = jax.lax.stop_gradient(coords)
        fcorrs = corr_sample(pyramid, track_feats, coords, cfg.corr_radius)
        # (B, S, N, L) -> (B, N, S, L)
        fcorrs_ = fcorrs.transpose(0, 2, 1, 3)
        fcorrs_ = P.linear(
            p["corr_mlp"]["fc2"], P.gelu(P.linear(p["corr_mlp"]["fc1"], fcorrs_))
        )  # (B, N, S, features)

        flows = (coords - coords[:, 0:1]).transpose(0, 2, 1, 3)  # (B, N, S, 2)
        flows_emb = get_2d_embedding(flows, cfg.flows_emb_dim, cat_coords=False)
        flows_emb = jnp.concatenate(
            [flows_emb, flows / cfg.max_scale, flows / cfg.max_scale], axis=-1
        )  # (B, N, S, features + 4)

        tf_ = track_feats.transpose(0, 2, 1, 3)  # (B, N, S, C)
        x = jnp.concatenate([flows_emb, fcorrs_, tf_], axis=-1)  # (B,N,S,D)
        x = x + sampled_pos[:, :, None, :]
        x = x + qrt[None].astype(x.dtype)  # broadcast (1,1,S,D)

        delta = updateformer(p["updateformer"], x, cfg.updateformer_cfg)
        delta_coords = delta[..., :2]  # (B, N, S, 2)
        delta_feats = delta[..., 2:]  # (B, N, S, C)

        upd = P.gelu(
            P.linear(p["ffeat_updater"], P.layer_norm(p["ffeat_norm"], delta_feats))
        )
        track_feats = (upd + tf_).transpose(0, 2, 1, 3)  # (B, S, N, C)

        coords = coords + delta_coords.transpose(0, 2, 1, 3)
        coords = coords.at[:, 0].set(coords0[:, 0])  # query frame is fixed
        coord_preds.append(coords * cfg.stride * down_ratio)

    vis = P.linear(p["vis_predictor"], track_feats)[..., 0]  # (B, S, N)
    conf = None
    if cfg.predict_conf:
        conf = P.linear(p["conf_predictor"], track_feats)[..., 0]
    if apply_sigmoid:
        vis = jax.nn.sigmoid(vis)
        conf = jax.nn.sigmoid(conf) if conf is not None else None
    return coord_preds, vis, conf


def track_head(
    p,
    taps: Dict[int, jax.Array],
    images_hw: Tuple[int, int],
    patch_start_idx: int,
    query_points: jax.Array,
    cfg: TrackHeadConfig,
    iters: Optional[int] = None,
):
    """Full track head (``track_head.py:76-119``): DPT features + tracker.

    ``query_points``: (B, N, 2) pixel coordinates in the original image.
    Returns (coord_preds, vis, conf) — coords in original image scale.
    """
    fmaps = dpt_head(
        p["feature_extractor"], taps, images_hw, patch_start_idx,
        cfg.feature_extractor_cfg,
    )  # (B, S, H/2, W/2, features)
    return track_predictor(
        p, query_points, fmaps, cfg, iters=iters, down_ratio=1
    )
