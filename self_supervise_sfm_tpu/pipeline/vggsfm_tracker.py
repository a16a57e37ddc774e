"""VGGSfM-variant coarse-to-fine point tracker.

Re-design of ``sailrecon/dependency/vggsfm_tracker.py`` +
``dependency/track_modules/{blocks,base_track_predictor,track_refine}.py``:
the standalone CNN tracker used by the reference's track-prediction path
(distinct from the in-model TrackHead — this one runs on raw images).

- ``BasicEncoder``: stride-4 residual CNN with instance norm, multi-scale
  concat head (``blocks.py:25-98``).
- ``ShallowEncoder``: stride-1 shallow CNN for 31x31 patch features
  (``blocks.py:101-168``).
- ``base_predictor``: the dependency-variant iterative predictor — raw
  correlation features (no corr MLP), padded transformer input, no
  query-ref token; ``fine=True`` drops the visibility head
  (``base_track_predictor.py:15-230``).
- ``refine_track``: coarse tracks -> 31x31 patch extraction -> patch
  features -> fine predictor in patch coordinates -> image coordinates
  (``track_refine.py:22-187``).

All NHWC jnp; patch extraction is a static ``dynamic_slice`` gather instead
of torch ``unfold`` (which materialises H*W overlapping patches).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..layers import params as P
from ..heads.track_modules import (
    UpdateFormerConfig,
    build_fmap_pyramid,
    corr_sample,
    init_updateformer,
    updateformer,
)
from ..heads.track_utils import get_2d_embedding, get_2d_sincos_pos_embed, sample_features
from ..heads.dpt_utils import resize_bilinear_ac


# -- CNN building blocks -----------------------------------------------------


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch InstanceNorm2d(affine=False): per-(sample, channel) over H, W."""
    mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
    var = jnp.var(x, axis=(-3, -2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def init_residual_block(key, c_in: int, c_out: int, stride: int = 1):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": P.init_conv(k1, 3, 3, c_in, c_out),
        "conv2": P.init_conv(k2, 3, 3, c_out, c_out),
    }
    if stride != 1:
        p["downsample"] = P.init_conv(k3, 1, 1, c_in, c_out)
    return p


def residual_block(p, x: jax.Array, stride: int = 1) -> jax.Array:
    """``modules.py:40-104`` with instance norm (affine-free)."""
    y = P.conv2d(p["conv1"], x, stride=stride, padding=[(1, 1), (1, 1)])
    y = jax.nn.relu(instance_norm(y))
    y = P.conv2d(p["conv2"], y, padding=[(1, 1), (1, 1)])
    y = jax.nn.relu(instance_norm(y))
    if "downsample" in p:
        x = instance_norm(P.conv2d(p["downsample"], x, stride=stride, padding="VALID"))
    return jax.nn.relu(x + y)


def init_basic_encoder(key, output_dim: int = 128):
    keys = jax.random.split(key, 12)
    half = output_dim // 2
    three_q = output_dim // 4 * 3
    return {
        "conv1": P.init_conv(keys[0], 7, 7, 3, half),
        "layer1": [init_residual_block(keys[1], half, half, 1),
                   init_residual_block(keys[2], half, half, 1)],
        "layer2": [init_residual_block(keys[3], half, three_q, 2),
                   init_residual_block(keys[4], three_q, three_q, 1)],
        "layer3": [init_residual_block(keys[5], three_q, output_dim, 2),
                   init_residual_block(keys[6], output_dim, output_dim, 1)],
        "layer4": [init_residual_block(keys[7], output_dim, output_dim, 2),
                   init_residual_block(keys[8], output_dim, output_dim, 1)],
        "conv2": P.init_conv(keys[9], 3, 3, output_dim * 3 + output_dim // 4, output_dim * 2),
        "conv3": P.init_conv(keys[10], 1, 1, output_dim * 2, output_dim),
    }


def basic_encoder(p, x: jax.Array, stride: int = 4) -> jax.Array:
    """(N, H, W, 3) -> (N, H/stride, W/stride, 128). ``blocks.py:77-98``."""
    H, W = x.shape[-3], x.shape[-2]
    y = P.conv2d(p["conv1"], x, stride=2, padding=[(3, 3), (3, 3)])
    y = jax.nn.relu(instance_norm(y))
    a = residual_block(p["layer1"][0], y, 1)
    a = residual_block(p["layer1"][1], a, 1)
    b = residual_block(p["layer2"][0], a, 2)
    b = residual_block(p["layer2"][1], b, 1)
    c = residual_block(p["layer3"][0], b, 2)
    c = residual_block(p["layer3"][1], c, 1)
    d = residual_block(p["layer4"][0], c, 2)
    d = residual_block(p["layer4"][1], d, 1)
    out_hw = (H // stride, W // stride)
    cat = jnp.concatenate(
        [resize_bilinear_ac(t, out_hw) for t in (a, b, c, d)], axis=-1
    )
    y = P.conv2d(p["conv2"], cat, padding=[(1, 1), (1, 1)])
    y = jax.nn.relu(instance_norm(y))
    return P.conv2d(p["conv3"], y, padding="VALID")


def init_shallow_encoder(key, output_dim: int = 32):
    keys = jax.random.split(key, 4)
    return {
        "conv1": P.init_conv(keys[0], 3, 3, 3, output_dim),
        "layer1": init_residual_block(keys[1], output_dim, output_dim, 2),
        "layer2": init_residual_block(keys[2], output_dim, output_dim, 2),
        "conv2": P.init_conv(keys[3], 1, 1, output_dim, output_dim),
    }


def shallow_encoder(p, x: jax.Array, stride: int = 1) -> jax.Array:
    """(N, P, P, 3) -> (N, P/stride, P/stride, 32). ``blocks.py:150-168``."""
    H, W = x.shape[-3], x.shape[-2]
    y = P.conv2d(p["conv1"], x, stride=2, padding=[(1, 1), (1, 1)])
    y = jax.nn.relu(instance_norm(y))
    tmp = residual_block(p["layer1"], y, 2)
    y = y + resize_bilinear_ac(tmp, y.shape[-3:-1])
    tmp = residual_block(p["layer2"], tmp, 2)
    y = y + resize_bilinear_ac(tmp, y.shape[-3:-1])
    y = P.conv2d(p["conv2"], y, padding="VALID") + y
    return resize_bilinear_ac(y, (H // stride, W // stride))


# -- dependency-variant iterative predictor ----------------------------------


@dataclass(frozen=True)
class VGGSfMPredictorConfig:
    stride: int = 4
    corr_levels: int = 5
    corr_radius: int = 4
    latent_dim: int = 128
    hidden_size: int = 384
    use_spaceatt: bool = True
    depth: int = 6
    fine: bool = False

    @property
    def corr_dim(self) -> int:
        return self.corr_levels * (2 * self.corr_radius + 1) ** 2

    @property
    def transformer_dim(self) -> int:
        # padding quirks mirrored from base_track_predictor.py:41-50
        d = self.corr_dim + 2 * self.latent_dim
        if self.fine:
            return d + (4 if d % 2 == 0 else 5)
        return d + (4 - d % 4) % 4

    @property
    def updateformer_cfg(self) -> UpdateFormerConfig:
        return UpdateFormerConfig(
            space_depth=self.depth if self.use_spaceatt else 0,
            time_depth=self.depth,
            input_dim=self.transformer_dim,
            hidden_size=self.hidden_size,
            output_dim=self.latent_dim + 2,
            add_space_attn=self.use_spaceatt,
            # the dependency-variant EfficientUpdateFormer has no input/output
            # LayerNorms (dependency/track_modules/blocks.py:269,314) and its
            # block norms are affine-free eps-1e-6 (modules.py:156-157)
            use_norms=False,
            block_norm_affine=False,
            block_norm_eps=1e-6,
        )


def init_vggsfm_predictor(key, cfg: VGGSfMPredictorConfig):
    ku, kn, kv = jax.random.split(key, 3)
    p = {
        "updateformer": init_updateformer(ku, cfg.updateformer_cfg),
        "norm": P.init_layer_norm(cfg.latent_dim),  # GroupNorm(1, C)
        "ffeat_updater": P.init_linear(kn, cfg.latent_dim, cfg.latent_dim),
    }
    if not cfg.fine:
        p["vis_predictor"] = P.init_linear(kv, cfg.latent_dim, 1)
    return p


def vggsfm_predictor(
    p,
    query_points: jax.Array,  # (B, N, 2)
    fmaps: jax.Array,  # (B, S, H, W, C)
    cfg: VGGSfMPredictorConfig,
    iters: int = 4,
    down_ratio: int = 1,
    return_feat: bool = False,
):
    """``base_track_predictor.py:73-230`` — raw-correlation variant."""
    B, N, _ = query_points.shape
    B, S, H, W, C = fmaps.shape
    qp = query_points / float(down_ratio) / float(cfg.stride)
    coords = jnp.broadcast_to(qp[:, None], (B, S, N, 2))
    query_feat = jax.vmap(sample_features)(fmaps[:, 0], coords[:, 0])
    track_feats = jnp.broadcast_to(query_feat[:, None], (B, S, N, C))
    coords0 = coords
    pyramid = build_fmap_pyramid(fmaps, cfg.corr_levels)

    pos_grid = get_2d_sincos_pos_embed(cfg.transformer_dim, (H, W))
    sampled_pos = jax.vmap(sample_features, in_axes=(None, 0))(pos_grid, coords[:, 0])

    coord_preds: List[jax.Array] = []
    for _ in range(iters):
        coords = jax.lax.stop_gradient(coords)
        fcorrs = corr_sample(pyramid, track_feats, coords, cfg.corr_radius)
        fcorrs_ = fcorrs.transpose(0, 2, 1, 3)  # (B, N, S, corr_dim)

        flows = (coords - coords[:, 0:1]).transpose(0, 2, 1, 3)
        flows_emb = get_2d_embedding(flows, cfg.latent_dim // 2, cat_coords=False)
        # the dependency variant appends the raw flows to the embedding
        # (base_track_predictor.py:139 ``cat([flows_emb, flows])``; the
        # track-head variant instead appends flows/max_scale twice)
        flows_emb = jnp.concatenate([flows_emb, flows], axis=-1)
        tf_ = track_feats.transpose(0, 2, 1, 3)
        x = jnp.concatenate([flows_emb, fcorrs_, tf_], axis=-1)
        pad = cfg.transformer_dim - x.shape[-1]
        assert pad >= 0, (
            f"corr/latent config overflows transformer_dim by {-pad} "
            "(the reference pads up only, base_track_predictor.py:146-149; "
            "pick corr_levels/corr_radius with (corr_dim + 2*latent) % 4 >= 2 "
            "headroom)"
        )
        if pad:
            x = jnp.concatenate([x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], -1)
        x = x + sampled_pos[:, :, None, :]

        delta = updateformer(p["updateformer"], x, cfg.updateformer_cfg)
        delta_coords = delta[..., :2]
        delta_feats = delta[..., 2:]
        upd = P.gelu(P.linear(p["ffeat_updater"], P.layer_norm(p["norm"], delta_feats)))
        track_feats = (upd + tf_).transpose(0, 2, 1, 3)
        coords = coords + delta_coords.transpose(0, 2, 1, 3)
        coords = coords.at[:, 0].set(coords0[:, 0])
        coord_preds.append(coords * cfg.stride * down_ratio)

    vis = None
    if not cfg.fine:
        vis = jax.nn.sigmoid(P.linear(p["vis_predictor"], track_feats)[..., 0])
    if return_feat:
        return coord_preds, vis, track_feats, query_feat
    return coord_preds, vis


# -- full coarse-to-fine tracker ---------------------------------------------


@dataclass(frozen=True)
class VGGSfMTrackerConfig:
    coarse: VGGSfMPredictorConfig = VGGSfMPredictorConfig(stride=4)
    fine: VGGSfMPredictorConfig = VGGSfMPredictorConfig(
        stride=1, depth=4, corr_levels=3, corr_radius=3, latent_dim=32,
        hidden_size=256, fine=True, use_spaceatt=False,
    )
    coarse_down_ratio: int = 2
    pradius: int = 15  # fine patch radius (psize = 31)
    fine_iters: int = 6


def init_vggsfm_tracker(key, cfg: VGGSfMTrackerConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "coarse_fnet": init_basic_encoder(k1, cfg.coarse.latent_dim),
        "coarse_predictor": init_vggsfm_predictor(k2, cfg.coarse),
        "fine_fnet": init_shallow_encoder(k3, cfg.fine.latent_dim),
        "fine_predictor": init_vggsfm_predictor(k4, cfg.fine),
    }


def extract_patches(images: jax.Array, topleft: jax.Array, psize: int) -> jax.Array:
    """images (F, H, W, 3), topleft (F, N, 2) int -> (F, N, psize, psize, 3).

    Static-shape gather replacing torch ``unfold`` (``track_refine.py:84-121``).
    """
    F_, H, W, C = images.shape
    ys = topleft[..., 1][..., None, None] + jnp.arange(psize)[None, None, :, None]
    xs = topleft[..., 0][..., None, None] + jnp.arange(psize)[None, None, None, :]
    ys = jnp.clip(ys, 0, H - 1)
    xs = jnp.clip(xs, 0, W - 1)

    def per_frame(img, y, x):
        return img[y, x]  # (N, psize, psize, C) via advanced indexing

    return jax.vmap(per_frame)(images, ys, xs)


def refine_track(
    images: jax.Array,  # (B, S, H, W, 3)
    fine_fnet_params,
    fine_predictor_params,
    coarse_pred: jax.Array,  # (B, S, N, 2)
    cfg: VGGSfMTrackerConfig,
):
    """Patch-based refinement (``track_refine.py:22-187``)."""
    B, S, N, _ = coarse_pred.shape
    H, W = images.shape[2], images.shape[3]
    pr = cfg.pradius
    psize = 2 * pr + 1

    track_int = jnp.floor(coarse_pred).astype(jnp.int32)
    track_frac = coarse_pred - track_int
    topleft = track_int - pr
    topleft_clamped = jnp.clip(topleft, 0, min(H, W) - psize)

    imgs = images.reshape(B * S, H, W, 3)
    patches = extract_patches(
        imgs, topleft_clamped.reshape(B * S, N, 2), psize
    )  # (B*S, N, psize, psize, 3)
    pf = shallow_encoder(
        fine_fnet_params, patches.reshape(B * S * N, psize, psize, 3),
        stride=cfg.fine.stride,
    )
    Cf = pf.shape[-1]
    pf = pf.reshape(B, S, N, psize, psize, Cf)
    pf = pf.transpose(0, 2, 1, 3, 4, 5).reshape(B * N, S, psize, psize, Cf)

    patch_query = (track_frac[:, 0] + pr).reshape(B * N, 1, 2)
    fine_lists, _, _, query_feat = vggsfm_predictor(
        fine_predictor_params, patch_query, pf, cfg.fine,
        iters=cfg.fine_iters, return_feat=True,
    )
    fine = fine_lists[-1].reshape(B, N, S, 2).transpose(0, 2, 1, 3)
    refined = fine + topleft.astype(fine.dtype)
    refined = refined.at[:, 0].set(coarse_pred[:, 0])
    return refined


def track(
    p,
    images: jax.Array,  # (B, S, H, W, 3) in [0, 1]
    query_points: jax.Array,  # (B, N, 2)
    cfg: VGGSfMTrackerConfig = VGGSfMTrackerConfig(),
    coarse_iters: int = 6,
    fine_tracking: bool = True,
):
    """Full coarse-to-fine (``vggsfm_tracker.py:58-124``).

    Returns (fine_tracks, coarse_tracks, visibility) — (B, S, N, 2) x2, (B, S, N).
    """
    B, S, H, W, _ = images.shape
    imgs = images.reshape(B * S, H, W, 3)
    if cfg.coarse_down_ratio > 1:
        imgs = resize_bilinear_ac(
            imgs, (H // cfg.coarse_down_ratio, W // cfg.coarse_down_ratio)
        )
    fmaps = basic_encoder(p["coarse_fnet"], imgs, stride=cfg.coarse.stride)
    fmaps = fmaps.reshape(B, S, *fmaps.shape[1:])

    coarse_lists, vis = vggsfm_predictor(
        p["coarse_predictor"], query_points, fmaps, cfg.coarse,
        iters=coarse_iters, down_ratio=cfg.coarse_down_ratio,
    )
    coarse = coarse_lists[-1]
    if not fine_tracking:
        return coarse, coarse, vis
    fine = refine_track(
        images, p["fine_fnet"], p["fine_predictor"], coarse, cfg
    )
    return fine, coarse, vis
