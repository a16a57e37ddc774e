"""SailRecon facade: aggregator + camera/point/depth heads.

Re-design of ``sailrecon/models/sail_recon.py`` (SailRecon). Three pure entry
points replace the reference's stateful forward/tmp_forward/reloc triple:

- ``forward``            — joint anchors+queries pass (training and
  single-pass inference; ``sail_recon.py:70-159``).
- ``build_scene_cache``  — anchors only, returns the HBM scene KV cache +
  anchor camera tokens (``sail_recon.py:176-199``).
- ``reloc``              — batched query localisation against a cache
  (``sail_recon.py:201-286``; the python per-image loop at
  ``train/demo_imc.py:97-107`` becomes one batched call).

Heads always run in fp32 regardless of the trunk compute dtype, mirroring the
disabled-AMP head region (``sail_recon.py:119``). All outputs stay on device
(the reference's unprojection detoured through CPU numpy).
"""

from __future__ import annotations

import functools as _functools
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..heads.camera import CameraHeadConfig, camera_head, init_camera_head
from ..heads.dpt import DPTHeadConfig, dpt_head, init_dpt_head
from ..ops import geometry as G
from .aggregator import (
    AggregatorConfig,
    aggregator_build_cache,
    aggregator_build_cache_staged,
    aggregator_forward,
    aggregator_reloc,
    aggregator_reloc_staged,
    init_aggregator,
)
from ..layers.vit import ViTConfig


@dataclass(frozen=True)
class SailReconConfig:
    aggregator: AggregatorConfig = field(default_factory=AggregatorConfig)
    camera: CameraHeadConfig = field(default_factory=CameraHeadConfig)
    point: DPTHeadConfig = field(
        default_factory=lambda: DPTHeadConfig(output_dim=4, activation="inv_log")
    )
    depth: DPTHeadConfig = field(
        default_factory=lambda: DPTHeadConfig(output_dim=2, activation="exp")
    )
    enable_camera: bool = True
    enable_point: bool = True
    enable_depth: bool = True

    @property
    def img_size(self) -> int:
        return self.aggregator.img_size


def make_config(
    img_size: int = 518,
    patch_size: int = 14,
    embed_dim: int = 1024,
    depth: int = 24,
    num_heads: int = 16,
    vit_depth: int = 24,
    vit_embed_dim: Optional[int] = None,
    vit_num_heads: Optional[int] = None,
    intermediate_layer_idx=(4, 11, 17, 23),
    compute_dtype: str = "float32",
    remat: bool = False,
    vit_remat: bool = False,
    attn_impl: str = "auto",
    global_attn_impl: str = "auto",
    cache_layout: str = "kv2",
) -> SailReconConfig:
    """Build a consistent config tree (flagship defaults = the reference's
    ViT-L/14 @ 518 with 24 aggregator layers).

    ``remat`` checkpoints the aggregator scan body; ``vit_remat`` the ViT
    blocks (independent: at mid depths the fastest fitting train config is
    often ViT-rematted + aggregator held — the ViT is a small share of the
    recompute cost but a large share of the stored activations).
    """
    vit_embed_dim = vit_embed_dim or embed_dim
    vit_num_heads = vit_num_heads or num_heads
    vit = ViTConfig(
        img_size=img_size,
        patch_size=patch_size,
        embed_dim=vit_embed_dim,
        depth=vit_depth,
        num_heads=vit_num_heads,
        attn_impl=attn_impl,
        remat=vit_remat,
    )
    agg = AggregatorConfig(
        img_size=img_size,
        patch_size=patch_size,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        intermediate_layer_idx=tuple(intermediate_layer_idx),
        vit=vit,
        compute_dtype=compute_dtype,
        remat=remat,
        attn_impl=attn_impl,
        global_attn_impl=global_attn_impl,
        cache_layout=cache_layout,
    )
    head_kw = dict(
        dim_in=2 * embed_dim,
        patch_size=patch_size,
        intermediate_layer_idx=tuple(intermediate_layer_idx),
        # bf16 production path: store the final full-res upsample in the
        # compute dtype — the consumer conv multiplies in bf16 at DEFAULT
        # TPU precision either way (f32 accumulate kept explicit); halves
        # the convert+relayout copy feeding it. fp32 configs unchanged.
        final_upsample_dtype=compute_dtype,
    )
    return SailReconConfig(
        aggregator=agg,
        camera=CameraHeadConfig(dim_in=2 * embed_dim, attn_impl=attn_impl),
        point=DPTHeadConfig(output_dim=4, activation="inv_log", **head_kw),
        depth=DPTHeadConfig(output_dim=2, activation="exp", **head_kw),
    )


# parent keys of big matmul/conv weights on the trunk compute path; their
# "w" leaves are safe to hold in the compute dtype (every consumer casts
# with `.astype(x.dtype)` anyway — see layers/params.py)
_CASTABLE_PARENTS = frozenset(
    {"qkv", "proj", "fc1", "fc2", "w12", "w3"}
)


def cast_trunk_weights(p, cfg: SailReconConfig):
    """Cast the trunk's large matmul weights to the compute dtype, once.

    With fp32 master params and a bf16 trunk, XLA materialises f32->bf16
    converts of every stacked weight *inside* the step (~7 ms/step at
    ViT-L/24: fourteen (24, 1024, 4096)-class tensors) — loop-invariant
    code motion does not hoist them out of scan/fori bodies. Casting once
    at load time is bit-identical: the per-call ``.astype(compute_dtype)``
    becomes a no-op.

    Heads stay fp32 (the reference's disabled-AMP boundary,
    ``sail_recon.py:119``); layer norms, biases and layer-scales stay fp32
    (they are applied in fp32 inside the fused kernels). Use for inference
    / serving only — training keeps fp32 master weights for the optimizer.
    """
    dtype = cfg.aggregator.dtype
    if dtype == jnp.float32:
        return p

    def cast(path, x):
        keys = [k.key for k in path if hasattr(k, "key")]
        if (
            len(keys) >= 3
            and keys[0] == "aggregator"
            and keys[-1] == "w"
            and keys[-2] in _CASTABLE_PARENTS
            and hasattr(x, "ndim")
            and x.ndim >= 2
        ):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map_with_path(cast, p)


def init_sailrecon(key, cfg: SailReconConfig):
    ka, kc, kp, kd = jax.random.split(key, 4)
    p: Dict[str, Any] = {"aggregator": init_aggregator(ka, cfg.aggregator)}
    if cfg.enable_camera:
        p["camera_head"] = init_camera_head(kc, cfg.camera)
    if cfg.enable_point:
        p["point_head"] = init_dpt_head(kp, cfg.point)
    if cfg.enable_depth:
        p["depth_head"] = init_dpt_head(kd, cfg.depth)
    return p


def _decode_heads(p, cfg, taps, cam_token_last_layer, images_hw, patch_start_idx):
    """Shared head decoding for forward/reloc paths. Everything fp32."""
    H, W = images_hw
    predictions: Dict[str, jax.Array] = {}

    extrinsic = intrinsic = None
    if cfg.enable_camera:
        cam_maps = camera_head(
            p["camera_head"], taps[-1], cam_token_last_layer, cfg.camera
        )
        extrinsic, intrinsic = G.pose_encoding_to_extri_intri(cam_maps[-1], (H, W))
        predictions["pose_enc_list"] = cam_maps
        predictions["extrinsic"] = extrinsic
        predictions["intrinsic"] = intrinsic

    if cfg.enable_point:
        xyz_map, xyz_conf = dpt_head(
            p["point_head"], taps, (H, W), patch_start_idx, cfg.point
        )
        predictions["point_map"] = xyz_map
        predictions["xyz_cnf"] = xyz_conf
    if cfg.enable_depth:
        dpt_map, dpt_conf = dpt_head(
            p["depth_head"], taps, (H, W), patch_start_idx, cfg.depth
        )
        predictions["depth_map"] = dpt_map
        predictions["dpt_cnf"] = dpt_conf
        if extrinsic is not None:
            # depth unprojection needs the predicted poses/intrinsics
            predictions["point_map_by_unprojection"] = G.unproject_depth_to_world(
                dpt_map[..., 0], extrinsic, intrinsic
            )
    predictions["cam_tokens"] = taps[-1][:, :, 0]
    return predictions


def forward(
    p,
    cfg: SailReconConfig,
    images: jax.Array,
    num_anchor: int,
    num_query: int,
    rank: int = 300,
    subsample_key: Optional[jax.Array] = None,
    subsample_indices: Optional[jax.Array] = None,
    images_duplicated: bool = False,
) -> Dict[str, jax.Array]:
    """Joint forward. images: (B, A+Q, H, W, 3) NHWC in [0,1], anchors first.

    ``images_duplicated``: promise that frames [A:] repeat frames [:A] (the
    standard inference layout, ``demo_imc_forward.py:76-101``) — the ViT
    patch embed then runs once per unique image, exactly.

    Returns per-query-frame predictions (leading dims (B, Q)):
    extrinsic (3,4), intrinsic (3,3), point_map (H,W,3), xyz_cnf (H,W),
    depth_map (H,W,1), dpt_cnf (H,W), point_map_by_unprojection (H,W,3),
    cam_tokens (2C), pose_enc_list.
    """
    H, W = images.shape[2], images.shape[3]
    taps, psi, cam_tok = aggregator_forward(
        p["aggregator"],
        cfg.aggregator,
        images,
        num_anchor,
        num_query,
        rank,
        subsample_key,
        subsample_indices,
        images_duplicated=images_duplicated,
    )
    return _decode_heads(p, cfg, taps, cam_tok, (H, W), psi)


def pose_forward(
    p,
    cfg: SailReconConfig,
    images: jax.Array,
    num_anchor: int,
    num_query: int,
    rank: Optional[int] = None,
    subsample_key: Optional[jax.Array] = None,
    fp64_decode: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Pose-only evaluation path (the ``co3d_forward`` equivalent,
    ``sail_recon.py:288-312``): aggregator + camera head, no dense heads.

    Returns (extrinsics (B, Q, 3, 4), intrinsics (B, Q, 3, 3)).
    ``fp64_decode=True`` mirrors the reference's fp64 autocast around the
    final encoding->pose decode (``sail_recon.py:304-311``) — on the host
    (numpy float64; TPU fp64 is emulated), so the call is not jittable
    end-to-end in that mode.
    """
    H, W = images.shape[2], images.shape[3]
    P0 = (H // cfg.aggregator.patch_size) * (W // cfg.aggregator.patch_size)
    taps, _, cam_tok = aggregator_forward(
        p["aggregator"], cfg.aggregator, images, num_anchor, num_query,
        rank if rank is not None else P0, subsample_key,
    )
    cam_maps = camera_head(p["camera_head"], taps[-1], cam_tok, cfg.camera)
    if fp64_decode:
        return G.pose_encoding_to_extri_intri_np64(cam_maps[-1], (H, W))
    return G.pose_encoding_to_extri_intri(cam_maps[-1], (H, W))


def build_scene_cache(
    p,
    cfg: SailReconConfig,
    anchor_images: jax.Array,
    rank: int = 300,
    subsample_key: Optional[jax.Array] = None,
    subsample_indices: Optional[jax.Array] = None,
    anchor_chunk: Optional[int] = None,
    chunk_embed: bool = True,
):
    """Phase 1 of two-phase inference: returns (cache, cam_token_last_layer).

    ``anchor_chunk``: optional anchor-chunked build (must divide the anchor
    count) — per-layer transients scale with the chunk instead of the scene;
    see ``aggregator._build_layer_chunked``. ``chunk_embed=False`` keeps the
    ViT patch embedding unchunked (bit-equal to the plain build; the chunked
    ViT is a different XLA program with bf16-scheduling-class deviations).
    """
    return aggregator_build_cache(
        p["aggregator"], cfg.aggregator, anchor_images, rank, subsample_key,
        subsample_indices, anchor_chunk=anchor_chunk, chunk_embed=chunk_embed,
    )


def reloc(
    p,
    cfg: SailReconConfig,
    cache,
    cam_token_last_layer: jax.Array,
    images: jax.Array,
    fast_reloc: bool = False,
) -> Dict[str, jax.Array]:
    """Phase 2: localise (B, Q, H, W, 3) query frames against the cache.

    ``fast_reloc=True`` decodes camera parameters only
    (``sail_recon.py:240-244``).
    """
    H, W = images.shape[2], images.shape[3]
    taps, psi = aggregator_reloc(p["aggregator"], cfg.aggregator, cache, images)
    if fast_reloc:
        cam_maps = camera_head(
            p["camera_head"], taps[-1], cam_token_last_layer, cfg.camera
        )
        extrinsic, intrinsic = G.pose_encoding_to_extri_intri(cam_maps[-1], (H, W))
        return {
            "extrinsic": extrinsic,
            "intrinsic": intrinsic,
            "pose_enc_list": cam_maps,
        }
    preds = _decode_heads(p, cfg, taps, cam_token_last_layer, (H, W), psi)
    return _with_conf_fractions(preds)


def _with_conf_fractions(preds: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    if "xyz_cnf" in preds:
        # per-view fraction of point-confidence above thresholds 1.0..5.25
        # (the reference computes exactly this in reloc, sail_recon.py:254-262
        # — there it is dropped on the floor; here it is a real output)
        thresholds = jnp.arange(1.0, 5.5, 0.25)
        cnf = preds["xyz_cnf"]  # (B, Q, H, W)
        preds["xyz_conf_fractions"] = jnp.mean(
            (cnf[..., None] > thresholds).astype(jnp.float32), axis=(2, 3)
        )  # (B, Q, num_thresholds)
    return preds


def build_scene_cache_staged(
    p,
    cfg: SailReconConfig,
    anchor_images,
    rank: int = 300,
    subsample_key: Optional[jax.Array] = None,
    subsample_indices: Optional[jax.Array] = None,
    num_segments: int = 4,
    anchor_chunk: Optional[int] = None,
    chunk_embed: bool = True,
):
    """Host-staged phase 1: scene size bounded by HOST RAM, not HBM.

    The cache streams to the host segment-by-segment as it is built — the
    TPU-idiomatic equivalent of the reference's CPU-offloaded cache
    (``sailrecon/layers/attention.py:92-97``). Returns a host-numpy cache +
    cam token, consumed by :func:`reloc_staged` (or uploaded wholesale to
    :func:`reloc` when it fits in HBM). See
    ``aggregator.aggregator_build_cache_staged`` for the memory model.
    """
    return aggregator_build_cache_staged(
        p["aggregator"], cfg.aggregator, anchor_images, rank, subsample_key,
        subsample_indices, num_segments, anchor_chunk=anchor_chunk,
        chunk_embed=chunk_embed,
    )


def reloc_staged(
    p,
    cfg: SailReconConfig,
    host_cache,
    cam_token_last_layer,
    images,
    num_segments: int = 4,
    fast_reloc: bool = False,
) -> Dict[str, jax.Array]:
    """:func:`reloc` against a HOST-RAM cache, uploading one layer segment
    per dispatch (device peak = query activations + one segment's kv2)."""
    H, W = images.shape[2], images.shape[3]
    taps, psi = aggregator_reloc_staged(
        p["aggregator"], cfg.aggregator, host_cache, images, num_segments
    )
    cam_tok = jnp.asarray(cam_token_last_layer)
    if fast_reloc:
        cam_maps = camera_head(
            p["camera_head"], taps[-1], cam_tok, cfg.camera
        )
        extrinsic, intrinsic = G.pose_encoding_to_extri_intri(cam_maps[-1], (H, W))
        return {
            "extrinsic": extrinsic,
            "intrinsic": intrinsic,
            "pose_enc_list": cam_maps,
        }
    return _staged_decode_jit(cfg, (H, W), psi)(p, taps, cam_tok)


@_functools.lru_cache(maxsize=8)
def _staged_decode_jit(cfg: SailReconConfig, hw: Tuple[int, int], psi: int):
    """One cached jit of the head decode per (config, image size) — a fresh
    lambda per reloc_staged call would recompile every time."""
    return jax.jit(
        lambda p, taps, ct: _with_conf_fractions(
            _decode_heads(p, cfg, taps, ct, hw, psi)
        )
    )


def reloc_chunked(
    p,
    cfg: SailReconConfig,
    cache,
    cam_token_last_layer: jax.Array,
    images: jax.Array,
    chunk: int = 4,
    fast_reloc: bool = False,
) -> Dict[str, jax.Array]:
    """:func:`reloc` over query chunks — the ``memory_save`` equivalent.

    The reference bounds reloc memory by looping python-side over per-frame
    chunks with CPU-offloaded caches (``sail_recon.py:245-253``,
    ``demo_imc.py:97-107``). On TPU the equivalent is a ``lax.map`` over
    fixed-size query chunks inside ONE jitted program: peak activation /
    head-decode memory is that of ``chunk`` frames instead of Q, the scene
    cache stays resident in HBM, and the chunk loop is sequential on-device
    (no host round-trips). Q is padded up to a multiple of ``chunk``; padded
    frames are dropped from every output. On a single v5e chip the full-head
    decode is the reloc memory ceiling (~0.66 GB/frame of fp32 DPT
    activations at 518px): chunked reloc holds S_max at ~40 GB-scale query
    sets where the unchunked batched call would OOM.
    """
    B, Q = images.shape[0], images.shape[1]
    nchunk = -(-Q // chunk)
    pad = nchunk * chunk - Q
    imgs = jnp.pad(images, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
    # (nchunk, B, chunk, H, W, 3): lax.map carries one chunk at a time
    imgs = imgs.reshape(B, nchunk, chunk, *images.shape[2:]).transpose(
        1, 0, 2, 3, 4, 5
    )

    def one(chunk_imgs):
        return reloc(p, cfg, cache, cam_token_last_layer, chunk_imgs,
                     fast_reloc=fast_reloc)

    stacked = jax.lax.map(one, imgs)  # leaves: (nchunk, B, chunk, ...)

    def unfold(a):
        if a.ndim < 3:
            return a
        a = a.transpose(1, 0, 2, *range(3, a.ndim))  # (B, nchunk, chunk, ...)
        a = a.reshape(B, nchunk * chunk, *a.shape[3:])
        return a[:, :Q]

    out = {k: unfold(v) if k != "pose_enc_list" else [unfold(x) for x in v]
           for k, v in stacked.items()}
    return out
