"""Torch-checkpoint -> JAX param-pytree converter.

Maps the reference ``SailRecon`` ``state_dict`` (HuggingFace
``HKUST-SAIL/SAIL-Recon/sailrecon.pt``, loaded at ``train/train_imc.py:464-468``)
onto this framework's parameter pytrees. Works from a plain ``{name: ndarray}``
dict so torch is only needed to *read* the file, not at model runtime.

Layout rules (see ``layers/params.py``):
- Linear:   torch (out, in)  -> w (in, out)  [transpose]
- Conv2d:   torch (O, I, H, W) -> w (H, W, I, O)
- ConvT2d:  torch (I, O, H, W) -> w (H, W, I, O)  (used with transpose_kernel)
- LayerNorm weight/bias -> scale/bias
- depth-stacked blocks: leaves stacked on axis 0 for ``lax.scan``.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


def load_torch_state_dict(path: str) -> Dict[str, Array]:
    """Read a ``.pt`` checkpoint into numpy (requires torch, CPU only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def torch_module_to_state_dict(module) -> Dict[str, Array]:
    """Convenience for golden tests: live torch module -> numpy state dict."""
    return {
        k: v.detach().float().cpu().numpy() for k, v in module.state_dict().items()
    }


# -- primitives -------------------------------------------------------------


def convert_linear(sd: StateDict, prefix: str):
    p = {"w": jnp.asarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def convert_ln(sd: StateDict, prefix: str):
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def convert_conv(sd: StateDict, prefix: str):
    p = {"w": jnp.asarray(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def convert_conv_transpose(sd: StateDict, prefix: str):
    # torch ConvTranspose2d weight (in, out, kh, kw) is the weight of the
    # forward conv it is the gradient of; lax.conv_transpose with
    # transpose_kernel=True expects that forward conv's HWIO layout, i.e.
    # (kh, kw, out, in).
    p = {"w": jnp.asarray(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


# -- transformer block ------------------------------------------------------


def convert_attention(sd: StateDict, prefix: str, qk_norm: bool):
    p = {
        "qkv": convert_linear(sd, f"{prefix}.qkv"),
        "proj": convert_linear(sd, f"{prefix}.proj"),
    }
    if qk_norm:
        p["q_norm"] = convert_ln(sd, f"{prefix}.q_norm")
        p["k_norm"] = convert_ln(sd, f"{prefix}.k_norm")
    return p


def convert_block(sd: StateDict, prefix: str, qk_norm: bool):
    return {
        "norm1": convert_ln(sd, f"{prefix}.norm1"),
        "attn": convert_attention(sd, f"{prefix}.attn", qk_norm),
        "ls1": {"gamma": jnp.asarray(sd[f"{prefix}.ls1.gamma"])},
        "norm2": convert_ln(sd, f"{prefix}.norm2"),
        "mlp": {
            "fc1": convert_linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": convert_linear(sd, f"{prefix}.mlp.fc2"),
        },
        "ls2": {"gamma": jnp.asarray(sd[f"{prefix}.ls2.gamma"])},
    }


def stack_blocks(blocks):
    """List of per-layer block pytrees -> one pytree of depth-stacked leaves."""
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def convert_blocks_stacked(sd: StateDict, prefix: str, depth: int, qk_norm: bool):
    return stack_blocks(
        [convert_block(sd, f"{prefix}.{i}", qk_norm) for i in range(depth)]
    )


# -- aggregator / heads / full model ---------------------------------------


def convert_aggregator(sd: StateDict, prefix: str, depth: int, vit_depth: int):
    pfx = f"{prefix}." if prefix else ""
    return {
        "vit": convert_vit(sd, f"{pfx}patch_embed", vit_depth),
        "frame_blocks": convert_blocks_stacked(
            sd, f"{pfx}frame_blocks", depth, qk_norm=True
        ),
        "global_blocks": convert_blocks_stacked(
            sd, f"{pfx}global_blocks", depth, qk_norm=True
        ),
        "reloc_blocks": convert_blocks_stacked(
            sd, f"{pfx}global_reloc_blocks", depth, qk_norm=True
        ),
        "camera_token": jnp.asarray(sd[f"{pfx}camera_token"]),
        "register_token": jnp.asarray(sd[f"{pfx}register_token"]),
        "camera_token_reloc": jnp.asarray(sd[f"{pfx}camera_token_reloc"]),
        "register_token_reloc": jnp.asarray(sd[f"{pfx}register_token_reloc"]),
    }


def convert_camera_head(sd: StateDict, prefix: str, trunk_depth: int = 4):
    pfx = f"{prefix}." if prefix else ""
    return {
        "trunk": convert_blocks_stacked(sd, f"{pfx}trunk", trunk_depth, qk_norm=False),
        "token_norm": convert_ln(sd, f"{pfx}token_norm"),
        "trunk_norm": convert_ln(sd, f"{pfx}trunk_norm"),
        "empty_pose_tokens": jnp.asarray(sd[f"{pfx}empty_pose_tokens"]),
        "embed_pose": convert_linear(sd, f"{pfx}embed_pose"),
        # torch: nn.Sequential(SiLU, Linear) -> index 1 is the Linear
        "poseLN_modulation": convert_linear(sd, f"{pfx}poseLN_modulation.1"),
        "pose_branch": {
            "fc1": convert_linear(sd, f"{pfx}pose_branch.fc1"),
            "fc2": convert_linear(sd, f"{pfx}pose_branch.fc2"),
        },
    }


def _convert_rcu(sd: StateDict, prefix: str):
    return {
        "conv1": convert_conv(sd, f"{prefix}.conv1"),
        "conv2": convert_conv(sd, f"{prefix}.conv2"),
    }


def _convert_fusion(sd: StateDict, prefix: str, has_residual: bool):
    p = {
        "resConfUnit2": _convert_rcu(sd, f"{prefix}.resConfUnit2"),
        "out_conv": convert_conv(sd, f"{prefix}.out_conv"),
    }
    if has_residual:
        p["resConfUnit1"] = _convert_rcu(sd, f"{prefix}.resConfUnit1")
    return p


def convert_dpt_head(sd: StateDict, prefix: str, feature_only: bool = False):
    pfx = f"{prefix}." if prefix else ""
    p = {
        "norm": convert_ln(sd, f"{pfx}norm"),
        "projects": [convert_conv(sd, f"{pfx}projects.{i}") for i in range(4)],
        "resize0": convert_conv_transpose(sd, f"{pfx}resize_layers.0"),
        "resize1": convert_conv_transpose(sd, f"{pfx}resize_layers.1"),
        "resize3": convert_conv(sd, f"{pfx}resize_layers.3"),
        "scratch": {
            "layer1_rn": convert_conv(sd, f"{pfx}scratch.layer1_rn"),
            "layer2_rn": convert_conv(sd, f"{pfx}scratch.layer2_rn"),
            "layer3_rn": convert_conv(sd, f"{pfx}scratch.layer3_rn"),
            "layer4_rn": convert_conv(sd, f"{pfx}scratch.layer4_rn"),
            "refinenet1": _convert_fusion(sd, f"{pfx}scratch.refinenet1", True),
            "refinenet2": _convert_fusion(sd, f"{pfx}scratch.refinenet2", True),
            "refinenet3": _convert_fusion(sd, f"{pfx}scratch.refinenet3", True),
            "refinenet4": _convert_fusion(sd, f"{pfx}scratch.refinenet4", False),
            "output_conv1": convert_conv(sd, f"{pfx}scratch.output_conv1"),
        },
    }
    if not feature_only:
        p["scratch"]["output_conv2"] = {
            "conv1": convert_conv(sd, f"{pfx}scratch.output_conv2.0"),
            "conv2": convert_conv(sd, f"{pfx}scratch.output_conv2.2"),
        }
    return p


def convert_torch_mha(sd: StateDict, prefix: str):
    """torch ``nn.MultiheadAttention`` -> fused-qkv attention params."""
    p = {
        "qkv": {"w": jnp.asarray(sd[f"{prefix}.in_proj_weight"].T)},
        "proj": convert_linear(sd, f"{prefix}.out_proj"),
    }
    if f"{prefix}.in_proj_bias" in sd:
        p["qkv"]["b"] = jnp.asarray(sd[f"{prefix}.in_proj_bias"])
    return p


def _convert_track_attn_block(
    sd: StateDict, prefix: str, cross: bool, norm_affine: bool = True
):
    p = {
        "attn": convert_torch_mha(
            sd, f"{prefix}.cross_attn" if cross else f"{prefix}.attn"
        ),
        "mlp": {
            "fc1": convert_linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": convert_linear(sd, f"{prefix}.mlp.fc2"),
        },
    }
    if norm_affine:
        p["norm1"] = convert_ln(sd, f"{prefix}.norm1")
        p["norm2"] = convert_ln(sd, f"{prefix}.norm2")
    else:
        # dependency-variant blocks: elementwise_affine=False — no params
        p["norm1"] = {}
        p["norm2"] = {}
    if cross:
        p["norm_context"] = convert_ln(sd, f"{prefix}.norm_context")
    return p


def convert_updateformer(
    sd: StateDict,
    prefix: str,
    time_depth: int,
    space_depth: int,
    use_norms: bool = True,
    block_norm_affine: bool = True,
):
    """``use_norms``/``block_norm_affine``: True for the track-head variant
    (``heads/track_modules/blocks.py``), False for the VGGSfM dependency
    variant (``dependency/track_modules/blocks.py`` — no input/output norms,
    affine-free block norms)."""
    p = {
        "input_transform": convert_linear(sd, f"{prefix}.input_transform"),
        "flow_head": convert_linear(sd, f"{prefix}.flow_head"),
        "time_blocks": [
            _convert_track_attn_block(
                sd, f"{prefix}.time_blocks.{i}", False, block_norm_affine
            )
            for i in range(time_depth)
        ],
    }
    if use_norms:
        p["input_norm"] = convert_ln(sd, f"{prefix}.input_norm")
        p["output_norm"] = convert_ln(sd, f"{prefix}.output_norm")
    if space_depth:
        # (sic) the reference parameter is named "virual_tracks"
        p["virtual_tracks"] = jnp.asarray(sd[f"{prefix}.virual_tracks"])
        p["space_virtual_blocks"] = [
            _convert_track_attn_block(
                sd, f"{prefix}.space_virtual_blocks.{i}", False, block_norm_affine
            )
            for i in range(space_depth)
        ]
        p["space_point2virtual_blocks"] = [
            _convert_track_attn_block(
                sd, f"{prefix}.space_point2virtual_blocks.{i}", True,
                block_norm_affine,
            )
            for i in range(space_depth)
        ]
        p["space_virtual2point_blocks"] = [
            _convert_track_attn_block(
                sd, f"{prefix}.space_virtual2point_blocks.{i}", True,
                block_norm_affine,
            )
            for i in range(space_depth)
        ]
    return p


def convert_track_head(sd: StateDict, prefix: str, depth: int = 6, predict_conf=True):
    pfx = f"{prefix}." if prefix else ""
    p = {
        "feature_extractor": convert_dpt_head(
            sd, f"{pfx}feature_extractor", feature_only=True
        ),
        "corr_mlp": {
            "fc1": convert_linear(sd, f"{pfx}tracker.corr_mlp.fc1"),
            "fc2": convert_linear(sd, f"{pfx}tracker.corr_mlp.fc2"),
        },
        "query_ref_token": jnp.asarray(sd[f"{pfx}tracker.query_ref_token"]),
        "updateformer": convert_updateformer(
            sd, f"{pfx}tracker.updateformer", depth, depth
        ),
        "fmap_norm": convert_ln(sd, f"{pfx}tracker.fmap_norm"),
        "ffeat_norm": convert_ln(sd, f"{pfx}tracker.ffeat_norm"),
        "ffeat_updater": convert_linear(sd, f"{pfx}tracker.ffeat_updater.0"),
        "vis_predictor": convert_linear(sd, f"{pfx}tracker.vis_predictor.0"),
    }
    if predict_conf:
        p["conf_predictor"] = convert_linear(sd, f"{pfx}tracker.conf_predictor.0")
    return p


def convert_sailrecon(sd: StateDict, depth: int = 24, vit_depth: int = 24):
    """Full reference SailRecon state dict -> framework param pytree."""
    p = {
        "aggregator": convert_aggregator(sd, "aggregator", depth, vit_depth),
    }
    if any(k.startswith("camera_head.") for k in sd):
        p["camera_head"] = convert_camera_head(sd, "camera_head")
    if any(k.startswith("point_head.") for k in sd):
        p["point_head"] = convert_dpt_head(sd, "point_head")
    if any(k.startswith("depth_head.") for k in sd):
        p["depth_head"] = convert_dpt_head(sd, "depth_head")
    return p


# -- DINOv2 ViT -------------------------------------------------------------


def convert_vit(sd: StateDict, prefix: str, depth: int):
    """Convert a DinoVisionTransformer subtree (e.g. ``aggregator.patch_embed``)."""
    pfx = f"{prefix}." if prefix else ""
    p = {
        "patch_embed": {"proj": convert_conv(sd, f"{pfx}patch_embed.proj")},
        "cls_token": jnp.asarray(sd[f"{pfx}cls_token"]),
        "pos_embed": jnp.asarray(sd[f"{pfx}pos_embed"]),
        "register_tokens": (
            jnp.asarray(sd[f"{pfx}register_tokens"])
            if f"{pfx}register_tokens" in sd
            else None
        ),
        "blocks": convert_blocks_stacked(sd, f"{pfx}blocks", depth, qk_norm=False),
        "norm": convert_ln(sd, f"{pfx}norm"),
    }
    return p


# -- VGGSfM standalone tracker (facebook/VGGSfM vggsfm_v2_tracker.pt) ---------


def convert_vggsfm_residual_block(sd: StateDict, prefix: str):
    """``dependency/track_modules/modules.py:40-104`` (instance norms carry no
    params; downsample = Sequential(Conv2d, norm) -> ``.downsample.0``)."""
    p = {
        "conv1": convert_conv(sd, f"{prefix}.conv1"),
        "conv2": convert_conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.downsample.0.weight" in sd:
        p["downsample"] = convert_conv(sd, f"{prefix}.downsample.0")
    return p


def convert_basic_encoder(sd: StateDict, prefix: str):
    """``dependency/track_modules/blocks.py:25-98`` (stride-4 CNN)."""
    return {
        "conv1": convert_conv(sd, f"{prefix}.conv1"),
        **{
            f"layer{i}": [
                convert_vggsfm_residual_block(sd, f"{prefix}.layer{i}.0"),
                convert_vggsfm_residual_block(sd, f"{prefix}.layer{i}.1"),
            ]
            for i in (1, 2, 3, 4)
        },
        "conv2": convert_conv(sd, f"{prefix}.conv2"),
        "conv3": convert_conv(sd, f"{prefix}.conv3"),
    }


def convert_shallow_encoder(sd: StateDict, prefix: str):
    """``dependency/track_modules/blocks.py:105-168`` (stride-1 patch CNN)."""
    return {
        "conv1": convert_conv(sd, f"{prefix}.conv1"),
        "layer1": convert_vggsfm_residual_block(sd, f"{prefix}.layer1"),
        "layer2": convert_vggsfm_residual_block(sd, f"{prefix}.layer2"),
        "conv2": convert_conv(sd, f"{prefix}.conv2"),
    }


def convert_vggsfm_predictor(sd: StateDict, prefix: str, depth: int,
                             use_spaceatt: bool, fine: bool):
    """``dependency/track_modules/base_track_predictor.py:15-72``: the
    dependency-variant updateformer (no input/output norms, affine-free block
    norms), GroupNorm(1, C) feature norm, ffeat_updater Sequential, and a
    vis_predictor on the coarse predictor only."""
    p = {
        "updateformer": convert_updateformer(
            sd, f"{prefix}.updateformer", time_depth=depth,
            space_depth=depth if use_spaceatt else 0,
            use_norms=False, block_norm_affine=False,
        ),
        # GroupNorm(1, C) on (M, C) rows == LayerNorm(C): weights map 1:1
        "norm": convert_ln(sd, f"{prefix}.norm"),
        "ffeat_updater": convert_linear(sd, f"{prefix}.ffeat_updater.0"),
    }
    if not fine:
        p["vis_predictor"] = convert_linear(sd, f"{prefix}.vis_predictor.0")
    return p


def convert_vggsfm_tracker(sd: StateDict, cfg=None):
    """Full ``TrackerPredictor`` checkpoint (``dependency/vggsfm_tracker.py:
    25-148``; weights published as facebook/VGGSfM ``vggsfm_v2_tracker.pt``)
    -> ``pipeline/vggsfm_tracker.init_vggsfm_tracker`` param tree."""
    from ..pipeline.vggsfm_tracker import VGGSfMTrackerConfig

    cfg = cfg or VGGSfMTrackerConfig()
    return {
        "coarse_fnet": convert_basic_encoder(sd, "coarse_fnet"),
        "coarse_predictor": convert_vggsfm_predictor(
            sd, "coarse_predictor", cfg.coarse.depth,
            cfg.coarse.use_spaceatt, cfg.coarse.fine,
        ),
        "fine_fnet": convert_shallow_encoder(sd, "fine_fnet"),
        "fine_predictor": convert_vggsfm_predictor(
            sd, "fine_predictor", cfg.fine.depth,
            cfg.fine.use_spaceatt, cfg.fine.fine,
        ),
    }
