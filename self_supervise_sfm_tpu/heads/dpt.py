"""DPT dense-prediction head (depth / point maps + confidence).

Re-design of ``sailrecon/heads/dpt_head.py`` (DPTHead): four tapped 2048-d
token maps are projected to [256, 512, 1024, 1024] channels, resized to a
x4/x2/x1/÷2 pyramid, fused RefineNet-style, and decoded to (C-1) value
channels + 1 confidence channel.

TPU notes: NHWC activations throughout; all bilinear resizes are
align-corners interpolation-matrix contractions (``dpt_utils.resize_bilinear_ac``)
so the whole head is one fused XLA graph; the reference's frame chunking
(``dpt_head.py:176-214``) and INT_MAX interpolate chunking are unnecessary —
frames are batched and memory is handled by remat/sharding at the trainer
level. Runs in fp32 (reference disables AMP for heads, ``sail_recon.py:119``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..layers import params as P
from .act import activate_head
from .dpt_utils import create_uv_grid, position_grid_to_embed, resize_bilinear_ac


@dataclass(frozen=True)
class DPTHeadConfig:
    dim_in: int = 2048
    patch_size: int = 14
    output_dim: int = 4  # (C-1) values + 1 confidence
    activation: str = "inv_log"
    conf_activation: str = "expp1"
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    intermediate_layer_idx: Tuple[int, ...] = (4, 11, 17, 23)
    pos_embed: bool = True
    feature_only: bool = False
    down_ratio: int = 1
    # Storage dtype of the FINAL full-resolution upsample (the tensor
    # feeding output_conv2). On TPU the consumer conv multiplies in bf16 at
    # DEFAULT precision regardless, so "bfloat16" applies the identical
    # rounding one op earlier and halves XLA's convert+relayout copy
    # (2 x 1.51 ms at 518px, PERF_r03 "DPT channels-last conversions");
    # the conv then accumulates f32 explicitly. "float32" (default) is the
    # reference-parity configuration.
    final_upsample_dtype: str = "float32"


def _init_rcu(key, features):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": P.init_conv(k1, 3, 3, features, features),
        "conv2": P.init_conv(k2, 3, 3, features, features),
    }


def _init_fusion(key, features, has_residual):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "resConfUnit2": _init_rcu(k2, features),
        "out_conv": P.init_conv(k3, 1, 1, features, features),
    }
    if has_residual:
        p["resConfUnit1"] = _init_rcu(k1, features)
    return p


def init_dpt_head(key, cfg: DPTHeadConfig):
    keys = jax.random.split(key, 16)
    f = cfg.features
    oc = cfg.out_channels
    p = {
        "norm": P.init_layer_norm(cfg.dim_in),
        "projects": [
            P.init_conv(keys[i], 1, 1, cfg.dim_in, oc[i]) for i in range(4)
        ],
        "resize0": P.init_conv_transpose(keys[4], 4, 4, oc[0], oc[0]),
        "resize1": P.init_conv_transpose(keys[5], 2, 2, oc[1], oc[1]),
        "resize3": P.init_conv(keys[6], 3, 3, oc[3], oc[3]),
        "scratch": {
            "layer1_rn": P.init_conv(keys[7], 3, 3, oc[0], f, bias=False),
            "layer2_rn": P.init_conv(keys[8], 3, 3, oc[1], f, bias=False),
            "layer3_rn": P.init_conv(keys[9], 3, 3, oc[2], f, bias=False),
            "layer4_rn": P.init_conv(keys[10], 3, 3, oc[3], f, bias=False),
            "refinenet1": _init_fusion(keys[11], f, True),
            "refinenet2": _init_fusion(keys[12], f, True),
            "refinenet3": _init_fusion(keys[13], f, True),
            "refinenet4": _init_fusion(keys[14], f, False),
        },
    }
    k15a, k15b, k15c = jax.random.split(keys[15], 3)
    if cfg.feature_only:
        p["scratch"]["output_conv1"] = P.init_conv(k15a, 3, 3, f, f)
    else:
        p["scratch"]["output_conv1"] = P.init_conv(k15a, 3, 3, f, f // 2)
        p["scratch"]["output_conv2"] = {
            "conv1": P.init_conv(k15b, 3, 3, f // 2, 32),
            "conv2": P.init_conv(k15c, 1, 1, 32, cfg.output_dim),
        }
    return p


def _rcu(p, x):
    """Residual conv unit (``dpt_head.py:425-483``).

    NOTE: the reference's first ``nn.ReLU(inplace=True)`` mutates its input,
    so the skip connection effectively adds ``relu(x)`` — reproduced here:
    ``y = conv2(relu(conv1(relu(x)))) + relu(x)``.
    """
    a = jax.nn.relu(x)
    out = P.conv2d(p["conv1"], a)
    out = jax.nn.relu(out)
    out = P.conv2d(p["conv2"], out)
    return out + a


def _fusion(p, x, residual=None, out_hw=None):
    """FeatureFusionBlock (``dpt_head.py:486-565``)."""
    if residual is not None:
        x = x + _rcu(p["resConfUnit1"], residual)
    x = _rcu(p["resConfUnit2"], x)
    if out_hw is None:
        out_hw = (x.shape[1] * 2, x.shape[2] * 2)
    x = resize_bilinear_ac(x, out_hw)
    return P.conv2d(p["out_conv"], x)


def _pos_embed_grid(ph: int, pw: int, C: int, W: int, H: int, dtype,
                    ratio: float = 0.1) -> jax.Array:
    """The scaled (ph, pw, C) sincos UV positional grid addend
    (``dpt_head.py:298-312``)."""
    grid = create_uv_grid(pw, ph, aspect_ratio=W / H, dtype=dtype)
    pe = position_grid_to_embed(grid, C)
    return (ratio * pe).astype(dtype)


def _apply_pos_embed(x: jax.Array, W: int, H: int, ratio: float = 0.1) -> jax.Array:
    """Add the scaled sincos UV positional grid (``dpt_head.py:298-312``)."""
    pe = _pos_embed_grid(x.shape[1], x.shape[2], x.shape[-1], W, H, x.dtype,
                         ratio)
    return x + pe[None]


def dpt_head(
    p,
    taps: Dict[int, jax.Array],
    images_hw: Tuple[int, int],
    patch_start_idx: int,
    cfg: DPTHeadConfig,
):
    """Decode tapped aggregator features into dense maps.

    Args:
        taps: layer-index -> (B, S, P, dim_in) fp32 features.
        images_hw: original (H, W) — the output resolution.
        patch_start_idx: first patch-token index (5).
    Returns:
        feature_only: (B, S, H', W', features)
        else: (preds (B, S, H, W, output_dim-1), conf (B, S, H, W)).
    """
    H, W = images_hw
    ph, pw = H // cfg.patch_size, W // cfg.patch_size
    ref_tap = taps[cfg.intermediate_layer_idx[0]]
    B, S = ref_tap.shape[0], ref_tap.shape[1]

    pyramid = []
    resize_ops = [
        lambda x: P.conv_transpose2d(p["resize0"], x, 4),
        lambda x: P.conv_transpose2d(p["resize1"], x, 2),
        lambda x: x,
        lambda x: P.conv2d(p["resize3"], x, stride=2, padding=[(1, 1), (1, 1)]),
    ]
    for i, layer_idx in enumerate(cfg.intermediate_layer_idx):
        x = taps[layer_idx][:, :, patch_start_idx:].astype(jnp.float32)
        x = x.reshape(B * S, ph * pw, cfg.dim_in)
        x = P.layer_norm(p["norm"], x)
        x = x.reshape(B * S, ph, pw, cfg.dim_in)
        x = P.conv2d(p["projects"][i], x)
        if cfg.pos_embed:
            x = _apply_pos_embed(x, W, H)
        x = resize_ops[i](x)
        pyramid.append(x)

    l1, l2, l3, l4 = pyramid
    s = p["scratch"]
    l1 = P.conv2d(s["layer1_rn"], l1)
    l2 = P.conv2d(s["layer2_rn"], l2)
    l3 = P.conv2d(s["layer3_rn"], l3)
    l4 = P.conv2d(s["layer4_rn"], l4)

    out = _fusion(s["refinenet4"], l4, out_hw=l3.shape[1:3])
    out = _fusion(s["refinenet3"], out, l3, out_hw=l2.shape[1:3])
    out = _fusion(s["refinenet2"], out, l2, out_hw=l1.shape[1:3])
    out = _fusion(s["refinenet1"], out, l1)

    out = P.conv2d(s["output_conv1"], out)
    out_hw = (
        int(ph * cfg.patch_size / cfg.down_ratio),
        int(pw * cfg.patch_size / cfg.down_ratio),
    )
    up_dtype = jnp.dtype(cfg.final_upsample_dtype)
    up_kw = {} if up_dtype == out.dtype else {"out_dtype": up_dtype}
    if cfg.pos_embed:
        # the post-resize pos-embed rides the resize call so the Pallas
        # H-pass can fuse the add (saves a full-resolution HBM round trip)
        pe = _pos_embed_grid(out_hw[0], out_hw[1], out.shape[-1], W, H,
                             out.dtype)
        out = resize_bilinear_ac(out, out_hw, add=pe, **up_kw)
    else:
        out = resize_bilinear_ac(out, out_hw, **up_kw)
    if cfg.feature_only:
        return out.reshape(B, S, *out.shape[1:])

    # f32 accumulation keeps the math identical when the upsample stored
    # bf16 (the TPU backend's own internal mix for f32 inputs)
    accum = jnp.float32 if out.dtype != jnp.float32 else None
    out = P.conv2d(s["output_conv2"]["conv1"], out, accum_dtype=accum)
    out = jax.nn.relu(out)
    out = P.conv2d(s["output_conv2"]["conv2"], out)
    preds, conf = activate_head(out, cfg.activation, cfg.conf_activation)
    preds = preds.reshape(B, S, *preds.shape[1:])
    conf = conf.reshape(B, S, *conf.shape[1:])
    return preds, conf
