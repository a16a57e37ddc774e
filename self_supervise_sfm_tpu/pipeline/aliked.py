"""ALIKED-class deformable keypoint detector + descriptor, in JAX.

The reference's extractor zoo instantiates lightglue's ALIKED alongside
SuperPoint and SIFT (``sailrecon/dependency/vggsfm_utils.py:205-250``).
This module provides the TPU-native equivalent of that capability: the
ALIKED architecture ("ALIKED: A Lighter Keypoint and Descriptor Extraction
Network via Deformable Transformation", Zhao et al., IEEE TIM 2023) —

- a 4-block multi-scale encoder (full res, /2, /8, /32) whose two deep
  blocks use **deformable convolutions**, implemented here as offset
  prediction + gather-based bilinear sampling (the XLA-friendly lowering of
  DCN; no custom CUDA op needed),
- multi-scale aggregation to a ``dim``-channel feature map + a sigmoid
  score-map head,
- DKD-style keypoint detection: iterated-maxpool NMS, static-shape top-k,
  and 5x5 local soft-argmax sub-pixel refinement,
- an SDDH-style sparse descriptor head: per keypoint, M deformable sample
  positions are estimated from the K x K feature patch, the feature map is
  bilinearly sampled there, and the samples are aggregated with
  per-position projections into an L2-normalised descriptor. Descriptors
  are computed **only at keypoints** (the sparsity that makes ALIKED
  cheap), batched over keypoints with vmap.

Everything is jittable with static shapes; `aliked_keypoints` returns
padded (max_pts, ...) arrays like the other extractors in this zoo.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ALIKEDConfig:
    # aliked-n16 channel plan
    c1: int = 16
    c2: int = 32
    c3: int = 64
    c4: int = 128
    dim: int = 128  # aggregated feature dim (4 branches x dim//4)
    desc_dim: int = 128
    kernel: int = 3  # SDDH patch size K
    num_samples: int = 16  # SDDH deformable positions M (the "n16")
    nms_radius: int = 2
    detection_threshold: float = 0.01
    border: int = 8


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def _conv_init(key, cin, cout, k):
    w = jax.random.normal(key, (k, k, cin, cout)) * (2.0 / (k * k * cin)) ** 0.5
    return {"w": w, "b": jnp.zeros((cout,))}


def _dense_init(key, cin, cout):
    w = jax.random.normal(key, (cin, cout)) * (2.0 / cin) ** 0.5
    return {"w": w, "b": jnp.zeros((cout,))}


def init_aliked(key, cfg: ALIKEDConfig = ALIKEDConfig()) -> Dict:
    ks = iter(jax.random.split(key, 32))
    c1, c2, c3, c4, dim = cfg.c1, cfg.c2, cfg.c3, cfg.c4, cfg.dim
    K, M = cfg.kernel, cfg.num_samples
    p = {
        # block1: plain ConvBlock at full resolution
        "b1_conv1": _conv_init(next(ks), 3, c1, 3),
        "b1_conv2": _conv_init(next(ks), c1, c1, 3),
        # block2: ResBlock at /2
        "b2_conv1": _conv_init(next(ks), c1, c2, 3),
        "b2_conv2": _conv_init(next(ks), c2, c2, 3),
        "b2_skip": _conv_init(next(ks), c1, c2, 1),
        # block3: deformable ResBlock at /8
        "b3_off1": _conv_init(next(ks), c2, 2 * 9, 3),
        "b3_conv1": _conv_init(next(ks), c2, c3, 3),
        "b3_off2": _conv_init(next(ks), c3, 2 * 9, 3),
        "b3_conv2": _conv_init(next(ks), c3, c3, 3),
        "b3_skip": _conv_init(next(ks), c2, c3, 1),
        # block4: deformable ResBlock at /32
        "b4_off1": _conv_init(next(ks), c3, 2 * 9, 3),
        "b4_conv1": _conv_init(next(ks), c3, c4, 3),
        "b4_off2": _conv_init(next(ks), c4, 2 * 9, 3),
        "b4_conv2": _conv_init(next(ks), c4, c4, 3),
        "b4_skip": _conv_init(next(ks), c3, c4, 1),
        # aggregation: 1x1 projections to dim//4 per branch
        "agg1": _conv_init(next(ks), c1, dim // 4, 1),
        "agg2": _conv_init(next(ks), c2, dim // 4, 1),
        "agg3": _conv_init(next(ks), c3, dim // 4, 1),
        "agg4": _conv_init(next(ks), c4, dim // 4, 1),
        # score-map head (SMH)
        "smh1": _conv_init(next(ks), dim, 8, 1),
        "smh2": _conv_init(next(ks), 8, 4, 3),
        "smh3": _conv_init(next(ks), 4, 4, 3),
        "smh4": _conv_init(next(ks), 4, 1, 3),
        # SDDH: offsets from the K x K patch, per-position projections
        "sddh_off": _dense_init(next(ks), K * K * dim, 2 * M),
        "sddh_proj": {
            "w": jax.random.normal(next(ks), (M, dim, cfg.desc_dim))
            * (2.0 / dim) ** 0.5
        },
        "sddh_out": _dense_init(next(ks), cfg.desc_dim, cfg.desc_dim),
    }
    # zero-init offset predictors: DCN starts as a plain conv (standard DCN
    # practice) and SDDH starts sampling at the keypoint itself
    for n in ("b3_off1", "b3_off2", "b4_off1", "b4_off2"):
        p[n] = {"w": jnp.zeros_like(p[n]["w"]), "b": p[n]["b"]}
    p["sddh_off"] = {
        "w": jnp.zeros_like(p["sddh_off"]["w"]),
        "b": p["sddh_off"]["b"],
    }
    return p


# ---------------------------------------------------------------------------
# deformable convolution (offset conv + gather-based bilinear sampling)
# ---------------------------------------------------------------------------


def _conv(p, x, stride: int = 1):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def _bilinear_hw(img: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """img (H, W, C); y/x arbitrary-shaped continuous coords -> (..., C).

    Zero padding outside the image (matches torchvision's deform_conv2d
    sampling convention).
    """
    H, W, C = img.shape
    y0f = jnp.floor(y)
    x0f = jnp.floor(x)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)
    wy = (y - y0f)[..., None]
    wx = (x - x0f)[..., None]

    def tap(yy, xx):
        inside = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        v = img[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
        return jnp.where(inside[..., None], v, 0.0)

    return (
        tap(y0, x0) * (1 - wy) * (1 - wx)
        + tap(y0, x0 + 1) * (1 - wy) * wx
        + tap(y0 + 1, x0) * wy * (1 - wx)
        + tap(y0 + 1, x0 + 1) * wy * wx
    )


def deform_conv(x: jax.Array, offsets: jax.Array, w: jax.Array, b: jax.Array):
    """DCNv1 3x3 deformable convolution.

    x (B, H, W, Cin); offsets (B, H, W, 18) as 9 x (dy, dx) per output pixel
    (kernel taps in row-major order, torchvision layout); w (3, 3, Cin, Cout).
    Each output pixel convolves samples taken at ``p0 + p_k + Δp_k`` with
    bilinear interpolation — lowered to gathers, which XLA handles natively
    (the reason no custom CUDA kernel is needed on TPU).
    """
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    off = offsets.reshape(B, H, W, 9, 2)

    def one_image(img, o):
        acc = jnp.zeros((H, W, Cout), img.dtype)
        k = 0
        for ky in (-1, 0, 1):
            for kx in (-1, 0, 1):
                sy = yy + ky + o[..., k, 0]
                sx = xx + kx + o[..., k, 1]
                v = _bilinear_hw(img, sy, sx)  # (H, W, Cin)
                acc = acc + v @ w[ky + 1, kx + 1].astype(img.dtype)
                k += 1
        return acc

    return jax.vmap(one_image)(x, off) + b.astype(x.dtype)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _gate(x):
    return jax.nn.selu(x)


def _avg_pool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / float(k * k)


def _resize_bilinear(x, H, W):
    return jax.image.resize(x, (x.shape[0], H, W, x.shape[-1]), "bilinear")


def _res_block(p, x, name, deform: bool):
    if deform:
        o1 = _conv(p[f"{name}_off1"], x)
        h = _gate(deform_conv(x, o1, p[f"{name}_conv1"]["w"], p[f"{name}_conv1"]["b"]))
        o2 = _conv(p[f"{name}_off2"], h)
        h = deform_conv(h, o2, p[f"{name}_conv2"]["w"], p[f"{name}_conv2"]["b"])
    else:
        h = _gate(_conv(p[f"{name}_conv1"], x))
        h = _conv(p[f"{name}_conv2"], h)
    return _gate(h + _conv(p[f"{name}_skip"], x))


def aliked_dense(p, images: jax.Array, cfg: ALIKEDConfig = ALIKEDConfig()):
    """images (B, H, W, 3) in [0,1] -> (scores (B,H,W), features (B,H,W,dim)).

    H and W must be multiples of 32 (the /32 branch); callers pad.
    """
    B, H, W, _ = images.shape
    x1 = _gate(_conv(p["b1_conv2"], _gate(_conv(p["b1_conv1"], images))))
    x2 = _res_block(p, _avg_pool(x1, 2), "b2", deform=False)  # /2
    x3 = _res_block(p, _avg_pool(x2, 4), "b3", deform=True)  # /8
    x4 = _res_block(p, _avg_pool(x3, 4), "b4", deform=True)  # /32

    f = jnp.concatenate(
        [
            _gate(_conv(p["agg1"], x1)),
            _resize_bilinear(_gate(_conv(p["agg2"], x2)), H, W),
            _resize_bilinear(_gate(_conv(p["agg3"], x3)), H, W),
            _resize_bilinear(_gate(_conv(p["agg4"], x4)), H, W),
        ],
        axis=-1,
    )  # (B, H, W, dim)

    s = _gate(_conv(p["smh1"], f))
    s = _gate(_conv(p["smh2"], s))
    s = _gate(_conv(p["smh3"], s))
    scores = jax.nn.sigmoid(_conv(p["smh4"], s))[..., 0]
    feats = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)
    return scores, feats


def sddh_descriptors(
    p, feats: jax.Array, xy: jax.Array, cfg: ALIKEDConfig = ALIKEDConfig()
) -> jax.Array:
    """Sparse deformable descriptor head.

    feats (H, W, dim) L2-normalised feature map; xy (N, 2) keypoints in
    pixels -> (N, desc_dim) L2-normalised descriptors. Per keypoint: read
    the K x K patch, regress M (dy, dx) sample offsets, bilinearly sample
    the feature map at kp + offset, aggregate with per-position projection
    matrices, SELU + linear, L2-normalise.
    """
    K, M = cfg.kernel, cfg.num_samples
    r = K // 2
    taps = jnp.stack(
        jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2)  # (K*K, 2) as (dy, dx)

    def one(kp):
        py = kp[1]
        px = kp[0]
        patch = _bilinear_hw(feats, py + taps[:, 0], px + taps[:, 1])  # (K*K, dim)
        off = patch.reshape(-1) @ p["sddh_off"]["w"] + p["sddh_off"]["b"]
        off = off.reshape(M, 2)  # (dy, dx), zero-init => samples at kp
        samples = _bilinear_hw(feats, py + off[:, 0], px + off[:, 1])  # (M, dim)
        d = jnp.einsum("md,mde->e", samples, p["sddh_proj"]["w"])
        d = _gate(d) @ p["sddh_out"]["w"] + p["sddh_out"]["b"]
        return d / (jnp.linalg.norm(d) + 1e-8)

    return jax.vmap(one)(xy)


def _softargmax_refine(scores: jax.Array, xy: jax.Array, radius: int = 2):
    """DKD sub-pixel refinement: soft-argmax over the (2r+1)^2 neighbourhood
    of each detected peak on the raw score map."""
    H, W = scores.shape
    t = jnp.arange(-radius, radius + 1, dtype=scores.dtype)
    dy, dx = jnp.meshgrid(t, t, indexing="ij")

    def one(kp):
        y = kp[1].astype(jnp.int32)
        x = kp[0].astype(jnp.int32)
        yy = jnp.clip(y + dy.astype(jnp.int32), 0, H - 1)
        xx = jnp.clip(x + dx.astype(jnp.int32), 0, W - 1)
        w = jax.nn.softmax(scores[yy, xx].reshape(-1) * 10.0)
        return kp + jnp.stack(
            [jnp.sum(w * dx.reshape(-1)), jnp.sum(w * dy.reshape(-1))]
        )

    return jax.vmap(one)(xy)


@functools.partial(jax.jit, static_argnums=(2, 3))
def aliked_keypoints(
    p, image: jax.Array, max_pts: int = 2048,
    cfg: ALIKEDConfig = ALIKEDConfig(),
):
    """image (H, W, 3) in [0,1] -> (xy (N,2), score (N,), desc (N,D)) with
    static N = max_pts (padded entries have score 0) — the full ALIKED
    pipeline: dense score/feature maps, NMS + top-k detection, sub-pixel
    refinement, sparse deformable descriptors at the keypoints only.
    """
    from .extractors import simple_nms

    H, W, _ = image.shape
    Hp = -(-H // 32) * 32
    Wp = -(-W // 32) * 32
    img = jnp.zeros((Hp, Wp, 3), image.dtype).at[:H, :W].set(image)
    scores, feats = aliked_dense(p, img[None], cfg)
    scores, feats = scores[0], feats[0]

    nmsed = simple_nms(scores[None], cfg.nms_radius)[0]
    b = cfg.border
    mask = jnp.zeros((Hp, Wp), bool).at[b : H - b, b : W - b].set(True)
    nmsed = jnp.where(mask & (nmsed > cfg.detection_threshold), nmsed, 0.0)
    vals, idx = jax.lax.top_k(nmsed.reshape(-1), max_pts)
    xy = jnp.stack([idx % Wp, idx // Wp], axis=-1).astype(jnp.float32)
    xy = _softargmax_refine(scores, xy)
    desc = sddh_descriptors(p, feats, xy, cfg)
    return xy, vals, desc
