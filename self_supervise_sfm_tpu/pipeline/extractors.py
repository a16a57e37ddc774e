"""Keypoint extractor zoo: SuperPoint (learned) + DoG/SIFT-style + Shi-Tomasi.

The reference builds its extractor zoo from CUDA-backed lightglue models
(ALIKED / SuperPoint / SIFT, ``sailrecon/dependency/vggsfm_utils.py:205-250``)
and unions their detections (``:253-278``). Here the zoo is TPU-native:

- ``superpoint_*``: the SuperPoint architecture in JAX (VGG encoder +
  65-way cell detector head + 256-d descriptor head, maxpool NMS), with a
  torch state-dict converter for the public weights — jittable end to end,
  static-shape top-k.
- ``dog_keypoints``: a scale-space Difference-of-Gaussians detector
  (the SIFT detector stage) with contrast + edge-response gating.
- Shi-Tomasi corners (``tracking.extract_keypoints``) as the dependency-free
  default.

- ``aliked`` (``pipeline/aliked.py``): the ALIKED deformable
  detector+descriptor, with DCN lowered to offset-conv + gather-based
  bilinear sampling (no custom op needed on TPU).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# SuperPoint
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SuperPointConfig:
    descriptor_dim: int = 256
    nms_radius: int = 4
    detection_threshold: float = 0.0005
    remove_borders: int = 4


_ENC = (
    ("conv1a", 1, 64), ("conv1b", 64, 64),
    ("conv2a", 64, 64), ("conv2b", 64, 64),
    ("conv3a", 64, 128), ("conv3b", 128, 128),
    ("conv4a", 128, 128), ("conv4b", 128, 128),
)


def init_superpoint(key, cfg: SuperPointConfig = SuperPointConfig()):
    def conv(k, cin, cout, ksize):
        w = jax.random.normal(k, (ksize, ksize, cin, cout)) * (
            2.0 / (ksize * ksize * cin)
        ) ** 0.5
        return {"w": w, "b": jnp.zeros((cout,))}

    keys = jax.random.split(key, len(_ENC) + 4)
    p = {
        name: conv(keys[i], cin, cout, 3)
        for i, (name, cin, cout) in enumerate(_ENC)
    }
    n = len(_ENC)
    p["convPa"] = conv(keys[n], 128, 256, 3)
    p["convPb"] = conv(keys[n + 1], 256, 65, 1)
    p["convDa"] = conv(keys[n + 2], 128, 256, 3)
    p["convDb"] = conv(keys[n + 3], 256, cfg.descriptor_dim, 1)
    return p


def _conv(p, x, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def _pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def superpoint_dense(p, images: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """images (B, H, W) grayscale in [0,1] -> (scores (B,H,W), desc (B,H/8,W/8,D)).

    The SuperPoint forward: VGG encoder, 65-channel cell softmax with dustbin
    drop, pixel-shuffle to full resolution; descriptor head L2-normalised.
    """
    x = images[..., None]
    relu = jax.nn.relu
    x = relu(_conv(p["conv1a"], x))
    x = relu(_conv(p["conv1b"], x))
    x = _pool(x)
    x = relu(_conv(p["conv2a"], x))
    x = relu(_conv(p["conv2b"], x))
    x = _pool(x)
    x = relu(_conv(p["conv3a"], x))
    x = relu(_conv(p["conv3b"], x))
    x = _pool(x)
    x = relu(_conv(p["conv4a"], x))
    feat = relu(_conv(p["conv4b"], x))

    cPa = relu(_conv(p["convPa"], feat))
    logits = _conv(p["convPb"], cPa)  # (B, H/8, W/8, 65)
    probs = jax.nn.softmax(logits, axis=-1)[..., :64]  # drop dustbin
    B, Hc, Wc, _ = probs.shape
    scores = probs.reshape(B, Hc, Wc, 8, 8).transpose(0, 1, 3, 2, 4)
    scores = scores.reshape(B, Hc * 8, Wc * 8)

    cDa = relu(_conv(p["convDa"], feat))
    desc = _conv(p["convDb"], cDa)
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
    return scores, desc


def simple_nms(scores: jax.Array, radius: int, iters: int = 2) -> jax.Array:
    """lightglue's iterated maxpool NMS: keep pixels that are the local max."""

    def maxpool(x):
        k = 2 * radius + 1
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1), "SAME"
        )

    zeros = jnp.zeros_like(scores)
    max_mask = scores == maxpool(scores)
    for _ in range(iters):
        supp = maxpool(jnp.where(max_mask, scores, zeros)) > scores
        supp_scores = jnp.where(supp, zeros, scores)
        new_max = supp_scores == maxpool(supp_scores)
        max_mask = max_mask | (new_max & (~supp))
    return jnp.where(max_mask, scores, zeros)


@functools.partial(jax.jit, static_argnums=(2, 3))
def superpoint_keypoints(
    p, image: jax.Array, max_pts: int = 2048,
    cfg: SuperPointConfig = SuperPointConfig(),
):
    """image (H, W) or (H, W, 3) in [0,1] -> (xy (N,2) f32, score (N,), desc (N,D)).

    Static output shapes (N = max_pts, padded entries have score 0) — the
    jit-friendly form of lightglue's dynamic top-k.
    """
    if image.ndim == 3:
        image = image @ jnp.asarray([0.299, 0.587, 0.114], image.dtype)
    H, W = image.shape
    # the VGG encoder's 8x downsampling floors non-multiple-of-8 dims (e.g.
    # the standard 518px frames): zero-pad up, crop the score map back
    H8, W8 = -(-H // 8) * 8, -(-W // 8) * 8
    padded = image
    if (H8, W8) != (H, W):
        padded = jnp.pad(image, ((0, H8 - H), (0, W8 - W)))
    scores, desc = superpoint_dense(p, padded[None])
    scores = simple_nms(scores, cfg.nms_radius)[0, :H, :W]
    b = cfg.remove_borders
    mask = jnp.zeros((H, W), bool).at[b:-b, b:-b].set(True)
    scores = jnp.where(mask & (scores > cfg.detection_threshold), scores, 0.0)
    flat = scores.reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_pts)
    ys = idx // W
    xs = idx % W
    xy = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
    # bilinear descriptor sampling on the H/8 grid (lightglue samples with
    # align_corners=False on the cell grid)
    gx = (xy[:, 0] + 0.5) / 8.0 - 0.5
    gy = (xy[:, 1] + 0.5) / 8.0 - 0.5
    d = _bilinear(desc[0], gx, gy)
    d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)
    return xy, vals, d


def _bilinear(grid: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """grid (H, W, C), x/y (N,) continuous coords -> (N, C)."""
    H, W, _ = grid.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = jnp.clip(x - x0, 0.0, 1.0)[:, None]
    wy = jnp.clip(y - y0, 0.0, 1.0)[:, None]
    return (
        grid[y0, x0] * (1 - wx) * (1 - wy)
        + grid[y0, x1] * wx * (1 - wy)
        + grid[y1, x0] * (1 - wx) * wy
        + grid[y1, x1] * wx * wy
    )


def convert_torch_superpoint(state_dict) -> dict:
    """Map the public SuperPoint torch weights (magicleap / lightglue layout:
    ``conv1a.weight`` (out,in,kh,kw)) onto the JAX param tree (HWIO)."""
    import numpy as np

    def cv(name):
        w = np.asarray(state_dict[f"{name}.weight"], np.float32)
        b = np.asarray(state_dict[f"{name}.bias"], np.float32)
        return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}

    names = [n for n, _, _ in _ENC] + ["convPa", "convPb", "convDa", "convDb"]
    return {n: cv(n) for n in names}


# ---------------------------------------------------------------------------
# DoG (SIFT detector stage)
# ---------------------------------------------------------------------------


def _gaussian_blur(img: jax.Array, sigma: float) -> jax.Array:
    r = max(int(3.0 * sigma + 0.5), 1)
    t = jnp.arange(-r, r + 1, dtype=img.dtype)
    k = jnp.exp(-0.5 * (t / sigma) ** 2)
    k = k / k.sum()
    x = img[None, ..., None]
    x = jax.lax.conv_general_dilated(
        x, k[:, None, None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = jax.lax.conv_general_dilated(
        x, k[None, :, None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return x[0, ..., 0]


def dog_keypoints(
    image: jax.Array,
    max_pts: int = 2048,
    num_scales: int = 3,
    sigma0: float = 1.6,
    contrast_threshold: float = 0.015,
    edge_ratio: float = 10.0,
    border: int = 8,
):
    """Difference-of-Gaussians scale-space extrema (the SIFT detector,
    single octave over the input resolution): (xy (N,2), score (N,)).

    3x3x3 extremum test across (x, y, scale), contrast gate |D| > thr, and
    the Hessian edge-response test tr^2/det < (r+1)^2/r.
    """
    if image.ndim == 3:
        image = image @ jnp.asarray([0.299, 0.587, 0.114], image.dtype)
    H, W = image.shape
    k = 2.0 ** (1.0 / num_scales)
    sigmas = [sigma0 * k**i for i in range(num_scales + 3)]
    gauss = jnp.stack([_gaussian_blur(image, s) for s in sigmas])
    dog = gauss[1:] - gauss[:-1]  # (num_scales+2, H, W)

    def maxpool3(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME"
        )

    absd = jnp.abs(dog)
    is_ext = (absd >= maxpool3(absd)) & (absd > contrast_threshold)
    # edge rejection on the middle scales via the 2x2 spatial Hessian
    dxx = jnp.roll(dog, -1, 2) + jnp.roll(dog, 1, 2) - 2 * dog
    dyy = jnp.roll(dog, -1, 1) + jnp.roll(dog, 1, 1) - 2 * dog
    dxy = (
        jnp.roll(jnp.roll(dog, -1, 1), -1, 2)
        - jnp.roll(jnp.roll(dog, -1, 1), 1, 2)
        - jnp.roll(jnp.roll(dog, 1, 1), -1, 2)
        + jnp.roll(jnp.roll(dog, 1, 1), 1, 2)
    ) / 4.0
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_ratio
    edge_ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)
    score = jnp.where(is_ext & edge_ok, absd, 0.0)
    score = score[1:-1].max(0)  # collapse scales
    mask = jnp.zeros((H, W), bool).at[border:-border, border:-border].set(True)
    score = jnp.where(mask, score, 0.0)
    vals, idx = jax.lax.top_k(score.reshape(-1), max_pts)
    xy = jnp.stack([idx % W, idx // W], axis=-1).astype(jnp.float32)
    return xy, vals


# ---------------------------------------------------------------------------
# zoo (vggsfm_utils.initialize_feature_extractors / extract_keypoints)
# ---------------------------------------------------------------------------


def initialize_feature_extractors(
    methods: str = "shi_tomasi",
    max_pts: int = 2048,
    superpoint_params: Optional[dict] = None,
) -> Dict[str, callable]:
    """'+'-separated extractor spec -> {name: image -> (N,2) xy} callables
    (``vggsfm_utils.py:205-250``). Supported: shi_tomasi, superpoint, dog."""
    from .tracking import extract_keypoints as shi_tomasi

    zoo: Dict[str, callable] = {}
    for m in methods.split("+"):
        m = m.strip().lower()
        if m in ("shi_tomasi", "shitomasi"):
            zoo[m] = lambda img: shi_tomasi(np.asarray(img), max_pts=max_pts)
        elif m == "superpoint":
            p = superpoint_params
            if p is None:
                p = init_superpoint(jax.random.PRNGKey(0))
            def sp(img, _p=p):
                xy, s, _ = superpoint_keypoints(_p, jnp.asarray(img), max_pts)
                return np.asarray(xy)[np.asarray(s) > 0]
            zoo[m] = sp
        elif m in ("dog", "sift"):
            def dg(img):
                xy, s = dog_keypoints(jnp.asarray(img), max_pts)
                return np.asarray(xy)[np.asarray(s) > 0]
            zoo[m] = dg
        elif m == "aliked":
            from . import aliked as A

            ap = A.init_aliked(jax.random.PRNGKey(0))
            def ak(img, _p=ap):
                img = jnp.asarray(img, jnp.float32)
                if img.ndim == 2:
                    img = jnp.repeat(img[..., None], 3, axis=-1)
                xy, s, _ = A.aliked_keypoints(_p, img, max_pts)
                return np.asarray(xy)[np.asarray(s) > 0]
            zoo[m] = ak
        else:
            raise ValueError(f"unknown extractor: {m}")
    return zoo


def extract_keypoints_union(
    image, extractors: Dict[str, callable], round_xy: bool = True
) -> np.ndarray:
    """Union of all extractors' detections with de-dup on integer pixels
    (``vggsfm_utils.py:253-278``)."""
    pts = []
    for fn in extractors.values():
        xy = np.asarray(fn(image), np.float32).reshape(-1, 2)
        pts.append(xy)
    xy = np.concatenate(pts, axis=0) if pts else np.zeros((0, 2), np.float32)
    if round_xy and len(xy):
        _, keep = np.unique(np.round(xy).astype(np.int64), axis=0, return_index=True)
        xy = xy[np.sort(keep)]
    return xy
