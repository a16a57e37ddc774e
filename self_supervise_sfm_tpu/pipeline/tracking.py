"""Track prediction pipeline: query-frame selection, keypoints, tracking, BA.

Re-design of ``sailrecon/dependency/track_predict.py`` + ``vggsfm_utils.py``.
Key architectural difference: the reference pulls in an *external* VGGSfM
CNN tracker plus lightglue keypoint extractors (ALIKED/SuperPoint/SIFT,
``vggsfm_utils.py:205-250``); here the model's own TrackHead supplies the
tracker (its DPT features come from the same aggregator pass), query-frame
ranking reuses the in-framework DINOv2 (no torch.hub download,
``vggsfm_utils.py:53-128``), and keypoints come from a Shi-Tomasi-style
corner response with grid NMS — everything jnp/numpy, no torch.

End-to-end: ``tracks_to_reconstruction`` triangulates the tracked
correspondences against predicted poses and hands off to the bundle adjuster
(``ops/bundle_adjust`` on-device or the native C++ engine), replacing the
pycolmap BA bridge.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..layers.vit import ViTConfig, vit_forward
from ..ops import geometry as G


# -- query frame ranking (DINO CLS similarity + FPS) --------------------------


def rank_frames_by_dino(
    vit_params, vit_cfg: ViTConfig, images: jax.Array, query_frame_num: int
) -> List[int]:
    """images (S, H, W, 3) in [0,1] -> ranked representative frame indices.

    Mirrors ``generate_rank_by_dino`` (``vggsfm_utils.py:53-128``) using the
    in-framework DINOv2 CLS tokens: cosine-similarity matrix, most-central
    frame first, then farthest-point sampling.
    """
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    x = (images - mean) / std
    feats = vit_forward(vit_params, x, vit_cfg)["x_norm_clstoken"]  # (S, D)
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    sim = np.asarray(feats @ feats.T)
    dist = np.clip(100.0 - sim, 0, None)
    np.fill_diagonal(sim, -100.0)
    start = int(np.argmax(sim.sum(axis=1)))
    return farthest_point_sampling(dist, query_frame_num, start)


def farthest_point_sampling(
    distance_matrix: np.ndarray, num_samples: int, start_index: int = 0
) -> List[int]:
    """``vggsfm_utils.py:131-163`` — numpy."""
    dm = np.clip(np.asarray(distance_matrix, np.float64), 0, None)
    N = dm.shape[0]
    selected = [start_index]
    check = dm[start_index].copy()
    check[selected] = 0
    while len(selected) < min(num_samples, N):
        far = int(np.argmax(check))
        selected.append(far)
        check = dm[far].copy()
        check[selected] = 0
    return selected


# -- keypoint extraction (Shi-Tomasi corner response + grid NMS) --------------


def extract_keypoints(
    image: np.ndarray,  # (H, W, 3) in [0,1]
    max_pts: int = 2048,
    nms_radius: int = 4,
    border: int = 8,
) -> np.ndarray:
    """Corner keypoints (N, 2) xy. Replaces the lightglue extractor zoo —
    the learned tracker only needs well-distributed, textured query points."""
    img = np.asarray(image, np.float32)
    gray = img.mean(-1) if img.ndim == 3 else img
    H, W = gray.shape
    gx = np.zeros_like(gray)
    gy = np.zeros_like(gray)
    gx[:, 1:-1] = (gray[:, 2:] - gray[:, :-2]) / 2
    gy[1:-1] = (gray[2:] - gray[:-2]) / 2

    def box(x, r=2):
        k = 2 * r + 1
        c = np.cumsum(np.cumsum(np.pad(x, ((r + 1, r), (r + 1, r))), 0), 1)
        return (
            c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]
        ) / (k * k)

    Ixx, Iyy, Ixy = box(gx * gx), box(gy * gy), box(gx * gy)
    # Shi-Tomasi min eigenvalue
    tr = Ixx + Iyy
    det = Ixx * Iyy - Ixy * Ixy
    disc = np.sqrt(np.maximum(tr * tr / 4 - det, 0))
    response = tr / 2 - disc
    response[:border] = response[-border:] = 0
    response[:, :border] = response[:, -border:] = 0

    # grid NMS: keep the max per (2r+1) cell
    r = nms_radius
    gh, gw = H // (2 * r + 1), W // (2 * r + 1)
    ys, xs, scores = [], [], []
    cells = response[: gh * (2 * r + 1), : gw * (2 * r + 1)].reshape(
        gh, 2 * r + 1, gw, 2 * r + 1
    ).transpose(0, 2, 1, 3).reshape(gh, gw, -1)
    best = cells.argmax(-1)
    score = cells.max(-1)
    cy = best // (2 * r + 1) + np.arange(gh)[:, None] * (2 * r + 1)
    cx = best % (2 * r + 1) + np.arange(gw)[None, :] * (2 * r + 1)
    order = np.argsort(score.ravel())[::-1][:max_pts]
    pts = np.stack([cx.ravel()[order], cy.ravel()[order]], axis=-1)
    keep = score.ravel()[order] > 1e-6
    return pts[keep].astype(np.float32)


# -- end-to-end track prediction ---------------------------------------------


def predict_tracks(
    tracker_params,
    images: np.ndarray,  # (S, H, W, 3) in [0, 1], one scene
    query_frame_indexes: Optional[List[int]] = None,
    query_frame_num: int = 3,
    max_query_pts: int = 2048,
    max_points_per_chunk: int = 1024,
    extractor_methods: str = "shi_tomasi",
    superpoint_params=None,
    fine_tracking: bool = True,
    augment_min_vis_frac: float = 0.3,
    max_augment_frames: int = 2,
    vit_params=None,
    vit_cfg=None,
    tracker_cfg=None,
):
    """End-to-end track generation (``dependency/track_predict.py:13-141``):

    1. pick representative query frames — caller-supplied, or DINO CLS
       ranking + farthest-point sampling when vit params are given, else
       uniform (``generate_rank_by_dino``, ``vggsfm_utils.py:53-128``);
    2. per query frame: reorder so the query leads, extract keypoints via the
       extractor zoo union, track them through every frame in fixed-size
       chunks (``_forward_on_query``, ``vggsfm_utils.py:281-341``);
    3. re-track frames whose mean visibility is poor, with them as the query
       (``_augment_non_visible_frames``, ``track_predict.py:253-349``).

    Returns (tracks (S, N, 2), visibility (S, N), query_points (N, 2 in the
    ORIGINAL frame order's coordinates)).
    """
    from .vggsfm_tracker import VGGSfMTrackerConfig, track as run_tracker
    from .extractors import initialize_feature_extractors, extract_keypoints_union

    S = images.shape[0]
    cfg = tracker_cfg or VGGSfMTrackerConfig()
    zoo = initialize_feature_extractors(
        extractor_methods, max_pts=max_query_pts, superpoint_params=superpoint_params
    )

    if query_frame_indexes is None:
        if vit_params is not None and vit_cfg is not None:
            query_frame_indexes = rank_frames_by_dino(
                vit_params, vit_cfg, jnp.asarray(images), query_frame_num
            )
        else:
            query_frame_indexes = list(
                np.linspace(0, S - 1, query_frame_num).astype(int)
            )

    def forward_on_query(qidx: int):
        order = [qidx] + [i for i in range(S) if i != qidx]
        inv = np.argsort(order)
        imgs = jnp.asarray(images[order])[None]  # (1, S, H, W, 3)
        xy = extract_keypoints_union(images[qidx], zoo)[:max_query_pts]
        if len(xy) == 0:
            return None
        tr_chunks, vis_chunks = [], []
        for lo in range(0, len(xy), max_points_per_chunk):
            q = jnp.asarray(xy[lo : lo + max_points_per_chunk])[None]
            fine, _, vis = run_tracker(
                tracker_params, imgs, q, cfg, fine_tracking=fine_tracking
            )
            tr_chunks.append(np.asarray(fine[0]))
            vis_chunks.append(np.asarray(vis[0]))
        tr = np.concatenate(tr_chunks, axis=1)[inv]  # back to original order
        vis = np.concatenate(vis_chunks, axis=1)[inv]
        return tr, vis, xy

    outs = [o for o in (forward_on_query(q) for q in query_frame_indexes) if o]
    if not outs:
        return None
    tracks = np.concatenate([o[0] for o in outs], axis=1)
    vis = np.concatenate([o[1] for o in outs], axis=1)
    qpts = np.concatenate([o[2] for o in outs], axis=0)

    # augment: frames that too few tracks see become query frames themselves
    seen = set(query_frame_indexes)
    frame_vis = (vis > 0.5).mean(axis=1)  # (S,)
    bad = [
        i for i in np.argsort(frame_vis)
        if frame_vis[i] < augment_min_vis_frac and i not in seen
    ][:max_augment_frames]
    for b in bad:
        o = forward_on_query(int(b))
        if o is not None:
            tracks = np.concatenate([tracks, o[0]], axis=1)
            vis = np.concatenate([vis, o[1]], axis=1)
            qpts = np.concatenate([qpts, o[2]], axis=0)
    return tracks, vis, qpts


# -- track -> reconstruction --------------------------------------------------


def triangulate_tracks(
    tracks: np.ndarray,  # (S, N, 2)
    vis: np.ndarray,  # (S, N) bool/float
    extrinsics: np.ndarray,  # (S, 3, 4)
    intrinsics: np.ndarray,  # (S, 3, 3)
) -> np.ndarray:
    """Linear (DLT) multi-view triangulation per track -> (N, 3)."""
    S, N, _ = tracks.shape
    Ps = np.einsum("sij,sjk->sik", intrinsics, extrinsics)  # (S, 3, 4)
    vis = vis > 0.5 if vis.dtype != bool else vis
    pts = np.zeros((N, 3), np.float64)
    for n in range(N):
        rows = []
        for s in range(S):
            if not vis[s, n]:
                continue
            x, y = tracks[s, n]
            rows.append(x * Ps[s, 2] - Ps[s, 0])
            rows.append(y * Ps[s, 2] - Ps[s, 1])
        if len(rows) < 4:
            continue
        A = np.stack(rows)
        _, _, Vt = np.linalg.svd(A, full_matrices=False)
        X = Vt[-1]
        pts[n] = X[:3] / (X[3] if abs(X[3]) > 1e-12 else 1e-12)
    return pts.astype(np.float32)


def tracks_to_reconstruction(
    tracks: np.ndarray,  # (S, N, 2)
    vis: np.ndarray,  # (S, N)
    extrinsics: np.ndarray,  # (S, 3, 4) initial (e.g. model-predicted)
    intrinsics: np.ndarray,  # (S, 3, 3)
    image_size: Tuple[int, int],
    max_reproj_error: float = 8.0,
    run_ba: bool = True,
    use_native_ba: bool = False,
    ba_num_shards: int = 1,
    colors: Optional[np.ndarray] = None,
):
    """Tracked correspondences + initial poses -> bundle-adjusted
    Reconstruction (the ``predict_tracks -> pycolmap BA`` hand-off,
    ``track_predict.py:13-141`` + ``np_to_pycolmap.py``)."""
    from ..utils import colmap_io as CIO

    points3d = triangulate_tracks(tracks, vis, extrinsics, intrinsics)
    masks = (vis > 0.5) & np.isfinite(points3d).all(-1)[None] & (
        np.abs(points3d).sum(-1) > 0
    )[None]
    rec, valid = CIO.batch_matrix_to_reconstruction(
        points3d, None, tracks, masks, extrinsics, intrinsics,
        image_size=image_size, max_reproj_error=max_reproj_error, colors=colors,
    )
    if rec is None:
        return None
    if run_ba:
        if use_native_ba:
            from ..native import ba as NBA

            pts, exts, Ks = CIO.reconstruction_to_batch_matrix(rec)
            pids = sorted(rec.points3d.keys())
            iids = sorted(rec.images.keys())
            pid_to_idx = {p: i for i, p in enumerate(pids)}
            iid_to_idx = {p: i for i, p in enumerate(iids)}
            ci, pi, uv = [], [], []
            for pid in pids:
                for iid, oi in rec.points3d[pid].track:
                    ci.append(iid_to_idx[iid])
                    pi.append(pid_to_idx[pid])
                    uv.append(rec.images[iid].xys[oi])
            if ba_num_shards > 1:
                # point-partitioned multi-worker engine (SURVEY §7.1 step 10)
                new_ext, new_pts, _ = NBA.ba_solve_distributed(
                    exts.astype(np.float32), Ks.astype(np.float32),
                    pts.astype(np.float32),
                    np.asarray(ci), np.asarray(pi), np.asarray(uv, np.float64),
                    num_shards=ba_num_shards, huber_delta=4.0,
                )
            else:
                new_ext, new_pts, _ = NBA.ba_solve(
                    exts.astype(np.float32), Ks.astype(np.float32),
                    pts.astype(np.float32),
                    np.asarray(ci), np.asarray(pi), np.asarray(uv, np.float64),
                    huber_delta=4.0,
                )
            for i, iid in enumerate(iids):
                rec.images[iid].qvec_wxyz = CIO._mat_to_qvec_wxyz(new_ext[i, :3, :3])
                rec.images[iid].tvec = new_ext[i, :3, 3].astype(np.float64)
            for i, pid in enumerate(pids):
                rec.points3d[pid].xyz = new_pts[i].astype(np.float64)
        else:
            from ..ops.bundle_adjust import BAConfig

            CIO.refine(rec, BAConfig(max_iters=20, huber_delta=4.0))
    return rec
