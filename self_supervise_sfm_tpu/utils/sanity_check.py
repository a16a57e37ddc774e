"""In-training geometric self-audit.

Re-design of ``train/utils/sanity_check.py`` (sanity_check_relative_poses):
pick a random correspondence pair, recover the predicted intrinsics to
original image space, reproject the sampled correspondences with the
predicted relative pose + measured depth, and report the mean pixel offset —
a live geometric consistency diagnostic (run every step at
``train_imc.py:371`` in the reference; optional/interval-based here since it
is a host sync point).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from ..ops import geometry as G


def sanity_check_relative_poses(
    extrinsic: np.ndarray,  # (S, 3, 4) predicted (processed space)
    intrinsic: np.ndarray,  # (S, 3, 3) predicted (processed space)
    scene: Dict[str, Any],  # un-batched numpy scene dict
    pair: Optional[int] = None,
    save_path: Optional[str] = None,
    rng: Optional[np.random.Generator] = None,
) -> Dict[str, float]:
    """Returns {mean_px_offset, median_px_offset, pair} for one pair."""
    import jax.numpy as jnp

    rng = rng or np.random.default_rng()
    valid = np.flatnonzero(scene["pair_valid"] > 0)
    if len(valid) == 0:
        return {"mean_px_offset": float("nan"), "median_px_offset": float("nan"), "pair": -1}
    p = int(pair if pair is not None else rng.choice(valid))

    si, di = int(scene["src_idx"][p]), int(scene["dst_idx"][p])
    recovered_K = scene["K_prime_to_K"] @ np.asarray(intrinsic)
    rel = G.relative_pose(
        jnp.asarray(extrinsic[si : si + 1]), jnp.asarray(extrinsic[di : di + 1])
    )
    ones = jnp.ones((1, 1), jnp.float32)
    pred_dst, _ = G.backproject_and_reproject(
        jnp.asarray(scene["src_coords"][p : p + 1]),
        jnp.asarray(scene["src_depth"][p : p + 1]),
        jnp.asarray(recovered_K[si : si + 1]),
        jnp.asarray(recovered_K[di : di + 1]),
        rel,
        ones,
    )
    offsets = np.asarray(
        G.compute_projective_residual(
            pred_dst, jnp.asarray(scene["dst_coords"][p : p + 1])
        )
    )[0]

    if save_path is not None and "images" in scene:
        from .vls import correspondence_overlay

        correspondence_overlay(
            scene["images"][si],
            scene["images"][di],
            scene["src_coords"][p],
            scene["dst_coords"][p],
            np.asarray(pred_dst)[0],
            save_path=save_path,
        )

    return {
        "mean_px_offset": float(offsets.mean()),
        "median_px_offset": float(np.median(offsets)),
        "pair": p,
    }
