"""Held-out validation + early stopping for the trainer.

The round-4 test-time-adaptation study (``TRAIN_EVAL_r04.json``) measured
that per-scene self-supervised fine-tuning OVERFITS: the tiny-scale held-out
pose error bottoms out at step 225 of 900 and then drifts back up. The
reference has no validation loop at all (``/root/reference/train/
train_imc.py`` trains for a fixed step count and keeps the last weights), so
a user running per-scene adaptation gets the overfit endpoint. This module
productizes the fix:

- ``--eval-every N --eval-data-root DIR`` runs a *self-supervised* validation
  every N steps: feed-forward poses on held-out scenes, then the mean
  reprojection residual of their correspondences (the same measurement the
  loss optimizes, on data the loss never sees — no GT poses needed, matching
  the reference's no-GT training contract);
- ``--eval-heldout-from K`` restricts the metric to correspondence pairs
  touching frame index >= K. For the TTA protocol (fine-tune on a scene's
  first K frames, hold out the rest) point ``--eval-data-root`` at the FULL
  scene and the metric reads only the held-out part;
- the best validation score tracks a best-checkpoint directory
  (``checkpoints_best/``, orbax, max_to_keep=1);
- ``--early-stop-patience P`` stops training after P consecutive validations
  without improvement (``--eval-min-delta`` sets the required relative gain).

Determinism: scenes load once with a fixed rng and every validation forward
uses the same subsample key, so scores are comparable across steps and
identical across processes (each process computes the same decision — no
cross-process broadcast needed for the stop signal).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models import sailrecon as M
from .loop import TrainConfig, _BATCH_KEYS
from .loss import _masked_mean, scene_residuals


@dataclass(frozen=True)
class EvalConfig:
    data_root: str = ""
    every: int = 0  # steps between validations (0 disables)
    num_images: int = 8  # frames per eval-scene forward
    sample_num: int = 2048  # correspondence samples per pair
    heldout_from: int = 0  # only pairs touching frame >= K count (0: all)
    patience: int = 0  # validations without improvement before stop (0: off)
    min_delta: float = 0.0  # relative improvement required to reset patience

    @property
    def enabled(self) -> bool:
        return bool(self.every) and bool(self.data_root)


class BestTracker:
    """Tracks the best validation metric and the early-stop decision."""

    def __init__(self, patience: int, min_delta: float):
        self.patience = patience
        self.min_delta = min_delta
        self.best = float("inf")
        self.best_step = -1
        self.stale = 0

    def update(self, step: int, metric: float) -> tuple[bool, bool]:
        """Returns (improved, should_stop)."""
        # first measurement always counts (inf * negative factor is -inf,
        # which no finite metric beats when min_delta > 1)
        improved = (self.best_step < 0
                    or metric < self.best * (1.0 - self.min_delta))
        if improved:
            self.best = metric
            self.best_step = step
            self.stale = 0
        else:
            self.stale += 1
        should_stop = bool(self.patience) and self.stale >= self.patience
        return improved, should_stop

    def summary(self) -> dict:
        return {"best_val_px_residual": self.best, "best_step": self.best_step}


def make_validator(model_cfg: M.SailReconConfig, train_cfg: TrainConfig,
                   ecfg: EvalConfig, img_size: int):
    """Loads the eval scenes once and returns ``validate(params) -> dict``.

    The forward + metric run in ONE jit (through the remote-TPU tunnel a
    fetch-then-recompute round trip costs ~30 ms per dispatch); only the two
    scalar means come back to the host.
    """
    from ..data.imc2021 import IMC2021Scenes, stack_scenes

    ds = IMC2021Scenes(
        ecfg.data_root, sample_num=ecfg.sample_num,
        num_images=ecfg.num_images, target_size=img_size, use_native=False,
    )
    rng = np.random.default_rng(0)  # fixed: same frames/samples every call
    scenes = [ds.load_scene(i, rng) for i in range(len(ds))]
    batch = stack_scenes(scenes)
    images = jnp.asarray(batch["images"])  # (B, S, H, W, 3)
    scene_keys = {k: jnp.asarray(batch[k]) for k in _BATCH_KEYS
                  if k != "images"}
    ekey = jax.random.PRNGKey(0x5EED)

    def _metric(params, images, scene_keys):
        S = images.shape[1]
        dup = jnp.concatenate([images, images], axis=1)
        preds = M.forward(
            params, model_cfg, dup, num_anchor=S, num_query=S,
            rank=train_cfg.rank, subsample_key=ekey, images_duplicated=True,
        )

        def one(ext, intr, scene):
            r = scene_residuals(ext, intr, scene, train_cfg.loss)
            w = r["weights"]
            if ecfg.heldout_from > 0:
                touch = (r["src_idx"] >= ecfg.heldout_from) | (
                    r["dst_idx"] >= ecfg.heldout_from)
                w = w * touch[:, None].astype(w.dtype)
            return (_masked_mean(r["residuals"], w),
                    _masked_mean(r["res_log"], w))

        px, lg = jax.vmap(one)(
            preds["extrinsic"], preds["intrinsic"], scene_keys)
        return {"px_residual": jnp.mean(px), "log_residual": jnp.mean(lg)}

    fn = jax.jit(_metric)

    def validate(params) -> dict:
        out = jax.device_get(fn(params, images, scene_keys))
        return {k: float(v) for k, v in out.items()}

    return validate
