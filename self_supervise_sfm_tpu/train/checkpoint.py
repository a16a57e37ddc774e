"""Orbax checkpointing: full train state, async save, deterministic resume.

The reference saves model weights only with no resume path
(``train/train_imc.py:272-286``) and explicitly notes (but never implements)
that the subsampling RNG must be saved for exact resume
(``aggregator.py:629-631``). Here the entire state — params, optimizer state,
step counter, PRNG key — round-trips through orbax.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: Any):
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
