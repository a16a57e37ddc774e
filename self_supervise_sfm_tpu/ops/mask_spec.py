"""Structured attention-mask specifications.

The aggregator's masks are block-structured (SURVEY §2.2): query tokens see
[the whole compressed scene context ‖ their own frame]. Passing them around
as dense (Nq, Nk) boolean arrays costs O(N^2) HBM and blocks kernel-level
skipping, so masks are described symbolically and materialised only by the
dense attention path; the Pallas flash kernel evaluates them functionally
per tile and skips fully-masked tiles.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class RelocMask:
    """KV axis = [n_ctx context tokens ‖ num_frames * frame_size query tokens].

    Query row r (frame r // frame_size) attends every context token and its
    own frame's tokens only (``aggregator.py:832-851`` expanded to tokens).
    """

    n_ctx: int
    frame_size: int
    num_frames: int

    @property
    def nq(self) -> int:
        return self.num_frames * self.frame_size

    @property
    def nk(self) -> int:
        return self.n_ctx + self.nq

    def materialize(self) -> jnp.ndarray:
        """Dense (1, 1, Nq, Nk) allow-mask for the XLA attention path."""
        q_frame = jnp.arange(self.nq) // self.frame_size
        qq = q_frame[:, None] == q_frame[None, :]
        ctx = jnp.ones((self.nq, self.n_ctx), bool)
        return jnp.concatenate([ctx, qq], axis=1)[None, None]

    def allowed(self, q_idx, k_idx):
        """Elementwise allow predicate on global (row, col) indices."""
        same_frame = (k_idx - self.n_ctx) // self.frame_size == (
            q_idx // self.frame_size
        )
        return (k_idx < self.n_ctx) | ((k_idx >= self.n_ctx) & same_frame)

    def block_visible(self, q0, q1, k0, k1):
        """Whether tile [q0,q1) x [k0,k1) contains ANY allowed entry."""
        ctx_hit = k0 < self.n_ctx
        fq0 = q0 // self.frame_size
        fq1 = (q1 - 1) // self.frame_size
        fk0 = (k0 - self.n_ctx) // self.frame_size
        fk1 = (k1 - 1 - self.n_ctx) // self.frame_size
        overlap = (fk0 <= fq1) & (fq0 <= fk1) & (k1 > self.n_ctx)
        return ctx_hit | overlap
