"""Device mesh + sharding strategy.

The reference's only parallelism is single-node DDP data parallel over NCCL
(``train/train_imc.py:47-58,472,494,571-576``). Here the strategy is a 2-D
``(data, context)`` mesh:

- ``data``:    whole scenes per device slice; gradients are reduced by XLA
  across this axis (the DDP all-reduce equivalent, riding ICI/DCN).
- ``context``: sequence parallelism for the long global-attention token axis
  (A*P tokens/scene): activations are sharded over tokens and XLA inserts the
  KV all-gathers over ICI — the TPU-native replacement for the reference's
  rank-subsampling-plus-CPU-offload memory workarounds (SURVEY §2.6).

Models call :func:`constrain` at their sharding anchor points; it is a no-op
unless a mesh has been activated via :func:`activate_mesh`, so single-device
paths compile unchanged.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_state = threading.local()

DATA_AXIS = "data"
CONTEXT_AXIS = "context"


def make_mesh(
    num_data: Optional[int] = None,
    num_context: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, context) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_context
    assert num_data * num_context <= len(devices), (
        f"mesh {num_data}x{num_context} exceeds {len(devices)} devices"
    )
    arr = np.asarray(devices[: num_data * num_context]).reshape(
        num_data, num_context
    )
    return Mesh(arr, (DATA_AXIS, CONTEXT_AXIS))


def active_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


@contextlib.contextmanager
def activate_mesh(mesh: Optional[Mesh]):
    """Make ``mesh`` visible to :func:`constrain` during trace time."""
    prev = active_mesh()
    _state.mesh = mesh
    try:
        yield
    finally:
        _state.mesh = prev


def constrain(x: jax.Array, *axes) -> jax.Array:
    """``with_sharding_constraint`` against the active mesh (no-op without).

    ``axes``: one entry per array dim — a mesh axis name, a tuple of names
    (sharded over their product), or None. Entries whose mesh extent is 1 or
    that don't divide the dim are dropped.
    """
    mesh = active_mesh()
    if mesh is None:
        return x
    clean = []
    for dim, ax in enumerate(axes):
        if ax is None:
            clean.append(None)
            continue
        names = ax if isinstance(ax, tuple) else (ax,)
        names = tuple(n for n in names if mesh.shape.get(n, 1) > 1)
        size = int(np.prod([mesh.shape[n] for n in names])) if names else 1
        if size > 1 and x.shape[dim] % size == 0:
            clean.append(names if len(names) > 1 else names[0])
        else:
            clean.append(None)
    if all(a is None for a in clean):
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*clean)))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Scenes sharded over the data axis (leading dim)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_sharding(mesh: Mesh, tree):
    """FSDP/ZeRO-3-style sharding pytree for params or optimizer state.

    Each array leaf's LARGEST dim divisible by the data-axis extent is
    sharded over ``data``; everything else is replicated. Under pjit, XLA
    inserts the per-use all-gather (forward/backward) and keeps the
    persistent buffer sharded — per-chip memory for params + Adam state
    drops by ~the data extent, the standard TPU recipe for models whose
    replicated train state exceeds one chip's HBM.
    """
    nd = mesh.shape.get(DATA_AXIS, 1)
    MIN_SHARD_ELEMS = 1 << 16  # small leaves stay replicated: sharding them
    # saves nothing and forces awkward reshards in the backward pass

    def leaf_sharding(x):
        if (
            nd <= 1
            or not hasattr(x, "shape")
            or x.ndim == 0
            or int(np.prod(x.shape)) < MIN_SHARD_ELEMS
        ):
            return NamedSharding(mesh, P())
        dims = sorted(
            range(x.ndim), key=lambda d: x.shape[d], reverse=True
        )
        for d in dims:
            if x.shape[d] % nd == 0 and x.shape[d] >= nd:
                spec = [None] * x.ndim
                spec[d] = DATA_AXIS
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf_sharding, tree)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put numeric leaves of a host batch onto the mesh data axis."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1:
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out
