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
MODEL_AXIS = "model"


def make_mesh(
    num_data: Optional[int] = None,
    num_context: int = 1,
    num_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, context, model) mesh over the available devices.

    ``model`` is the tensor-parallel axis (Megatron-style: attention heads /
    MLP hidden sharded across it, see :func:`param_sharding`); extent 1 by
    default so 2-D callers are unaffected.
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // (num_context * num_model)
    total = num_data * num_context * num_model
    assert total <= len(devices), (
        f"mesh {num_data}x{num_context}x{num_model} exceeds {len(devices)} devices"
    )
    arr = np.asarray(devices[:total]).reshape(num_data, num_context, num_model)
    return Mesh(arr, (DATA_AXIS, CONTEXT_AXIS, MODEL_AXIS))


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


# Megatron-style tensor-parallel dims, keyed on the trailing param path.
# Column-parallel weights (output dim sharded, no comm on the way in):
# attention QKV, MLP up-projections. Row-parallel weights (input dim
# sharded; XLA inserts the all-reduce on their output): attention out-proj,
# MLP down-projections. Dims are negative to be agnostic to stacked-layer
# leading axes (scanned blocks carry an extra (L, ...) dim).
_TP_COLUMN = {"qkv": ("attn",), "fc1": (), "w12": ()}
_TP_ROW = {"proj": ("attn",), "fc2": (), "w3": ()}


def _tp_dim(path) -> Optional[int]:
    keys = [k.key for k in path if hasattr(k, "key") and isinstance(k.key, str)]
    if len(keys) < 2:
        return None
    parent, leaf = keys[-2], keys[-1]
    anc = set(keys[:-1])

    def guarded(table):
        req = table.get(parent)
        return req is not None and all(r in anc for r in req)

    if guarded(_TP_COLUMN):
        return -1  # w: (..., in, out) / b: (..., out)
    if guarded(_TP_ROW) and leaf == "w":
        return -2  # w: (..., in, out); bias of a row-parallel layer stays whole
    return None


def param_sharding(mesh: Mesh, tree, fsdp: bool = False, tp: bool = False):
    """Composable sharding pytree for params / grads / optimizer state.

    - ``tp``: tensor parallelism over ``model`` — Megatron column/row rules
      on attention + MLP weights (``_tp_dim``); GSPMD propagation shards the
      matching activations and inserts the output all-reduces, no model-code
      changes needed.
    - ``fsdp``: ZeRO-3 over ``data`` — each leaf's largest *remaining* dim
      divisible by the data extent is sharded; XLA inserts per-use
      all-gathers and keeps the persistent buffer sharded. Composes with tp
      (a weight can be model-sharded on one dim and data-sharded on another).
    """
    nd = mesh.shape.get(DATA_AXIS, 1) if fsdp else 1
    nm = mesh.shape.get(MODEL_AXIS, 1) if tp else 1
    MIN_SHARD_ELEMS = 1 << 16  # small leaves stay replicated: sharding them
    # saves nothing and forces awkward reshards in the backward pass

    def leaf_sharding(path, x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return NamedSharding(mesh, P())
        spec = [None] * x.ndim
        if nm > 1:
            d = _tp_dim(path)
            if d is not None and x.shape[d] % nm == 0:
                spec[d % x.ndim] = MODEL_AXIS
        if nd > 1 and int(np.prod(x.shape)) >= MIN_SHARD_ELEMS:
            dims = sorted(range(x.ndim), key=lambda d: x.shape[d], reverse=True)
            for d in dims:
                if spec[d] is None and x.shape[d] % nd == 0 and x.shape[d] >= nd:
                    spec[d] = DATA_AXIS
                    break
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def fsdp_sharding(mesh: Mesh, tree):
    """FSDP/ZeRO-3-style sharding pytree (see :func:`param_sharding`)."""
    return param_sharding(mesh, tree, fsdp=True)


def shard_batch(batch: dict, mesh: Mesh, process_local: bool = False) -> dict:
    """Device-put numeric leaves of a host batch onto the mesh data axis.

    ``process_local``: the batch holds only THIS process's slice of the
    global batch axis (each host loaded its own scenes); the global arrays
    are assembled from the per-process slices. Default: the batch is the
    full global value on every process (replicated host data) and each
    process transfers its addressable shards.
    """
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1:
            if process_local and jax.process_count() > 1:
                out[k] = jax.make_array_from_process_local_data(
                    sh, np.asarray(v)
                )
            else:
                out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out
