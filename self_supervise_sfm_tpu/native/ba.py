"""ctypes bindings for the native C++ bundle-adjustment engine (cpp/ba).

The shared library is built on demand with g++ (no external deps). Use
:func:`available` to gate call sites; the pure-JAX solver
(``ops/bundle_adjust``) is always available as the on-device path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "cpp", "ba", "ba_engine.cpp")
_LIB = os.path.join(_ROOT, "cpp", "ba", "libba_engine.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the shared library (cached by mtime)."""
    if (
        not force
        and os.path.exists(_LIB)
        and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
    ):
        return _LIB
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(build())
            lib.ba_solve.restype = ctypes.c_int
            lib.ba_solve.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                ctypes.c_int, ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
            ]
            _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def ba_solve(
    extrinsics: np.ndarray,  # (C, 3, 4) w2c
    intrinsics: np.ndarray,  # (C, 3, 3)
    points: np.ndarray,  # (P, 3)
    cam_idx: np.ndarray,
    pt_idx: np.ndarray,
    uv: np.ndarray,
    weight: Optional[np.ndarray] = None,
    max_iters: int = 30,
    init_lambda: float = 1e-3,
    huber_delta: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, dict]:
    """Run the native LM-Schur solver; returns (extrinsics, points, info)."""
    from ..ops import geometry as G
    import jax.numpy as jnp

    lib = _load()
    C = extrinsics.shape[0]
    aa = np.asarray(G.mat_to_axis_angle(jnp.asarray(extrinsics[:, :3, :3].astype(np.float32))))
    cam = np.concatenate([aa, extrinsics[:, :3, 3]], axis=1).astype(np.float64)
    cam = np.ascontiguousarray(cam)
    K4 = np.ascontiguousarray(
        np.stack(
            [intrinsics[:, 0, 0], intrinsics[:, 1, 1], intrinsics[:, 0, 2], intrinsics[:, 1, 2]],
            axis=1,
        ).astype(np.float64)
    )
    pts = np.ascontiguousarray(points.astype(np.float64))
    if weight is None:
        weight = np.ones(len(uv))
    final_cost = ctypes.c_double(0.0)
    iters_run = ctypes.c_int(0)
    ret = lib.ba_solve(
        C, pts.shape[0], len(uv),
        cam, K4, pts,
        np.ascontiguousarray(cam_idx.astype(np.int32)),
        np.ascontiguousarray(pt_idx.astype(np.int32)),
        np.ascontiguousarray(uv.astype(np.float64)),
        np.ascontiguousarray(weight.astype(np.float64)),
        max_iters, init_lambda, huber_delta,
        ctypes.byref(final_cost), ctypes.byref(iters_run),
    )
    assert ret == 0
    R = np.asarray(G.axis_angle_to_mat(jnp.asarray(cam[:, :3].astype(np.float32))))
    ext = np.concatenate([R, cam[:, 3:6, None].astype(np.float32)], axis=2)
    return ext, pts.astype(np.float32), {
        "final_cost": final_cost.value,
        "iterations": iters_run.value,
    }
