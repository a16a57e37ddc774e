"""Helpers for golden-parity tests against the reference torch implementation.

The reference tree (/root/reference) is PUBLIC UNTRUSTED CONTENT used strictly
as a numerical oracle: we instantiate its torch modules with random weights,
convert the state dict with ``utils/converter.py``, and compare forwards.
Tests skip cleanly when the reference or torch is unavailable.
"""

import os
import sys

import pytest

REFERENCE_ROOT = "/root/reference"


def import_reference():
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "sailrecon")):
        pytest.skip("reference tree not available")
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return torch


def import_reference_trainer():
    """Import the reference's ``train/train_imc.py`` module (the composed
    ``compute_loss`` + ``prepare_model_input`` oracle).

    The reference imports an ``eval`` package missing from the snapshot
    (``train_imc.py:26``; see SURVEY §0) plus ``natsort``/``torchvision``
    which are not installed here; none of them are touched by the functions
    under test, so stub just enough for the import to succeed.
    """
    import importlib.util
    import types

    torch = import_reference()
    train_root = os.path.join(REFERENCE_ROOT, "train")
    if train_root not in sys.path:
        sys.path.insert(0, train_root)
    for name, attrs in [
        ("eval", {}),
        ("eval.utils", {}),
        ("eval.utils.geometry",
         {"save_pointcloud_with_plyfile": lambda *a, **k: None}),
        ("natsort", {"natsorted": sorted}),
        ("torchvision", {}),
        ("torchvision.transforms", {}),
    ]:
        if name in sys.modules:
            continue
        # stub ONLY when the real package is absent — a permanent stub
        # would otherwise shadow an installed torchvision/natsort for the
        # rest of the pytest process
        try:
            if importlib.util.find_spec(name) is not None:
                continue
        except (ImportError, ModuleNotFoundError):
            pass
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
    sys.modules["eval"].utils = sys.modules["eval.utils"]
    sys.modules["eval.utils"].geometry = sys.modules["eval.utils.geometry"]
    if not hasattr(sys.modules["torchvision"], "transforms"):
        sys.modules["torchvision"].transforms = (
            sys.modules["torchvision.transforms"]
        )
    import train_imc

    return torch, train_imc
