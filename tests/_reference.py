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
