"""SwiGLU feed-forward variants — re-design of ``sailrecon/layers/swiglu_ffn.py``.

Used by DINOv2 giant-class backbones (``vision_transformer.py:146-152``);
the flagship ViT-L uses plain MLP, but the layer inventory keeps parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import params as P


def swiglu_hidden_fused(hidden_features: int) -> int:
    """SwiGLUFFNFused hidden sizing: (2/3 h + 7) // 8 * 8 (``swiglu_ffn.py:66``)."""
    return (int(hidden_features * 2 / 3) + 7) // 8 * 8


def init_swiglu(key, d_in: int, hidden: int, d_out=None, bias: bool = True):
    d_out = d_out or d_in
    k1, k2 = jax.random.split(key)
    return {
        "w12": P.init_linear(k1, d_in, 2 * hidden, bias=bias),
        "w3": P.init_linear(k2, hidden, d_out, bias=bias),
    }


def swiglu(p, x):
    x12 = P.linear(p["w12"], x)
    x1, x2 = jnp.split(x12, 2, axis=-1)
    return P.linear(p["w3"], jax.nn.silu(x1) * x2)
