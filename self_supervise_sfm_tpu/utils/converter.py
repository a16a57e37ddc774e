"""Torch-checkpoint -> JAX param-pytree converter.

Maps the reference ``SailRecon`` ``state_dict`` (HuggingFace
``HKUST-SAIL/SAIL-Recon/sailrecon.pt``, loaded at ``train/train_imc.py:464-468``)
onto this framework's parameter pytrees. Works from a plain ``{name: ndarray}``
dict so torch is only needed to *read* the file, not at model runtime.

Layout rules (see ``layers/params.py``):
- Linear:   torch (out, in)  -> w (in, out)  [transpose]
- Conv2d:   torch (O, I, H, W) -> w (H, W, I, O)
- ConvT2d:  torch (I, O, H, W) -> w (H, W, I, O)  (used with transpose_kernel)
- LayerNorm weight/bias -> scale/bias
- depth-stacked blocks: leaves stacked on axis 0 for ``lax.scan``.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


def load_torch_state_dict(path: str) -> Dict[str, Array]:
    """Read a ``.pt`` checkpoint into numpy (requires torch, CPU only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def torch_module_to_state_dict(module) -> Dict[str, Array]:
    """Convenience for golden tests: live torch module -> numpy state dict."""
    return {
        k: v.detach().float().cpu().numpy() for k, v in module.state_dict().items()
    }


# -- primitives -------------------------------------------------------------


def convert_linear(sd: StateDict, prefix: str):
    p = {"w": jnp.asarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def convert_ln(sd: StateDict, prefix: str):
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def convert_conv(sd: StateDict, prefix: str):
    p = {"w": jnp.asarray(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def convert_conv_transpose(sd: StateDict, prefix: str):
    # torch ConvTranspose2d weight: (in, out, kh, kw) -> (kh, kw, in, out);
    # applied with lax.conv_transpose(..., transpose_kernel=True).
    p = {"w": jnp.asarray(sd[f"{prefix}.weight"].transpose(2, 3, 0, 1))}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


# -- transformer block ------------------------------------------------------


def convert_attention(sd: StateDict, prefix: str, qk_norm: bool):
    p = {
        "qkv": convert_linear(sd, f"{prefix}.qkv"),
        "proj": convert_linear(sd, f"{prefix}.proj"),
    }
    if qk_norm:
        p["q_norm"] = convert_ln(sd, f"{prefix}.q_norm")
        p["k_norm"] = convert_ln(sd, f"{prefix}.k_norm")
    return p


def convert_block(sd: StateDict, prefix: str, qk_norm: bool):
    return {
        "norm1": convert_ln(sd, f"{prefix}.norm1"),
        "attn": convert_attention(sd, f"{prefix}.attn", qk_norm),
        "ls1": {"gamma": jnp.asarray(sd[f"{prefix}.ls1.gamma"])},
        "norm2": convert_ln(sd, f"{prefix}.norm2"),
        "mlp": {
            "fc1": convert_linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": convert_linear(sd, f"{prefix}.mlp.fc2"),
        },
        "ls2": {"gamma": jnp.asarray(sd[f"{prefix}.ls2.gamma"])},
    }


def stack_blocks(blocks):
    """List of per-layer block pytrees -> one pytree of depth-stacked leaves."""
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def convert_blocks_stacked(sd: StateDict, prefix: str, depth: int, qk_norm: bool):
    return stack_blocks(
        [convert_block(sd, f"{prefix}.{i}", qk_norm) for i in range(depth)]
    )


# -- DINOv2 ViT -------------------------------------------------------------


def convert_vit(sd: StateDict, prefix: str, depth: int):
    """Convert a DinoVisionTransformer subtree (e.g. ``aggregator.patch_embed``)."""
    pfx = f"{prefix}." if prefix else ""
    p = {
        "patch_embed": {"proj": convert_conv(sd, f"{pfx}patch_embed.proj")},
        "cls_token": jnp.asarray(sd[f"{pfx}cls_token"]),
        "pos_embed": jnp.asarray(sd[f"{pfx}pos_embed"]),
        "register_tokens": (
            jnp.asarray(sd[f"{pfx}register_tokens"])
            if f"{pfx}register_tokens" in sd
            else None
        ),
        "blocks": convert_blocks_stacked(sd, f"{pfx}blocks", depth, qk_norm=False),
        "norm": convert_ln(sd, f"{pfx}norm"),
    }
    return p
