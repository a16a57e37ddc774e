"""Parameter-pytree primitives: init + apply for linear / layernorm / conv.

The whole model stack is expressed as explicit parameter pytrees (nested dicts
of jnp arrays) and pure apply functions — no module framework. This gives:

- a trivially inspectable 1:1 mapping to the reference torch ``state_dict``
  for the checkpoint converter (``utils/converter.py``),
- clean ``lax.scan`` over depth-stacked block parameters,
- explicit ``PartitionSpec`` annotation points for pjit sharding.

Conventions:
- Linear: ``{'w': (d_in, d_out), 'b': (d_out,)}``; apply is ``x @ w + b``.
  (torch ``nn.Linear.weight`` is ``(out, in)`` — transposed on conversion.)
- LayerNorm: ``{'scale': (d,), 'bias': (d,)}`` — computed in fp32 always,
  mirroring torch autocast's fp32 layer-norm policy.
- Conv2d: NHWC activations, HWIO kernels (torch OIHW -> transpose (2,3,1,0)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


# -- linear -----------------------------------------------------------------


def init_linear(key, d_in: int, d_out: int, bias: bool = True, std: float = 0.02):
    kw, _ = jax.random.split(key)
    p = {"w": trunc_normal(kw, (d_in, d_out), std=std)}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def linear(p, x):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# -- layer norm -------------------------------------------------------------


def init_layer_norm(d: int, affine: bool = True):
    if not affine:
        return {}
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def layer_norm(p, x, eps: float = 1e-5):
    """Always computed in fp32; result cast back to the input dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if p:
        y = y * p["scale"] + p["bias"]
    return y.astype(dtype)


# -- conv2d (NHWC / HWIO) ---------------------------------------------------


def init_conv(key, kh: int, kw: int, c_in: int, c_out: int, bias: bool = True):
    fan_in = kh * kw * c_in
    std = (2.0 / fan_in) ** 0.5
    p = {"w": std * jax.random.normal(key, (kh, kw, c_in, c_out), jnp.float32)}
    if bias:
        p["b"] = jnp.zeros((c_out,), jnp.float32)
    return p


def conv2d(p, x, stride=1, padding="SAME", accum_dtype=None):
    """x: (N, H, W, C_in) -> (N, H', W', C_out).

    ``accum_dtype``: output/accumulation dtype when x is low-precision
    (``preferred_element_type``). A bf16 input with accum_dtype=f32 is
    exactly what the TPU conv backend does internally for f32 inputs at
    DEFAULT precision (bf16 MXU multiply, f32 accumulate) — making the
    boundary explicit lets the producer store bf16 and skip the f32 copy.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=accum_dtype,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def init_conv_transpose(key, kh: int, kw: int, c_in: int, c_out: int, bias: bool = True):
    fan_in = kh * kw * c_in
    std = (2.0 / fan_in) ** 0.5
    # layout (kh, kw, c_out, c_in): the HWIO kernel of the forward conv this
    # op is the transpose of (used with transpose_kernel=True)
    p = {"w": std * jax.random.normal(key, (kh, kw, c_out, c_in), jnp.float32)}
    if bias:
        p["b"] = jnp.zeros((c_out,), jnp.float32)
    return p


def conv_transpose2d(p, x, stride):
    """Transposed conv matching torch ``ConvTranspose2d(..., padding=0)``.

    x: (N, H, W, C_in) -> (N, H*stride_h + kh - stride_h, ..., C_out) for
    VALID padding; for the kernel==stride cases used by the DPT head this is
    exactly (N, H*stride, W*stride, C_out).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    y = jax.lax.conv_transpose(
        x,
        p["w"].astype(x.dtype),
        strides=stride,
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# -- misc -------------------------------------------------------------------


def gelu(x):
    """Exact (erf) GELU, matching torch ``nn.GELU()`` default."""
    return jax.nn.gelu(x, approximate=False)


def layer_scale(p, x):
    return x * p["gamma"].astype(x.dtype)


def init_layer_scale(d: int, init_value: float):
    return {"gamma": jnp.full((d,), init_value, jnp.float32)}
