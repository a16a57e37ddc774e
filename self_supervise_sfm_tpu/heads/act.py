"""Head activations — re-design of ``sailrecon/heads/head_act.py``."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inverse_log_transform(y: jax.Array) -> jax.Array:
    """sign(y) * (exp(|y|) - 1)  (``head_act.py:657-667``)."""
    return jnp.sign(y) * jnp.expm1(jnp.abs(y))


def base_pose_act(pose_enc: jax.Array, act_type: str = "linear") -> jax.Array:
    if act_type == "linear":
        return pose_enc
    if act_type == "inv_log":
        return inverse_log_transform(pose_enc)
    if act_type == "exp":
        return jnp.exp(pose_enc)
    if act_type == "relu":
        return jax.nn.relu(pose_enc)
    raise ValueError(f"Unknown act_type: {act_type}")


def activate_pose(
    pred_pose_enc: jax.Array,
    trans_act: str = "linear",
    quat_act: str = "linear",
    fl_act: str = "linear",
) -> jax.Array:
    """Activate [T(3), quat(4), fov(2)] slices (``head_act.py:552-577``)."""
    T = base_pose_act(pred_pose_enc[..., :3], trans_act)
    quat = base_pose_act(pred_pose_enc[..., 3:7], quat_act)
    fl = base_pose_act(pred_pose_enc[..., 7:], fl_act)
    return jnp.concatenate([T, quat, fl], axis=-1)


def activate_head(
    out: jax.Array, activation: str = "norm_exp", conf_activation: str = "expp1"
):
    """Split dense head output into (values, confidence) with activations.

    ``out``: (..., H, W, C) channels-last (the reference permutes from NCHW,
    ``head_act.py:603-654``; we are NHWC throughout). Last channel is the
    confidence logit.
    """
    xyz = out[..., :-1]
    conf = out[..., -1]

    if activation == "norm_exp":
        d = jnp.maximum(jnp.linalg.norm(xyz, axis=-1, keepdims=True), 1e-8)
        pts = (xyz / d) * jnp.expm1(d)
    elif activation == "norm":
        pts = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    elif activation == "exp":
        pts = jnp.exp(xyz)
    elif activation == "relu":
        pts = jax.nn.relu(xyz)
    elif activation == "inv_log":
        pts = inverse_log_transform(xyz)
    elif activation == "xy_inv_log":
        xy, z = xyz[..., :2], xyz[..., 2:]
        z = inverse_log_transform(z)
        pts = jnp.concatenate([xy * z, z], axis=-1)
    elif activation == "sigmoid":
        pts = jax.nn.sigmoid(xyz)
    elif activation == "linear":
        pts = xyz
    else:
        raise ValueError(f"Unknown activation: {activation}")

    if conf_activation == "expp1":
        conf_out = 1.0 + jnp.exp(conf)
    elif conf_activation == "expp0":
        conf_out = jnp.exp(conf)
    elif conf_activation == "sigmoid":
        conf_out = jax.nn.sigmoid(conf)
    else:
        raise ValueError(f"Unknown conf_activation: {conf_activation}")

    return pts, conf_out
