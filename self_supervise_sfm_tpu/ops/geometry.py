"""Geometry core: batched camera/pose math, fully on-device.

TPU-first rewrite of the reference geometry scattered across
``sailrecon/utils/pose_enc.py``, ``sailrecon/utils/rotation.py``,
``sailrecon/utils/geometry.py`` and ``train/utils/geometry.py`` in
ShngJZ/self-supervise-sfm.  Unlike the reference (which round-trips depth
unprojection through CPU numpy, ``sailrecon/utils/geometry.py:33-38``),
everything here is pure ``jnp`` with static shapes so it fuses under ``jit``.

Conventions
-----------
- Extrinsics are OpenCV world-to-camera ``[R|t]``, shape ``(..., 3, 4)``.
- Quaternions are scalar-last ``(x, y, z, w)`` (matches
  ``sailrecon/utils/rotation.py:14``).
- Pose encoding is the 9-D ``absT_quaR_FoV`` vector
  ``[tx ty tz, qx qy qz qw, fov_h fov_w]``
  (``sailrecon/utils/pose_enc.py:12-101``).
- Intrinsics are pixel-unit ``(..., 3, 3)`` with zero skew.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def f32_matmul(fn):
    """Force full-fp32 matmul precision inside geometry ops.

    TPU MXU default precision is bf16, which is fine for the transformer trunk
    but catastrophically lossy for pose chains (mm-level errors per matmul).
    All geometry matmuls therefore trace under ``highest`` precision.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


# ---------------------------------------------------------------------------
# Homogeneous coordinates / SE(3)
# ---------------------------------------------------------------------------


def to_homogeneous(points: jax.Array) -> jax.Array:
    """Append a 1 to the last axis.  (..., N) -> (..., N+1)."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def from_homogeneous(points: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Perspective divide, (..., N+1) -> (..., N).

    Mirrors ``train/utils/geometry.py:550-560`` (adds eps rather than clamping,
    so sign of the denominator is preserved).
    """
    denom = points[..., -1:] + eps
    # guard exact zeros (keeps gradients finite; values this close to the
    # camera plane carry no usable signal anyway)
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    return points[..., :-1] / denom


def pad_poses(pose34: jax.Array) -> jax.Array:
    """Pad (..., 3, 4) to (..., 4, 4) with the homogeneous row [0,0,0,1]."""
    batch = pose34.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=pose34.dtype), batch + (1, 4)
    )
    return jnp.concatenate([pose34[..., :3, :4], bottom], axis=-2)


def unpad_poses(pose44: jax.Array) -> jax.Array:
    """(..., 4, 4) -> (..., 3, 4)."""
    return pose44[..., :3, :4]


def as_pose44(pose: jax.Array) -> jax.Array:
    """Accept (..., 3, 4) or (..., 4, 4); always return (..., 4, 4)."""
    if pose.shape[-2:] == (3, 4):
        return pad_poses(pose)
    return pose


@f32_matmul
def se3_inverse(pose: jax.Array) -> jax.Array:
    """Closed-form SE(3) inverse of (..., 3, 4) or (..., 4, 4) world-to-cam.

    Equivalent to ``closed_form_inverse_se3`` (``sailrecon/utils/geometry.py:1076``)
    but shape-polymorphic and differentiable on-device.
    """
    R = pose[..., :3, :3]
    t = pose[..., :3, 3:4]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -Rt @ t], axis=-1)
    return pad_poses(top)


@f32_matmul
def relative_pose(src_extrinsic: jax.Array, dst_extrinsic: jax.Array) -> jax.Array:
    """src-cam -> dst-cam transform: ``dst @ inv(src)``, returns (..., 4, 4).

    Mirrors ``train/utils/geometry.py:766-808``.
    """
    src44 = as_pose44(src_extrinsic)
    dst44 = as_pose44(dst_extrinsic)
    return dst44 @ se3_inverse(src44)


# ---------------------------------------------------------------------------
# Quaternions  (scalar-last xyzw)
# ---------------------------------------------------------------------------


def quat_to_mat(quaternions: jax.Array) -> jax.Array:
    """(..., 4) xyzw quaternion -> (..., 3, 3) rotation matrix.

    Matches ``sailrecon/utils/rotation.py:14-46`` (works for non-unit quats via
    the 2/|q|^2 normalisation).
    """
    i, j, k, r = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def standardize_quaternion(quaternions: jax.Array) -> jax.Array:
    """Flip sign so the scalar (last) component is non-negative."""
    return jnp.where(quaternions[..., 3:4] < 0, -quaternions, quaternions)


def mat_to_quat(matrix: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 4) xyzw quaternion.

    Numerically-robust branch selection as in
    ``sailrecon/utils/rotation.py:49-115`` (pick the best-conditioned of the
    four candidate denominators), expressed with ``where`` instead of
    boolean indexing so it jits.
    """
    batch = matrix.shape[:-2]
    m = matrix.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 0.0))

    # candidate quaternions (r, i, j, k order) scaled by each component
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    denom = 2.0 * jnp.maximum(q_abs[..., None], 0.1)
    quat_candidates = quat_by_rijk / denom

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=matrix.dtype)[..., None]
    out = jnp.sum(quat_candidates * onehot, axis=-2)  # rijk

    out = out[..., jnp.array([1, 2, 3, 0])]  # rijk -> ijkr (xyzw)
    return standardize_quaternion(out)


# ---------------------------------------------------------------------------
# Axis-angle (Rodrigues) — the bundle-adjustment rotation parameterisation
# ---------------------------------------------------------------------------


def axis_angle_to_mat(aa: jax.Array) -> jax.Array:
    """(..., 3) axis-angle -> (..., 3, 3) rotation (Rodrigues), smooth at 0."""
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)[..., None]  # (..., 1, 1)
    theta = jnp.sqrt(theta2 + 1e-24)
    x, y, z = aa[..., 0], aa[..., 1], aa[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    # sin(t)/t and (1-cos t)/t^2 with stable small-angle forms
    a = jnp.sinc(theta / jnp.pi)  # sin(theta)/theta
    b = jnp.where(theta2 > 1e-12, (1.0 - jnp.cos(theta)) / (theta2 + 1e-24), 0.5)
    return eye + a * K + b * (K @ K)


def mat_to_axis_angle(R: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation -> (..., 3) axis-angle via the quaternion."""
    q = mat_to_quat(R)  # xyzw, w >= 0
    xyz = q[..., :3]
    w = jnp.clip(q[..., 3:4], -1.0, 1.0)
    n = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(n, w)
    scale = jnp.where(n > 1e-9, theta / jnp.maximum(n, 1e-12), 2.0)
    return xyz * scale


# ---------------------------------------------------------------------------
# Pose encoding  (absT_quaR_FoV, 9-D)
# ---------------------------------------------------------------------------


def extri_intri_to_pose_encoding(
    extrinsics: jax.Array,
    intrinsics: jax.Array,
    image_size_hw: Tuple[int, int],
) -> jax.Array:
    """(..., 3, 4), (..., 3, 3) -> (..., 9). See ``utils/pose_enc.py:12-65``."""
    R = extrinsics[..., :3, :3]
    T = extrinsics[..., :3, 3]
    quat = mat_to_quat(R)
    H, W = image_size_hw
    fov_h = 2.0 * jnp.arctan((H / 2.0) / intrinsics[..., 1, 1])
    fov_w = 2.0 * jnp.arctan((W / 2.0) / intrinsics[..., 0, 0])
    return jnp.concatenate([T, quat, fov_h[..., None], fov_w[..., None]], axis=-1)


def pose_encoding_to_extri_intri(
    pose_encoding: jax.Array,
    image_size_hw: Optional[Tuple[int, int]] = None,
    build_intrinsics: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """(..., 9) -> ((..., 3, 4) extrinsics, (..., 3, 3) intrinsics or None).

    See ``sailrecon/utils/pose_enc.py:68-167``. The principal point is assumed
    to be the image centre.
    """
    T = pose_encoding[..., :3]
    quat = pose_encoding[..., 3:7]
    R = quat_to_mat(quat)
    extrinsics = jnp.concatenate([R, T[..., None]], axis=-1)

    intrinsics = None
    if build_intrinsics:
        assert image_size_hw is not None
        H, W = image_size_hw
        fov_h = pose_encoding[..., 7]
        fov_w = pose_encoding[..., 8]
        # clamp tan away from 0: a relu'd FoV head emits exactly 0 at init,
        # which would make f infinite and poison gradients with NaNs
        fy = (H / 2.0) / jnp.maximum(jnp.tan(fov_h / 2.0), 1e-6)
        fx = (W / 2.0) / jnp.maximum(jnp.tan(fov_w / 2.0), 1e-6)
        zeros = jnp.zeros_like(fx)
        ones = jnp.ones_like(fx)
        row0 = jnp.stack([fx, zeros, jnp.full_like(fx, W / 2.0)], axis=-1)
        row1 = jnp.stack([zeros, fy, jnp.full_like(fy, H / 2.0)], axis=-1)
        row2 = jnp.stack([zeros, zeros, ones], axis=-1)
        intrinsics = jnp.stack([row0, row1, row2], axis=-2)
    return extrinsics, intrinsics


def pose_encoding_to_extri_intri_np64(
    pose_encoding,
    image_size_hw: Optional[Tuple[int, int]] = None,
    build_intrinsics: bool = True,
):
    """Host-side float64 pose decode (numpy).

    The reference's pose-only eval path decodes the final encoding under an
    fp64 autocast (``sail_recon.py:304-311``). On TPU fp64 is emulated and
    slow, so the fp64 variant runs on the host over the (..., 9) fp32
    encoding — identical math to :func:`pose_encoding_to_extri_intri` at
    double precision.
    """
    import numpy as np

    enc = np.asarray(pose_encoding, np.float64)
    T = enc[..., :3]
    q = enc[..., 3:7]
    i, j, k, r = np.moveaxis(q, -1, 0)
    two_s = 2.0 / np.sum(q * q, axis=-1)
    R = np.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    ).reshape(q.shape[:-1] + (3, 3))
    extrinsics = np.concatenate([R, T[..., None]], axis=-1)
    intrinsics = None
    if build_intrinsics:
        assert image_size_hw is not None
        H, W = image_size_hw
        fy = (H / 2.0) / np.maximum(np.tan(enc[..., 7] / 2.0), 1e-6)
        fx = (W / 2.0) / np.maximum(np.tan(enc[..., 8] / 2.0), 1e-6)
        zeros = np.zeros_like(fx)
        ones = np.ones_like(fx)
        row0 = np.stack([fx, zeros, np.full_like(fx, W / 2.0)], axis=-1)
        row1 = np.stack([zeros, fy, np.full_like(fy, H / 2.0)], axis=-1)
        row2 = np.stack([zeros, zeros, ones], axis=-1)
        intrinsics = np.stack([row0, row1, row2], axis=-2)
    return extrinsics, intrinsics


# ---------------------------------------------------------------------------
# Depth unprojection (on-device; replaces the reference's CPU numpy path)
# ---------------------------------------------------------------------------


def depth_to_cam_points(depth_map: jax.Array, intrinsic: jax.Array) -> jax.Array:
    """(..., H, W) depth + (..., 3, 3) K -> (..., H, W, 3) camera-frame points.

    Batched equivalent of ``depth_to_cam_coords_points``
    (``sailrecon/utils/geometry.py:1039-1073``).
    """
    H, W = depth_map.shape[-2], depth_map.shape[-1]
    u = jnp.arange(W, dtype=depth_map.dtype)[None, :]  # (1, W)
    v = jnp.arange(H, dtype=depth_map.dtype)[:, None]  # (H, 1)
    fu = intrinsic[..., 0, 0][..., None, None]
    fv = intrinsic[..., 1, 1][..., None, None]
    cu = intrinsic[..., 0, 2][..., None, None]
    cv = intrinsic[..., 1, 2][..., None, None]
    x = (u - cu) * depth_map / fu
    y = (v - cv) * depth_map / fv
    return jnp.stack([x, y, depth_map], axis=-1)


@f32_matmul
def unproject_depth_to_world(
    depth_map: jax.Array, extrinsics: jax.Array, intrinsics: jax.Array
) -> jax.Array:
    """(..., H, W[, 1]) depth, (..., 3, 4) E, (..., 3, 3) K -> (..., H, W, 3) world points.

    On-device replacement for ``unproject_depth_map_to_point_map``
    (``sailrecon/utils/geometry.py:963-994``) which detached to CPU numpy.
    """
    if depth_map.shape[-1] == 1 and depth_map.ndim >= 3:
        depth_map = depth_map[..., 0]
    cam_pts = depth_to_cam_points(depth_map, intrinsics)  # (..., H, W, 3)
    c2w = se3_inverse(extrinsics)  # (..., 4, 4)
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    world = jnp.einsum("...ij,...hwj->...hwi", R, cam_pts) + t[..., None, None, :]
    return world


# ---------------------------------------------------------------------------
# Correspondence reprojection (the training-loss geometry)
# ---------------------------------------------------------------------------


@f32_matmul
def backproject_and_reproject(
    src_coords: jax.Array,
    src_depth: jax.Array,
    src_intrinsic: jax.Array,
    dst_intrinsic: jax.Array,
    rel_pose: jax.Array,
    src_depth_scale: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Exact perspective reprojection of src pixels into the dst view.

    Args (leading dims broadcast; canonical shapes shown for P pairs, N points):
        src_coords: (P, N, 2) source pixel coordinates.
        src_depth: (P, N) source depths.
        src_intrinsic / dst_intrinsic: (P, 3, 3).
        rel_pose: (P, 3, 4) or (P, 4, 4) src-cam -> dst-cam.
        src_depth_scale: (P, 1) per-pair depth scale.

    Returns:
        (dst_coords (P, N, 2), valid_mask (P, N) -- all True, matching
        ``train/utils/geometry.py:615-683``).
    """
    rel44 = as_pose44(rel_pose)
    scaled_depth = src_depth * src_depth_scale  # (P, N)
    src_h = to_homogeneous(src_coords)  # (P, N, 3)
    K_inv = jnp.linalg.inv(src_intrinsic)
    cam = jnp.einsum("...ij,...nj->...ni", K_inv, src_h) * scaled_depth[..., None]
    cam_h = to_homogeneous(cam)  # (P, N, 4)
    dst_cam = jnp.einsum("...ij,...nj->...ni", rel44, cam_h)[..., :3]
    dst_h = jnp.einsum("...ij,...nj->...ni", dst_intrinsic, dst_cam)
    dst_coords = from_homogeneous(dst_h)
    valid = jnp.ones(dst_coords.shape[:-1], dtype=bool)
    return dst_coords, valid


@f32_matmul
def backproject_and_reproject_with_approximation(
    src_coords: jax.Array,
    src_depth: jax.Array,
    dst_depth: jax.Array,
    src_intrinsic: jax.Array,
    dst_intrinsic: jax.Array,
    rel_pose: jax.Array,
    src_depth_scale: jax.Array,
    dst_depth_scale: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Linearised reprojection: perspective division replaced by the measured
    destination depth (keeps gradients well-behaved).

    Mirrors ``train/utils/geometry.py:685-764``.
    """
    rel44 = as_pose44(rel_pose)
    scaled_src = src_depth * src_depth_scale
    scaled_dst = dst_depth * dst_depth_scale
    src_h = to_homogeneous(src_coords)
    K_inv = jnp.linalg.inv(src_intrinsic)
    cam = jnp.einsum("...ij,...nj->...ni", K_inv, src_h) * scaled_src[..., None]
    cam_h = to_homogeneous(cam)
    dst_cam = jnp.einsum("...ij,...nj->...ni", rel44, cam_h)[..., :3]
    dst_h = jnp.einsum("...ij,...nj->...ni", dst_intrinsic, dst_cam)
    dst_coords = dst_h[..., :2] / (scaled_dst[..., None] + 1e-6)
    valid = jnp.ones(dst_coords.shape[:-1], dtype=bool)
    return dst_coords, valid


def compute_projective_residual(
    predicted_dst_coords: jax.Array, actual_dst_coords: jax.Array
) -> jax.Array:
    """Per-point L2 residual, (..., N, 2) x2 -> (..., N).

    ``train/utils/geometry.py:810-829``.
    """
    diff = predicted_dst_coords - actual_dst_coords
    return jnp.linalg.norm(diff, axis=-1)


# ---------------------------------------------------------------------------
# Projection with radial distortion (the pycolmap-compatible camera models)
# ---------------------------------------------------------------------------


def apply_distortion(params: jax.Array, u: jax.Array, v: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Apply SIMPLE_RADIAL / RADIAL / OPENCV distortion in normalised coords.

    ``params``: (..., NP) with NP in {1, 2, 4}:
        1: [k]        SIMPLE_RADIAL
        2: [k1, k2]   RADIAL
        4: [k1, k2, p1, p2]  OPENCV
    Mirrors ``sailrecon/dependency/distortion.py`` semantics.
    """
    num_params = params.shape[-1]
    r2 = u * u + v * v
    if num_params == 1:
        k = params[..., 0]
        radial = k * r2
        du = u * radial
        dv = v * radial
    elif num_params == 2:
        k1, k2 = params[..., 0], params[..., 1]
        radial = k1 * r2 + k2 * r2 * r2
        du = u * radial
        dv = v * radial
    elif num_params == 4:
        k1, k2, p1, p2 = (params[..., i] for i in range(4))
        uv = u * v
        radial = k1 * r2 + k2 * r2 * r2
        du = u * radial + 2.0 * p1 * uv + p2 * (r2 + 2.0 * u * u)
        dv = v * radial + 2.0 * p2 * uv + p1 * (r2 + 2.0 * v * v)
    else:
        raise ValueError(f"Unsupported number of distortion params: {num_params}")
    return u + du, v + dv


def iterative_undistortion(
    params: jax.Array, uv: jax.Array, max_iters: int = 100
) -> jax.Array:
    """Newton-iteration undistortion with a numeric Jacobian.

    JAX port of ``sailrecon/dependency/distortion.py:52-121`` with a static
    iteration count (``lax.fori_loop``); converged points stop updating via the
    same step-norm criterion.
    """
    eps = jnp.finfo(uv.dtype).eps
    max_step_norm = 1e-10
    rel_step_size = 1e-6

    def body(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        fx, fy = apply_distortion(params, x, y)
        fx = fx - uv[..., 0]
        fy = fy - uv[..., 1]
        step_x = jnp.maximum(eps, jnp.abs(rel_step_size * x))
        step_y = jnp.maximum(eps, jnp.abs(rel_step_size * y))
        fx_px, fy_px = apply_distortion(params, x + step_x, y)
        fx_mx, fy_mx = apply_distortion(params, x - step_x, y)
        fx_py, fy_py = apply_distortion(params, x, y + step_y)
        fx_my, fy_my = apply_distortion(params, x, y - step_y)
        J00 = (fx_px - fx_mx) / (2.0 * step_x)
        J01 = (fx_py - fx_my) / (2.0 * step_y)
        J10 = (fy_px - fy_mx) / (2.0 * step_x)
        J11 = (fy_py - fy_my) / (2.0 * step_y)
        det = J00 * J11 - J01 * J10
        # sign-preserving floor: sign(det)*eps + eps would be EXACTLY zero
        # for small negative det, turning the Newton step infinite
        det = jnp.where(
            jnp.abs(det) < 1e-12,
            jnp.where(det < 0, -1e-12, 1e-12),
            det,
        )
        dx = (J11 * fx - J01 * fy) / det
        dy = (-J10 * fx + J00 * fy) / det
        step_sq = dx * dx + dy * dy
        keep = step_sq >= max_step_norm
        x = x - jnp.where(keep, dx, 0.0)
        y = y - jnp.where(keep, dy, 0.0)
        return jnp.stack([x, y], axis=-1)

    return jax.lax.fori_loop(0, max_iters, body, uv)


@f32_matmul
def img_from_cam(
    intrinsics: jax.Array,
    points_cam: jax.Array,
    distortion_params: Optional[jax.Array] = None,
    default: float = 0.0,
) -> jax.Array:
    """Camera-frame points -> pixel coordinates.

    Args:
        intrinsics: (B, 3, 3)
        points_cam: (B, 3, N)
        distortion_params: optional (B, NP)
    Returns:
        (B, N, 2) pixels; non-finite entries replaced by ``default``.
    Mirrors ``sailrecon/dependency/projection.py`` (torch path).
    """
    pts = points_cam / (points_cam[:, 2:3, :] + 1e-8)
    if distortion_params is not None:
        u, v = apply_distortion(distortion_params[..., None, :], pts[:, 0], pts[:, 1])
        pts = jnp.stack([u, v, jnp.ones_like(u)], axis=1)
    pix = jnp.einsum("bij,bjn->bin", intrinsics, pts)[:, :2]  # (B, 2, N)
    pix = jnp.swapaxes(pix, -1, -2)
    return jnp.where(jnp.isfinite(pix), pix, default)


@f32_matmul
def project_world_points_to_cam(
    world_points: jax.Array,
    cam_extrinsics: jax.Array,
    cam_intrinsics: Optional[jax.Array] = None,
    distortion_params: Optional[jax.Array] = None,
    default: float = 0.0,
) -> Tuple[Optional[jax.Array], jax.Array]:
    """World points (N, 3) -> per-camera pixels (B, N, 2) and cam points (B, 3, N).

    Mirrors ``sailrecon/dependency/projection.py`` ``project_3D_points``.
    """
    wp_h = to_homogeneous(world_points)  # (N, 4)
    cam_points = jnp.einsum("bij,nj->bin", cam_extrinsics, wp_h)  # (B, 3, N)
    if cam_intrinsics is None:
        return None, cam_points
    image_points = img_from_cam(cam_intrinsics, cam_points, distortion_params, default)
    return image_points, cam_points
