"""Rotation / pose parameterizations.

Covers the reference's Euler conversions (`utils.py:209-268`, transforms3d
'sxyz' convention: R = Rz(az) @ Ry(ay) @ Rx(ax)), `pose_vec2mat`
(`models/inverse_warp.py:77-92`), `Pose2RT`/`RT2Pose`
(`models/SFMnet.py:284-296`), plus the SO(3) exponential map used by the
TPU-native IRLS essential-matrix polish (replacing the hand-written Givens
updates in `RANSAC_FiveP/essential_matrix/polish_E.cu:450`).

All functions are shape-polymorphic over leading batch dims and jit-safe
(no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp


def angle_to_matrix(angle: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (ax, ay, az), 'sxyz' convention -> rotation matrix.

    Matches `utils.py:232-268`: R = Rz(az) @ Ry(ay) @ Rx(ax).
    angle: (..., 3) -> (..., 3, 3)
    """
    ai, aj, ak = angle[..., 0], angle[..., 1], angle[..., 2]
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    row0 = jnp.stack([cj * ck, sj * sc - cs, sj * cc + ss], axis=-1)
    row1 = jnp.stack([cj * sk, sj * ss + cc, sj * cs - sc], axis=-1)
    row2 = jnp.stack([-sj, cj * si, cj * ci], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> Euler angles (ax, ay, az), 'sxyz'.

    Matches `utils.py:207-230`; the gimbal-lock branch is expressed with
    `jnp.where` so it stays jit-able (the reference uses a python branch on
    the batch max, `utils.py:222`).
    matrix: (..., 3, 3) -> (..., 3)
    """
    M = matrix
    cy = jnp.sqrt(M[..., 0, 0] ** 2 + M[..., 1, 0] ** 2)
    safe = cy > 4e-15
    ax = jnp.where(
        safe,
        jnp.arctan2(M[..., 2, 1], M[..., 2, 2]),
        jnp.arctan2(-M[..., 1, 2], M[..., 1, 1]),
    )
    ay = jnp.arctan2(-M[..., 2, 0], cy)
    az = jnp.where(safe, jnp.arctan2(M[..., 1, 0], M[..., 0, 0]), 0.0)
    return jnp.stack([ax, ay, az], axis=-1)


def exp_so3(omega: jnp.ndarray) -> jnp.ndarray:
    """SO(3) exponential map (Rodrigues). omega: (..., 3) -> (..., 3, 3).

    Taylor-safe near zero so it is differentiable everywhere (needed by the
    Gauss-Newton essential polish, ops/essential.py).
    """
    theta2 = jnp.sum(omega * omega, axis=-1)
    # sin(t)/t and (1-cos t)/t^2 with series fallback near 0. The
    # "double-where" guard keeps the *untaken* branch finite too —
    # reverse-mode AD otherwise produces NaN cotangents at omega = 0
    # (0/0 in the unselected branch poisons the chain rule).
    small = theta2 < 1e-12
    safe2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    K = skew(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product matrix. v: (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix. (..., 4) -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quat(M: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), branch-free.

    Uses the max-component construction evaluated for all four cases and
    selected with `where` (jit-safe; the usual python branch is not).
    """
    m00, m11, m22 = M[..., 0, 0], M[..., 1, 1], M[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions, each valid when its pivot is largest
    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 + tr)) / 2
    qx = jnp.sqrt(jnp.maximum(0.0, 1.0 + m00 - m11 - m22)) / 2
    qy = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 + m11 - m22)) / 2
    qz = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 - m11 + m22)) / 2
    # fix signs from off-diagonals relative to the largest component
    # (sign-select instead of jnp.copysign: f64 copysign lowers to an s64
    # bitcast that TPU's x64 rewriter does not implement)
    def _copysign(mag, ref):
        return mag * jnp.where(ref >= 0, 1.0, -1.0)

    qx = _copysign(qx, M[..., 2, 1] - M[..., 1, 2])
    qy = _copysign(qy, M[..., 0, 2] - M[..., 2, 0])
    qz = _copysign(qz, M[..., 1, 0] - M[..., 0, 1])
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def pose_vec2mat(vec: jnp.ndarray) -> jnp.ndarray:
    """6DoF (tx, ty, tz, rx, ry, rz) -> (..., 3, 4) transform.

    Order matches `models/inverse_warp.py:77-92` (translation first).
    """
    t = vec[..., :3, None]
    R = angle_to_matrix(vec[..., 3:])
    return jnp.concatenate([R, t], axis=-1)


def pose_to_rt(pose: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) -> (ax, ay, az, tx, ty, tz). Matches `Pose2RT` (SFMnet.py:287)."""
    return jnp.concatenate(
        [matrix_to_angle(pose[..., :3, :3]), pose[..., :3, 3]], axis=-1
    )


def rt_to_pose(rt: jnp.ndarray) -> jnp.ndarray:
    """(ax, ay, az, tx, ty, tz) -> (..., 3, 4). Matches `RT2Pose` (SFMnet.py:292)."""
    return jnp.concatenate(
        [angle_to_matrix(rt[..., :3]), rt[..., 3:, None]], axis=-1
    )


def invert_pose(pose: jnp.ndarray) -> jnp.ndarray:
    """Invert a (..., 3, 4) rigid transform: (R, t) -> (R^T, -R^T t)."""
    R = pose[..., :3, :3]
    t = pose[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    return jnp.concatenate([Rt, -Rt @ t], axis=-1)


def compose_pose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose (..., 3, 4) rigid transforms: returns a @ b (apply b then a)."""
    Ra, ta = a[..., :3, :3], a[..., :3, 3:]
    Rb, tb = b[..., :3, :3], b[..., :3, 3:]
    return jnp.concatenate([Ra @ Rb, Ra @ tb + ta], axis=-1)


def rotation_angular_error(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle (radians) between rotations, (...,3,3)x2 -> (...)."""
    cos = (jnp.einsum("...ij,...ij->...", R1, R2) - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))
