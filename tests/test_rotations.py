"""Unit tests for ops/rotations.py (ref `utils.py:209-268` conventions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_sfm_revisited_tpu.ops import rotations as rot


def random_rotations(key, n):
    q = jax.random.normal(key, (n, 4), dtype=jnp.float64)
    return rot.quat_to_matrix(q)


def test_angle_matrix_roundtrip():
    key = jax.random.PRNGKey(0)
    angles = jax.random.uniform(key, (64, 3), jnp.float64, -1.2, 1.2)
    R = rot.angle_to_matrix(angles)
    # orthonormal, det +1
    eye = jnp.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-12)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-12)
    back = rot.matrix_to_angle(R)
    np.testing.assert_allclose(back, angles, atol=1e-9)


def test_angle_convention_matches_transforms3d_sxyz():
    # R = Rz(az) @ Ry(ay) @ Rx(ax), per utils.py:232-268
    ax, ay, az = 0.3, -0.4, 0.7

    def rx(a):
        return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])

    def ry(a):
        return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])

    def rz(a):
        return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])

    expect = rz(az) @ ry(ay) @ rx(ax)
    got = rot.angle_to_matrix(jnp.array([ax, ay, az], dtype=jnp.float64))
    np.testing.assert_allclose(got, expect, atol=1e-12)


def test_quat_roundtrip():
    R = random_rotations(jax.random.PRNGKey(1), 64)
    q = rot.matrix_to_quat(R)
    R2 = rot.quat_to_matrix(q)
    np.testing.assert_allclose(R2, R, atol=1e-9)


def test_exp_so3():
    w = jnp.array([0.0, 0.0, jnp.pi / 2], dtype=jnp.float64)
    R = rot.exp_so3(w)
    expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float64)
    np.testing.assert_allclose(R, expect, atol=1e-12)
    # near-zero: identity + skew
    w = jnp.array([1e-9, 0.0, 0.0], dtype=jnp.float64)
    np.testing.assert_allclose(rot.exp_so3(w), np.eye(3) + np.asarray(rot.skew(w)), atol=1e-15)


def test_pose_roundtrip_and_inverse():
    key = jax.random.PRNGKey(2)
    vec = jax.random.uniform(key, (8, 6), jnp.float64, -1.0, 1.0)
    pose = rot.pose_vec2mat(vec)
    assert pose.shape == (8, 3, 4)
    rt = rot.pose_to_rt(pose)
    pose2 = rot.rt_to_pose(rt)
    np.testing.assert_allclose(pose2, pose, atol=1e-9)

    inv = rot.invert_pose(pose)
    comp = rot.compose_pose(pose, inv)
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    np.testing.assert_allclose(comp, np.broadcast_to(ident, comp.shape), atol=1e-12)


def test_rotation_angular_error():
    R1 = rot.angle_to_matrix(jnp.array([0.0, 0.0, 0.0], dtype=jnp.float64))
    R2 = rot.angle_to_matrix(jnp.array([0.0, 0.0, 0.25], dtype=jnp.float64))
    err = rot.rotation_angular_error(R1, R2)
    np.testing.assert_allclose(err, 0.25, atol=1e-9)
