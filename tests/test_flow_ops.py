"""Unit tests for ops/flow_ops.py."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_sfm_revisited_tpu.ops import camera as cam
from deep_sfm_revisited_tpu.ops import flow_ops
from deep_sfm_revisited_tpu.ops import rotations as rot

F32 = jnp.float32


def test_flow2coord_roundtrip():
    key = jax.random.PRNGKey(0)
    flow = jax.random.uniform(key, (2, 8, 10, 2), F32, -3, 3)
    c1, c2 = flow_ops.flow2coord(flow)
    assert c1.shape == (2, 8, 10, 3)
    np.testing.assert_allclose(c1[..., 2], 1.0)
    np.testing.assert_allclose(flow_ops.coord2flow(c1, c2), flow, atol=1e-6)
    # coord1 is the pixel grid
    np.testing.assert_allclose(c1[0, 0, :, 0], np.arange(10))
    np.testing.assert_allclose(c1[0, :, 0, 1], np.arange(8))


def test_sample_correspondences_identity_flow():
    b, h, w = 2, 64, 96
    K = jnp.asarray([[50.0, 0, 48], [0, 50.0, 32], [0, 0, 1]], F32)
    K_inv = jnp.broadcast_to(jnp.linalg.inv(K), (b, 3, 3))
    flow = jnp.zeros((b, h, w, 2), F32)
    x1, x2 = flow_ops.sample_correspondences(flow, K_inv, 256, margin=10)
    assert x1.shape == (b, 256, 2)
    np.testing.assert_allclose(x1, x2, atol=1e-6)
    # normalized coords stay in a sane range
    assert float(jnp.max(jnp.abs(x1))) < 2.0


def test_sample_correspondences_recovers_pose_via_ransac():
    """End-to-end: rigid flow from known pose -> sampler -> RANSAC -> pose."""
    from deep_sfm_revisited_tpu.ops import essential as ess

    b, h, w = 1, 96, 128
    f = 80.0
    K = jnp.asarray([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], jnp.float64)
    Kb = jnp.broadcast_to(K, (b, 3, 3))
    K_inv = jnp.broadcast_to(jnp.linalg.inv(K), (b, 3, 3))

    R = rot.angle_to_matrix(jnp.array([0.02, -0.03, 0.01], jnp.float64))
    t = jnp.array([0.4, 0.1, 0.2], jnp.float64)
    t = t / jnp.linalg.norm(t)
    pose = jnp.concatenate([R, t[:, None]], 1)[None]

    # non-constant depth so translation is observable
    key = jax.random.PRNGKey(3)
    depth = 5.0 + 3.0 * jax.random.uniform(key, (b, h, w), jnp.float64)
    flow = cam.pose2flow(depth, pose, Kb, K_inv)

    x1, x2 = flow_ops.sample_correspondences(flow, K_inv, 512, margin=10)
    out = ess.ransac_pose(x1[0], x2[0], jax.random.PRNGKey(0),
                          num_hypotheses=128, ransac_iter=1,
                          threshold=1e-4, polish=True)
    r_err = float(rot.rotation_angular_error(out["P"][:, :3], R))
    t_dir = out["P"][:, 3]
    t_err = float(jnp.arccos(jnp.clip(jnp.dot(t_dir, t), -1, 1)))
    assert r_err < 2e-3, np.degrees(r_err)
    assert t_err < 2e-2, np.degrees(t_err)


def test_flow2depth_recovers_depth():
    b, h, w = 1, 48, 64
    f = 60.0
    K = jnp.asarray([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], jnp.float64)
    Kb = jnp.broadcast_to(K, (b, 3, 3))
    K_inv = jnp.broadcast_to(jnp.linalg.inv(K), (b, 3, 3))
    R = rot.angle_to_matrix(jnp.array([0.01, 0.02, -0.01], jnp.float64))
    t = jnp.array([0.3, -0.1, 0.05], jnp.float64)
    pose = jnp.concatenate([R, t[:, None]], 1)[None]
    key = jax.random.PRNGKey(5)
    depth = 4.0 + 4.0 * jax.random.uniform(key, (b, h, w), jnp.float64)
    flow = cam.pose2flow(depth, pose, Kb, K_inv)
    est = flow_ops.flow2depth(flow, pose, Kb, K_inv)
    # interior pixels (borders can alias through the projection)
    err = jnp.abs(est - depth)[:, 4:-4, 4:-4]
    assert float(jnp.median(err)) < 1e-3
