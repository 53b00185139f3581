"""Confidence-weighted correspondence sampling (replaces the reference's
SIFT keypoint masks, `models/SFMnet.py:203-254`) + the >= min_matches
degenerate guard (`lib/config.py:55`).

Validation the VERDICT asked for: on a synthetic LOW-TEXTURE scene
(accurate flow only inside a confident region, garbage flow outside),
entropy-weighted sampling recovers the pose where uniform sampling
degrades."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_sfm_revisited_tpu.ops import flow_ops
from deep_sfm_revisited_tpu.ops.camera import pose2flow
from deep_sfm_revisited_tpu.ops.essential import ransac_pose
from deep_sfm_revisited_tpu.ops.rotations import exp_so3


def _scene(h=96, w=128, seed=0):
    """Rigid scene -> exact flow; right half corrupted + marked
    high-entropy (the 'low-texture' band)."""
    rng = np.random.default_rng(seed)
    K = jnp.asarray(
        [[[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]]], jnp.float64)
    K_inv = jnp.linalg.inv(K)
    R = exp_so3(jnp.asarray([0.02, -0.03, 0.01], jnp.float64))
    t = jnp.asarray([0.6, 0.05, 0.8])
    t = t / jnp.linalg.norm(t)
    pose = jnp.concatenate([R, t[:, None]], axis=-1)[None]
    depth = jnp.asarray(
        8.0 + 4.0 * rng.random((1, h, w)), jnp.float64)
    flow = pose2flow(depth, pose, K, K_inv)  # exact rigid flow

    # corrupt ~88% of pixels: a mostly structureless frame where the
    # matcher is reliable only on scattered textured patches — uniform
    # sampling then feeds RANSAC ~88% outliers while the patches keep
    # full-image spatial spread (non-degenerate pose geometry)
    noise = jnp.asarray(rng.normal(0, 12.0, flow.shape), flow.dtype)
    bad = jnp.asarray(rng.random((1, h, w, 1)) > 0.12)
    flow_corrupt = jnp.where(bad, flow + noise, flow)
    # entropy map: confident (0.1) in the good band, ~1 in the bad band
    conf = jnp.broadcast_to(
        jnp.where(bad[..., 0], 0.97, 0.1)[..., None], (1, h, w, 1))
    return flow_corrupt, conf, pose, K_inv


def _pose_err(P, pose_gt):
    R_err = np.arccos(np.clip(
        (np.trace(np.asarray(P)[0, :3, :3].T @
                  np.asarray(pose_gt)[0, :3, :3]) - 1) / 2, -1, 1))
    t1 = np.asarray(P)[0, :3, 3]
    t2 = np.asarray(pose_gt)[0, :3, 3]
    t1, t2 = t1 / np.linalg.norm(t1), t2 / np.linalg.norm(t2)
    t_err = np.arccos(np.clip(abs(np.dot(t1, t2)), -1, 1))
    return R_err, t_err


def _recover(flow, conf, K_inv, key):
    if conf is not None:
        x1, x2, num_good = flow_ops.sample_correspondences(
            flow, K_inv, 256, margin=6, key=key, conf=conf, min_matches=20)
    else:
        x1, x2 = flow_ops.sample_correspondences(
            flow, K_inv, 256, margin=6, key=key)
        num_good = None
    out = ransac_pose(x1, x2, jax.random.PRNGKey(7),
                      num_hypotheses=128, ransac_iter=2, polish_iters=4)
    return out["P"], num_good


def test_conf_sampling_beats_uniform_on_low_texture():
    flow, conf, pose_gt, K_inv = _scene()
    key = jax.random.PRNGKey(3)

    P_conf, num_good = _recover(flow, conf, K_inv, key)
    P_unif, _ = _recover(flow, None, K_inv, key)

    r_c, t_c = _pose_err(P_conf, pose_gt)
    r_u, t_u = _pose_err(P_unif, pose_gt)
    # confident sampling recovers the pose tightly
    assert r_c < 0.01 and t_c < 0.02, (r_c, t_c)
    # uniform sampling drowns in the ~88% outlier fraction
    assert t_u > 5 * max(t_c, 1e-3) or r_u > 5 * max(r_c, 1e-3), (
        (r_c, t_c), (r_u, t_u))
    # the confident band (~12% of the 4x-oversampled grid) was found
    assert int(num_good[0]) > 64


def test_min_matches_guard_falls_back_to_uniform():
    """All-high-entropy conf (num_good < min_matches) must fall back to
    the uniform grid (≙ the reference's dense-grid fallback,
    models/SFMnet.py:239-241) instead of amplifying noise."""
    flow, _, pose_gt, K_inv = _scene()
    bad_conf = jnp.full(flow.shape[:3] + (1,), 0.99, flow.dtype)

    x1c, x2c, num_good = flow_ops.sample_correspondences(
        flow, K_inv, 128, margin=6, key=None, conf=bad_conf,
        min_matches=20)
    assert int(num_good[0]) == 0
    x1u, x2u = flow_ops.sample_correspondences(
        flow, K_inv, 128, margin=6, key=None)
    assert x1c.shape == x1u.shape == (1, 128, 2)
    # deterministic fallback: equal scores -> stable top-k (a fixed grid
    # subset); shapes and finiteness are the contract here
    assert np.isfinite(np.asarray(x1c)).all()


def test_conf_sampling_fixed_shapes_and_jit():
    flow, conf, _, K_inv = _scene(h=64, w=96, seed=1)

    @jax.jit
    def f(flow, conf, key):
        return flow_ops.sample_correspondences(
            flow, K_inv, 64, margin=4, key=key, conf=conf, min_matches=20)

    x1, x2, num_good = f(flow, conf, jax.random.PRNGKey(0))
    assert x1.shape == (1, 64, 2) and x2.shape == (1, 64, 2)
    assert num_good.shape == (1,)
    # re-keying changes the Gumbel draw but not the shape
    y1, _, _ = f(flow, conf, jax.random.PRNGKey(1))
    assert y1.shape == x1.shape
    assert not np.allclose(np.asarray(x1), np.asarray(y1))
