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


def _adversarial_scene(h=96, w=192, seed=2):
    """Round-5 A/B scene (VERDICT 'next' #5): three vertical bands on a
    REAL rendered image —
      left  : a repeating 2-D dot lattice (HIGH texture — real corners —
              but ambiguous matching -> corrupt flow; a matcher's
              entropy flags it, a texture score cannot),
      middle: random texture (good flow, both scores confident),
      right : flat/low texture (no signal -> corrupt flow; both flag).
    Returns (image, flow, entropy_conf, pose_gt, K_inv, bands)."""
    rng = np.random.default_rng(seed)
    K = jnp.asarray(
        [[[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]]], jnp.float64)
    K_inv = jnp.linalg.inv(K)
    R = exp_so3(jnp.asarray([0.015, -0.02, 0.01], jnp.float64))
    t = jnp.asarray([0.5, 0.1, 0.85])
    t = t / jnp.linalg.norm(t)
    pose = jnp.concatenate([R, t[:, None]], axis=-1)[None]
    depth = jnp.asarray(8.0 + 4.0 * rng.random((1, h, w)), jnp.float64)
    flow = pose2flow(depth, pose, K, K_inv)

    xs = np.arange(w)
    ys = np.arange(h)
    img = np.empty((1, h, w, 3), np.float32)
    # 2-D repeating dot lattice, period 8 px: REAL corners everywhere
    # (high Shi-Tomasi score) but matching is ambiguous at every
    # multiple of the period — texture trusts it, a matcher's entropy
    # flags it. (1-D stripes would NOT fool the texture score: the
    # min-eigenvalue correctly rejects pure 1-D structure.)
    lattice = (np.sin(2 * np.pi * ys / 8.0)[:, None]
               * np.sin(2 * np.pi * xs / 8.0)[None, :])
    img[..., :] = (0.5 + 0.45 * lattice)[None, :, :, None]
    # band widths: lattice w/6, random-texture w/6, flat the remaining
    # 2/3 — flat dominates so BLIND uniform sampling drowns in ~83%
    # outliers, while the texture score at least rejects the flat band
    b1, b2 = w // 6, w // 3
    img[:, :, b1:b2] = rng.random((1, h, b2 - b1, 3)).astype(np.float32)
    img[:, :, b2:] = 0.5 + 0.02 * rng.random(
        (1, h, w - b2, 3)).astype(np.float32)

    band = np.zeros((1, h, w, 1), np.float32)  # 0 left, 1 mid, 2 right
    band[:, :, b1:b2] = 1.0
    band[:, :, b2:] = 2.0
    good = band == 1.0
    noise = jnp.asarray(rng.normal(0, 10.0, flow.shape), flow.dtype)
    flow_c = jnp.where(jnp.asarray(good), flow, flow + noise)
    # a matcher's entropy: confident only where matching is unambiguous
    ent = jnp.asarray(np.where(good, 0.1, 0.97), flow.dtype)
    return jnp.asarray(img), flow_c, ent, pose, K_inv


def test_sampler_ab_entropy_vs_texture_on_adversarial_scene():
    """The texture sampler (the on-device analogue of the reference's
    SIFT keypoint path) is fooled by repeating texture — the matcher's
    entropy is not. Pins the A/B that justified keeping entropy as the
    shipped default (`cfg.pose.sampler`), and that the texture score
    still beats blind uniform sampling (it rejects the flat band)."""
    img, flow, ent, pose_gt, K_inv = _adversarial_scene()
    tex = flow_ops.texture_pseudo_entropy(img)

    # the texture score trusts the dot lattice (low pseudo-entropy on
    # the left band) — that's the failure mode being bracketed
    b1, b2 = img.shape[2] // 6, img.shape[2] // 3
    assert float(jnp.mean(tex[:, :, :b1])) < 0.55
    assert float(jnp.mean(tex[:, :, b2:])) > 0.9

    key = jax.random.PRNGKey(5)
    P_ent, _ = _recover(flow, ent, K_inv, key)
    P_tex, _ = _recover(flow, tex.astype(flow.dtype), K_inv, key)
    P_uni, _ = _recover(flow, None, K_inv, key)

    r_e, t_e = _pose_err(P_ent, pose_gt)
    r_t, t_t = _pose_err(P_tex, pose_gt)
    r_u, t_u = _pose_err(P_uni, pose_gt)
    # entropy recovers tightly; texture must not beat it here
    assert r_e < 0.01 and t_e < 0.02, (r_e, t_e)
    assert r_e <= r_t + 1e-6 and t_e <= t_t + 1e-6, (
        (r_e, t_e), (r_t, t_t))
    # and texture >= uniform (it at least rejects the flat band):
    # compare total angular error
    assert (r_t + t_t) <= (r_u + t_u) + 1e-6, ((r_t, t_t), (r_u, t_u))


def test_sampler_knob_wires_through_sfmnet():
    """cfg.pose.sampler reaches the pose path: all three options run
    finite through SFMNet and 'uniform' reports no num_matches."""
    import dataclasses

    from deep_sfm_revisited_tpu.config import SfMConfig
    from deep_sfm_revisited_tpu.models.sfmnet import SFMNet

    base = SfMConfig().override(**{
        "flow.estimator": "DICL", "depth.nlabel": 8,
        "depth.remat": False, "pose.num_hypotheses": 16,
        "pose.ransac_iter": 1, "pose.num_correspondences": 64,
        "pose.polish_iters": 2, "train.mixed_prec": False})
    b, h, w = 1, 128, 128
    ref = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3))
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 3))
    K = jnp.asarray([[[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]]],
                    jnp.float32)
    variables = None
    for sampler in ("entropy", "texture", "uniform"):
        cfg = base.override(**{"pose.sampler": sampler})
        net = SFMNet(cfg)
        if variables is None:
            variables = jax.jit(
                lambda r, t, k: net.init(jax.random.PRNGKey(2), r, t, k,
                                         key=jax.random.PRNGKey(3))
            )(ref, tgt, K)
        out = net.apply(variables, ref, tgt, K, key=jax.random.PRNGKey(4))
        assert bool(jnp.all(jnp.isfinite(out["pose"])))
        if sampler == "uniform":
            assert out["num_matches"] is None
        else:
            assert out["num_matches"] is not None
