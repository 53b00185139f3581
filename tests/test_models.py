"""Forward-pass shape/finiteness tests for the networks (SURVEY.md §4:
fixed-seed tiny-image forward tests, the rebuild's per-network strategy)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_sfm_revisited_tpu.config import DepthConfig, FlowConfig, SfMConfig
from deep_sfm_revisited_tpu.models.psnet import PSNet
from deep_sfm_revisited_tpu.models.raft import RAFT
from deep_sfm_revisited_tpu.models.sfmnet import SFMNet
from deep_sfm_revisited_tpu.models.submodules import SPPFeatureExtractor

F32 = jnp.float32


def small_K(b, h, w, f=50.0):
    K = jnp.asarray([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], F32)
    return jnp.broadcast_to(K, (b, 3, 3))


def test_spp_feature_extractor_shapes():
    m = SPPFeatureExtractor()
    x = jnp.zeros((2, 64, 96, 3), F32)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 16, 24, 32)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_psnet_forward():
    cfg = DepthConfig(nlabel=16, min_depth=1.0)
    m = PSNet(cfg)
    b, h, w = 1, 64, 96
    ref = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3), F32, -1, 1)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (b, 1, h, w, 3), F32, -1, 1)
    pose = jnp.concatenate(
        [jnp.eye(3, dtype=F32), jnp.array([[0.2], [0.0], [0.0]], F32)], 1
    )[None, None]
    K = small_K(b, h, w)
    K_inv = jnp.linalg.inv(K)
    params = m.init(jax.random.PRNGKey(2), ref, tgt, pose, K, K_inv)
    d_init, d = m.apply(params, ref, tgt, pose, K, K_inv)
    assert d_init.shape == (b, h, w)
    assert d.shape == (b, h, w)
    assert bool(jnp.all(jnp.isfinite(d)))
    # depths live in [min_depth, min_depth * nlabel] by construction
    assert float(d_init.min()) >= cfg.min_depth - 1e-3
    assert float(d_init.max()) <= cfg.min_depth * cfg.nlabel + 1e-3


@pytest.mark.parametrize("mode", ["tridiag", "halo"])
def test_psnet_dpack_equivalence(mode):
    """D-packed hourglass (dpack=4, both lowerings) must match the
    unpacked depth-folded form with the SAME parameter tree, eval and
    train (float-reassociation tolerance only)."""
    base = DepthConfig(nlabel=8, min_depth=1.0, dpack_mode=mode)
    b, h, w = 1, 32, 48
    ref = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3), F32, -1, 1)
    tgt = jnp.roll(ref, 2, axis=2)[:, None]
    pose = jnp.concatenate(
        [jnp.eye(3, dtype=F32), jnp.array([[0.5], [0.0], [0.1]], F32)], 1
    )[None, None]
    K = small_K(b, h, w)
    K_inv = jnp.linalg.inv(K)

    m1 = PSNet(dataclasses.replace(base, dpack=1))
    m4 = PSNet(dataclasses.replace(base, dpack=4))
    params = m1.init(jax.random.PRNGKey(2), ref, tgt, pose, K, K_inv)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        m4.init(jax.random.PRNGKey(2), ref, tgt, pose, K, K_inv)
    )

    for out1, out4 in zip(
        m1.apply(params, ref, tgt, pose, K, K_inv),
        m4.apply(params, ref, tgt, pose, K, K_inv),
    ):
        np.testing.assert_allclose(out1, out4, rtol=2e-5, atol=2e-5)

    (o1, _), bn1 = m1.apply(params, ref, tgt, pose, K, K_inv, True,
                            mutable=["batch_stats"])
    (o4, _), bn4 = m4.apply(params, ref, tgt, pose, K, K_inv, True,
                            mutable=["batch_stats"])
    np.testing.assert_allclose(o1, o4, rtol=2e-5, atol=2e-5)
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-5),
        bn1, bn4,
    )


def test_raft_forward():
    cfg = FlowConfig(raft_iters_train=2, raft_iters_eval=3)
    m = RAFT(cfg)
    b, h, w = 1, 64, 96
    pair = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 6), F32, -1, 1)
    params = m.init(jax.random.PRNGKey(1), pair)
    flow, conf = m.apply(params, pair)
    assert flow.shape == (b, h, w, 2)
    assert conf is None
    assert bool(jnp.all(jnp.isfinite(flow)))
    # training mode returns the per-iteration stack
    flows, _ = m.apply(
        params, pair, train=True, all_iters=True,
        mutable=["batch_stats"],
    )[0]
    assert flows.shape == (2, b, h, w, 2)


def tiny_sfm_config():
    cfg = SfMConfig()
    cfg = cfg.override(**{
        "flow.raft_iters_train": 2,
        "flow.raft_iters_eval": 2,
        "depth.nlabel": 8,
        "pose.num_hypotheses": 16,
        "pose.ransac_iter": 1,
        "pose.num_correspondences": 128,
        "pose.polish_iters": 2,
    })
    return cfg


def test_sfmnet_end_to_end():
    cfg = tiny_sfm_config()
    m = SFMNet(cfg)
    b, h, w = 1, 64, 96
    k = jax.random.PRNGKey(0)
    ref = jax.random.uniform(k, (b, h, w, 3), F32, -1, 1)
    target = jnp.roll(ref, 2, axis=2)  # simple shift "motion"
    K = small_K(b, h, w)
    params = m.init(jax.random.PRNGKey(1), ref, target, K, key=k)
    out = m.apply(params, ref, target, K, key=k)
    assert out["flow"].shape == (b, h, w, 2)
    assert out["pose"].shape == (b, 3, 4)
    assert out["depth"].shape == (b, h, w)
    assert bool(jnp.all(jnp.isfinite(out["depth"])))
    # pose translation is unit-norm from RANSAC decomposition
    np.testing.assert_allclose(
        jnp.linalg.norm(out["pose"][:, :, 3], axis=-1), 1.0, atol=1e-4
    )


@pytest.mark.heavy
def test_sfmnet_gt_pose_path():
    cfg = tiny_sfm_config()
    m = SFMNet(cfg)
    b, h, w = 1, 64, 96
    ref = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3), F32, -1, 1)
    target = jnp.roll(ref, 2, axis=2)
    K = small_K(b, h, w)
    pose_gt = jnp.concatenate(
        [jnp.eye(3, dtype=F32), jnp.array([[0.3], [0.0], [0.1]], F32)], 1
    )[None]
    params = m.init(
        jax.random.PRNGKey(1), ref, target, K, pose_gt=pose_gt, use_gt_pose=True
    )
    out = m.apply(params, ref, target, K, pose_gt=pose_gt, use_gt_pose=True)
    assert out["depth"].shape == (b, h, w)
    np.testing.assert_allclose(out["pose"], pose_gt, atol=1e-6)


@pytest.mark.heavy
def test_dicl_forward():
    from deep_sfm_revisited_tpu.models.dicl import DICLFlow

    cfg = FlowConfig(estimator="DICL")
    m = DICLFlow(cfg)
    b, h, w = 1, 128, 128  # H, W % 128 == 0 (the reference pads to /128)
    pair = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 6), F32, -1, 1)
    params = m.init(jax.random.PRNGKey(1), pair)
    flow, conf = m.apply(params, pair)
    assert flow.shape == (b, h, w, 2)
    assert conf.shape == (b, h, w, 1)
    assert bool(jnp.all(jnp.isfinite(flow)))
    # training stack: 5 levels x2 (raw + context) with SUP_RAW_FLOW
    stack, _ = m.apply(params, pair, train=True, all_iters=True,
                       mutable=["batch_stats"])[0]
    assert stack.shape[0] == 10
    assert stack.shape[1:] == (b, h, w, 2)


@pytest.mark.heavy
def test_sfmnet_with_dicl():
    cfg = tiny_sfm_config().override(**{"flow.estimator": "DICL"})
    m = SFMNet(cfg)
    b, h, w = 1, 128, 128
    ref = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3), F32, -1, 1)
    target = jnp.roll(ref, 2, axis=2)
    K = small_K(b, h, w)
    k = jax.random.PRNGKey(2)
    params = m.init(jax.random.PRNGKey(1), ref, target, K, key=k)
    out = m.apply(params, ref, target, K, key=k)
    assert out["depth"].shape == (b, h, w)
    assert bool(jnp.all(jnp.isfinite(out["depth"])))


@pytest.mark.heavy
def test_sfmnet_differentiable_pose_gradient_reaches_flow():
    """cfg.pose.differentiable routes pose error into the flow net via the
    implicit-gradient refinement (the wired version of the reference's
    unwired bilevel machinery)."""
    import __graft_entry__ as g

    cfg = g._tiny_cfg(nlabel=8, hyps=8, iters=2, ncorr=64, flow="RAFT").override(
        **{"pose.differentiable": True}
    )
    m = SFMNet(cfg)
    b = g._batch(1, 64, 96)
    k = jax.random.PRNGKey(0)
    v = jax.jit(
        lambda r, t, K: m.init(jax.random.PRNGKey(1), r, t, K, key=k)
    )(b["ref"], b["target"], b["intrinsics"])
    stats = v.get("batch_stats", {})

    def loss(params):
        out = m.apply({"params": params, "batch_stats": stats},
                      b["ref"], b["target"], b["intrinsics"], key=k)
        return jnp.sum(out["pose"] ** 2)

    grads = jax.grad(loss)(v["params"])
    g_flow = sum(
        float(jnp.sum(jnp.abs(x)))
        for x in jax.tree_util.tree_leaves(grads["flow_net"])
    )
    assert np.isfinite(g_flow) and g_flow > 0


def test_trunc_soft_disparity_regression():
    """TRUNC_SOFT windowed soft-argmax (ref lib/config.py:77,
    submodule.py:66-80 — implemented as the evident masked-softmax
    intent; the literal reference form yields -inf off-center, see the
    soft_argmax_disparity docstring). Checked against a numpy oracle."""
    from deep_sfm_revisited_tpu.models.submodules import (
        soft_argmax_disparity,
    )

    rng = np.random.RandomState(3)
    D, B, H, W = 8, 2, 4, 5
    logits = rng.randn(B, D, H, W).astype(np.float32) * 2.0
    prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    got = np.asarray(
        soft_argmax_disparity(jnp.asarray(prob), D, trunc_soft=True)
    )

    # oracle: renormalized expectation over labels within +-D//2 of argmax
    wsize = D // 2
    labels = np.arange(1, D + 1, dtype=np.float64)
    want = np.zeros((B, H, W))
    for b in range(B):
        for y in range(H):
            for x in range(W):
                p = prob[b, :, y, x].astype(np.float64)
                a = int(p.argmax())
                m = (np.abs(np.arange(D) - a) <= wsize)
                pw = p * m
                want[b, y, x] = (pw * labels).sum() / pw.sum()
    assert np.abs(got - want).max() < 1e-4

    # a distribution entirely inside the window reduces to the plain form
    peaked = np.zeros((1, D, 1, 1), np.float32)
    peaked[0, D // 2 - 1 : D // 2 + 2, 0, 0] = [0.25, 0.5, 0.25]
    plain = np.asarray(soft_argmax_disparity(jnp.asarray(peaked), D))
    trunc = np.asarray(
        soft_argmax_disparity(jnp.asarray(peaked), D, trunc_soft=True)
    )
    assert np.abs(plain - trunc).max() < 1e-6


def test_psnet_trunc_soft_knob_wires_through():
    """cfg.depth.trunc_soft reaches the regression (different, finite
    depth vs the default path)."""
    import dataclasses

    from deep_sfm_revisited_tpu.config import DepthConfig
    from deep_sfm_revisited_tpu.models.psnet import PSNet

    cfg0 = dataclasses.replace(DepthConfig(), nlabel=8, remat=False)
    cfg1 = dataclasses.replace(cfg0, trunc_soft=True)
    B, H, W = 1, 32, 32
    key = jax.random.PRNGKey(0)
    ref = jax.random.uniform(key, (B, H, W, 3))
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (B, 1, H, W, 3))
    pose = jnp.concatenate(
        [jnp.eye(3), jnp.array([[0.5], [0.0], [0.0]])], 1
    )[None, None].astype(jnp.float32)
    K = jnp.array([[[20.0, 0, 16], [0, 20.0, 16], [0, 0, 1]]])
    Ki = jnp.linalg.inv(K)
    outs = []
    for c in (cfg0, cfg1):
        net = PSNet(c, norm_target=0.0)
        variables = net.init(key, ref, tgt, pose, K, Ki, False)
        outs.append(np.asarray(
            net.apply(variables, ref, tgt, pose, K, Ki, False)[1]
        ))
    assert np.all(np.isfinite(outs[0])) and np.all(np.isfinite(outs[1]))
    assert np.abs(outs[0] - outs[1]).max() > 1e-7
