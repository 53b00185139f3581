"""End-to-end optimization sanity: training REDUCES the eval metric.

The single-step descent test (test_train.py) proves one gradient step
lowers the loss; this proves the whole chain — PSNet forward, masked
depth loss, Adam, BatchNorm stats, and the Eigen eval protocol —
cooperates: memorizing one synthetic batch for 60 steps must cut
abs_rel substantially and raise a1. A sign error anywhere in the
loss/eval plumbing, a BN-stats mixup, or a depth/scale convention
drift fails this even though each unit test still passes. The tiny
model saturates at a capacity floor (~0.22 abs_rel on random textures,
measured), so the assertion is a large relative improvement, not
convergence to zero. (abs_rel <= 0.055 on real KITTI — BASELINE.md —
remains unfalsifiable offline; this is the strongest accuracy
statement synthetic data supports.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.heavy
def test_training_reduces_eval_abs_rel():
    import __graft_entry__ as g
    from deep_sfm_revisited_tpu.train.trainer import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )

    cfg = g._tiny_cfg(nlabel=8, hyps=8, iters=1, ncorr=64, flow="RAFT")
    cfg = cfg.override(use_gt_pose=True)

    b, h, w = 2, 48, 64
    rng = np.random.default_rng(0)
    ref = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
    # GT depth inside [min_depth, nlabel*min_depth] = [0.5, 4.0]
    depth_gt = (1.2 + 1.8 * rng.random((b, h, w))).astype(np.float32)
    # |t| == NORM_TARGET so RESCALE_DEPTH is the identity: the net's
    # normalized output IS the metric depth
    pose = np.concatenate(
        [np.eye(3, dtype=np.float32),
         np.asarray([[0.0], [0.0], [0.6]], np.float32)], axis=1)
    batch = {
        "ref": jnp.asarray(ref),
        "target": jnp.asarray(np.roll(ref, 2, axis=2)),
        "intrinsics": jnp.broadcast_to(
            jnp.asarray([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]],
                        jnp.float32), (b, 3, 3)),
        "pose_gt": jnp.broadcast_to(jnp.asarray(pose), (b, 3, 4)),
        "depth_gt": jnp.asarray(depth_gt),
    }

    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), sample_shape=(b, h, w),
        steps_per_epoch=100,
    )
    ev = make_eval_step(model, cfg)
    m0, _ = ev(state, batch, jax.random.PRNGKey(9))
    before = float(m0["abs_rel"])
    before_a1 = float(m0["a1"])

    step = make_train_step(model, cfg)
    key = jax.random.PRNGKey(1)
    for _ in range(60):
        key, ks = jax.random.split(key)
        state, _ = step(state, batch, ks)

    m1, _ = ev(state, batch, jax.random.PRNGKey(9))
    after = float(m1["abs_rel"])
    after_a1 = float(m1["a1"])
    assert np.isfinite(before) and np.isfinite(after)
    # measured trajectory: 0.334 -> 0.220 abs_rel, a1 0.395 -> 0.584
    assert after < 0.80 * before, (before, after)
    assert after_a1 > before_a1 + 0.08, (before_a1, after_a1)
    assert float(m1["rmse"]) < float(m0["rmse"])
