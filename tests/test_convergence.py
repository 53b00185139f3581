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


@pytest.mark.heavy
def test_shipped_recipe_converges_through_production_fit():
    """THE flagship-recipe convergence proof (round-3 'next' #1): DICL
    flow (pretrained on the scene's exact flow, then FROZEN per the
    KITTI recipe) + ONLINE five-point RANSAC pose + PSNet plane sweep,
    driven end-to-end by the production `fit` loop (ChainedStep,
    config dump, Orbax checkpointing), on analytic scenes with known
    geometry. The poses entering the plane sweep during training are
    the NOISY RANSAC estimates (several degrees of rotation error at
    flow EPE ~1.2 px) — the coupling the paper's pipeline rests on and
    the one thing single-component tests cannot cover.

    Measured trajectory (probe 2026-08-21, 12 epochs x 3 steps):
    abs_rel 0.523 -> 0.103, a1 0.212 -> 0.891, train loss 9.4 -> 0.35,
    with eval-pair RANSAC rot_err ~9 deg. Assertions leave margin.
    ≙ the reference's training objective/loop `main.py:266-291,339-450`.
    """
    from deep_sfm_revisited_tpu.config import FlowConfig, SfMConfig
    from deep_sfm_revisited_tpu.data.synthetic import (
        default_planes,
        exact_flow,
        forward_trajectory,
        relative_pose,
        render,
    )
    from deep_sfm_revisited_tpu.train.flow_trainer import (
        create_flow_state,
        make_flow_train_step,
    )
    from deep_sfm_revisited_tpu.train.loop import fit
    from deep_sfm_revisited_tpu.train.metrics import motion_errors
    from deep_sfm_revisited_tpu.train.trainer import (
        create_train_state,
        make_eval_step,
    )

    h, w = 128, 128  # DICL's U-net floor (the reference pads to /128)
    K = np.asarray([[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]])
    traj = forward_trajectory(4, step=0.6)  # |t| == norm_target
    planes = default_planes()
    frames = [render(K, traj[i], (h, w), planes) for i in range(4)]

    # --- stage 1: pretrain the flow net on the scene's exact flow, as
    # the recipe pretrains DICL before freezing it (README.md:52) ------
    fcfg = FlowConfig(estimator="DICL")
    fmodel, fstate = create_flow_state(
        fcfg, jax.random.PRNGKey(0), sample_shape=(2, h, w), lr=2e-4,
        dtype=jnp.float32,
    )
    fstep = make_flow_train_step(fmodel, fcfg)
    refs, tgts, flows = [], [], []
    for i in (1, 2):  # training orientation: ref = later frame
        refs.append(frames[i][0] * 2 - 1)
        tgts.append(frames[i - 1][0] * 2 - 1)
        flows.append(exact_flow(K, traj[i], traj[i - 1], frames[i][2]))
    fbatch = {
        "ref": jnp.asarray(np.stack(refs)),
        "target": jnp.asarray(np.stack(tgts)),
        "flow_gt": jnp.asarray(np.stack(flows)),
        "flow_valid": jnp.ones((2, h, w), bool),
    }
    for _ in range(70):
        fstate, fm = fstep(fstate, fbatch)
    assert float(fm["epe"]) < 2.0  # imperfect on purpose: noisy flow

    # --- stage 2: the shipped recipe through the production fit -------
    cfg = SfMConfig().override(**{
        "flow.estimator": "DICL",
        "depth.nlabel": 8,
        "depth.min_depth": 2.5,
        "depth.remat": False,
        "pose.num_hypotheses": 32,
        "pose.ransac_iter": 1,
        "pose.num_correspondences": 256,
        "pose.polish_iters": 3,
        "train.fix_flownet": True,
        "train.mixed_prec": False,
        "train.batch_size": 1,
        "train.epochs": 12,
        "train.lr": 2e-4,
        "train.chain_steps": 3,
        "train.print_freq": 3,
        "train.image_freq": 0,
        "data.train_size": (h, w),
    }, use_gt_pose=False)

    batches = []
    for i in (1, 2, 3):
        batches.append({
            "ref": (frames[i][0] * 2 - 1)[None],
            "target": (frames[i - 1][0] * 2 - 1)[None],
            "intrinsics": np.asarray(K, np.float32)[None],
            "pose_gt": relative_pose(traj[i], traj[i - 1]).astype(
                np.float32)[None],
            "depth_gt": frames[i][1][None],
        })

    class L:
        def __iter__(self):
            return iter(batches)

        def __len__(self):
            return len(batches)

    def inject(state):
        params = dict(state.params)
        params["flow_net"] = fstate.params
        stats = dict(state.batch_stats)
        stats["flow_net"] = fstate.batch_stats
        tp = type(state.params)
        ts = type(state.batch_stats)
        return state.replace(
            params=params if isinstance(state.params, dict) else tp(params),
            batch_stats=stats if isinstance(state.batch_stats, dict)
            else ts(stats),
        )

    model0, state0 = create_train_state(
        cfg, jax.random.PRNGKey(0), sample_shape=(1, h, w),
        steps_per_epoch=len(batches))
    state0 = inject(state0)
    ev = make_eval_step(model0, cfg)
    ebatch = {k: jnp.asarray(v) for k, v in batches[0].items()}
    m0, out0 = ev(state0, ebatch, jax.random.PRNGKey(9))
    before, before_a1 = float(m0["abs_rel"]), float(m0["a1"])

    # the online pose entering the sweep is genuinely NOISY — estimated
    # by RANSAC from the imperfect frozen flow, not GT
    r_err, _, _ = motion_errors(out0["pose"], ebatch["pose_gt"])
    assert float(np.degrees(np.asarray(r_err)[0])) > 0.5

    import tempfile

    state1 = fit(cfg, L(), out_dir=tempfile.mkdtemp(), restore_fn=inject)
    m1, _ = ev(state1, ebatch, jax.random.PRNGKey(9))
    after, after_a1 = float(m1["abs_rel"]), float(m1["a1"])
    assert np.isfinite(before) and np.isfinite(after)
    assert after < 0.45 * before, (before, after)
    assert after_a1 > before_a1 + 0.30, (before_a1, after_a1)


@pytest.mark.heavy
def test_posenet_recipe_training_reduces_pose_error():
    """POSENET-recipe convergence: training with the MSE pose loss
    (rot x20, wired round 3) must actually REDUCE the predicted pose's
    rotation and translation-direction errors over steps — not merely
    produce nonzero gradients (round-3 'next' #1). Memorizes one batch
    with a rotating+translating GT pose; measured trajectory:
    rot_err 0.060 -> 0.002 rad, trans_angle 2.01 -> 0.006 rad over 120
    steps (lr 1e-3)."""
    import __graft_entry__ as g
    from deep_sfm_revisited_tpu.train.metrics import motion_errors
    from deep_sfm_revisited_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    cfg = g._tiny_cfg(nlabel=8, hyps=8, iters=2, ncorr=64, flow="RAFT")
    cfg = cfg.override(**{"pose.estimator": "POSENET",
                          "train.fix_flownet": True,
                          "train.mixed_prec": False,
                          "train.lr": 1e-3})
    b, h, w = 2, 64, 96
    batch = dict(g._batch(b, h, w))
    a = 0.06
    R = np.asarray([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                    [-np.sin(a), 0, np.cos(a)]], np.float32)
    t = np.asarray([0.2, 0.05, 0.55], np.float32)
    batch["pose_gt"] = jnp.broadcast_to(
        jnp.asarray(np.concatenate([R, t[:, None]], 1)), (b, 3, 4))

    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      sample_shape=(b, h, w),
                                      steps_per_epoch=100)

    @jax.jit
    def pose_fwd(state, batch):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["ref"], batch["target"], batch["intrinsics"],
            train=False, key=jax.random.PRNGKey(3))
        return out["pose"]

    def errs(s):
        r, _, ta = motion_errors(pose_fwd(s, batch), batch["pose_gt"])
        return float(jnp.mean(r)), float(jnp.mean(ta))

    r0, ta0 = errs(state)
    step = make_train_step(model, cfg)
    key = jax.random.PRNGKey(1)
    for _ in range(120):
        key, ks = jax.random.split(key)
        state, m = step(state, batch, ks)
    assert np.isfinite(float(m["pose_loss"]))
    r1, ta1 = errs(state)
    assert r1 < 0.25 * r0, (r0, r1)
    assert ta1 < 0.10 * ta0, (ta0, ta1)
