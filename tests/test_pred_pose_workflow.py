"""Presaved-pose workload e2e: save poses -> reload via the dataset ->
train depth on them (the reference's two-stage recipe: `save_pose`
main.py:636-703 writes, `KITTI_loader.py:121-125,231-237,359-366` read,
`models/SFMnet.py:139-141` consumes with PRED_POSE_ONLINE=False)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_sfm_revisited_tpu.config import SfMConfig

TINY = {
    "flow.raft_iters_train": 2,
    "flow.raft_iters_eval": 2,
    "depth.nlabel": 8,
    "pose.num_hypotheses": 8,
    "pose.ransac_iter": 1,
    "pose.num_correspondences": 64,
    "pose.polish_iters": 2,
    "data.pad_multiple": 16,
}


@pytest.fixture(scope="module")
def vo_root(tmp_path_factory):
    from imageio.v2 import imwrite

    root = tmp_path_factory.mktemp("kitti_vo_pred")
    rng = np.random.default_rng(0)
    for seq in (9,):
        img_dir = root / "sequences" / f"{seq:02d}" / "image_2"
        os.makedirs(img_dir)
        os.makedirs(root / "poses", exist_ok=True)
        poses = []
        for i in range(4):
            imwrite(img_dir / f"{i:06d}.png",
                    rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
            pose = np.concatenate(
                [np.eye(3), [[0.05 * i], [0.0], [0.6 * i]]], axis=1
            )
            poses.append(pose.reshape(-1))
        np.savetxt(root / "poses" / f"{seq:02d}.txt", np.stack(poses))
        with open(root / "sequences" / f"{seq:02d}" / "calib.txt", "w") as f:
            f.write("P2: 70 0 48 0 0 70 32 0 0 0 1 0\n")
    return str(root)


def _stub_pose_forward(ref, target, K, key):
    """Deterministic fake pose net: identity R, translation derived from
    the mean image brightness difference (so fw != bw)."""
    d = jnp.mean(ref - target, axis=(1, 2, 3))
    t = jnp.stack([d, d * 0 + 0.1, d * 0 + 1.0], axis=-1)
    R = jnp.broadcast_to(jnp.eye(3), (ref.shape[0], 3, 3))
    return jnp.concatenate([R, t[..., None]], axis=-1)


def test_save_reload_vo_pred_poses(vo_root):
    from deep_sfm_revisited_tpu.data.kitti import KittiVODataset
    from deep_sfm_revisited_tpu.train.pose_eval import save_vo_pred_poses

    ds = KittiVODataset(vo_root, train=False)
    written = save_vo_pred_poses(
        ds, _stub_pose_forward, vo_root, jax.random.PRNGKey(0)
    )
    assert 9 in written
    assert os.path.exists(os.path.join(vo_root, "pred_poses", "09_fw.npy"))
    assert os.path.exists(os.path.join(vo_root, "pred_poses", "09_bw.npy"))

    # reload: dataset must surface the saved poses, not zeros
    ds2 = KittiVODataset(vo_root, train=False)
    s = ds2[0]
    assert s["pred_pose"].shape == (3, 4)
    assert np.any(s["pred_pose"] != 0)
    # round-trip: the stored bw pose for this pair's first frame
    bw = np.load(os.path.join(vo_root, "pred_poses", "09_bw.npy"))
    np.testing.assert_allclose(s["pred_pose"], bw[s["frame_id1"]])


def test_sfmnet_consumes_pred_pose_not_gt():
    """PRED_POSE_ONLINE=False conditions depth on pred_pose
    (models/SFMnet.py:139-141) — round-1 silently used pose_gt."""
    from deep_sfm_revisited_tpu.models.sfmnet import SFMNet

    cfg = SfMConfig().override(**TINY, pred_pose_online=False)
    model = SFMNet(cfg, dtype=jnp.float32)
    b, h, w = 1, 32, 48
    ref = jnp.zeros((b, h, w, 3))
    target = jnp.ones((b, h, w, 3)) * 0.1
    K = jnp.broadcast_to(
        jnp.asarray([[40.0, 0, 24], [0, 40.0, 16], [0, 0, 1]]), (b, 3, 3))
    pose_gt = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
         jnp.asarray([[[9.0], [9.0], [9.0]]])], axis=-1)
    pred_pose = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
         jnp.asarray([[[0.3], [0.0], [1.0]]])], axis=-1)

    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), ref, target, K,
                           pose_gt=pose_gt, pred_pose=pred_pose,
                           key=jax.random.PRNGKey(1))
    )()
    out = jax.jit(
        lambda v: model.apply(v, ref, target, K, pose_gt=pose_gt,
                              pred_pose=pred_pose,
                              key=jax.random.PRNGKey(1))
    )(variables)
    np.testing.assert_allclose(np.asarray(out["pose"]),
                               np.asarray(pred_pose), atol=1e-6)
    assert np.isfinite(np.asarray(out["depth"])).all()

    # without a pred_pose input the path must refuse, not fall back to GT
    with pytest.raises(AssertionError):
        model.apply(variables, ref, target, K, pose_gt=pose_gt,
                    key=jax.random.PRNGKey(1))


def test_pred_pose_training_step_e2e(vo_root):
    """save -> reload -> one depth-training step on the saved poses."""
    from deep_sfm_revisited_tpu.data.kitti import KittiVODataset
    from deep_sfm_revisited_tpu.data.loader import BatchLoader
    from deep_sfm_revisited_tpu.data.transforms import Compose, Normalize
    from deep_sfm_revisited_tpu.train.pose_eval import save_vo_pred_poses
    from deep_sfm_revisited_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    save_vo_pred_poses(
        KittiVODataset(vo_root, train=False),
        _stub_pose_forward, vo_root, jax.random.PRNGKey(0),
    )
    ds = KittiVODataset(vo_root, train=False,
                        transform=Compose([Normalize()]))
    loader = BatchLoader(ds, 2, shuffle=False, workers=1, pad_multiple=16)
    batch = next(iter(loader))
    assert np.any(batch["pred_pose"] != 0)

    cfg = SfMConfig().override(**TINY, pred_pose_online=False)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  sample_shape=(2, 64, 96))
    model = None  # make_train_step takes the model; rebuild
    from deep_sfm_revisited_tpu.models.sfmnet import SFMNet

    model = SFMNet(cfg, dtype=jnp.bfloat16)
    step = make_train_step(model, cfg)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"}
    state, metrics = step(state, dev_batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_evaluate_vo_odometry_oracle(vo_root):
    """Oracle pose net -> the one-call odometry report must be ~zero ATE
    (segment errors are NaN on a 4-frame toy path shorter than 100 m —
    that must be tolerated, not crash)."""
    from deep_sfm_revisited_tpu.data.kitti import (
        KittiVODataset,
        compute_delta_rt,
        load_vo_poses,
    )
    from deep_sfm_revisited_tpu.train.pose_eval import evaluate_vo_odometry

    gt_poses = load_vo_poses(os.path.join(vo_root, "poses", "09.txt"))
    ds = KittiVODataset(vo_root, train=False)

    calls = []

    def oracle(ref, tgt, K, key):
        idx = len(calls)
        calls.append(idx)
        # evaluate_vo_odometry feeds consecutive forward links in order:
        # link idx covers frames (idx, idx+1); prediction is the
        # later-in-earlier (bw) transform, matching pose_gt orientation
        rel = compute_delta_rt(gt_poses[idx], gt_poses[idx + 1])
        return jnp.asarray(rel)[None]

    report = evaluate_vo_odometry(ds, oracle, jax.random.PRNGKey(0),
                                  pad_multiple=16)
    assert set(report) == {9}
    rep = report[9]
    assert rep["ate_rmse"] < 1e-4
    assert rep["rpe_trans"] < 1e-4
    assert np.isnan(rep["t_err_pct"])  # no 100 m segment on the toy path
    assert len(calls) == 3  # 4 frames -> 3 consecutive links


def test_evaluate_vo_odometry_scores_across_gaps():
    """A missing pair mid-sequence must NOT drop the rest of the sequence:
    every contiguous segment is chained and scored, and the report says
    how many segments there were (round-2 weakness: only the run from the
    first frame was evaluated)."""
    from deep_sfm_revisited_tpu.train.pose_eval import evaluate_vo_odometry

    n_frames = 8
    gt = np.stack([
        np.concatenate([np.eye(3), [[0.0], [0.0], [1.0 * i]]], axis=1)
        for i in range(n_frames)
    ]).astype(np.float64)

    class GappyVO:
        skip = 1
        poses = {9: gt}

        def __len__(self):
            return n_frames - 1

        def _pair_index(self, i):
            if i == 3:  # boundary-style fallback pair: link (3,4) missing
                return (3, 2)
            return (i, i + 1)

        def __getitem__(self, i, rng=None):
            return {
                "ref": np.zeros((16, 16, 3), np.float32),
                "target": np.zeros((16, 16, 3), np.float32),
                "intrinsics": np.eye(3, dtype=np.float32),
                "seq": np.asarray(9),
                "frame_id1": np.asarray(i),
            }

    calls = []

    def oracle(ref, tgt, K, key):
        calls.append(1)
        # exact relative transform of the straight-line GT: the later
        # frame sits 1 m behind in the earlier frame's coords
        rel = np.concatenate([np.eye(3), [[0.0], [0.0], [1.0]]], axis=1)
        return jnp.asarray(rel, jnp.float32)[None]

    report = evaluate_vo_odometry(GappyVO(), oracle, jax.random.PRNGKey(0),
                                  pad_multiple=16)
    rep = report[9]
    assert rep["n_segments"] == 2
    # both segments scored: 3 links + 3 links -> 4 + 4 poses
    assert rep["frames_scored"] == 8
    assert len(calls) == 6
    assert rep["ate_rmse"] < 1e-4  # oracle is exact on every segment


def test_segmented_odometry_aggregation_is_framewise(tmp_path):
    """When a sequence splits into segments with DIFFERENT error levels,
    the report must aggregate ate_rmse in the squared domain (RMSE over
    all scored frames, not a mean of per-segment RMSEs) and merge the
    per-length KITTI tables across segments (ADVICE r3: per_length was
    copied from the first segment only)."""
    from deep_sfm_revisited_tpu.train.odometry import (
        chain_poses,
        evaluate_trajectory,
    )
    from deep_sfm_revisited_tpu.train.pose_eval import evaluate_vo_odometry

    n_frames = 28
    gap_link = 13  # segments: frames 0..13 and 14..27, 390 m paths each
    step_m = 30.0
    gt = np.stack([
        np.concatenate([np.eye(3), [[0.0], [0.0], [step_m * i]]], axis=1)
        for i in range(n_frames)
    ]).astype(np.float64)

    class GappyVO:
        skip = 1
        poses = {9: gt}

        def __len__(self):
            return n_frames - 1

        def _pair_index(self, i):
            if i == gap_link:
                return (i, i - 1)  # boundary-style fallback: link missing
            return (i, i + 1)

        def __getitem__(self, i, rng=None):
            return {
                "ref": np.zeros((16, 16, 3), np.float32),
                "target": np.zeros((16, 16, 3), np.float32),
                "intrinsics": np.eye(3, dtype=np.float32),
                "seq": np.asarray(9),
                "frame_id1": np.asarray(i),
            }

    def rel_for(i):
        # exact forward link before the gap; a small yaw error after it
        # -> the two segments score DIFFERENT errors
        yaw = 0.0 if i < gap_link else 0.01
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        return np.concatenate([R, [[0.0], [0.0], [step_m]]],
                              axis=1).astype(np.float32)

    def oracle(ref, tgt, K, key):
        i = oracle.calls
        oracle.calls += 1
        links = [j for j in range(n_frames - 1) if j != gap_link]
        return jnp.asarray(rel_for(links[i]))[None]

    oracle.calls = 0
    rep = evaluate_vo_odometry(GappyVO(), oracle, jax.random.PRNGKey(0),
                               pad_multiple=16)[9]
    assert rep["n_segments"] == 2

    # independent per-segment reports -> expected frame-weighted combine
    segs = [list(range(0, gap_link + 1)),
            list(range(gap_link + 1, n_frames))]
    seg_reps = []
    for seg in segs:
        est = np.asarray(chain_poses(jnp.asarray(
            np.stack([rel_for(i) for i in seg[:-1]]))))
        seg_reps.append((len(est), evaluate_trajectory(est, gt[seg])))
    n_tot = sum(n for n, _ in seg_reps)
    exp_ate = np.sqrt(sum(n * r["ate_rmse"] ** 2
                          for n, r in seg_reps) / n_tot)
    exp_t = sum(n * r["t_err_pct"] for n, r in seg_reps) / n_tot
    np.testing.assert_allclose(rep["ate_rmse"], exp_ate, rtol=1e-9)
    np.testing.assert_allclose(rep["t_err_pct"], exp_t, rtol=1e-9)
    # the second segment's yaw drift must be visible in the aggregate
    assert seg_reps[0][1]["ate_rmse"] < 1e-6 < rep["ate_rmse"]
    # per_length merged across BOTH segments: with identical GT paths the
    # merged r_err at L=100 is the (equal-weight) mean of the two
    for L, (t_e, r_e) in rep["per_length"].items():
        exp_r = np.mean([r["per_length"][L][1] for _, r in seg_reps])
        np.testing.assert_allclose(r_e, exp_r, rtol=1e-9)
    assert rep["per_length"]  # toy path is long enough for the table


def test_odometry_smoke_saved_poses_to_ate(vo_root, tmp_path):
    """Chain saved per-pair poses into a trajectory and score ATE vs the
    GT trajectory — the reference outsources this to kitti-odom-eval
    (README.md:69-71); here it is in-framework end-to-end."""
    from deep_sfm_revisited_tpu.data.kitti import (
        KittiVODataset,
        compute_delta_rt,
        load_vo_poses,
    )
    from deep_sfm_revisited_tpu.data.loader import BatchLoader
    from deep_sfm_revisited_tpu.train.odometry import ate_rmse
    from deep_sfm_revisited_tpu.train.pose_eval import (
        save_sequence_poses,
        trajectory_from_saved,
    )

    gt_poses = load_vo_poses(os.path.join(vo_root, "poses", "09.txt"))

    # oracle pose net: returns the exact GT relative pose per pair
    ds = KittiVODataset(vo_root, train=False)
    loader = BatchLoader(ds, 1, shuffle=False, workers=1, pad_multiple=16,
                         drop_last=False)

    class OracleFwd:
        def __init__(self):
            self.i = 0

        def __call__(self, ref, tgt, K, key):
            # called twice per batch (bw then fw); derive pair from order
            idx = self.i // 2
            bw_call = self.i % 2 == 0
            self.i += 1
            i, j = ds._pair_index(idx)
            a, b = (j, i) if bw_call else (i, j)
            rel = compute_delta_rt(gt_poses[b], gt_poses[a])
            return jnp.asarray(rel)[None]

    out_dir = str(tmp_path / "poses")
    save_sequence_poses(loader, OracleFwd(), out_dir, jax.random.PRNGKey(0))
    traj = trajectory_from_saved(out_dir, seq=9)
    n = traj.shape[0]
    gt_traj = gt_poses[:n]
    err = float(ate_rmse(jnp.asarray(traj), jnp.asarray(gt_traj)))
    assert err < 1e-4, err  # oracle poses -> ~zero ATE


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    from imageio.v2 import imwrite

    root = tmp_path_factory.mktemp("kitti_raw_pred")
    date, drive = "2011_09_26", "2011_09_26_drive_0001_sync"
    folder = f"{date}/{drive}"
    img_dir = root / folder / "image_02" / "data"
    os.makedirs(img_dir)
    rng = np.random.default_rng(1)
    n = 4
    for i in range(n):
        imwrite(img_dir / f"{i:010d}.png",
                rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
    with open(root / "test_files.txt", "w") as f:
        for i in range(1, n):
            f.write(f"{folder} {i:010d} l\n")
    # precomputed calib/pose dicts (the reference's required .npy inputs)
    K = np.asarray([[70.0, 0, 48, 0], [0, 70.0, 32, 0], [0, 0, 1, 0]])
    np.save(root / "kitti_raw_calib_dict.npy", {date: K},
            allow_pickle=True)
    poses = np.stack([
        np.concatenate([np.eye(3), [[0.1 * i], [0], [0.5 * i]]], axis=1)
        for i in range(n)
    ])
    poses4 = np.concatenate(
        [poses, np.broadcast_to([[0, 0, 0, 1.0]], (n, 1, 4))], axis=1)
    np.save(root / "kitti_raw_pose_dict.npy", {drive: poses4},
            allow_pickle=True)
    return str(root)


def test_save_reload_raw_pred_poses(raw_root):
    from deep_sfm_revisited_tpu.data.kitti import KittiRawDataset
    from deep_sfm_revisited_tpu.train.pose_eval import save_raw_pred_poses

    ds = KittiRawDataset(raw_root, train=False)
    written = save_raw_pred_poses(
        ds, _stub_pose_forward, raw_root, jax.random.PRNGKey(0)
    )
    assert len(written) == len(ds)
    assert all("pred_poses_fb" in p for p in written)

    ds2 = KittiRawDataset(raw_root, train=False)
    s = ds2[0]
    assert np.any(s["pred_pose"] != 0)
    fb = np.load(written[0])
    np.testing.assert_allclose(s["pred_pose"], fb[1])
    np.testing.assert_allclose(s["pred_pose_fw"], fb[0])
