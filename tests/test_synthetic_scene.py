"""Analytic-scene generator consistency (data/synthetic.py).

The synthetic scenes back the convergence proofs and the golden-dataset
CLI pins, so their ground truth must agree with the framework's OWN
geometry ops: pose2flow(GT depth, GT pose) must equal the scene's exact
flow, the two rendered views must be photometrically consistent under
that flow, and RANSAC on the exact flow must recover the GT pose.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from deep_sfm_revisited_tpu.data.synthetic import (
    default_planes,
    exact_flow,
    forward_trajectory,
    relative_pose,
    render,
    sparse_depth,
    write_kitti_raw_tree,
    write_kitti_vo_tree,
)

HW = (48, 64)
K = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])


def _pair(seed=0):
    traj = forward_trajectory(2)
    planes = default_planes()
    img_r, depth_r, X_r = render(K, traj[0], HW, planes, seed=seed)
    img_t, depth_t, _ = render(K, traj[1], HW, planes, seed=seed)
    return traj, img_r, depth_r, X_r, img_t


def test_scene_flow_matches_pipeline_pose2flow():
    """The scene's exact flow must equal ops.camera.pose2flow evaluated
    on the scene's GT depth and GT relative pose — this pins the
    generator's pose convention to the one the data pipeline carries
    (pose_gt: ref-cam -> target-cam coords)."""
    from deep_sfm_revisited_tpu.ops.camera import pose2flow

    traj, img_r, depth_r, X_r, _ = _pair()
    flow_exact = exact_flow(K, traj[0], traj[1], X_r)
    pose = relative_pose(traj[0], traj[1])
    flow_ops = np.asarray(pose2flow(
        jnp.asarray(depth_r)[None],
        jnp.asarray(pose, jnp.float32)[None],
        jnp.asarray(K, jnp.float32)[None],
        jnp.linalg.inv(jnp.asarray(K, jnp.float32))[None],
    ))[0]
    np.testing.assert_allclose(flow_ops, flow_exact, atol=2e-2)


def test_scene_photometric_consistency():
    """Sampling the target image at ref + exact_flow must reproduce the
    ref image (world-anchored texture; bilinear tolerance only)."""
    traj, img_r, depth_r, X_r, img_t = _pair()
    flow = exact_flow(K, traj[0], traj[1], X_r)
    h, w = HW
    ys, xs = np.mgrid[0:h, 0:w]
    px = xs + flow[..., 0]
    py = ys + flow[..., 1]
    inside = (px >= 1) & (px < w - 2) & (py >= 1) & (py < h - 2)
    x0, y0 = np.floor(px).astype(int), np.floor(py).astype(int)
    fx, fy = (px - x0)[..., None], (py - y0)[..., None]
    x0c = np.clip(x0, 0, w - 2)
    y0c = np.clip(y0, 0, h - 2)
    samp = ((1 - fx) * (1 - fy) * img_t[y0c, x0c]
            + fx * (1 - fy) * img_t[y0c, x0c + 1]
            + (1 - fx) * fy * img_t[y0c + 1, x0c]
            + fx * fy * img_t[y0c + 1, x0c + 1])
    err = np.abs(samp - img_r)[inside]
    # occlusion boundaries between planes break consistency on a few
    # pixels; the bulk must match to bilinear-interp error
    assert np.percentile(err, 90) < 0.06, np.percentile(err, 90)


def test_ransac_recovers_scene_pose_from_exact_flow():
    """Five-point RANSAC on correspondences sampled from the exact flow
    must recover the GT relative pose (rotation < 0.1 deg, translation
    direction < 0.5 deg) — the scene is non-degenerate for E."""
    from deep_sfm_revisited_tpu.ops.essential import ransac_pose

    traj, img_r, depth_r, X_r, _ = _pair()
    flow = exact_flow(K, traj[0], traj[1], X_r)
    pose = relative_pose(traj[0], traj[1])
    h, w = HW
    ys, xs = np.mgrid[0:h, 0:w]
    pts1 = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float64)
    pts2 = pts1 + flow.reshape(-1, 2)
    rng = np.random.default_rng(0)
    sel = rng.choice(len(pts1), 256, replace=False)
    Kinv = np.linalg.inv(K)

    def norm(p):
        ph = np.concatenate([p, np.ones_like(p[:, :1])], 1)
        return (ph @ Kinv.T)[:, :2]

    out = ransac_pose(
        jnp.asarray(norm(pts1[sel]))[None],
        jnp.asarray(norm(pts2[sel]))[None],
        jax.random.PRNGKey(0), num_hypotheses=64, ransac_iter=2,
    )
    P = np.asarray(out["P"])[0]
    R_gt, t_gt = pose[:3, :3], pose[:3, 3]
    t_gt = t_gt / np.linalg.norm(t_gt)
    rot_err = np.degrees(np.arccos(np.clip(
        (np.trace(P[:3, :3].T @ R_gt) - 1) / 2, -1, 1)))
    t_err = np.degrees(np.arccos(np.clip(abs(P[:3, 3] @ t_gt), -1, 1)))
    assert rot_err < 0.1, rot_err
    assert t_err < 0.5, t_err


def test_golden_vo_tree_loads_consistently(tmp_path):
    """write_kitti_vo_tree -> KittiVODataset: pose_gt must equal the
    written trajectory's relative pose and depth_gt the rendered sparse
    depth (to PNG uint16 quantization)."""
    from deep_sfm_revisited_tpu.data import KittiVODataset

    root = str(tmp_path / "vo")
    write_kitti_vo_tree(root, seqs=(9,), n_frames=4, hw=HW)
    ds = KittiVODataset(root, train=False)
    assert len(ds) == 4
    s = ds.__getitem__(0)
    traj = forward_trajectory(4)
    # pair (0, 1): ref = frame 1 (later), pose ref->target = rel(1, 0)
    exp = relative_pose(traj[1], traj[0])
    np.testing.assert_allclose(s["pose_gt"], exp, atol=1e-5)
    _, depth1, _ = render(K_vo(), traj[1], HW, default_planes(), seed=9)
    sp = sparse_depth(depth1)
    got = s["depth_gt"]
    mask = sp > 0
    assert mask.sum() > 100
    np.testing.assert_allclose(got[mask], sp[mask], atol=1 / 128)
    assert (got[~mask] == 0).all()


def K_vo(hw=HW, focal=70.0):
    h, w = hw
    return np.asarray([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]])


def test_golden_raw_tree_loads_consistently(tmp_path):
    """write_kitti_raw_tree -> KittiRawDataset (deterministic pairs):
    pose_gt and GT depth consistent with the written scene."""
    from deep_sfm_revisited_tpu.data import KittiRawDataset

    root = str(tmp_path / "raw")
    write_kitti_raw_tree(root, n_frames=5, hw=HW, n_test=2)
    ds = KittiRawDataset(
        root, train=False,
        gt_depth_dir=os.path.join(root, "gt_depth"),
        random_offset=False, random_fw_bw=False,
    )
    assert len(ds) == 2
    s = ds.__getitem__(1)  # frame 1, partner frame 0
    traj = forward_trajectory(5)
    exp = relative_pose(traj[1], traj[0])
    np.testing.assert_allclose(s["pose_gt"], exp, atol=1e-5)
    _, depth1, _ = render(K_vo(), traj[1], HW, default_planes(), seed=0)
    sp = sparse_depth(depth1)
    mask = sp > 0
    np.testing.assert_allclose(s["depth_gt"][mask], sp[mask], atol=1 / 128)
