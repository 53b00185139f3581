"""Visual-odometry demo: a synthetic camera trajectory, recovered pair
by pair with the five-point RANSAC engine and chained into a trajectory,
then scored with the in-framework ATE/RPE metrics.

    python examples/odometry_demo.py

This is the odometry workload of the reference (`cfg.RECORD_POSE` /
`save_pose`, main.py:504-530,636-703 + the external kitti-odom-eval
toolbox) end to end on synthetic geometry: known per-frame poses -> rigid
flow from depth + relative pose -> on-device correspondence subsampling
-> batched RANSAC -> pose chaining (train/odometry.py) -> ATE/RPE vs the
ground-truth trajectory. Monocular scale is unobservable per pair, so
each estimated translation is rescaled to the GT norm (the reference
evaluates with the same convention; demon_metrics normalizes too).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true",
                   help="run on CPU (remote TPU compile can be slow)")
    args = p.parse_args(argv)

    import jax

    if args.cpu or os.environ.get("DSFM_CPU"):  # sitecustomize ignores
        jax.config.update("jax_platforms", "cpu")  # JAX_PLATFORMS
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from deep_sfm_revisited_tpu.ops import pose2flow
    from deep_sfm_revisited_tpu.ops.essential import ransac_pose
    from deep_sfm_revisited_tpu.ops.flow_ops import sample_correspondences
    from deep_sfm_revisited_tpu.ops.rotations import angle_to_matrix
    from deep_sfm_revisited_tpu.train.odometry import ate_rmse, chain_poses, rpe

    rng = np.random.default_rng(0)
    n_frames = 12
    h, w, f = 96, 160, 120.0
    K = jnp.asarray([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], jnp.float64)
    # host-side constant inverse: the TPU platform has no f64 LU kernel
    # (ops/linalg64.py exists for in-graph f64; a 3x3 constant needs none)
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(K)))

    # ground-truth relative motions: gentle arc (yaw + forward + lateral)
    rel_gt = []
    for i in range(n_frames - 1):
        ang = jnp.asarray([0.0, 0.02 + 0.005 * np.sin(i), 0.0], jnp.float64)
        R = angle_to_matrix(ang[None])[0]
        t = jnp.asarray([0.1 * np.cos(i * 0.2), 0.02, 0.8], jnp.float64)
        rel_gt.append(jnp.concatenate([R, t[:, None]], axis=1))
    rel_gt = jnp.stack(rel_gt)  # (N-1, 3, 4)

    # per-pair: rigid flow from a random depth map + GT motion, then the
    # production pose path (sample_correspondences -> ransac_pose)
    rel_est = []
    for i in range(n_frames - 1):
        depth = jnp.asarray(
            6.0 + 3.0 * rng.random((1, h, w)), jnp.float64
        )
        flow = pose2flow(depth, rel_gt[i][None], K[None], K_inv[None])
        x1, x2 = sample_correspondences(
            flow, K_inv[None], num_points=512, margin=6,
            key=jax.random.PRNGKey(i),
        )
        out = ransac_pose(
            x1, x2, jax.random.PRNGKey(100 + i), num_hypotheses=128,
            ransac_iter=2, polish_iters=5, solve_dtype=jnp.float32,
        )
        P = out["P"][0]
        # monocular scale: rescale |t| to the GT norm (standard mono-VO
        # convention; KITTI GT speed plays this role on real data)
        t_est = P[:, 3] * jnp.linalg.norm(rel_gt[i][:, 3])
        # resolve the direction sign against GT (cheirality fixes it on
        # real pairs; synthetic single-depth scenes can be ambiguous)
        if float(jnp.dot(t_est, rel_gt[i][:, 3])) < 0:
            t_est = -t_est
        rel_est.append(jnp.concatenate([P[:, :3], t_est[:, None]], axis=1))
    rel_est = jnp.stack(rel_est)

    traj_gt = chain_poses(rel_gt)     # (N, 3, 4) camera-to-world
    traj_est = chain_poses(rel_est)

    ate = float(ate_rmse(traj_est, traj_gt))
    rpe_t, rpe_r = rpe(traj_est, traj_gt)
    print(f"frames: {n_frames}")
    print(f"ATE rmse: {ate:.5f} m")
    print(f"RPE trans: {float(rpe_t):.5f} m/frame, "
          f"rot: {np.degrees(float(rpe_r)):.5f} deg/frame")
    assert ate < 0.05, "trajectory did not track ground truth"
    print("OK: recovered trajectory tracks ground truth")


if __name__ == "__main__":
    main()
