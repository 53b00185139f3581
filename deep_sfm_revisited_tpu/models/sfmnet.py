"""SFMNet: the end-to-end two-view SfM composite.

TPU-native rebuild of `models/SFMnet.py` (`SFMnet` `:32`, forward `:95`,
`pose_by_ransac` `:176`): flow estimation -> correspondence subsampling ->
five-point RANSAC pose (or GT pose / PoseNet regression) -> plane-sweep
depth.

Key structural change (SURVEY.md §3.1): the reference's pose path runs a
*serial python loop over batch items*, each doing GPU->CPU transfers,
OpenCV SIFT/SURF detection, FLANN matching, and a CUDA RANSAC call
(`models/SFMnet.py:192-274`). Here the whole batch stays on device:
correspondences are subsampled from dense flow on a jittered grid (the
reference's own fallback path, `models/SFMnet.py:239-241`, promoted to the
primary path) and the batched RANSAC is one vmapped call. Pose outputs are
`stop_gradient`-ed exactly as the reference detaches E/P
(`models/SFMnet.py:272`).

The RANSAC runs in float64 inside the surrounding float32/bfloat16 jit,
mirroring the reference's `autocast(enabled=False)` + `.double()` region
(`models/SFMnet.py:265-270`).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.psnet import PSNet
from deep_sfm_revisited_tpu.models.raft import RAFT
from deep_sfm_revisited_tpu.ops.essential import (
    decompose_essential,
    ransac_pose,
    refine_essential_implicit,
)
from deep_sfm_revisited_tpu.ops.flow_ops import (
    sample_correspondences,
    texture_pseudo_entropy,
)

Dtype = Any


class SFMNet(nn.Module):
    """Composite model. Images NHWC in [-1, 1]; intrinsics (B, 3, 3)."""

    cfg: SfMConfig
    dtype: Dtype = jnp.float32
    # optional NamedSharding over (batch, hypothesis) pinning the RANSAC
    # candidate axis to a mesh axis (see ops.essential.ransac_pose)
    hyp_sharding: Any = None
    # optional NamedSharding for PSNet's plane-sweep cost volume
    cost_sharding: Any = None
    # optional NamedSharding over (batch, point) sharding RANSAC's
    # test-point axis: scoring + polish normal equations psum over chips
    point_sharding: Any = None

    def setup(self):
        cfg = self.cfg
        if cfg.flow.estimator == "RAFT":
            self.flow_net = RAFT(cfg.flow, dtype=self.dtype)
        elif cfg.flow.estimator == "DICL":
            from deep_sfm_revisited_tpu.models.dicl import DICLFlow

            self.flow_net = DICLFlow(cfg.flow, dtype=self.dtype)
        elif cfg.flow.estimator == "PWC":
            from deep_sfm_revisited_tpu.models.pwcnet import PWCDCNet

            self.flow_net = PWCDCNet(cfg.flow, dtype=self.dtype)
        else:
            raise NotImplementedError(cfg.flow.estimator)

        if cfg.depth.estimator == "PSNET":
            norm_target = (
                cfg.train.norm_target if cfg.train.rescale_depth else 0.0
            )
            self.depth_net = PSNet(
                cfg.depth,
                norm_target=norm_target,
                dtype=self.dtype,
                cost_sharding=self.cost_sharding,
            )
        elif cfg.depth.estimator == "PANET":
            from deep_sfm_revisited_tpu.models.depth_alternates import PANet

            self.depth_net = PANet(cfg.depth, dtype=self.dtype)
        elif cfg.depth.estimator == "REGNET":
            from deep_sfm_revisited_tpu.models.depth_alternates import REGNet

            self.depth_net = REGNet(cfg.depth, dtype=self.dtype)
        elif cfg.depth.estimator == "REG2D":
            from deep_sfm_revisited_tpu.models.depth_alternates import REG2D

            self.depth_net = REG2D(cfg.depth, dtype=self.dtype)
        elif cfg.depth.estimator == "DISPNET":
            from deep_sfm_revisited_tpu.models.depth_alternates import DISPNET

            self.depth_net = DISPNET(cfg.depth, dtype=self.dtype)
        elif cfg.depth.estimator == "CVP":
            from deep_sfm_revisited_tpu.models.cvpmvs import CVPMVS

            self.depth_net = CVPMVS(cfg.depth, dtype=self.dtype)
        else:
            raise NotImplementedError(cfg.depth.estimator)

        if cfg.pose.estimator == "POSENET":
            from deep_sfm_revisited_tpu.models.posenet import PlainPose

            self.pose_net = PlainPose(dtype=self.dtype)

    def __call__(
        self,
        ref: jnp.ndarray,            # (B, H, W, 3)
        target: jnp.ndarray,         # (B, H, W, 3)
        intrinsics: jnp.ndarray,     # (B, 3, 3)
        pose_gt: Optional[jnp.ndarray] = None,   # (B, 3, 4)
        pred_pose: Optional[jnp.ndarray] = None,  # (B, 3, 4) presaved
        use_gt_pose: bool = False,
        train: bool = False,
        key: Optional[jax.Array] = None,
    ):
        """Returns dict(flow, flow_all, pose, depth_init, depth, inliers).

        `pose` is the ref->target transform (B, 3, 4) with unit (or
        NORM_TARGET-scaled, inside PSNet) translation. Matches the
        reference forward contract (`models/SFMnet.py:95-174`), including
        the pre-saved-pose source: with `cfg.pred_pose_online=False` the
        depth net is conditioned on `pred_pose` — poses saved by a prior
        `save_pose` run (`models/SFMnet.py:139-141`, `main.py:636-703`)
        — NOT on the ground truth.
        """
        cfg = self.cfg
        K = intrinsics.astype(jnp.float32)
        K_inv = jnp.linalg.inv(K)

        flow_all = None
        inliers = None
        num_matches = None
        rt = None
        if use_gt_pose:
            # oracle GT-pose path (models/SFMnet.py:148-155)
            assert pose_gt is not None
            pose = pose_gt.astype(jnp.float32)
            if cfg.pose.gt_pose_normalized:
                scale = jnp.linalg.norm(pose[:, :3, 3], axis=-1)
                pose = pose.at[:, :3, 3].divide(scale[:, None])
            flow = jnp.zeros(ref.shape[:3] + (2,), jnp.float32)
        elif not cfg.pred_pose_online:
            # pre-saved predicted poses, the two-stage "save poses then
            # train depth" workload (models/SFMnet.py:139-141)
            assert pred_pose is not None, (
                "pred_pose_online=False needs a pred_pose input "
                "(saved by train/pose_eval.save_sequence_poses)"
            )
            pose = pred_pose.astype(jnp.float32)
            flow = jnp.zeros(ref.shape[:3] + (2,), jnp.float32)
            if cfg.pose.pred_pose_gt_scale and pose_gt is not None:
                scale = jnp.linalg.norm(pose_gt[:, :3, 3], axis=-1)
                pose = pose.at[:, :3, 3].multiply(scale[:, None])
        else:
            pair = jnp.concatenate([ref, target], axis=-1)
            if train:
                flow_all, conf = self.flow_net(pair, train=True,
                                               all_iters=True)
                flow = flow_all[-1]
            else:
                flow, conf = self.flow_net(pair, train=False)
            flow = flow.astype(jnp.float32)

            if cfg.pose.estimator == "RANSAC":
                # sampling weight (cfg.pose.sampler): flow-net entropy
                # (default), Shi-Tomasi texture score of the ref image
                # (≙ the reference's SIFT keypoint masks,
                # SFMnet.py:203-254), or the uniform grid
                if cfg.pose.sampler == "texture":
                    conf_s = texture_pseudo_entropy(ref)
                elif cfg.pose.sampler == "uniform":
                    conf_s = None
                elif cfg.pose.sampler == "entropy":
                    conf_s = conf
                else:
                    raise NotImplementedError(cfg.pose.sampler)
                pose, inliers, num_matches = self._pose_by_ransac(
                    flow, K_inv, key, conf=conf_s
                )
            elif cfg.pose.estimator == "POSENET":
                # the flow confidence (DICL entropy; None for RAFT) is a
                # pose-net input in the reference (SFMnet.py:133)
                rt = self.pose_net(flow, ref, target, conf)
                from deep_sfm_revisited_tpu.ops.rotations import rt_to_pose

                pose = rt_to_pose(rt)
            else:
                raise NotImplementedError(cfg.pose.estimator)

            if cfg.pose.pred_pose_gt_scale and pose_gt is not None:
                scale = jnp.linalg.norm(pose_gt[:, :3, 3], axis=-1)
                pose = pose.at[:, :3, 3].multiply(scale[:, None])

        if cfg.record_pose or (cfg.record_pose_eval and not train):
            # early-return pose path (≙ models/SFMnet.py:157-158);
            # num_matches rides along so the pose tools can report the
            # confident-candidate count / uniform-fallback rate the
            # reference prints for degenerate pairs (SFMnet.py:205-241)
            return {"pose": pose, "flow": flow, "num_matches": num_matches}

        depth_init, depth = self.depth_net(
            ref, target[:, None], pose[:, None], K, K_inv, train=train
        )
        return {
            "flow": flow,
            "flow_all": flow_all,
            "pose": pose,
            # raw PoseNet regression output (B, 6), un-stop-gradiented:
            # the training objective adds the MSE pose loss on it
            # (≙ `rot_and_trans` returned at models/SFMnet.py:171 and
            # supervised at main.py:396-408); None on other pose paths
            "rt": rt,
            "depth_init": depth_init,
            "depth": depth,
            "inliers": inliers,
            "num_matches": num_matches,
        }

    def _pose_by_ransac(self, flow, K_inv, key, conf=None):
        """Batched on-device RANSAC pose (≙ `pose_by_ransac`, SFMnet.py:176).

        `conf` is the flow net's entropy map (DICL; None for RAFT):
        correspondences are importance-sampled toward confident pixels —
        the deterministic replacement for the reference's SIFT keypoint
        masks (`models/SFMnet.py:203-254`) — with the reference's
        >= min_matches degenerate guard (`lib/config.py:55`) falling back
        to the uniform grid.

        With cfg.pose.differentiable, the winning E is re-refined through
        the implicit-gradient layer on the *non-detached* correspondences,
        so pose error back-propagates into the flow network — the wired
        version of the reference's unwired bilevel machinery
        (epipolar_utils.py:158-357).
        """
        cfg = self.cfg.pose
        if key is None:
            key = jax.random.PRNGKey(0)
        k_sample, k_ransac = jax.random.split(key)
        num_matches = None
        if conf is not None:
            x1, x2, num_matches = sample_correspondences(
                flow.astype(jnp.float64),
                K_inv.astype(jnp.float64),
                num_points=cfg.num_correspondences,
                margin=cfg.corr_margin,
                key=k_sample,
                conf=jax.lax.stop_gradient(conf).astype(jnp.float64),
                min_matches=cfg.min_matches,
            )
            num_matches = jax.lax.stop_gradient(num_matches)
        else:
            x1, x2 = sample_correspondences(
                flow.astype(jnp.float64),
                K_inv.astype(jnp.float64),
                num_points=cfg.num_correspondences,
                margin=cfg.corr_margin,
                key=k_sample,
            )

        out = ransac_pose(
            jax.lax.stop_gradient(x1),
            jax.lax.stop_gradient(x2),
            k_ransac,
            num_hypotheses=cfg.num_hypotheses,
            ransac_iter=cfg.ransac_iter,
            threshold=cfg.ransac_threshold,
            polish=cfg.use_polish,
            polish_iters=cfg.polish_iters,
            huber_delta=cfg.polish_huber_delta,
            hyp_sharding=self.hyp_sharding,
            point_sharding=self.point_sharding,
            solve_dtype=jnp.dtype(cfg.solve_dtype),
            score_subset=cfg.score_subset,
            score_topk=cfg.score_topk,
        )
        if cfg.differentiable:
            w = jax.lax.stop_gradient(
                out["inlier_mask"].astype(jnp.float64)
            )
            E = jax.vmap(
                lambda e, a, b, ww: refine_essential_implicit(
                    e, a, b, ww, cfg.polish_iters, cfg.polish_huber_delta
                )
            )(jax.lax.stop_gradient(out["E"]), x1, x2, w)
            P, _ = decompose_essential(E, x1, x2)
            return (P.astype(jnp.float32),
                    jax.lax.stop_gradient(out["inliers"]), num_matches)
        return (
            jax.lax.stop_gradient(out["P"].astype(jnp.float32)),
            jax.lax.stop_gradient(out["inliers"]),
            num_matches,
        )
