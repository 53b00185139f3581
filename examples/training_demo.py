"""Training-loop demo: the production fit machinery on synthetic data.

    python examples/training_demo.py --out /tmp/sfm_train_demo

Drives the exact pieces `cli.main` uses for training — create_train_state,
ChainedStep (K fused optimization steps per dispatched program with
on-device metric accumulation), train_epoch, ChainedEval + validate —
over an in-memory synthetic dataset, then points at the artifacts:
per-window scalars in JSONL AND a TensorBoard-loadable
events.out.tfevents.* (utils/tb_events.py), plus the final Eigen-protocol
metric dict. Mirrors the reference's `main.py` train/validate loop
(main.py:122-291) at demo scale.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synthetic_loader(n, b, h, w, seed):
    rng = np.random.default_rng(seed)
    pose = np.concatenate(
        [np.eye(3, dtype=np.float32),
         np.asarray([[0.0], [0.0], [0.6]], np.float32)], axis=1)
    batches = []
    for _ in range(n):
        ref = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
        batches.append({
            "ref": ref,
            "target": np.roll(ref, 2, axis=2),
            "intrinsics": np.broadcast_to(
                np.asarray([[60.0, 0, w / 2], [0, 60.0, h / 2],
                            [0, 0, 1]], np.float32), (b, 3, 3)).copy(),
            "pose_gt": np.broadcast_to(pose, (b, 3, 4)).copy(),
            "depth_gt": (1.2 + 1.8 * rng.random((b, h, w))).astype(
                np.float32),
        })
    return batches


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sfm_train_demo")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--chain", type=int, default=4)
    args = ap.parse_args(argv)

    import jax

    from deep_sfm_revisited_tpu.config import SfMConfig
    from deep_sfm_revisited_tpu.train.loop import train_epoch, validate
    from deep_sfm_revisited_tpu.train.trainer import (
        ChainedEval,
        ChainedStep,
        create_train_state,
    )
    from deep_sfm_revisited_tpu.utils.logging import (
        MetricLogger,
        create_logger,
    )

    cfg = SfMConfig().override(**{
        "flow.estimator": "RAFT", "flow.raft_iters_train": 1,
        "flow.raft_iters_eval": 1, "depth.nlabel": 8,
        "pose.num_hypotheses": 8, "pose.ransac_iter": 1,
        "pose.num_correspondences": 64, "pose.polish_iters": 2,
    }, use_gt_pose=True)
    b, h, w = 1, 48, 64

    os.makedirs(args.out, exist_ok=True)
    logger = create_logger(args.out, "demo")
    mlog = MetricLogger(args.out, "train")

    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), sample_shape=(b, h, w),
        steps_per_epoch=max(args.steps, 1),
    )
    step = ChainedStep(model, cfg)
    ev = ChainedEval(model, cfg)

    train_batches = synthetic_loader(args.steps, b, h, w, seed=0)
    val_batches = synthetic_loader(2, b, h, w, seed=1)

    state, avg_loss = train_epoch(
        train_batches, state, step, 0, jax.random.PRNGKey(1),
        logger=logger, metric_logger=mlog, print_freq=args.chain,
        chain=args.chain,
    )
    results = validate(val_batches, state, ev, jax.random.PRNGKey(2),
                       logger=logger, chain=2)
    mlog.close()

    tb = [f for f in os.listdir(os.path.join(args.out, "train"))
          if "tfevents" in f]
    print(f"avg train loss: {avg_loss:.4f}")
    print("eval:", {k: round(v, 4) for k, v in sorted(results.items())})
    print(f"scalars: {args.out}/train/scalars.jsonl")
    print(f"tensorboard event file: {args.out}/train/{tb[0]}")
    return results


if __name__ == "__main__":
    main()
