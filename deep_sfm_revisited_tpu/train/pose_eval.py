"""Pose recording and sequence-pose saving.

Rebuild of the reference pose workload paths:
  * `record_pose_errors` ≙ the RECORD_POSE branch of `validate`
    (`main.py:504-530`): run the model's early-return pose path on every
    pair and accumulate DeMoN motion errors vs GT, forward and backward;
  * `save_sequence_poses` ≙ `save_pose` (`main.py:636-703`): run forward
    and backward per pair and persist per-frame [pose_fw; pose_bw] .npy
    stacks (consumed as pre-computed training poses,
    `KITTI_loader.py:361`, and chained into trajectories for
    odometry evaluation with train/odometry.py instead of the external
    kitti-odom-eval toolbox).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from deep_sfm_revisited_tpu.train.metrics import motion_errors


def record_pose_errors(
    loader,
    pose_forward: Callable,  # (batch, key) -> (B, 3, 4) predicted pose
    key: jax.Array,
    logger=None,
) -> Dict[str, float]:
    """Aggregate (rot, trans-dist, trans-angle) errors over a loader."""
    errs: List[np.ndarray] = []
    for batch in loader:
        key, k = jax.random.split(key)
        pred = pose_forward(batch, k)
        gt = jnp.asarray(batch["pose_gt"])
        r, td, ta = motion_errors(pred, gt)
        errs.append(np.stack([np.asarray(r), np.asarray(td),
                              np.asarray(ta)], axis=-1))
    agg = np.concatenate(errs, axis=0).mean(axis=0)
    out = {"rot_err": float(agg[0]), "trans_dist": float(agg[1]),
           "trans_angle": float(agg[2])}
    if logger is not None:
        logger.info(f"pose errors: {out}")
    return out


def save_sequence_poses(
    loader,
    pose_forward: Callable,  # (ref, target, K, key) -> (B, 3, 4)
    out_dir: str,
    key: jax.Array,
) -> List[str]:
    """Per-frame [pose_fw; pose_bw] .npy files (≙ `save_pose`).

    The backward pose is the model run with (ref, target) swapped, as the
    reference does (`main.py:682-683`), not the matrix inverse — the two
    differ by the network's estimation error, and the reference trains on
    both.
    """
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for batch in loader:
        key, k1, k2 = jax.random.split(key, 3)
        ref = jnp.asarray(batch["ref"])
        tgt = jnp.asarray(batch["target"])
        K = jnp.asarray(batch["intrinsics"])
        pose_bw = np.asarray(pose_forward(ref, tgt, K, k1))
        pose_fw = np.asarray(pose_forward(tgt, ref, K, k2))
        for b in range(pose_bw.shape[0]):
            seq = batch.get("seq")
            fid = batch.get("frame_id")
            fid1 = batch.get("frame_id1")
            # name by BOTH frame ids: sequence-boundary fallback pairs
            # (j = i - skip) would otherwise collide with the forward
            # pair ending at the same frame, corrupting the chain
            name = (
                f"{int(seq[b]):02d}_{int(fid1[b]):06d}_{int(fid[b]):06d}.npy"
                if seq is not None and fid is not None and fid1 is not None
                else f"{len(written):06d}.npy"
            )
            path = os.path.join(out_dir, name)
            np.save(path, np.stack([pose_fw[b], pose_bw[b]]))
            written.append(path)
    return written


def _batched_pairs(dataset, indices, batch_size, pad_multiple=128):
    """Collate dataset samples into padded inference batches."""
    from deep_sfm_revisited_tpu.data.loader import collate

    for s in range(0, len(indices), batch_size):
        chunk = [dataset[int(i)] for i in indices[s:s + batch_size]]
        yield collate(chunk, pad_multiple=pad_multiple), chunk


def save_vo_pred_poses(
    dataset,
    pose_forward: Callable,  # (ref, target, K, key) -> (B, 3, 4)
    root: str,
    key: jax.Array,
    batch_size: int = 1,
    pad_multiple: int = 128,
) -> Dict[int, str]:
    """Write per-sequence stacked pred-pose arrays in the layout the VO
    loader consumes: `pred_poses/{seq:02d}_fw.npy` / `_bw.npy`, indexed by
    the pair's first frame id (≙ `save_pose` main.py:636-703 producing
    what `KITTI_loader.py:121-125` reads).

    `dataset` should be a KittiVODataset WITHOUT random augmentation.
    """
    from collections import defaultdict

    acc: Dict[int, Dict[int, np.ndarray]] = defaultdict(dict)
    nframes: Dict[int, int] = defaultdict(int)
    for batch, chunk in _batched_pairs(
        dataset, range(len(dataset)), batch_size, pad_multiple
    ):
        key, k1, k2 = jax.random.split(key, 3)
        ref = jnp.asarray(batch["ref"])
        tgt = jnp.asarray(batch["target"])
        K = jnp.asarray(batch["intrinsics"])
        pose_bw = np.asarray(pose_forward(ref, tgt, K, k1))
        pose_fw = np.asarray(pose_forward(tgt, ref, K, k2))
        for b, s in enumerate(chunk):
            seq, fid1 = int(s["seq"]), int(s["frame_id1"])
            acc[seq][fid1] = np.stack([pose_fw[b], pose_bw[b]])
            nframes[seq] = max(nframes[seq], fid1 + 1)

    out_dir = os.path.join(root, "pred_poses")
    os.makedirs(out_dir, exist_ok=True)
    written: Dict[int, str] = {}
    for seq, by_frame in acc.items():
        fw = np.zeros((nframes[seq], 3, 4), np.float32)
        bw = np.zeros((nframes[seq], 3, 4), np.float32)
        for fid, fb in by_frame.items():
            fw[fid], bw[fid] = fb[0], fb[1]
        np.save(os.path.join(out_dir, f"{seq:02d}_fw.npy"), fw)
        np.save(os.path.join(out_dir, f"{seq:02d}_bw.npy"), bw)
        written[seq] = out_dir
    return written


def save_raw_pred_poses(
    dataset,
    pose_forward: Callable,  # (ref, target, K, key) -> (B, 3, 4)
    root: str,
    key: jax.Array,
    batch_size: int = 1,
    pad_multiple: int = 128,
) -> List[str]:
    """Write per-frame [pose_fw; pose_bw] .npy files in the reference's
    pred_poses_fb layout (image_02 -> pred_poses_fb, png -> npy;
    ≙ `save_pose` main.py:686-692, read back by `KITTI_loader.py:359-366`
    and our KittiRawDataset).

    `dataset` should be a KittiRawDataset WITHOUT random augmentation
    (pass random_offset=False, random_fw_bw=False so the saved pose
    matches the deterministic -1 pair).
    """
    written: List[str] = []
    for batch, chunk in _batched_pairs(
        dataset, range(len(dataset)), batch_size, pad_multiple
    ):
        key, k1, k2 = jax.random.split(key, 3)
        ref = jnp.asarray(batch["ref"])
        tgt = jnp.asarray(batch["target"])
        K = jnp.asarray(batch["intrinsics"])
        pose_bw = np.asarray(pose_forward(ref, tgt, K, k1))
        pose_fw = np.asarray(pose_forward(tgt, ref, K, k2))
        for b, s in enumerate(chunk):
            folder, frame = dataset.items[int(s["index"])][:2]
            out_dir = os.path.join(root, folder, "pred_poses_fb")
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir, f"{int(frame):010d}.npy")
            np.save(path, np.stack([pose_fw[b], pose_bw[b]]))
            written.append(path)
    return written


def evaluate_vo_odometry(
    dataset,
    pose_forward: Callable,  # (ref, target, K, key) -> (B, 3, 4)
    key: jax.Array,
    batch_size: int = 1,
    pad_multiple: int = 128,
    logger=None,
) -> Dict[int, Dict[str, float]]:
    """Full in-framework odometry evaluation over a KittiVODataset: predict
    the backward (later-frame-in-earlier-frame) pose of every consecutive
    skip-pair, chain per-sequence trajectories, and score ATE / RPE / the
    KITTI devkit segment errors vs the GT trajectory — everything the
    reference's `save_pose` + external kitti-odom-eval workflow produces
    (`main.py:636-703`, `README.md:69-71`) in one call.

    `dataset` should be built WITHOUT random augmentation. Returns
    {seq: evaluate_trajectory dict}.
    """
    from collections import defaultdict

    from deep_sfm_revisited_tpu.train.odometry import (
        chain_poses,
        evaluate_trajectory,
    )
    import jax.numpy as jnp_  # local alias, keeps the module import lazy

    # consecutive forward links only (skip-pair, no boundary fallbacks)
    links = [
        i for i in range(len(dataset))
        if dataset._pair_index(i)[1] == i + dataset.skip
    ]
    rels: Dict[int, Dict[int, np.ndarray]] = defaultdict(dict)
    for batch, chunk in _batched_pairs(dataset, links, batch_size,
                                       pad_multiple):
        key, k = jax.random.split(key)
        # backward pose: frame-(i+skip) camera expressed in frame-i coords
        pose_bw = np.asarray(pose_forward(
            jnp_.asarray(batch["ref"]), jnp_.asarray(batch["target"]),
            jnp_.asarray(batch["intrinsics"]), k,
        ))
        for b, s in enumerate(chunk):
            rels[int(s["seq"])][int(s["frame_id1"])] = pose_bw[b]
    report: Dict[int, Dict[str, float]] = {}
    for seq, by_frame in sorted(rels.items()):
        fids = sorted(by_frame)
        # longest contiguous run from the first frame
        run = [by_frame[fids[0]]]
        for a, b in zip(fids, fids[1:]):
            if b != a + dataset.skip:
                break
            run.append(by_frame[b])
        est = np.asarray(chain_poses(jnp_.asarray(np.stack(run))))
        gt = dataset.poses[seq][fids[0]::dataset.skip][: len(est)]
        rep = evaluate_trajectory(est, gt)
        report[seq] = rep
        if logger is not None:
            logger.info(
                f"seq {seq:02d}: ATE {rep['ate_rmse']:.3f} m, "
                f"t_err {rep['t_err_pct']:.2f} %, "
                f"r_err {rep['r_err_deg_per_100m']:.4f} deg/100m"
            )
    return report


def trajectory_from_saved(out_dir: str, seq: int) -> np.ndarray:
    """Chain saved backward poses of one sequence into cam-to-world poses.

    Each saved pair file `{seq}_{i}_{j}.npy` (j = i + skip) holds
    [pose_fw; pose_bw] with pose_bw the frame-j -> frame-i COORDINATE
    transform, i.e. exactly the "pose of the later camera expressed in
    the earlier one" that `chain_poses` integrates — no inversion.
    Sequence-boundary fallback pairs (j < i) are excluded: they duplicate
    an existing link in reversed orientation.
    """
    from deep_sfm_revisited_tpu.train.odometry import chain_poses

    links = {}
    for f in sorted(os.listdir(out_dir)):
        if not (f.startswith(f"{seq:02d}_") and f.endswith(".npy")):
            continue
        parts = f[:-4].split("_")
        if len(parts) != 3:
            continue
        i, j = int(parts[1]), int(parts[2])
        if j > i:
            links[i] = (j, np.load(os.path.join(out_dir, f))[1])
    rels = []
    t = min(links) if links else 0
    while t in links:
        j, bw = links[t]
        rels.append(bw)
        t = j
    rel = np.stack(rels)
    return np.asarray(chain_poses(jnp.asarray(rel)))
