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


def _invert_pose(pose: jnp.ndarray) -> jnp.ndarray:
    """Rigid inverse of (B, 3, 4) transforms: [R^T | -R^T t]."""
    R = pose[:, :3, :3]
    t = pose[:, :3, 3:]
    Rt = jnp.swapaxes(R, 1, 2)
    return jnp.concatenate([Rt, -Rt @ t], axis=-1)


def record_pose_errors(
    loader,
    pose_forward: Callable,  # (ref, target, K, key) -> (B, 3, 4)
    #                          or -> ((B, 3, 4), num_matches) diag form
    key: jax.Array,
    logger=None,
    min_matches: int = 0,
) -> Dict[str, float]:
    """Aggregate (rot, trans-dist, trans-angle) errors over a loader, in
    BOTH pair directions (≙ the RECORD_POSE branch, main.py:504-529: the
    reference runs the model forward AND backward per pair and keeps
    `errors_fw_l` / `errors_bw_l`).

    The loader's (ref, target, pose_gt) orientation is the backward
    direction; the forward pass swaps the images and scores against the
    rigid inverse of pose_gt (the loaders' pose_gt_fw ≙ pose_gt_bw^-1 by
    construction in the reference's KITTI_loader).
    """
    errs_fw: List[np.ndarray] = []
    errs_bw: List[np.ndarray] = []
    match_counts: List[np.ndarray] = []
    for batch in loader:
        key, k1, k2 = jax.random.split(key, 3)
        ref = jnp.asarray(batch["ref"])
        tgt = jnp.asarray(batch["target"])
        K = jnp.asarray(batch["intrinsics"])
        gt_bw = jnp.asarray(batch["pose_gt"])
        pred_bw = pose_forward(ref, tgt, K, k1)
        pred_fw = pose_forward(tgt, ref, K, k2)
        if isinstance(pred_bw, tuple):  # diag form carries num_matches
            pred_bw, nm = pred_bw
            pred_fw, _ = pred_fw
            if nm is not None:
                match_counts.append(np.asarray(nm))
        for errs, pred, gt in (
            (errs_bw, pred_bw, gt_bw),
            (errs_fw, pred_fw, _invert_pose(gt_bw)),
        ):
            r, td, ta = motion_errors(pred, gt)
            errs.append(np.stack([np.asarray(r), np.asarray(td),
                                  np.asarray(ta)], axis=-1))
    agg_bw = np.concatenate(errs_bw, axis=0).mean(axis=0)
    agg_fw = np.concatenate(errs_fw, axis=0).mean(axis=0)
    out = {
        # unsuffixed = backward direction (the loader orientation, and
        # what the depth pipeline consumes) for continuity
        "rot_err": float(agg_bw[0]), "trans_dist": float(agg_bw[1]),
        "trans_angle": float(agg_bw[2]),
        "rot_err_fw": float(agg_fw[0]), "trans_dist_fw": float(agg_fw[1]),
        "trans_angle_fw": float(agg_fw[2]),
    }
    if match_counts:
        nm = np.concatenate(match_counts, axis=0).astype(np.float64)
        out["num_matches"] = float(nm.mean())
        out["uniform_fallback"] = float((nm < min_matches).mean())
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
        # split into EVERY contiguous run (a single missing pair must not
        # silently drop the rest of the sequence from the score)
        segments: List[List[int]] = [[fids[0]]]
        for a, b in zip(fids, fids[1:]):
            if b == a + dataset.skip:
                segments[-1].append(b)
            else:
                segments.append([b])
        seg_reps = []
        for seg in segments:
            est = np.asarray(chain_poses(
                jnp_.asarray(np.stack([by_frame[f] for f in seg]))
            ))
            gt = dataset.poses[seq][seg[0]::dataset.skip][: len(est)]
            seg_reps.append((len(est), evaluate_trajectory(est, gt)))
        # frame-weighted aggregate over segments; a gapless sequence
        # reduces to the single-segment report exactly. RMSE-type keys
        # (ate_rmse AND the rpe_* pair — odometry.rpe returns
        # sqrt-mean-square values too) aggregate in the squared domain
        # (sqrt of the frame-weighted mean square) so the result IS the
        # RMSE over all scored frames, not a mean of per-segment RMSEs
        rmse_keys = {"ate_rmse", "rpe_trans", "rpe_rot_deg"}
        total = sum(n for n, _ in seg_reps)
        rep: Dict[str, float] = {}
        for k in seg_reps[0][1]:
            if k == "per_length":
                continue
            vals = [(n, r[k]) for n, r in seg_reps
                    if np.isfinite(r[k])]
            w = sum(n for n, _ in vals)
            if not w:
                rep[k] = float("nan")
            elif k in rmse_keys or k.endswith("rmse"):
                rep[k] = float(np.sqrt(
                    sum(n * v * v for n, v in vals) / w))
            else:
                rep[k] = sum(n * v for n, v in vals) / w
        # per_length: frame-weighted merge of the per-segment KITTI
        # tables (each maps L -> (t_err_pct, r_err_deg_per_100m); a
        # length absent from a segment simply contributes no weight)
        merged: Dict[int, List] = {}
        for n, r in seg_reps:
            for L, (t_e, r_e) in r["per_length"].items():
                merged.setdefault(L, []).append((n, t_e, r_e))
        rep["per_length"] = {
            L: (sum(n * t for n, t, _ in v) / sum(n for n, _, _ in v),
                sum(n * r for n, _, r in v) / sum(n for n, _, _ in v))
            for L, v in sorted(merged.items())
        }
        rep["n_segments"] = len(segments)
        rep["frames_scored"] = total
        if len(segments) > 1 and logger is not None:
            logger.warning(
                f"seq {seq:02d}: {len(segments)} disjoint segments "
                f"(missing pairs at the gaps) — metrics are the "
                f"frame-weighted aggregate over all of them"
            )
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
