"""Evaluation metrics.

Rebuilds the KITTI Eigen depth protocol of `main.py:560-630`:
  * validity mask 0 < d < 80 m + Eigen crop window
    [0.408h, 0.992h] x [0.036w, 0.964w] (`main.py:568-574`),
  * per-image median scale alignment (`main.py:576-585`),
  * clamp to [MIN_DEPTH, nlabel*MIN_DEPTH] (`main.py:587-590`),
  * the 9 scalar metrics of `evaluate_metric` (`main.py:727-747`) plus
    l1_inverse / scale_invariant (`demon_metrics.py:63,130`),
and the DeMoN motion errors (`compute_motion_errors`,
`demon_metrics.py:391+`) without the minieigen dependency.

All functions are jit-able masked reductions (the reference indexes with
boolean masks, which XLA cannot; weighted means are identical).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.ops.rotations import matrix_to_quat


def _mmean(x, mask):
    w = mask.astype(x.dtype)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def eigen_crop_mask(
    depth_gt: jnp.ndarray,
    max_depth: float = 80.0,
    raw_hw: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Eigen evaluation mask (≙ `main.py:568-574`). depth_gt (B, H, W).

    The reference evaluates at RAW image size (`gt_height, gt_width =
    mask.shape[2:]` AFTER cropping the prediction back, `main.py:543,573`).
    When inputs were padded to /128 for the network, pass `raw_hw`
    (B, 2) int32 per-image raw (h, w): the crop window is computed on the
    raw dims and padded rows/cols are masked out — bit-identical metrics
    to evaluating on the unpadded arrays (tests/test_metrics_protocol.py).
    """
    b, h, w = depth_gt.shape
    valid = (depth_gt > 0) & (depth_gt < max_depth)
    # f64 window math (x64 is on package-wide for the RANSAC island):
    # in f32, 0.99189189*370 rounds UP to 367.0 and the floor is off by
    # one row vs the reference's float64 numpy computation
    if raw_hw is None:
        rh = jnp.full((b,), h, jnp.float64)
        rw = jnp.full((b,), w, jnp.float64)
    else:
        rh = raw_hw[:, 0].astype(jnp.float64)
        rw = raw_hw[:, 1].astype(jnp.float64)
    # np.astype(int32) in the reference truncates toward zero == floor here
    y0 = jnp.floor(0.40810811 * rh)[:, None, None]
    y1 = jnp.floor(0.99189189 * rh)[:, None, None]
    x0 = jnp.floor(0.03594771 * rw)[:, None, None]
    x1 = jnp.floor(0.96405229 * rw)[:, None, None]
    ys = jnp.arange(h, dtype=jnp.float64)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float64)[None, None, :]
    crop = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
    in_raw = (ys < rh[:, None, None]) & (xs < rw[:, None, None])
    return valid & crop & in_raw


def demon_mask(depth_gt: jnp.ndarray, raw_hw: jnp.ndarray | None = None) -> jnp.ndarray:
    """DeMoN-protocol validity mask: 0.5 <= d <= 10 m, finite, NO crop
    window (≙ the DEMON_DATASET branch of validate, `main.py:565-566`).
    Padded rows/cols (gt = 0) fail the lower bound; `raw_hw` additionally
    hard-masks them for safety with nonzero-padded GT."""
    b, h, w = depth_gt.shape
    valid = (
        (depth_gt >= 0.5) & (depth_gt <= 10.0) & jnp.isfinite(depth_gt)
    )
    if raw_hw is not None:
        ys = jnp.arange(h)[None, :, None]
        xs = jnp.arange(w)[None, None, :]
        valid = valid & (ys < raw_hw[:, :1, None]) & (xs < raw_hw[:, 1:, None])
    return valid


def _masked_median_sort(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of masked entries of a 1-D slice (fixed-shape via sorting).

    Invalid entries are pushed to +inf; the median index is derived from
    the valid count. Kept as the reference implementation for the
    bisection variant's equality tests.
    """
    n = x.shape[0]
    vals = jnp.where(mask, x, jnp.inf)
    s = jnp.sort(vals)
    cnt = jnp.sum(mask)
    mid = jnp.maximum(cnt - 1, 0) // 2
    lo = s[jnp.clip(mid, 0, n - 1)]
    hi = s[jnp.clip(cnt - 1 - mid, 0, n - 1)]  # == mid for odd cnt
    med = 0.5 * (lo + hi)
    return jnp.where(cnt > 0, med, 1.0)


def _f32_order_key(x: jnp.ndarray) -> jnp.ndarray:
    """Map f32 to uint32 keys whose UNSIGNED order equals float total
    order (standard sign-flip trick: negative floats get bitwise-NOT,
    non-negative get the sign bit set)."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    neg = (u >> 31).astype(jnp.bool_)
    return jnp.where(neg, ~u, u | jnp.uint32(0x80000000))


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Exact masked median via 32-step bit bisection (round-4 perf:
    the chained-validate Eigen metrics paid +8.2 ms/pair for per-image
    full-sort medians, PERF.md round-3). Each bisection step is one
    masked count — 32 streaming reductions instead of an O(n log n)
    sort, and XLA keeps the whole fori_loop on-device. Bit-exact vs
    `_masked_median_sort` (tests/test_metrics_protocol.py): the k-th
    order statistics are recovered exactly, not approximated.
    """
    keys = jnp.where(mask, _f32_order_key(x),
                     jnp.uint32(0xFFFFFFFF))  # invalid -> +max key
    cnt = jnp.sum(mask)
    k_lo = jnp.maximum(cnt - 1, 0) // 2
    k_hi = cnt - 1 - k_lo  # == k_lo for odd cnt
    ranks = jnp.stack([k_lo, k_hi])  # (2,)

    def body(i, bounds):
        lo, hi = bounds  # (2,) uint32 each; invariant: kth in [lo, hi]
        mid = lo + (hi - lo) // 2
        # one pass over the data serves BOTH order statistics
        c = jnp.sum(keys[None, :] <= mid[:, None], axis=1)
        take_lo = c >= ranks + 1
        return (jnp.where(take_lo, lo, mid + 1),
                jnp.where(take_lo, mid, hi))

    lo0 = jnp.zeros((2,), jnp.uint32)
    hi0 = jnp.full((2,), 0xFFFFFFFF, jnp.uint32)
    lo, _ = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
    # invert the order key back to f32
    neg = (lo & jnp.uint32(0x80000000)) == 0
    bits = jnp.where(neg, ~lo, lo & jnp.uint32(0x7FFFFFFF))
    vals = jax.lax.bitcast_convert_type(bits, jnp.float32)
    med = 0.5 * (vals[0] + vals[1])
    return jnp.where(cnt > 0, med, 1.0)


def median_scale_align(
    pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Per-image median(gt)/median(pred) rescale (≙ `main.py:576-585`)."""
    b = pred.shape[0]
    p = pred.reshape(b, -1)
    g = gt.reshape(b, -1)
    m = mask.reshape(b, -1)
    import jax

    med_p = jax.vmap(_masked_median)(p, m)
    med_g = jax.vmap(_masked_median)(g, m)
    scale = med_g / jnp.maximum(med_p, 1e-12)
    return pred * scale[:, None, None]


def depth_metrics(
    gt: jnp.ndarray, pred: jnp.ndarray, mask: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """The 9 depth metrics over masked pixels (≙ `main.py:727-747`)."""
    eps = 1e-12
    # scrub masked-out entries BEFORE arithmetic: the reference indexes
    # with the boolean mask (dropping e.g. NaN GT rows); a weighted mean
    # would otherwise propagate NaN*0 = NaN into the sums
    g = jnp.maximum(jnp.where(mask, gt, 1.0), eps)
    p = jnp.maximum(jnp.where(mask, pred, 1.0), eps)
    thresh = jnp.maximum(g / p, p / g)
    log_d = jnp.log(g) - jnp.log(p)
    # scale_invariant (demon_metrics.py:130): sqrt(E[d^2] - E[d]^2) of log diffs
    mean_logd = _mmean(log_d, mask)
    sc_inv = jnp.sqrt(
        jnp.maximum(_mmean(log_d**2, mask) - mean_logd**2, 0.0)
    )
    return {
        "abs_rel": _mmean(jnp.abs(g - p) / g, mask),
        "sq_rel": _mmean((g - p) ** 2 / g, mask),
        "rmse": jnp.sqrt(_mmean((g - p) ** 2, mask)),
        "rmse_log": jnp.sqrt(_mmean(log_d**2, mask)),
        "a1": _mmean((thresh < 1.25).astype(jnp.float32), mask),
        "a2": _mmean((thresh < 1.25**2).astype(jnp.float32), mask),
        "a3": _mmean((thresh < 1.25**3).astype(jnp.float32), mask),
        "l1_inv": _mmean(jnp.abs(1.0 / g - 1.0 / p), mask),
        "sc_inv": sc_inv,
    }


def evaluate_depth(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    nlabel: int,
    min_depth: float,
    max_depth: float = 80.0,
    median_scale: bool = True,
    raw_hw: jnp.ndarray | None = None,
    protocol: str = "eigen",
) -> Dict[str, jnp.ndarray]:
    """Full eval protocol: mask + median align + clamp + metrics
    (≙ `validate`, main.py:560-630). `raw_hw` (B, 2) carries per-image
    pre-pad sizes so padded inputs evaluate exactly as unpadded ones.
    `protocol`: "eigen" (KITTI crop window) or "demon" (0.5-10 m, no
    crop; ≙ the DEMON_DATASET branch, main.py:565-566)."""
    if protocol == "demon":
        mask = demon_mask(gt, raw_hw=raw_hw)
    else:
        mask = eigen_crop_mask(gt, max_depth, raw_hw=raw_hw)
    if median_scale:
        pred = median_scale_align(pred, gt, mask)
    pred = jnp.clip(pred, min_depth, nlabel * min_depth)
    return depth_metrics(gt, pred, mask)


def motion_errors(
    pred_pose: jnp.ndarray, gt_pose: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(rot angle err, normalized-translation L2, translation angle err).

    ≙ `compute_motion_errors` (`demon_metrics.py:391+`), computed on
    (..., 3, 4) pose matrices with quaternion angular distance instead of
    the minieigen dependency.
    """
    q1 = matrix_to_quat(pred_pose[..., :3, :3])
    q2 = matrix_to_quat(gt_pose[..., :3, :3])
    dot = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    rot_err = 2.0 * jnp.arccos(jnp.clip(dot, -1.0, 1.0))

    t1 = pred_pose[..., :3, 3]
    t2 = gt_pose[..., :3, 3]
    n1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    n2 = t2 / jnp.maximum(jnp.linalg.norm(t2, axis=-1, keepdims=True), 1e-12)
    trans_dist = jnp.linalg.norm(n1 - n2, axis=-1)
    trans_angle = jnp.arccos(jnp.clip(jnp.sum(n1 * n2, axis=-1), -1.0, 1.0))
    return rot_err, trans_dist, trans_angle
