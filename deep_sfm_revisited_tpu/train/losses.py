"""Training losses.

Rebuilds the depth loss of `main.py:350-394` (masked smooth-L1 on
depth_init/depth with 0.7 init weight and the RESCALE_DEPTH scale-window
logic), the PoseNet regression loss (`main.py:396-408`), and the
multi-iteration flow supervision of RAFT (`models/RAFT/core` sequence
loss) / multiscale flow losses (`loss_functions.py:15-62`) + EPE
(`loss_functions.py:247-288`).

All losses are mask-weighted means computed with `where`-zeroing instead
of boolean indexing (the reference's `tensor[mask]` produces dynamic
shapes, which XLA cannot compile; the weighted-mean form is numerically
identical).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Huber/smooth-L1 with beta=1 (torch F.smooth_l1_loss)."""
    d = jnp.abs(pred - gt)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    w = mask.astype(x.dtype)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def depth_training_loss(
    depth_init: jnp.ndarray,     # (B, H, W) pre-context prediction
    depth: jnp.ndarray,          # (B, H, W) refined prediction
    depth_gt: jnp.ndarray,       # (B, H, W) sparse GT (0 where absent)
    pose_gt: jnp.ndarray,        # (B, 3, 4) GT relative pose (metric)
    nlabel: int,
    min_depth: float,
    rescale_depth: bool = True,
    norm_target: float = 0.6,
    min_train_scale: float = 0.2,
    max_train_scale: float = 2.0,
    init_weight: float = 0.7,
    remask: bool = False,
) -> Tuple[jnp.ndarray, dict]:
    """Masked smooth-L1 depth loss ("follow the setting of DPSNet").

    Matches `main.py:350-394`: the validity mask keeps
    MIN_DEPTH <= gt <= nlabel*MIN_DEPTH and finite values; with
    RESCALE_DEPTH the network's NORM_TARGET-scaled prediction is rescaled
    by |t_gt|/NORM_TARGET and frames whose GT translation norm is outside
    [MIN_TRAIN_SCALE, MAX_TRAIN_SCALE] are dropped from the loss.
    """
    valid = (
        (depth_gt >= min_depth)
        & (depth_gt <= nlabel * min_depth)
        & jnp.isfinite(depth_gt)
    )
    scale = jnp.linalg.norm(pose_gt[:, :3, 3], axis=-1)  # (B,)
    if rescale_depth:
        scale_ok = (scale > min_train_scale) & (scale < max_train_scale)
        ratio = (scale / norm_target)[:, None, None]
        # the reference rescales ONLY the refined output; depth_init is
        # supervised at the NORM_TARGET scale as-is (`main.py:364` touches
        # depth_bw alone before both enter the smooth-L1 at `:387-388`)
        depth = depth * ratio
        if remask:
            # RESCALE_DEPTH_REMASK (main.py:366-372): revalidate against
            # the DE-rescaled GT
            gt_r = depth_gt / ratio
            valid = (
                (gt_r >= min_depth)
                & (gt_r <= nlabel * min_depth)
                & jnp.isfinite(gt_r)
            )
    else:
        scale_ok = scale > min_train_scale
    mask = valid & scale_ok[:, None, None]

    loss_init = _masked_mean(smooth_l1(depth_init, depth_gt), mask)
    loss_out = _masked_mean(smooth_l1(depth, depth_gt), mask)
    loss = init_weight * loss_init + loss_out
    return loss, {
        "depth_init": loss_init,
        "depth_out": loss_out,
        "valid_frac": _masked_mean(jnp.ones_like(depth_gt), mask),
    }


def pose_regression_loss(
    rt_pred: jnp.ndarray,   # (B, 6): (rot3, normalized trans3)
    pose_gt: jnp.ndarray,   # (B, 3, 4)
    rot_weight: float = 20.0,
) -> jnp.ndarray:
    """MSE pose loss with 20x rotation weighting (≙ `main.py:396-408`)."""
    from deep_sfm_revisited_tpu.ops.rotations import pose_to_rt

    rt_gt = pose_to_rt(pose_gt)
    t = rt_gt[:, 3:]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    target = jnp.concatenate([rt_gt[:, :3], t], axis=-1)
    per_dim = jnp.mean((rt_pred - target) ** 2, axis=0)  # (6,)
    per_dim = per_dim.at[:3].multiply(rot_weight)
    return jnp.mean(per_dim)


def flow_epe(
    flow_pred: jnp.ndarray,  # (B, H, W, 2)
    flow_gt: jnp.ndarray,    # (B, H, W, 2)
    valid: Optional[jnp.ndarray] = None,  # (B, H, W)
) -> jnp.ndarray:
    """End-point error (≙ `loss_functions.py:247-288`)."""
    epe = jnp.linalg.norm(flow_pred - flow_gt, axis=-1)
    if valid is None:
        return jnp.mean(epe)
    return _masked_mean(epe, valid)


def flow_sequence_loss(
    flow_preds: jnp.ndarray,  # (iters, B, H, W, 2)
    flow_gt: jnp.ndarray,     # (B, H, W, 2)
    valid: Optional[jnp.ndarray] = None,
    gamma: float = 0.8,
    max_flow: float = 400.0,
) -> jnp.ndarray:
    """Exponentially-weighted multi-iteration L1 (RAFT sequence loss).

    The reference trains RAFT with this schedule (models/RAFT); DICL uses
    the multiscale variant below.
    """
    n = flow_preds.shape[0]
    mag = jnp.linalg.norm(flow_gt, axis=-1)
    v = (mag < max_flow)
    if valid is not None:
        v = v & valid
    total = 0.0
    for i in range(n):
        w = gamma ** (n - i - 1)
        l1 = jnp.sum(jnp.abs(flow_preds[i] - flow_gt), axis=-1)
        total = total + w * _masked_mean(l1, v)
    return total


def multiscale_flow_loss(
    flow_pyramid,             # list of (B, h_i, w_i, 2), coarse->fine or any
    flow_gt: jnp.ndarray,     # (B, H, W, 2) full-res GT
    weights,                  # per-level loss weights (ref MultiScale_W)
    valid: Optional[jnp.ndarray] = None,
    valid_range=None,         # per-level (vy, vx) GT-magnitude gates
) -> jnp.ndarray:
    """Multiscale L1 flow loss (≙ `MultiScale_UP`, loss_functions.py:15-62).

    Reference semantics: each prediction is compared at FULL resolution
    (the DICL `all_iters` stack already arrives upsampled + value-scaled,
    ≙ `realflow` at :24-26); with `valid_range`, pixels whose GT
    magnitude exceeds the level's range are ZEROED but still counted in
    the mean (`lossvalue*mask; lossvalue.mean()`, :44-55), and the total
    is divided by the number of levels (:58). Levels whose prediction is
    not full-res are average-pool-downsampled GT comparisons instead.
    """
    B, H, W, _ = flow_gt.shape
    total = 0.0
    n = 0
    for i, (w_lvl, pred) in enumerate(zip(weights, flow_pyramid)):
        h, wdt = pred.shape[1], pred.shape[2]
        fy, fx = H // h, W // wdt
        gt = flow_gt.reshape(B, h, fy, wdt, fx, 2).mean(axis=(2, 4))
        gt = gt / jnp.asarray([fx, fy], flow_gt.dtype)
        l1 = jnp.sum(jnp.abs(pred - gt), axis=-1)
        mask = jnp.ones(l1.shape, bool)
        if valid_range is not None and i < len(valid_range):
            vy, vx = valid_range[i]
            mask = mask & (jnp.abs(gt[..., 0]) <= vx) & (jnp.abs(gt[..., 1]) <= vy)
        if valid is not None:
            vv = valid.reshape(B, h, fy, wdt, fx).mean(axis=(2, 4)) > 0.5
            total = total + w_lvl * _masked_mean(jnp.where(mask, l1, 0.0), vv)
        else:
            # zeroed-but-counted mean, as the reference
            total = total + w_lvl * jnp.mean(jnp.where(mask, l1, 0.0))
        n += 1
    return total / max(n, 1)


# ---------------------------------------------------------------------------
# photometric / self-supervised flow losses (≙ loss_functions.py:65-155)
# ---------------------------------------------------------------------------


def charbonnier(x: jnp.ndarray, alpha: float = 0.5,
                eps: float = 1e-3) -> jnp.ndarray:
    """Charbonnier penalty. The reference's `charbonnier_penalty` is
    sqrt(err^2 + 0.001^2) (loss_functions.py:209-210) = alpha 0.5; alpha
    stays a knob for the generalized form."""
    return (x * x + eps * eps) ** alpha


def photometric_loss(
    ref: jnp.ndarray,      # (B, H, W, 3)
    target: jnp.ndarray,   # (B, H, W, 3)
    flow: jnp.ndarray,     # (B, H, W, 2) ref->target
    occlusion: Optional[jnp.ndarray] = None,  # (B, H, W) 1 = visible
) -> jnp.ndarray:
    """Charbonnier warp error of target warped back to ref
    (≙ the photometric term, loss_functions.py:65-97)."""
    from deep_sfm_revisited_tpu.models.dicl import warp_flow

    warped = warp_flow(target, flow)
    diff = charbonnier(warped - ref)  # per channel, as the reference
    if occlusion is None:
        return jnp.mean(diff)
    m = occlusion.astype(diff.dtype)[..., None]
    # occlusion-normalized mean (loss_functions.py:84-85)
    return jnp.mean(diff * m) / (jnp.mean(m) + 1e-3)


def _census_transform(img: jnp.ndarray, patch: int = 3) -> jnp.ndarray:
    """Ternary census descriptors (≙ `ternary_transform` inside
    `ternary_loss`, loss_functions.py:131-139): normalized differences of
    each pixel to its patch neighborhood over the reference's intensity
    mapping (0.5 * mean(channels) + 0.5) * 255 for [-1, 1] images."""
    gray = (0.5 * jnp.mean(img, axis=-1, keepdims=True) + 0.5) * 255.0
    r = patch // 2
    pad = jnp.pad(gray, ((0, 0), (r, r), (r, r), (0, 0)))
    B, H, W, _ = img.shape
    neighbors = []
    for dy in range(patch):
        for dx in range(patch):
            neighbors.append(
                jax.lax.dynamic_slice(pad, (0, dy, dx, 0), (B, H, W, 1))
            )
    n = jnp.concatenate(neighbors, axis=-1)
    diff = n - gray
    return diff / jnp.sqrt(0.81 + diff * diff)


def census_loss(
    ref: jnp.ndarray,
    target: jnp.ndarray,
    flow: jnp.ndarray,
    occlusion: Optional[jnp.ndarray] = None,
    patch: int = 3,
) -> jnp.ndarray:
    """Ternary census matching loss on warped images
    (≙ `ternary_loss`, loss_functions.py:129-155): soft hamming distance
    of census descriptors, Charbonnier-penalized, averaged under the
    occlusion mask with a (patch//2)-pixel border zeroed (`create_mask`)
    and normalized by the mask mean."""
    from deep_sfm_revisited_tpu.models.dicl import warp_flow

    c_ref = _census_transform(ref, patch)
    c_tgt = _census_transform(warp_flow(target, flow), patch)
    d = c_ref - c_tgt
    dist = jnp.sum(d * d / (0.1 + d * d), axis=-1)
    B, H, W = dist.shape
    r = patch // 2
    border = jnp.zeros((H, W), dist.dtype).at[r:H - r, r:W - r].set(1.0)
    m = border[None]
    if occlusion is not None:
        m = m * occlusion.astype(dist.dtype)
    return jnp.mean(charbonnier(dist) * m) / (jnp.mean(m) + 1e-3)


def occlusion_mask_fb(
    flow_fw: jnp.ndarray, flow_bw: jnp.ndarray, alpha1: float = 0.01,
    alpha2: float = 0.5,
) -> jnp.ndarray:
    """Forward-backward consistency occlusion mask (1 = visible)."""
    from deep_sfm_revisited_tpu.models.dicl import warp_flow

    bw_warped = warp_flow(flow_bw, flow_fw)
    fb = flow_fw + bw_warped
    mag = jnp.sum(flow_fw**2, -1) + jnp.sum(bw_warped**2, -1)
    occluded = jnp.sum(fb**2, -1) > alpha1 * mag + alpha2
    return (~occluded).astype(flow_fw.dtype)


def weighted_smooth_depth_loss(pred: jnp.ndarray,
                               image: jnp.ndarray,
                               edge_weight: float = 0.5) -> jnp.ndarray:
    """Edge-aware 1st+2nd-order smoothness on a depth/disparity map
    (≙ `weighted_smooth_depth_loss`, loss_functions.py:98-126): gradients
    along H and W plus the three second-order terms, each weighted by
    exp(-0.5 * mean-channel |image gradient|) of the matching order, and
    summed as plain absolute means.

    pred (B, H, W); image (B, H, W, C).
    """
    def g_h(x):
        return x[:, 1:] - x[:, :-1]

    def g_w(x):
        return x[:, :, 1:] - x[:, :, :-1]

    Ix, Iy = g_h(image), g_w(image)
    Ix2, IxIy = g_h(Ix), g_w(Ix)
    IyIx, Iy2 = g_h(Iy), g_w(Iy)

    def w(t):
        return jnp.exp(-edge_weight * jnp.mean(jnp.abs(t), axis=-1))

    dx, dy = g_h(pred), g_w(pred)
    dx2, dxdy = g_h(dx), g_w(dx)
    dydx, dy2 = g_h(dy), g_w(dy)
    terms = (
        dx * w(Ix), dy * w(Iy), dx2 * w(Ix2), dxdy * w(IxIy),
        dydx * w(IyIx), dy2 * w(Iy2),
    )
    return sum(jnp.mean(jnp.abs(t)) for t in terms)


def smoothness_loss_2nd(flow: jnp.ndarray, image: jnp.ndarray,
                        edge_weight: float = 0.5) -> jnp.ndarray:
    """Edge-aware smoothness on a 2-channel flow field: the reference
    depth form applied per flow component."""
    return (weighted_smooth_depth_loss(flow[..., 0], image, edge_weight)
            + weighted_smooth_depth_loss(flow[..., 1], image, edge_weight))
