"""MVS plane/homography warping helpers.

Rebuild of `models/modules.py`: `homo_warping` (`:65-96`, warp source
features over a set of fronto-parallel depth hypotheses given a relative
pose — identical math to `ops.camera.plane_sweep_warp` but with shared
(global) depth values), depth-hypothesis schedules
(`calSweepingDepthHypo` `:48`, `calDepthHypo` `:97`), per-pixel
hypothesis warping `proj_cost` (`:193`), and the regression heads
`depth_regression` / `depth_regression_refine` (`:306-316`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.ops.camera import inverse_warp, plane_sweep_warp


def sweeping_depth_hypos(depth_min: float, depth_max: float,
                         n: int = 48) -> jnp.ndarray:
    """Uniform initial sweep (≙ `calSweepingDepthHypo`, modules.py:48)."""
    return jnp.linspace(depth_min, depth_max, n, dtype=jnp.float32)


def local_depth_hypos(depth: jnp.ndarray, n: int = 8,
                      ratio: float = 0.1) -> jnp.ndarray:
    """Per-pixel hypotheses around an upsampled depth map
    (≙ `calDepthHypo`, modules.py:97 — the reference derives the interval
    from epipolar geometry; a relative +-ratio interval is its practical
    behavior on KITTI scales). depth (B, H, W) -> (B, n, H, W)."""
    offs = jnp.linspace(-1.0, 1.0, n, dtype=jnp.float32)
    return depth[:, None] * (1.0 + ratio * offs[None, :, None, None])


def homo_warping(src_feat: jnp.ndarray, pose: jnp.ndarray, K: jnp.ndarray,
                 K_inv: jnp.ndarray, depth_hypos: jnp.ndarray) -> jnp.ndarray:
    """Warp source features over global depth hypotheses.

    src_feat (B, H, W, C); depth_hypos (D,) -> (B, D, H, W, C).
    ≙ `homo_warping` (modules.py:65-96).
    """
    return plane_sweep_warp(src_feat, depth_hypos, pose, K, K_inv)


def proj_cost_volume(
    ref_feat: jnp.ndarray,
    src_feat: jnp.ndarray,
    pose: jnp.ndarray,
    K: jnp.ndarray,
    K_inv: jnp.ndarray,
    depth_hypos: jnp.ndarray,  # (B, D, H, W) per-pixel hypotheses
) -> jnp.ndarray:
    """Sum-of-squares cost volume over per-pixel depth hypotheses.

    Returns (B, D, H, W, C): ref^2 + warped^2 per hypothesis
    (≙ `proj_cost`, modules.py:193, matching CVPMVS's volume_sq_sum
    aggregation, `models/CVPMVS.py:155-176`).
    """
    B, D = depth_hypos.shape[:2]
    H, W, C = src_feat.shape[1:]
    sf = jnp.broadcast_to(src_feat[:, None], (B, D, H, W, C)).reshape(
        B * D, H, W, C
    )
    dh = depth_hypos.reshape(B * D, H, W)
    pf = jnp.repeat(pose, D, axis=0)
    warped = inverse_warp(sf, dh, pf, jnp.repeat(K, D, 0),
                          jnp.repeat(K_inv, D, 0))
    warped = warped.reshape(B, D, H, W, C)
    ref = ref_feat[:, None]
    return ref**2 + warped**2


def depth_regression(prob: jnp.ndarray, depth_values: jnp.ndarray):
    """Soft-argmax over global hypothesis values.

    prob (B, D, H, W), depth_values (D,) -> (B, H, W)
    (≙ `depth_regression`, modules.py:306)."""
    return jnp.sum(prob * depth_values[None, :, None, None], axis=1)


def depth_regression_refine(prob: jnp.ndarray, depth_hypos: jnp.ndarray):
    """Soft-argmax over per-pixel hypothesis values.

    prob, depth_hypos (B, D, H, W) -> (B, H, W)
    (≙ `depth_regression_refine`, modules.py:311)."""
    return jnp.sum(prob * depth_hypos, axis=1)
