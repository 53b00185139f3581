"""MVS plane/homography warping helpers.

Rebuild of `models/modules.py`: `homo_warping` (`:65-96`, warp source
features over a set of fronto-parallel depth hypotheses given a relative
pose), depth-hypothesis schedules (`calSweepingDepthHypo` `:48`,
`calDepthHypo` `:97`), per-pixel hypothesis warping `proj_cost` (`:193`),
and the regression heads `depth_regression` / `depth_regression_refine`
(`:306-314`).

Sampling faithfully reproduces the reference's quirk: coordinates are
normalized with the align_corners=True convention (x / ((W-1)/2) - 1,
modules.py:87-88,225-226) but `grid_sample` is called WITHOUT
align_corners (torch default False, modules.py:92,228) — the effective
sample point is x * W/(W-1) - 0.5 with zero padding and partial edge
interpolation. `grid_sample_zeros` implements exactly that lowering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.ops.camera import pixel_grid


def grid_sample_zeros(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """torch `F.grid_sample(..., padding_mode='zeros', align_corners=False)`
    given PIXEL coordinates (already mapped to sample space).

    img (B, H, W, C); coords (B, ..., 2) as (x, y). Out-of-range taps
    contribute zero individually (partial interpolation at borders, unlike
    the hard valid-cut of `ops.camera.bilinear_sample`).

    TPU lowering: pad one pixel on EVERY side, shift coords by +1, clamp
    the base index so all four taps stay inside the padded image, and
    clip the fractional weight — beyond-range queries then read padded
    zeros with full weight, which is exactly the torch zero fill.
    """
    B, H, W, C = img.shape
    out_shape = coords.shape[:-1] + (C,)
    xy = coords.reshape(B, -1, 2).astype(jnp.float32)
    x = jnp.clip(xy[..., 0] + 1.0, 0.0, W + 1.0)
    y = jnp.clip(xy[..., 1] + 1.0, 0.0, H + 1.0)
    x0 = jnp.clip(jnp.floor(x), 0.0, W)
    y0 = jnp.clip(jnp.floor(y), 0.0, H)
    wx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(y - y0, 0.0, 1.0)[..., None]

    fp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    Wp = W + 2
    flat = fp.reshape(B, (H + 2) * Wp, C)
    xpair = jnp.concatenate([flat[:, :-1], flat[:, 1:]], axis=-1)
    quad = jnp.concatenate([xpair[:, :-Wp], xpair[:, Wp:]], axis=-1)
    idx = (y0 * Wp + x0).astype(jnp.int32)
    g = jnp.take_along_axis(quad, idx[..., None], axis=1, mode="clip")
    v00, v01 = g[..., :C], g[..., C:2 * C]
    v10, v11 = g[..., 2 * C:3 * C], g[..., 3 * C:]
    out = ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
           + (v10 * (1 - wx) + v11 * wx) * wy)
    return out.reshape(out_shape).astype(img.dtype)


def _ref_quirk_coords(p: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Project homogeneous points (..., 3, N) and apply the reference's
    normalization quirk: align_corners=True normalization consumed by an
    align_corners=False grid_sample => x_eff = x * W/(W-1) - 0.5.
    Returns (..., N, 2)."""
    z = p[..., 2, :]
    x = p[..., 0, :] / z
    y = p[..., 1, :] / z
    x = x * (w / (w - 1.0)) - 0.5
    y = y * (h / (h - 1.0)) - 0.5
    return jnp.stack([x, y], axis=-1)


def sweeping_depth_hypos(depth_min: float, depth_max: float,
                         n: int = 48) -> jnp.ndarray:
    """Uniform initial sweep (≙ `calSweepingDepthHypo`, modules.py:48)."""
    return jnp.linspace(depth_min, depth_max, n, dtype=jnp.float32)


def local_depth_hypos(depth: jnp.ndarray, n: int = 8,
                      interval: float = 1.0) -> jnp.ndarray:
    """Per-pixel hypotheses around an upsampled depth map
    (≙ `calDepthHypo`, modules.py:97-113): ABSOLUTE offsets
    (-n/2 .. n/2 - 1) * interval metres — the reference hardcodes d=4,
    interval=1, giving offsets -4..+3. depth (B, H, W) -> (B, n, H, W)."""
    d = n // 2
    offs = (jnp.arange(n, dtype=jnp.float32) - d) * interval
    return depth[:, None] + offs[None, :, None, None]


def homo_warping(src_feat: jnp.ndarray, pose: jnp.ndarray,
                 depth_hypos: jnp.ndarray) -> jnp.ndarray:
    """Warp source features over global depth hypotheses.

    src_feat (B, H, W, C); depth_hypos (D,) -> (B, D, H, W, C).
    ≙ `homo_warping` (modules.py:65-96) including BOTH its quirks: the
    grid_sample normalization mix (module docstring) and the fact that
    the rotation/translation act directly on PIXEL homogeneous
    coordinates — the caller passes the raw pose (CVPMVS.py:163) and the
    multi-scale intrinsics the model computes are never applied
    (modules.py:74-84).
    """
    B, H, W, C = src_feat.shape
    D = depth_hypos.shape[0]
    grid = pixel_grid(H, W, jnp.float32).reshape(3, -1)  # (3, HW)
    ray = jnp.einsum("bij,jn->bin", pose[:, :, :3], grid)  # (B, 3, HW)
    trans = pose[:, :, 3][..., None]
    p = ray[:, None] * depth_hypos[None, :, None, None] + trans[:, None]
    p = p.reshape(B, D, 3, H * W)
    coords = _ref_quirk_coords(p, H, W).reshape(B, D, H, W, 2)
    return grid_sample_zeros(src_feat, coords)


def proj_cost_volume(
    ref_feat: jnp.ndarray,
    src_feat: jnp.ndarray,
    pose: jnp.ndarray,
    depth_hypos: jnp.ndarray,  # (B, D, H, W) per-pixel hypotheses
) -> jnp.ndarray:
    """Sum-of-squares cost volume over per-pixel depth hypotheses.

    Returns (B, D, H, W, C): ref^2 + warped^2 per hypothesis
    (≙ `proj_cost`, modules.py:193-244, whose in-place pow_ quirks reduce
    the "variance" aggregation to exactly this sum of squares — matching
    `models/CVPMVS.py:155-176`). Pose acts on pixel coordinates, no
    intrinsics — same quirk as `homo_warping`.
    """
    B, D = depth_hypos.shape[:2]
    H, W, C = src_feat.shape[1:]
    grid = pixel_grid(H, W, jnp.float32).reshape(3, -1)
    ray = jnp.einsum("bij,jn->bin", pose[:, :, :3], grid)  # (B, 3, HW)
    trans = pose[:, :, 3][..., None]
    dh = depth_hypos.reshape(B, D, 1, H * W)
    p = ray[:, None] * dh + trans[:, None]  # (B, D, 3, HW)
    coords = _ref_quirk_coords(p, H, W).reshape(B, D, H, W, 2)
    warped = grid_sample_zeros(src_feat, coords)  # (B, D, H, W, C)
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
