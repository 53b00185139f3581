"""Correlation layers: local (PWC-style) and epipolar-constrained.

Rebuild of `models/correlation.py`:
  * `local_correlation` ≙ `CorrelationLayer` (`:6-28`): dot-product cost
    over a (2md+1)^2 displacement window. The reference python-loops 81
    shifted products; here the whole window is one pad + static-slice
    stack reduced with an einsum — XLA fuses it into a single
    displacement-batched contraction (and the all-pairs variant used by
    RAFT is a plain MXU matmul, models/raft.py);
  * `epipolar_correlation` ≙ `EpipolarCorrelationLayer` (`:30-128`):
    given (R, T), sample target features at displacements parallel /
    perpendicular to the epipolar line through each pixel and correlate —
    the geometry (epipole direction from K R K^-1 and K T) is computed
    in closed form and sampling is one batched bilinear gather over all
    (para, perp) offsets.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.ops.camera import bilinear_sample, pixel_grid


def local_correlation(f0: jnp.ndarray, f1: jnp.ndarray, md: int = 4) -> jnp.ndarray:
    """PWC-style windowed correlation.

    f0, f1 (B, H, W, C) -> (B, H, W, (2md+1)^2), normalized by C.
    Output channel index = (row_i + md) * (2md+1) + (col_i + md), matching
    the reference's loop order (`models/correlation.py:21-26`).
    """
    B, H, W, C = f0.shape
    f1p = jnp.pad(f1, ((0, 0), (md, md), (md, md), (0, 0)))
    outs = []
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            shifted = jax.lax.dynamic_slice(
                f1p, (0, dy + md, dx + md, 0), (B, H, W, C)
            )
            outs.append(jnp.sum(f0 * shifted, axis=-1))
    return jnp.stack(outs, axis=-1) / C


def epipolar_geometry(
    pose: jnp.ndarray, K: jnp.ndarray, K_inv: jnp.ndarray, h: int, w: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-pixel epipolar direction field.

    pose (B, 3, 4); returns (end_point, para_dir, perp_dir), each
    (B, H, W, 2): the infinite-depth projection of every pixel, the unit
    direction of its epipolar line in the target image, and its
    perpendicular. ≙ `EpipolarCorrelationLayer.forward` geometry
    (`models/correlation.py:79-104`), minus the hard-coded DeMoN
    intrinsics — K comes from the caller.
    """
    B = pose.shape[0]
    grid = pixel_grid(h, w, jnp.float32).reshape(3, -1)  # (3, HW)
    KRKi = jnp.einsum("bij,bjk,bkl->bil", K, pose[:, :, :3], K_inv)
    ray = jnp.einsum("bij,jn->bin", KRKi, grid)  # (B, 3, HW)
    t = jnp.einsum("bij,bj->bi", K, pose[:, :, 3])[..., None]  # (B, 3, 1)

    def proj(p):
        z = jnp.where(jnp.abs(p[:, 2]) < 1e-6,
                      jnp.where(p[:, 2] < 0, -1e-6, 1e-6), p[:, 2])
        return p[:, :2] / z[:, None]

    end = proj(ray)                      # infinite-depth point (B, 2, HW)
    far = proj(ray * 10.0 + t)           # a second point on the line
    d = far - end
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    perp = jnp.stack([-d[:, 1], d[:, 0]], axis=1)

    def to_map(x):
        return jnp.moveaxis(x, 1, -1).reshape(B, h, w, 2)

    return to_map(end), to_map(d), to_map(perp)


def epipolar_correlation(
    f0: jnp.ndarray,
    f1: jnp.ndarray,
    pose: jnp.ndarray,
    K: jnp.ndarray,
    K_inv: jnp.ndarray,
    initial_flow: jnp.ndarray,
    para_offsets: Sequence[float] = (-4, -3, -2, -1, 0, 1, 2, 3, 4),
    perp_offsets: Sequence[float] = (-1, 0, 1),
) -> jnp.ndarray:
    """Epipolar-constrained correlation (≙ `EpipolarCorrelationLayer`).

    f0/f1 (B, H, W, C); initial_flow (B, H, W, 2). Each pixel's current
    match is first projected onto its epipolar line, then correlated at
    para x perp offsets along/off the line. Returns
    (B, H, W, 2 + 2 + P*Q): [epipolar_flow, para_dir, correlations]
    (`models/correlation.py:105-128`).
    """
    B, H, W, C = f0.shape
    end, para, perp = epipolar_geometry(pose, K, K_inv, H, W)
    grid = jnp.moveaxis(pixel_grid(H, W, jnp.float32)[:2], 0, -1)[None]
    flow_pt = grid + initial_flow
    # project the flow target onto the epipolar line
    k = jnp.sum((flow_pt - end) * para, axis=-1, keepdims=True)
    init_loc = end + k * para

    offsets = [
        init_loc + pi * para + qi * perp
        for pi in para_offsets
        for qi in perp_offsets
    ]
    coords = jnp.stack(offsets, axis=1)  # (B, PQ, H, W, 2)
    sampled = bilinear_sample(f1, coords)  # (B, PQ, H, W, C)
    corr = jnp.einsum("bhwc,bnhwc->bhwn", f0, sampled) / C
    epi_flow = init_loc - grid
    return jnp.concatenate([epi_flow, para, corr], axis=-1)
