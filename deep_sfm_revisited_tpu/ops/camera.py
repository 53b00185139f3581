"""Differentiable camera / warping ops.

TPU-native rebuild of `models/inverse_warp.py` (`set_id_grid`/`pixel2cam`
`:9-42`, `cam2pixel` `:44-75`, `inverse_warp` `:121-153`, `pose2flow`
`:94-119`) and the duplicate in `models/pose2flow.py`.

Layout convention: NHWC everywhere (TPU-native; the reference is NCHW).
Images/features are (B, H, W, C), flow is (B, H, W, 2) with (dx, dy),
depth is (B, H, W).

`bilinear_sample` reproduces torch `F.grid_sample(..., align_corners=True,
padding_mode='zeros')` semantics including the reference's out-of-range ->
coordinate-2 trick (`models/inverse_warp.py:68-72`), which is equivalent to
zeroing samples whose *pre-clip* location falls outside the image.

The plane-sweep variant `plane_sweep_coords` vectorizes the per-plane
python loop of the reference (`models/PSNet.py:149-157`) into one
broadcasted computation over all D depth planes: the pixel ray direction
K R K^-1 [u,v,1] is computed once and scaled per plane, so cost-volume
construction becomes a single gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel grid (3, H, W) of (u, v, 1) = (x/col, y/row, 1).

    Matches `set_id_grid` (`models/inverse_warp.py:9-16`).
    """
    v, u = jnp.meshgrid(
        jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype), indexing="ij"
    )
    return jnp.stack([u, v, jnp.ones_like(u)], axis=0)


def pixel2cam(depth: jnp.ndarray, K_inv: jnp.ndarray) -> jnp.ndarray:
    """Back-project pixels to camera-frame points.

    depth (B, H, W), K_inv (B, 3, 3) -> (B, 3, H, W).
    Matches `pixel2cam` (`models/inverse_warp.py:27-42`).
    """
    b, h, w = depth.shape
    grid = pixel_grid(h, w, depth.dtype).reshape(3, -1)  # (3, HW)
    cam = jnp.einsum("bij,jn->bin", K_inv, grid).reshape(b, 3, h, w)
    return cam * depth[:, None]


def cam2pixel(
    cam: jnp.ndarray, proj_rot: jnp.ndarray, proj_tr: jnp.ndarray
) -> jnp.ndarray:
    """Project camera-frame points into another view's pixel coords.

    cam (B, 3, H, W), proj_rot (B, 3, 3), proj_tr (B, 3, 1) -> pixel coords
    (B, H, W, 2) in *pixel units* (not normalized). Z clamped to 1e-3 as in
    `cam2pixel` (`models/inverse_warp.py:60`). Points behind the camera end
    up far outside the image and are zero-masked by `bilinear_sample`.
    """
    b, _, h, w = cam.shape
    flat = cam.reshape(b, 3, -1)
    p = jnp.einsum("bij,bjn->bin", proj_rot, flat) + proj_tr
    z = jnp.maximum(p[:, 2], 1e-3)
    # mirror the reference's "send out-of-frustum points to coordinate 2"
    # trick: a negative-depth point projects to a bogus in-frame location,
    # so push it far out of range instead.
    invalid = p[:, 2] <= 1e-3
    x = jnp.where(invalid, 2.0 * w, p[:, 0] / z)
    y = jnp.where(invalid, 2.0 * h, p[:, 1] / z)
    return jnp.stack([x, y], axis=-1).reshape(b, h, w, 2)


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with zeros padding, align_corners=True semantics.

    img (B, H, W, C); coords (B, ..., 2) as (x, y) pixel coordinates.
    Returns (B, ..., C). Samples whose (x, y) fall outside [0, W-1]x[0, H-1]
    contribute zero — matching torch grid_sample zeros padding combined with
    the reference's out-of-range trick (`models/inverse_warp.py:68-72`).

    TPU gather cost is bound by gather *row count*, not bytes: instead of
    four single-pixel gathers, pad the image by one row and one column and
    gather all FOUR bilinear taps in one 4C-wide row — the channel axis is
    stacked as [v00|v01|v10|v11] by concatenating x-shifted then y-shifted
    views. One gather per query instead of four: exact same math, 2x fewer
    gather rows than the previous pair form (scratch/warp_ablate.py).
    (A Pallas kernel slot once Mosaic works on this platform.)
    """
    B, H, W, C = img.shape
    out_shape = coords.shape[:-1] + (C,)
    # coordinates always in float32: half-precision coords round flat
    # indices out of range (bf16 has an 8-bit mantissa; y*W+x overflows its
    # exact-integer range at ~256), which silently corrupts the gather
    xy = coords.reshape(B, -1, 2).astype(jnp.float32)
    x, y = xy[..., 0], xy[..., 1]

    valid = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    # zero pad at x = W and y = H: when x0 = W-1 the x+1 taps read the pad
    # column but wx = 0 there (x is clipped), and likewise y0 = H-1 reads
    # the pad row with wy = 0 — contributions are exactly zero, matching
    # the 4-tap form. Row stride of the padded flat view is W+1.
    fp = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)))
    flat = fp.reshape(B, (H + 1) * (W + 1), C)
    xpair = jnp.concatenate([flat[:, :-1], flat[:, 1:]], axis=-1)  # [x | x+1]
    quad = jnp.concatenate(
        [xpair[:, : -(W + 1)], xpair[:, W + 1 :]], axis=-1
    )  # [y,x | y,x+1 | y+1,x | y+1,x+1], (B, H*(W+1)-1, 4C)

    idx = (y0 * (W + 1) + x0).astype(jnp.int32)
    # indices are pre-clipped; mode="clip" skips XLA's NaN-fill path
    g = jnp.take_along_axis(quad, idx[..., None], axis=1, mode="clip")
    v00, v01, v10, v11 = g[..., :C], g[..., C:2*C], g[..., 2*C:3*C], g[..., 3*C:]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = (top * (1 - wy) + bot * wy) * valid[..., None]
    return out.reshape(out_shape).astype(img.dtype)


def inverse_warp(
    feat: jnp.ndarray,
    depth: jnp.ndarray,
    pose: jnp.ndarray,
    K: jnp.ndarray,
    K_inv: jnp.ndarray,
) -> jnp.ndarray:
    """Warp target-view features into the reference view given ref depth.

    feat (B, H, W, C) target features; depth (B, H, W) reference depth;
    pose (B, 3, 4) ref->target transform; K/K_inv (B, 3, 3).
    Returns (B, H, W, C). Matches `inverse_warp`
    (`models/inverse_warp.py:121-153`).
    """
    cam = pixel2cam(depth, K_inv)  # (B,3,H,W)
    proj = jnp.einsum("bij,bjk->bik", K, pose)  # (B,3,4)
    coords = cam2pixel(cam, proj[:, :, :3], proj[:, :, 3:])  # (B,H,W,2)
    return bilinear_sample(feat, coords)


def pose2flow(
    depth: jnp.ndarray, pose: jnp.ndarray, K: jnp.ndarray, K_inv: jnp.ndarray
) -> jnp.ndarray:
    """Rigid optical flow induced by depth + relative pose.

    depth (B, H, W), pose (B, 3, 4) -> flow (B, H, W, 2).
    Matches `pose2flow` (`models/inverse_warp.py:94-119`).
    """
    b, h, w = depth.shape
    cam = pixel2cam(depth, K_inv)
    proj = jnp.einsum("bij,bjk->bik", K, pose)
    coords = cam2pixel(cam, proj[:, :, :3], proj[:, :, 3:])  # (B,H,W,2)
    grid = pixel_grid(h, w, depth.dtype)[:2]  # (2,H,W)
    return coords - jnp.moveaxis(grid, 0, -1)[None]


def plane_sweep_coords(
    depths: jnp.ndarray,
    pose: jnp.ndarray,
    K: jnp.ndarray,
    K_inv: jnp.ndarray,
    h: int,
    w: int,
) -> jnp.ndarray:
    """Sampling coordinates for all plane-sweep depth hypotheses at once.

    depths (D,) fronto-parallel plane depths; pose (B, 3, 4); K/K_inv (B,3,3).
    Returns (B, D, H, W, 2) pixel coords into the target view.

    Replaces the reference's D-iteration python loop calling `inverse_warp`
    per plane (`models/PSNet.py:149-157`): because every plane is
    fronto-parallel, the projected point is ray_dir * d + K t with
    ray_dir = K R K^-1 [u,v,1] computed once, so the whole volume is one
    broadcast — MXU/VPU friendly, no per-plane kernel launches.
    """
    dtype = depths.dtype
    grid = pixel_grid(h, w, dtype).reshape(3, -1)  # (3, HW)
    KRKinv = jnp.einsum("bij,bjk,bkl->bil", K, pose[:, :, :3], K_inv)
    ray = jnp.einsum("bij,jn->bin", KRKinv, grid)  # (B,3,HW)
    trans = jnp.einsum("bij,bj->bi", K, pose[:, :, 3])[..., None]  # (B,3,1)
    p = ray[:, None] * depths[None, :, None, None] + trans[:, None]  # (B,D,3,HW)
    z = jnp.maximum(p[:, :, 2], 1e-3)
    invalid = p[:, :, 2] <= 1e-3
    x = jnp.where(invalid, 2.0 * w, p[:, :, 0] / z)
    y = jnp.where(invalid, 2.0 * h, p[:, :, 1] / z)
    D = depths.shape[0]
    return jnp.stack([x, y], axis=-1).reshape(p.shape[0], D, h, w, 2)


def plane_sweep_warp(
    feat: jnp.ndarray,
    depths: jnp.ndarray,
    pose: jnp.ndarray,
    K: jnp.ndarray,
    K_inv: jnp.ndarray,
) -> jnp.ndarray:
    """Warp target features across all D depth planes: (B,H,W,C)->(B,D,H,W,C)."""
    B, H, W, C = feat.shape
    coords = plane_sweep_coords(depths, pose, K, K_inv, H, W)  # (B,D,H,W,2)
    return bilinear_sample(feat, coords)
