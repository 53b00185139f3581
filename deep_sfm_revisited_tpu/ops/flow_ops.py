"""Flow <-> correspondence <-> depth conversions.

Rebuilds `flow2coord`/`coord2flow` (`epipolar_utils.py:8-45`, duplicated at
`models/SFMnet.py:298-333`) and the flow->depth triangulation
(`models/flow2depth.py:7-41`), plus the on-device correspondence sampler
that replaces the reference's per-image OpenCV SIFT/SURF + FLANN loop
(`models/SFMnet.py:192-254`). The reference itself falls back to a dense
flow grid inside a 10px margin when matching fails
(`models/SFMnet.py:239-241`); that deterministic, batched path is our
primary one — no host round-trips, no per-batch-item python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.ops.camera import pixel_grid


def flow2coord(flow: jnp.ndarray):
    """Flow (B, H, W, 2) -> homogeneous correspondence grids.

    Returns (coord1, coord2), each (B, H, W, 3) with (u, v, 1).
    Matches `flow2coord` (`epipolar_utils.py:8-28`) modulo NHWC layout.
    """
    b, h, w, _ = flow.shape
    grid = jnp.moveaxis(pixel_grid(h, w, flow.dtype), 0, -1)  # (H,W,3)
    coord1 = jnp.broadcast_to(grid[None], (b, h, w, 3))
    coord2 = jnp.concatenate([coord1[..., :2] + flow, coord1[..., 2:]], axis=-1)
    return coord1, coord2


def coord2flow(coord1: jnp.ndarray, coord2: jnp.ndarray) -> jnp.ndarray:
    """Inverse of flow2coord: (B, H, W, 3) pairs -> flow (B, H, W, 2).

    Matches `coord2flow` (`epipolar_utils.py:32-45`).
    """
    return coord2[..., :2] - coord1[..., :2]


def _candidate_grid(b, h, w, margin, n, dtype, key):
    """Jittered stride grid of exactly n points inside `margin`."""
    ih, iw = h - 2 * margin, w - 2 * margin
    aspect = iw / ih
    ny = max(int(round((n / aspect) ** 0.5)), 1)
    nx = max(n // ny, 1)
    ys = jnp.linspace(margin, h - 1 - margin, ny)
    xs = jnp.linspace(margin, w - 1 - margin, nx)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pts = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # (ny*nx, 2)
    # pad/trim to exactly n (repeat from start if short)
    reps = -(-n // pts.shape[0])
    pts = jnp.tile(pts, (reps, 1))[:n]
    pts = jnp.broadcast_to(pts[None], (b, n, 2)).astype(dtype)
    if key is not None:
        cell = jnp.array([iw / nx, ih / ny], dtype=dtype)
        jitter = jax.random.uniform(key, pts.shape, dtype, -0.5, 0.5) * cell
        pts = jnp.clip(
            pts + jitter,
            jnp.array([margin, margin], dtype=dtype),
            jnp.array([w - 1 - margin, h - 1 - margin], dtype=dtype),
        )
    return pts


def texture_pseudo_entropy(image: jnp.ndarray,
                           window: int = 5) -> jnp.ndarray:
    """Shi-Tomasi texture score as a PSEUDO-ENTROPY map (low = textured
    = trustworthy correspondence), drop-in for the `conf` argument of
    `sample_correspondences`.

    image (B, H, W, 3) -> (B, H, W, 1). Per pixel: the smaller
    eigenvalue of the `window`-box-smoothed image structure tensor
    (the Shi-Tomasi "good features to track" score — the closest
    on-device analogue of the reference's SIFT/SURF keypoint masks,
    `models/SFMnet.py:203-254`), normalized by its per-image max and
    returned as 1 - score so the existing low-entropy-is-good contract
    and the `good_entropy` threshold apply unchanged.

    Round-5 'next' #5: an image-driven alternative to the flow net's
    entropy confidence (`cfg.pose.sampler = "texture"`), bracketing the
    risk of replacing the reference's keypointed pose path with a
    learned confidence.
    """
    gray = jnp.mean(image.astype(jnp.float32), axis=-1, keepdims=True)
    # central differences, replicate-padded
    gp = jnp.pad(gray, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    ix = 0.5 * (gp[:, 1:-1, 2:] - gp[:, 1:-1, :-2])
    iy = 0.5 * (gp[:, 2:, 1:-1] - gp[:, :-2, 1:-1])

    k = jnp.ones((window, window, 1, 1), jnp.float32) / (window * window)

    def box(x):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    sxx, sxy, syy = box(ix * ix), box(ix * iy), box(iy * iy)
    half_tr = 0.5 * (sxx + syy)
    rad = jnp.sqrt(jnp.maximum(
        (0.5 * (sxx - syy)) ** 2 + sxy ** 2, 0.0))
    lam_min = jnp.maximum(half_tr - rad, 0.0)
    peak = jnp.max(lam_min, axis=(1, 2, 3), keepdims=True)
    score = lam_min / jnp.maximum(peak, 1e-12)
    return 1.0 - score


def sample_correspondences(
    flow: jnp.ndarray,
    K_inv: jnp.ndarray,
    num_points: int,
    margin: int = 10,
    key: jax.Array | None = None,
    conf: jnp.ndarray | None = None,
    min_matches: int = 20,
    oversample: int = 4,
    good_entropy: float = 0.7,
):
    """Subsample normalized correspondences from dense flow, on device.

    flow (B, H, W, 2); K_inv (B, 3, 3); returns (x1, x2), each
    (B, num_points, 2) in K^-1-normalized image coordinates — the solver
    input format of `compute_P_matrix_ransac` (`epipolar_utils.py:112-135`,
    fed at `models/SFMnet.py:252-270`).

    Without `conf`: a uniform stride grid inside `margin` (the reference's
    fallback, `models/SFMnet.py:183,239-241`), optionally jittered by
    `key`. Fixed output shape for jit.

    With `conf` (B, H, W, 1) NORMALIZED ENTROPY (DICL `FlowEntropy`,
    low = confident): the deterministic replacement for the reference's
    SIFT/SURF keypoint masks (`models/SFMnet.py:203-254` picks GOOD
    correspondences; the CUDA solver additionally requires >= 20 matches,
    `lib/config.py:55`). An `oversample`x denser candidate grid is scored
    by confidence weight w = 1 - entropy and the top `num_points`
    candidates are kept (Gumbel-perturbed when `key` is given, i.e.
    weighted sampling without replacement). Degenerate guard: when fewer
    than `min_matches` candidates are confident (entropy < good_entropy),
    selection falls back to uniform — the reference's dense-grid fallback
    (`models/SFMnet.py:239-241`). Returns (x1, x2, num_good) with
    num_good (B,) the per-image confident-candidate count.
    """
    b, h, w, _ = flow.shape
    if key is not None:
        k_grid, k_gumbel = jax.random.split(key)
    else:
        k_grid = k_gumbel = None

    # selection-class math (grid, confidence gather, Gumbel scores,
    # top_k) runs in f32 even when the caller passes f64 flow: emulated
    # f64 is ~10x per op on TPU and the f64 top_k sorts 4096 float-pair
    # scores — but only the SELECTION comes from these values; the flow
    # values fed to the solver are gathered from the original array in
    # its own dtype below (round-5; identical selection up to score
    # ties, which the Gumbel draw already randomizes)
    sdtype = jnp.float32 if flow.dtype == jnp.float64 else flow.dtype
    n_cand = num_points * (oversample if conf is not None else 1)
    pts = _candidate_grid(b, h, w, margin, n_cand, sdtype, k_grid)
    pts_i = jnp.round(pts).astype(jnp.int32)
    idx = pts_i[..., 1] * w + pts_i[..., 0]

    num_good = None
    if conf is not None:
        ent = conf.reshape(b, h * w).astype(sdtype)
        e = jnp.take_along_axis(ent, idx, axis=1)  # (B, n_cand)
        wgt = jnp.clip(1.0 - e, 0.0, 1.0)
        good = e < good_entropy
        num_good = jnp.sum(good, axis=1)
        use_conf = (num_good >= max(min_matches, 1))[:, None]
        score = jnp.where(use_conf, jnp.log(wgt + 1e-6), 0.0)
        if k_gumbel is not None:
            u = jax.random.uniform(
                k_gumbel, score.shape, sdtype, 1e-12, 1.0
            )
            score = score - jnp.log(-jnp.log(u))
        _, top = jax.lax.top_k(score, num_points)  # (B, num_points)
        pts_i = jnp.take_along_axis(pts_i, top[..., None], axis=1)
        idx = jnp.take_along_axis(idx, top, axis=1)

    flat = flow.reshape(b, h * w, 2)
    f = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B,N,2)
    p1 = pts_i.astype(flow.dtype)
    p2 = p1 + f

    ones = jnp.ones_like(p1[..., :1])
    h1 = jnp.concatenate([p1, ones], axis=-1)  # (B,N,3)
    h2 = jnp.concatenate([p2, ones], axis=-1)
    n1 = jnp.einsum("bij,bnj->bni", K_inv, h1)
    n2 = jnp.einsum("bij,bnj->bni", K_inv, h2)
    if conf is not None:
        return n1[..., :2], n2[..., :2], num_good
    return n1[..., :2], n2[..., :2]


def flow2depth(
    flow: jnp.ndarray,
    pose: jnp.ndarray,
    K: jnp.ndarray,
    K_inv: jnp.ndarray,
    min_depth: float = 1e-3,
) -> jnp.ndarray:
    """Closed-form per-pixel depth from flow + relative pose (triangulation).

    flow (B, H, W, 2), pose (B, 3, 4) ref->target, K/K_inv (B, 3, 3)
    -> depth (B, H, W) in the reference view.

    Full least-squares triangulation generalizing the reference's
    `Flow2Depth` (`models/flow2depth.py:7-41`): with a = K R K^-1 [u,v,1]
    and b = K t, the target pixel x2 satisfies z2 x2 = a z1 + b; the two
    non-homogeneous rows give (x2*a_z - a_x) z1 = b_x - x2*b_z (same for y),
    solved in least squares over both rows.
    """
    b_, h, w, _ = flow.shape
    grid = pixel_grid(h, w, flow.dtype).reshape(3, -1)  # (3,HW)
    KRKinv = jnp.einsum("bij,bjk,bkl->bil", K, pose[:, :, :3], K_inv)
    a = jnp.einsum("bij,jn->bin", KRKinv, grid)  # (B,3,HW)
    t = jnp.einsum("bij,bj->bi", K, pose[:, :, 3])  # (B,3)
    x2 = (grid[None, :2] + jnp.moveaxis(flow.reshape(b_, -1, 2), -1, 1))  # (B,2,HW)
    # rows: c_i * z = d_i for i in {x, y}
    cx = x2[:, 0] * a[:, 2] - a[:, 0]
    cy = x2[:, 1] * a[:, 2] - a[:, 1]
    dx = t[:, 0, None] - x2[:, 0] * t[:, 2, None]
    dy = t[:, 1, None] - x2[:, 1] * t[:, 2, None]
    z = (cx * dx + cy * dy) / (cx * cx + cy * cy + 1e-12)
    return jnp.maximum(z, min_depth).reshape(b_, h, w)
