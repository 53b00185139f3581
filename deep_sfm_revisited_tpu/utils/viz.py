"""Flow / depth visualization.

Rebuild of `flow_viz.py` (Middlebury color-wheel flow rendering,
`flow_viz.py:22-143` `make_colorwheel`/`flow_uv_to_colors`, driver
`:239-280`), the raw flow RGB of `flow2rgb_raw` (`main.py:777-789`), and
the depth colormap of `tensor2array` (`utils.py:165-192`). numpy host
code — used for logging images, not in the jit path.
"""

from __future__ import annotations

import numpy as np


def make_colorwheel() -> np.ndarray:
    """The 55-color Middlebury wheel (≙ `make_colorwheel`, flow_viz.py:22)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    ramps = [
        (RY, 0, 1, False),  # R->Y
        (YG, 1, 0, True),
        (GC, 1, 2, False),
        (CB, 2, 1, True),
        (BM, 2, 0, False),
        (MR, 0, 2, True),
    ]
    for n, c_full, c_ramp, down in ramps:
        wheel[col : col + n, c_full] = 255
        ramp = np.floor(255 * np.arange(n) / n)
        wheel[col : col + n, c_ramp] = 255 - ramp if down else ramp
        col += n
    return wheel


_WHEEL = make_colorwheel()


def flow_to_rgb(flow: np.ndarray, clip: float | None = None) -> np.ndarray:
    """Flow (H, W, 2) -> uint8 RGB (H, W, 3) via the Middlebury wheel
    (≙ `flow_to_image`/`flow_uv_to_colors`, flow_viz.py:66-143)."""
    flow = np.asarray(flow, np.float32)
    u, v = flow[..., 0], flow[..., 1]
    if clip is not None:
        u = np.clip(u, -clip, clip)
        v = np.clip(v, -clip, clip)
    rad = np.sqrt(u * u + v * v)
    rad_max = max(rad.max(), 1e-5)
    u, v = u / rad_max, v / rad_max
    rad = rad / rad_max

    ncols = _WHEEL.shape[0]
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(np.int32)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    img = np.zeros(flow.shape[:2] + (3,), np.uint8)
    for c in range(3):
        col0 = _WHEEL[k0, c] / 255.0
        col1 = _WHEEL[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        col = np.where(rad <= 1, 1 - rad * (1 - col), col * 0.75)
        img[..., c] = np.floor(255 * col)
    return img


def flow_to_rgb_raw(flow: np.ndarray, max_value: float = 128.0) -> np.ndarray:
    """Simple (u, v, 0) normalization (≙ `flow2rgb_raw`, main.py:777-789)."""
    flow = np.asarray(flow, np.float32)
    rgb = np.zeros(flow.shape[:2] + (3,), np.float32)
    norm = flow / max_value
    rgb[..., 0] = np.clip(norm[..., 0], -1, 1) * 0.5 + 0.5
    rgb[..., 1] = np.clip(norm[..., 1], -1, 1) * 0.5 + 0.5
    return (rgb * 255).astype(np.uint8)


def depth_to_colormap(
    depth: np.ndarray, max_value: float | None = 80.0, colormap: str = "bone"
) -> np.ndarray:
    """Depth (H, W) -> uint8 RGB via a matplotlib colormap
    (≙ `tensor2array`, utils.py:165-192)."""
    import matplotlib

    depth = np.asarray(depth, np.float32)
    mv = max_value if max_value is not None else max(depth.max(), 1e-5)
    norm = np.clip(depth / mv, 0, 1)
    rgba = matplotlib.colormaps[colormap](norm)
    return (rgba[..., :3] * 255).astype(np.uint8)
