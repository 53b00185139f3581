"""Pallas kernel: VMEM-resident bilinear gather for the plane-sweep warp.

The XLA quad-gather form (`ops.camera.bilinear_sample`) streams every
query's 4C-wide row out of HBM: at the flagship plane sweep (D=128
planes x 96x320 pixels x 32ch bf16) that is 3.93M gather rows and the
op runs gather-row-bound at ~13.5 ms (PERF.md stage table) — ~10x off
the HBM speed-of-light for the 251 MB it actually produces.

This kernel keeps the ENTIRE padded quad feature image resident in VMEM
(4C=128 sublanes x ~31k lanes bf16 ~ 7.9 MB at KITTI 1/4 res) and
resolves each query with a lane-axis gather: per grid step it gathers a
(4C, T) tile, splits the four taps on the sublane axis, and applies the
bilinear weights on the VPU, so each HBM byte of the feature map crosses
once and the op's traffic drops to ~index+weights in, volume out.

DEPLOYMENT NOTE (measured 2026-08-20, scratch/dyngather_probe.py): the
current toolchain CANNOT run this on hardware. jax's Mosaic gather rule
only lowers equal-shape gathers to `tpu.dynamic_gather`
(pallas/mosaic/lowering.py:2493 asserts indices.shape == x.shape+(1,)),
and the Mosaic backend then rejects any gather whose lane extent spans
more than ONE 128-lane vreg ("Not implemented: Multiple source vregs
along gather dimension") — so VMEM-resident tables cannot be indexed
across their full extent, which is the whole point of this kernel. It is
validated in interpret mode (exact vs the XLA path) and kept as the
deployment artifact for a toolchain with real lane gathers; the
production default stays the XLA quad-gather (`depth.warp_kernel=False`).

Exact same math as `bilinear_sample` (align_corners=True, zeros padding
via the reference's out-of-range trick, `models/inverse_warp.py:68-72`):
equivalence is tested in interpret mode (tests/test_camera.py) and the
production default stays the XLA path unless `depth.warp_kernel` is on
(TPU-only; the wrapper falls back to XLA on other backends).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from deep_sfm_revisited_tpu.ops.camera import plane_sweep_coords


def _lane_take(q: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-row lane gather: q (R, L), idx (R, T) int32 -> (R, T).

    `jnp.take_along_axis(q, idx, axis=1)` with the int64 index upcast it
    performs under jax_enable_x64 stripped out (Mosaic rejects 64-bit
    types; the package enables x64 globally for the f64 RANSAC path).
    Indices must be in bounds — this emits mode=promise_in_bounds.
    """
    r, t = idx.shape
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return lax.gather(
        q, idx.astype(jnp.int32).reshape(r, t, 1), dnums, (1, 1),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _warp_kernel(quad_ref, idx_ref, wx_ref, wy_ref, va_ref, out_ref, *,
                 ch: int):
    # quad_ref (4C, Lq) resident across the grid; idx/wx/wy/va (1, T)
    # query tiles; out_ref (C, T).
    q = quad_ref[...]
    idx = idx_ref[...]                      # (1, T) int32, pre-clipped
    tiles = jnp.broadcast_to(idx, (4 * ch, idx.shape[1]))
    g = _lane_take(q, tiles)                # (4C, T)
    v00 = g[0 * ch:1 * ch].astype(jnp.float32)
    v01 = g[1 * ch:2 * ch].astype(jnp.float32)
    v10 = g[2 * ch:3 * ch].astype(jnp.float32)
    v11 = g[3 * ch:4 * ch].astype(jnp.float32)
    wx = wx_ref[...]                        # (1, T) f32, broadcasts over C
    wy = wy_ref[...]
    va = va_ref[...]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    out_ref[...] = ((top * (1.0 - wy) + bot * wy) * va).astype(out_ref.dtype)


def _quad_rows(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (4C, Lq) tap-stacked rows of the 1-padded image.

    Row r of the flattened (W+1)-stride padded image holds, stacked on
    the sublane axis, the four bilinear taps [y,x | y,x+1 | y+1,x |
    y+1,x+1] — the transposed twin of the quad layout built by
    `bilinear_sample` (ops/camera.py), so one lane gather per query
    fetches all four taps.
    """
    H, W, C = img.shape
    fp = jnp.pad(img, ((0, 1), (0, 1), (0, 0)))
    flat = fp.reshape((H + 1) * (W + 1), C).T        # (C, L)
    xpair = jnp.concatenate([flat[:, :-1], flat[:, 1:]], axis=0)
    return jnp.concatenate([xpair[:, : -(W + 1)], xpair[:, W + 1:]], axis=0)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def bilinear_sample_pallas(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    *,
    tile: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in `ops.camera.bilinear_sample` on the Pallas fast path.

    img (B, H, W, C); coords (B, ..., 2) pixel (x, y). Requires the quad
    image to fit VMEM (~(H+1)(W+1) * 4C * itemsize; ~7.9 MB at KITTI 1/4
    res bf16). Batch items run as separate kernel instances (B is 1 in
    the eval protocol; the plane-sweep D axis is the parallel axis).
    """
    B, H, W, C = img.shape
    out_shape = coords.shape[:-1] + (C,)

    xy = coords.reshape(B, -1, 2).astype(jnp.float32)
    n = xy.shape[1]
    x, y = xy[..., 0], xy[..., 1]
    valid = ((x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)).astype(
        jnp.float32
    )
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    idx = (y0 * (W + 1) + x0).astype(jnp.int32)

    nt = -(-n // tile) * tile
    pad = ((0, 0), (0, nt - n))
    idx = jnp.pad(idx, pad)
    wx = jnp.pad(wx, pad)
    wy = jnp.pad(wy, pad)
    valid = jnp.pad(valid, pad)

    lq = (H + 1) * (W + 1) - (W + 2)
    call = pl.pallas_call(
        functools.partial(_warp_kernel, ch=C),
        grid=(nt // tile,),
        in_specs=[
            pl.BlockSpec((4 * C, lq), lambda g: (0, 0)),
            pl.BlockSpec((1, tile), lambda g: (0, g)),
            pl.BlockSpec((1, tile), lambda g: (0, g)),
            pl.BlockSpec((1, tile), lambda g: (0, g)),
            pl.BlockSpec((1, tile), lambda g: (0, g)),
        ],
        out_specs=pl.BlockSpec((C, tile), lambda g: (0, g)),
        out_shape=jax.ShapeDtypeStruct((C, nt), img.dtype),
        interpret=interpret,
    )

    outs = []
    for b in range(B):  # B is static and small; D*H*W is the hot axis
        quad = _quad_rows(img[b])
        o = call(quad, idx[b][None], wx[b][None], wy[b][None],
                 valid[b][None])
        outs.append(o[:, :n].T)  # (n, C)
    return jnp.stack(outs).reshape(out_shape)


def plane_sweep_warp_pallas(
    feat: jnp.ndarray,
    depths: jnp.ndarray,
    pose: jnp.ndarray,
    K: jnp.ndarray,
    K_inv: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """`ops.camera.plane_sweep_warp` on the VMEM-resident kernel path."""
    B, H, W, _ = feat.shape
    coords = plane_sweep_coords(depths, pose, K, K_inv, H, W)
    return bilinear_sample_pallas(feat, coords, interpret=interpret)
