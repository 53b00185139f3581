"""Pallas kernel: windowed (PWC-style) correlation.

The XLA formulation (`ops.correlation.local_correlation`) materializes
(2md+1)^2 shifted elementwise products — each a full feature-map read
from HBM, so the op is ~81x memory-amplified at md=4. This kernel keeps
the target feature map resident in VMEM and computes every displacement
with static/dynamic slices on the VPU: each input byte crosses HBM once.

Replaces the reference's python shift loop (`CorrelationLayer`,
`models/correlation.py:6-28`) at TPU speed-of-light for the op
(HBM-bandwidth bound at ~1 read of f0 + f1 + 1 write of the volume).

`local_correlation_pallas(f0, f1, md)` matches
`local_correlation(f0, f1, md)` exactly (same channel ordering and /C
normalization, zeros outside the frame); set `interpret=True` for CPU
tests. VMEM budget: the padded f1 image per batch item must fit
(~(H+2md)(W+2md) C 4B — 4.4 MB at KITTI 1/8 res, 32ch f32).

DEPLOYMENT NOTE: the current axon remote-compile Mosaic build fails to
legalize ANY gridded pallas_call ("failed to legalize operation
'func.return'", reproduced with a trivial 3-D copy kernel); this kernel
is therefore validated in interpret mode and kept as the deployment
artifact for a platform with a working Mosaic. The production XLA path
(ops.correlation.local_correlation) remains the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(f0_ref, f1_ref, out_ref, *, md: int, ch: int,
                 tile_h: int):
    # f0_ref: (1, Th, W, C) row tile; f1_ref: (1, H+2md, W+2md, C) full
    # padded image of this batch item; out_ref: (1, Th, W, S2)
    # out_ref layout is displacement-major (1, S2, Th, W): every store is
    # then a well-formed 2-D (sublane, lane) block — stacking 81 maps into
    # a minor axis fails Mosaic legalization
    f0 = f0_ref[0]
    th, w, _ = f0.shape
    row0 = pl.program_id(1) * tile_h
    inv_c = 1.0 / ch
    s = 2 * md + 1
    for dy in range(s):
        f1rows = f1_ref[0, pl.ds(row0 + dy, th), :, :]
        for dx in range(s):
            f1s = f1rows[:, dx : dx + w, :]
            out_ref[0, dy * s + dx] = jnp.sum(f0 * f1s, axis=-1) * inv_c


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def local_correlation_pallas(
    f0: jnp.ndarray,
    f1: jnp.ndarray,
    md: int = 4,
    tile_h: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """f0, f1 (B, H, W, C) -> (B, H, W, (2md+1)^2), /C-normalized.

    Channel order matches the reference loop: index =
    (dy + md) * (2md+1) + (dx + md).
    """
    B, H, W, C = f0.shape
    s2 = (2 * md + 1) ** 2
    f1p = jnp.pad(f1, ((0, 0), (md, md), (md, md), (0, 0)))
    # pad H to the tile size
    Hp = -(-H // tile_h) * tile_h
    if Hp != H:
        f0 = jnp.pad(f0, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
        f1p = jnp.pad(f1p, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
    Hp2 = f1p.shape[1]

    grid = (B, Hp // tile_h)
    out = pl.pallas_call(
        functools.partial(_corr_kernel, md=md, ch=C, tile_h=tile_h),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, W, C),
                lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Hp2, W + 2 * md, C),
                lambda b, i: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, s2, tile_h, W),
            lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, s2, Hp, W), f0.dtype),
        interpret=interpret,
    )(f0, f1p)
    # displacement-major kernel output -> NHWC channel-last contract
    return jnp.moveaxis(out[:, :, :H], 1, -1)
