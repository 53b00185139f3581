"""Probe the Mosaic building blocks for a hand-written hourglass conv kernel.

Design: activations live as (D, H, C=32 sublanes, W lanes) bf16. Per grid
step (h-tile, d): build patchT (288, TH*384) by sublane-concat of
lane-shifted row slices, ONE MXU GEMM kfold (96, 288) @ patchT, rolling
3-slot depth accumulator in VMEM scratch (tap-fold over kd), masked
halo lanes, @pl.when-gated output writes. No transposes anywhere.

Blocks probed:
  P2: sublane-concat of lane-shifted slices + GEMM (96,288)@(288,3072)
  P3: rotating VMEM scratch accumulator + @pl.when-gated output writes
  P4: manual DMA from an ANY-space input with dynamic row offset
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    import jax as _j

    _j.config.update("jax_platforms", "cpu")
    _real_call = pl.pallas_call
    pl.pallas_call = functools.partial(_real_call, interpret=True)


def probe(name, fn):
    t = time.time()
    try:
        ok = fn()
        print(f"{name}: ok={ok} in {time.time()-t:.1f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:250]}", flush=True)


# ---- P2: sublane concat of lane-shifted slices + GEMM -------------------
def p2():
    TH, C, WS = 8, 32, 512  # stored row (C, 512), data lanes [1, 321)

    def kern(x_ref, k_ref, o_ref):
        # x: (TH+2, C, WS) rows h-1..h+TH; build per output row h:
        # patchT[(i*3+j)*C+ci, w] = x[h+i, ci, w+j] (stored lane = w+1)
        per_h = []
        for h in range(TH):
            parts = []
            for i in range(3):
                row = x_ref[h + i]  # (C, WS)
                for j in range(3):
                    parts.append(row[:, j:j + 384])
            per_h.append(jnp.concatenate(parts, axis=0))  # (288, 384)
        patch = jnp.concatenate(per_h, axis=1)  # (288, TH*384)
        o_ref[...] = jnp.dot(
            k_ref[...], patch, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (TH + 2, C, WS), jnp.bfloat16, -1, 1)
    k = jax.random.uniform(key, (96, 288), jnp.bfloat16, -1, 1)
    y = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((96, TH * 384), jnp.bfloat16)
    )(x, k)
    xf = np.asarray(x, np.float32)
    kf = np.asarray(k, np.float32)
    per_h = []
    for h in range(TH):
        parts = [xf[h + i][:, j:j + 384] for i in range(3) for j in range(3)]
        per_h.append(np.concatenate(parts, 0))
    ref = kf @ np.concatenate(per_h, 1)
    err = float(np.max(np.abs(ref - np.asarray(y, np.float32))))
    return err / (float(np.max(np.abs(ref))) + 1e-9) < 2e-2


# ---- P3: rotating scratch + gated writes -------------------------------
def p3():
    D, R = 6, 8

    def kern(x_ref, o_ref, acc_ref):
        d = pl.program_id(0)

        @pl.when(d == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        x = x_ref[...].astype(jnp.float32)
        cur = d % 3
        nxt = (d + 1) % 3
        acc_ref[nxt] = acc_ref[nxt] + x * 0.5
        acc_ref[cur] = acc_ref[cur] + x
        o_ref[...] = acc_ref[cur].astype(jnp.bfloat16)
        acc_ref[cur] = jnp.zeros_like(acc_ref[cur])

    x = jax.random.uniform(jax.random.PRNGKey(2), (D, R, 128), jnp.bfloat16)
    y = pl.pallas_call(
        kern,
        grid=(D,),
        in_specs=[pl.BlockSpec((1, R, 128), lambda d: (d, 0, 0))],
        out_specs=pl.BlockSpec((1, R, 128), lambda d: (d, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((D, R, 128), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((3, 1, R, 128), jnp.float32)],
    )(x)
    xf = np.asarray(x, np.float32)
    ref = xf.copy()
    ref[1:] += 0.5 * xf[:-1]
    err = float(np.max(np.abs(ref - np.asarray(y, np.float32))))
    return err < 1e-2


# ---- P4: manual DMA with dynamic offset --------------------------------
def p4():
    H, C, WS, TH = 96, 8, 256, 8

    def kern(x_hbm, o_ref, buf, sem):
        hb = pl.program_id(0)
        start = jnp.clip(hb * TH - 1, 0, H - (TH + 2))
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, TH + 2)], buf, sem
        )
        cp.start()
        cp.wait()
        o_ref[...] = buf[pl.ds(1, TH)] * 2.0

    x = jax.random.uniform(jax.random.PRNGKey(3), (H, C, WS), jnp.bfloat16)
    y = pl.pallas_call(
        kern,
        grid=(H // TH,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TH, C, WS), lambda hb: (hb, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((H, C, WS), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, C, WS), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    xf = np.asarray(x, np.float32)
    ref = xf.copy() * 2.0
    # rows at tile starts use clipped windows; interior rows replicate x*2
    for hb in range(H // TH):
        start = min(max(hb * TH - 1, 0), H - (TH + 2))
        ref[hb * TH:(hb + 1) * TH] = xf[start + 1:start + 1 + TH] * 2.0
    err = float(np.max(np.abs(ref - np.asarray(y, np.float32))))
    return err < 1e-2


probe("P2 sublane-concat+GEMM", p2)
probe("P3 rotating scratch", p3)
probe("P4 dynamic-offset DMA", p4)
