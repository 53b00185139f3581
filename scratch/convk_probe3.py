"""P2d: unaligned LANE slices taken directly on the ref (not the value).

The value-level slice row[:, 1:385] failed Mosaic legalization; DMA-level
and ref-level slicing may lower differently. If this works, the im2col
patch build for a hand-written hourglass conv kernel is feasible without
pltpu.roll (which also fails).
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")
    pl.pallas_call = functools.partial(pl.pallas_call, interpret=True)

TH, C, WS = 8, 32, 512


def probe(name, fn):
    t = time.time()
    try:
        ok = fn()
        print(f"{name}: ok={ok} in {time.time()-t:.1f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:250]}", flush=True)


def p2d():
    def kern(x_ref, k_ref, o_ref):
        per_h = []
        for h in range(TH):
            parts = []
            for i in range(3):
                for j in range(3):
                    parts.append(x_ref[h + i, :, j:j + 384])  # ref slice
            per_h.append(jnp.concatenate(parts, axis=0))  # (288, 384)
        patch = jnp.concatenate(per_h, axis=1)
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


probe("P2d ref-level unaligned lane slices + dot", p2d)
