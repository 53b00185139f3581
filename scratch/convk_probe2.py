"""Bisect P2 (sublane-concat + GEMM) Mosaic failure.

  P2a: plain dot (96,288)@(288,3072) from refs
  P2b: 9-part sublane concat of ALIGNED slices + dot
  P2c: pltpu.roll-based lane shifts (aligned slices) + concat + dot
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


def p2a():
    def kern(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(
            a_ref[...], b_ref[...], preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    a = jax.random.uniform(key, (96, 288), jnp.bfloat16, -1, 1)
    b = jax.random.uniform(key, (288, TH * 384), jnp.bfloat16, -1, 1)
    y = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((96, TH * 384), jnp.bfloat16)
    )(a, b)
    ref = np.asarray(a, np.float32) @ np.asarray(b, np.float32)
    err = float(np.max(np.abs(ref - np.asarray(y, np.float32))))
    return err / (float(np.max(np.abs(ref))) + 1e-9) < 2e-2


def p2b():
    def kern(x_ref, k_ref, o_ref):
        per_h = []
        for h in range(TH):
            parts = []
            for i in range(3):
                row = x_ref[h + i]  # (C, WS)
                for _ in range(3):
                    parts.append(row[:, 0:384])  # aligned slice
            per_h.append(jnp.concatenate(parts, axis=0))
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
    return bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))


def p2c():
    def kern(x_ref, k_ref, o_ref):
        per_h = []
        for h in range(TH):
            parts = []
            for i in range(3):
                row = x_ref[h + i]  # (C, WS)
                for j in range(3):
                    # roll requires non-negative shift: WS - j == -j (mod WS)
                    r = row if j == 0 else pltpu.roll(row, shift=WS - j, axis=1)
                    parts.append(r[:, 0:384])
            per_h.append(jnp.concatenate(parts, axis=0))
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
    # reference
    xf = np.asarray(x, np.float32)
    kf = np.asarray(k, np.float32)
    per_h = []
    for h in range(TH):
        parts = []
        for i in range(3):
            for j in range(3):
                parts.append(np.roll(xf[h + i], -j, axis=1)[:, :384])
        per_h.append(np.concatenate(parts, 0))
    ref = kf @ np.concatenate(per_h, 1)
    err = float(np.max(np.abs(ref - np.asarray(y, np.float32))))
    return err / (float(np.max(np.abs(ref))) + 1e-9) < 2e-2


probe("P2a dot", p2a)
probe("P2b aligned concat+dot", p2b)
probe("P2c roll concat+dot", p2c)
