"""Probe 3: bisect the Mosaic AssertionError from gather_probe2.

Variants, small to warp-sized; per-step 2-D idx blocks this time:
  V1: C=8,  L=1024   f32  (matches the interpret-ok case)
  V2: C=8,  L=122880 f32  (big lane extent)
  V3: C=32, L=122880 bf16 (warp shape; bf16 gather source)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILES, GRID = 8, 16


def make(C, L, dtype):
    def kernel(x_ref, idx_ref, o_ref):
        x = x_ref[...]
        acc = jnp.zeros((C, 128), jnp.float32)
        for t in range(TILES):
            idx = idx_ref[t, :][None]  # (1, 128)
            idxb = jnp.broadcast_to(idx, (C, 128))
            acc = acc + jnp.take_along_axis(x, idxb, axis=1).astype(
                jnp.float32)
        o_ref[...] = acc.astype(x.dtype)

    return pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((C, L), lambda g: (0, 0)),
            pl.BlockSpec((TILES, 128), lambda g: (g, 0)),
        ],
        out_specs=pl.BlockSpec((C, 128), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, 128), dtype),
    )


def run(name, C, L, dtype):
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (C, L), dtype, -1, 1)
    idx = jax.random.randint(key, (GRID * TILES, 128), 0, L, jnp.int32)
    t0 = time.time()
    try:
        f = make(C, L, dtype)
        y = jax.jit(f)(x, idx)
        ok = bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))
        print(f"{name}: ok={ok} in {time.time()-t0:.1f}s", flush=True)
        return f, x, idx
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:250]}", flush=True)
        return None


run("V1 C=8 L=1024 f32", 8, 1024, jnp.float32)
run("V2 C=8 L=122880 f32", 8, 122880, jnp.float32)
r = run("V3 C=32 L=122880 bf16", 32, 122880, jnp.bfloat16)

if r is not None:
    f, x, idx = r
    jf = jax.jit(lambda x, i: jnp.sum(f(x, i).astype(jnp.float32)))
    float(jf(x, idx))
    t0 = time.perf_counter()
    for _ in range(8):
        float(jf(x, idx))
    dt = (time.perf_counter() - t0) / 8 * 1000
    n = GRID * TILES
    # flagship warp: 3.93M out px * 4 taps / 128 per gather = 122880 gathers
    print(f"V3 throughput: {n} (32,128)-gathers in {dt:.1f} ms "
          f"(~25 ms floor); warp would need {122880 // n}x", flush=True)
