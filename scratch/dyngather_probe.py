"""Probe: Mosaic tpu.dynamic_gather semantics + throughput.

This jax's Mosaic gather rule ONLY accepts equal-shape operand/indices
(lowering.py:2493 asserts indices.shape == x.shape + (1,)), lowered to
tpu.dynamic_gather along the lane axis. Questions:
  1. Does it gather across the FULL lane extent (not just within a
     128-lane register)? Verify out[r,t] == x[r, idx[r,t]] at (8, 512)
     and at the warp-kernel extent (128, 30848).
  2. Throughput at the warp shape: 128 grid steps of a (128, 30848)
     gather ~= one plane-sweep volume's 3.93M queries.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

DN = lax.GatherDimensionNumbers(
    offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
    operand_batching_dims=(0,), start_indices_batching_dims=(0,),
)


def take_eq(x, idx):
    return lax.gather(x, idx[..., None], DN, (1, 1),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def small():
    R, T = 8, 512

    def kernel(x_ref, i_ref, o_ref):
        o_ref[...] = take_eq(x_ref[...], i_ref[...])

    x = jnp.arange(R * T, dtype=jnp.float32).reshape(R, T)
    idx = jax.random.randint(jax.random.PRNGKey(0), (R, T), 0, T, jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, T), jnp.float32),
    )
    t0 = time.time()
    out = np.asarray(f(x, idx))
    ref = np.asarray(x)[np.arange(R)[:, None], np.asarray(idx)]
    ok = np.array_equal(out, ref)
    print(f"small (8,512) full-extent gather: correct={ok} "
          f"(compile {time.time()-t0:.0f}s)", flush=True)
    if not ok:
        bad = np.nonzero(out != ref)
        print("  first bad:", bad[0][:4], bad[1][:4],
              out[bad][:4], ref[bad][:4], flush=True)
    return ok


def big():
    R, T = 128, 30848
    G = 128

    def kernel(x_ref, i_ref, o_ref):
        x = x_ref[...]
        idxb = jnp.broadcast_to(i_ref[...], (R, T))
        o_ref[...] = take_eq(x, idxb)[:32]

    x = jax.random.normal(jax.random.PRNGKey(1), (R, T), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(2), (1, G, T), 0, T,
                             jnp.int32)
    f = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((R, T), lambda g: (0, 0)),
                  pl.BlockSpec((1, 1, T), lambda g: (0, g, 0))],
        out_specs=pl.BlockSpec((32, T), lambda g: (0, g)),
        out_shape=jax.ShapeDtypeStruct((32, G * T), jnp.bfloat16),
    )
    jf = jax.jit(lambda x, i: jnp.sum(f(x, i).astype(jnp.float32)))
    t0 = time.time()
    s = float(jf(x, idx))
    print(f"big (128,30848)x128 compiled+ran in {time.time()-t0:.0f}s "
          f"sum={s:.0f}", flush=True)
    # correctness spot-check of one grid step
    out = f(x, idx)
    g = 3
    ref = np.asarray(x)[np.arange(R)[:, None],
                        np.broadcast_to(np.asarray(idx)[0, g], (R, T))][:32]
    ok = np.array_equal(np.asarray(out[:, g * T:(g + 1) * T]), ref)
    print(f"big correctness (step {g}): {ok}", flush=True)
    for _ in range(2):
        float(jf(x, idx))
    t0 = time.perf_counter()
    for _ in range(6):
        float(jf(x, idx))
    dt = (time.perf_counter() - t0) / 6 * 1000
    print(f"big gather volume: {dt:.1f} ms (~one warp volume of queries; "
          f"incl ~25 ms read floor)", flush=True)


if __name__ == "__main__":
    if small():
        big()
