"""Probe 2: lane-axis take_along_axis at warp-kernel shape + throughput.

The real warp kernel needs: feat rows (C=32 sublanes, H*W~124k lanes,
bf16, ~8 MB VMEM), gather T=128 output pixels x 4 taps per grid step.
Measure a kernel that does G gathers of (32, 128) from a (32, 124k) row
to estimate gather throughput (the flagship warp needs 3.93M pixels x 4
taps => 123k such (32,128) gathers).
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

C, L = 32, 96 * 1280  # 122880 lanes
TILES_PER_STEP = 32    # gathers per grid step
GRID = 960             # total (C,128) gathers = 30720 ~ one plane-sweep's 1/128


def kernel(x_ref, idx_ref, o_ref):
    x = x_ref[...]  # (C, L)
    g = pl.program_id(0)
    acc = jnp.zeros((C, 128), jnp.float32)
    for t in range(TILES_PER_STEP):
        idx = idx_ref[0, pl.ds(g * TILES_PER_STEP + t, 1), :]  # (1,128)
        idxb = jnp.broadcast_to(idx, (C, 128))
        acc = acc + jnp.take_along_axis(x, idxb, axis=1).astype(jnp.float32)
    o_ref[...] = acc.astype(x.dtype)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (C, L), jnp.bfloat16, -1, 1)
    idx = jax.random.randint(key, (1, GRID * TILES_PER_STEP, 128), 0, L,
                             jnp.int32)

    t0 = time.time()
    try:
        f = pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((C, L), lambda g: (0, 0)),
                pl.BlockSpec((1, GRID * TILES_PER_STEP, 128),
                             lambda g: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((C, 128), lambda g: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((C, 128), jnp.bfloat16),
        )
        jf = jax.jit(lambda x, i: jnp.sum(f(x, i).astype(jnp.float32)))
        r = float(jf(x, idx))
        print(f"BIG-LANE gather compiled+ran in {time.time()-t0:.1f}s "
              f"(sum={r:.1f})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"BIG-LANE FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        return

    for _ in range(2):
        float(jf(x, idx))
    t0 = time.perf_counter()
    for _ in range(8):
        float(jf(x, idx))
    dt = (time.perf_counter() - t0) / 8 * 1000
    n_g = GRID * TILES_PER_STEP
    print(f"{n_g} (32,128)-gathers: {dt:.1f} ms (incl ~25 ms read floor); "
          f"flagship warp needs 123k taps*4 => scale x{3932160 * 4 / 128 / n_g:.0f}",
          flush=True)


if __name__ == "__main__":
    main()
