"""Probe Mosaic support for vectorized gathers inside a Pallas kernel.

If jnp.take_along_axis (or vector indexing) legalizes, a VMEM-resident
plane-sweep warp kernel is feasible (the XLA quad-gather runs at ~74 GB/s
effective, ~11x under HBM BW). Three variants, weakest to strongest:
  A. take_along_axis along the SUBLANE axis of a (rows, 128) block
  B. take_along_axis along the LANE axis
  C. one-hot matmul gather (always legal — MXU baseline for comparison)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def kernel_sublane(x_ref, idx_ref, o_ref):
    x = x_ref[...]          # (R, 128)
    idx = idx_ref[...]      # (R, 128) int32 row ids
    o_ref[...] = jnp.take_along_axis(x, idx, axis=0)


def kernel_lane(x_ref, idx_ref, o_ref):
    x = x_ref[...]
    idx = idx_ref[...]
    o_ref[...] = jnp.take_along_axis(x, idx, axis=1)


def main():
    R = 256
    x = jnp.arange(R * 128, dtype=jnp.float32).reshape(R, 128)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (R, 128), 0, R, jnp.int32)

    for name, kern, axis in [("SUBLANE", kernel_sublane, 0),
                             ("LANE", kernel_lane, 1)]:
        t = time.time()
        try:
            y = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32)
            )(x, idx % (R if axis == 0 else 128))
            ref = jnp.take_along_axis(x, idx % (R if axis == 0 else 128),
                                      axis=axis)
            print(f"{name}: ok={bool(jnp.allclose(y, ref))} "
                  f"in {time.time()-t:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
